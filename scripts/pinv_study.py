#!/usr/bin/env python
"""Exact-vs-implicit pinv gradient adoption study (VERDICT r2 item #1).

The Pallas Nystrom kernels support two backward modes for the 6-iteration
Moore-Penrose pseudo-inverse (ref models/mirror.py:299-309 autodiffs through
the iterations):

- ``exact``    — replay the 6 iterations inside the kernel VJP (faithful;
                 67 ms/step of the 283 ms exact-mode step);
- ``implicit`` — implicit-function gradient of the CONVERGED pinv
                 (d(A^+) via the Magnus expression), 2 matmuls instead
                 (+30% end-to-end throughput), but biased on unconverged
                 iterates: gradient cosine ~0.56 at init.

This script produces the evidence VERDICT asked for: same seeds, same
synthetic data with learnable structure, N steps at production dims,

  (a) per-term loss curves for both modes,
  (b) the gradient-cosine trajectory along the implicit run (does the bias
      shrink as the landmark matrices condition?),
  (c) a downstream linear-probe delta on held-out labeled slides.

Writes one JSON (``--output``); summarize into BASELINE.md by hand.

Run on the real chip:  python scripts/pinv_study.py --steps 500
Tiny smoke (CPU):      MIRROR_PLATFORM=cpu python scripts/pinv_study.py \
                           --steps 8 --tiny --cosine-every 4 --log-every 2
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_structured_batches(
    rng, n_slides, tokens, wsi_dim, rna_dim, latent=16, n_classes=2
):
    """Paired WSI/RNA data sharing a per-slide latent (plus class structure)
    so every loss term has signal: alignment (shared latent), retention
    (tokens correlated through the latent), clustering (class modes)."""
    z_class = rng.normal(size=(n_classes, latent)).astype(np.float32) * 2.0
    labels = rng.integers(0, n_classes, size=n_slides)
    z = (z_class[labels] + rng.normal(size=(n_slides, latent)) * 0.5).astype(
        np.float32
    )
    a_wsi = rng.normal(size=(latent, wsi_dim)).astype(np.float32) / np.sqrt(latent)
    a_rna = rng.normal(size=(latent, rna_dim)).astype(np.float32) / np.sqrt(latent)
    token_noise = rng.normal(size=(n_slides, tokens, wsi_dim)).astype(np.float32)
    wsi = z @ a_wsi
    wsi = wsi[:, None, :] + 0.3 * token_noise
    rna = z @ a_rna + 0.1 * rng.normal(size=(n_slides, rna_dim)).astype(np.float32)
    return wsi.astype(np.float32), rna.astype(np.float32), labels


def build(mode, args, mesh):
    """(model, train_step, state, schedule-free tx) for one pinv mode."""
    import jax
    import optax

    from mirror_tpu.losses import MirrorLossWeights
    from mirror_tpu.registry import create_model
    from mirror_tpu.train.state import create_train_state
    from mirror_tpu.train.steps import make_mirror_train_step
    from mirror_tpu.parallel import replicate

    kwargs = dict(
        wsi_embed_dim=args.wsi_dim,
        rna_embed_dim=args.rna_dim,
        embed_dim=args.embed_dim,
        wsi_num_tokens=args.tokens,
        rna_mlp_ratio=2.572,
        num_prototypes=args.prototypes,
        dtype="bfloat16" if args.bf16 else None,
        use_pallas=args.use_pallas,
        pinv_grad=mode,
    )
    model = create_model("mirror", **kwargs)
    import jax.numpy as jnp

    rngs = {
        "params": jax.random.PRNGKey(args.seed),
        "dropout": jax.random.PRNGKey(args.seed + 1),
        "masking": jax.random.PRNGKey(args.seed + 2),
        "style": jax.random.PRNGKey(args.seed + 3),
    }
    wsi0 = jnp.zeros((2, args.tokens, args.wsi_dim), jnp.float32)
    rna0 = jnp.zeros((2, args.rna_dim), jnp.float32)
    params = jax.jit(
        lambda r: model.init(r, wsi0, rna0, 0.75, 0.75, True)["params"]
    )(rngs)
    tx = optax.adam(args.lr)
    state = replicate(mesh, create_train_state(params, tx))
    step = make_mirror_train_step(
        model, tx, MirrorLossWeights(0.5, 0.15, 0.15, 0.1, 0.1)
    )
    return model, jax.jit(step, donate_argnums=0), state, tx


def tree_cosine(a, b):
    import jax
    import jax.numpy as jnp

    av, _ = jax.flatten_util.ravel_pytree(a)
    bv, _ = jax.flatten_util.ravel_pytree(b)
    av, bv = av.astype(jnp.float32), bv.astype(jnp.float32)
    return float(
        jnp.vdot(av, bv)
        / jnp.maximum(jnp.linalg.norm(av) * jnp.linalg.norm(bv), 1e-20)
    )


def grad_fn_for(mode, args, mesh):
    """Loss-grad (no update) in the given mode, for cosine probes."""
    import jax

    from mirror_tpu.losses import MirrorLossWeights, mirror_loss
    from mirror_tpu.registry import create_model

    kwargs = dict(
        wsi_embed_dim=args.wsi_dim,
        rna_embed_dim=args.rna_dim,
        embed_dim=args.embed_dim,
        wsi_num_tokens=args.tokens,
        rna_mlp_ratio=2.572,
        num_prototypes=args.prototypes,
        dtype="bfloat16" if args.bf16 else None,
        use_pallas=args.use_pallas,
        pinv_grad=mode,
    )
    model = create_model("mirror", **kwargs)
    weights = MirrorLossWeights(0.5, 0.15, 0.15, 0.1, 0.1)

    def loss_fn(params, batch, rngs):
        out = model.apply(
            {"params": params}, batch["wsi"], batch["rna"], 0.75, 0.75,
            False, rngs=rngs,
        )
        return mirror_loss(*out, weights=weights)[0]

    return jax.jit(jax.grad(loss_fn))


def probe_accuracy(model_kwargs, params, wsi, labels, seed=0):
    """Linear probe on frozen wsi cls embeddings (sklearn logistic)."""
    import jax
    import jax.numpy as jnp
    from sklearn.linear_model import LogisticRegression
    from sklearn.model_selection import cross_val_score

    from mirror_tpu.registry import create_model

    model = create_model("mirror", **model_kwargs)

    @jax.jit
    def embed(p, w):
        enc = model.bind(
            {"params": p},
            rngs={"masking": jax.random.PRNGKey(0),
                  "style": jax.random.PRNGKey(1)},
        ).wsi_encoder
        seq = enc.forward_encoder(jnp.asarray(w), True)
        return seq[:, 0, :].astype(jnp.float32)

    wsi_dev = jnp.asarray(wsi)  # device-resident: avoid per-chunk host ships
    embs = []
    bs = 16
    n_full = (len(wsi) // bs) * bs
    for i in range(0, n_full, bs):
        embs.append(np.asarray(embed(params, wsi_dev[i : i + bs])))
    x = np.concatenate(embs)
    labels = np.asarray(labels)[:n_full]
    clf = LogisticRegression(max_iter=2000, random_state=seed)
    scores = cross_val_score(clf, x, labels, cv=4)
    return float(np.mean(scores))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--n-slides", type=int, default=64)
    ap.add_argument("--tokens", type=int, default=2048)
    ap.add_argument("--wsi-dim", type=int, default=768)
    ap.add_argument("--rna-dim", type=int, default=10234)
    ap.add_argument("--embed-dim", type=int, default=768)
    ap.add_argument("--prototypes", type=int, default=3000)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--log-every", type=int, default=10)
    ap.add_argument("--cosine-every", type=int, default=50)
    ap.add_argument("--bf16", action="store_true", default=True)
    ap.add_argument("--no-bf16", dest="bf16", action="store_false")
    ap.add_argument("--use-pallas", action="store_true", default=None)
    ap.add_argument("--tiny", action="store_true",
                    help="smoke dims for CPU runs")
    ap.add_argument("--output", default="pinv_study.json")
    args = ap.parse_args()

    if args.tiny:
        args.tokens, args.wsi_dim, args.rna_dim = 16, 32, 96
        args.embed_dim, args.prototypes = 48, 24
        args.batch_size, args.n_slides = 8, 16
        args.bf16 = False

    forced = os.environ.get("MIRROR_PLATFORM")
    import jax

    if forced:
        jax.config.update("jax_platforms", forced)
    if args.use_pallas is None:
        args.use_pallas = jax.default_backend() == "tpu"

    import jax.numpy as jnp

    from mirror_tpu.parallel import create_mesh, shard_batch

    mesh = create_mesh()
    host_rng = np.random.default_rng(args.seed)
    wsi, rna, labels = make_structured_batches(
        host_rng, args.n_slides, args.tokens, args.wsi_dim, args.rna_dim
    )
    print(f"data: wsi {wsi.shape}, rna {rna.shape}", flush=True)

    # the cohort lives ON DEVICE (a 2048x768 fp32 batch is ~200 MB — far too
    # much to ship per step over the axon tunnel); batches are device-side
    # gathers, sharded over the mesh
    from mirror_tpu.parallel.mesh import batch_sharding

    wsi_dev = jnp.asarray(wsi)
    rna_dev = jnp.asarray(rna)

    @jax.jit
    def gather(wsi_d, rna_d, idx):
        # dataset passed as ARGUMENTS: closing over it would bake 400 MB of
        # constants into the program (the remote compile service rejects it)
        return {
            "wsi": jax.lax.with_sharding_constraint(
                jnp.take(wsi_d, idx, axis=0), batch_sharding(mesh)
            ),
            "rna": jax.lax.with_sharding_constraint(
                jnp.take(rna_d, idx, axis=0), batch_sharding(mesh)
            ),
        }

    def batch_at(step):
        idx = np.random.default_rng(1000 + step).choice(
            args.n_slides, args.batch_size, replace=False
        )
        return gather(wsi_dev, rna_dev, jnp.asarray(idx))

    results = {"args": vars(args), "modes": {}}
    final_params = {}
    for mode in ("exact", "implicit"):
        _, step_fn, state, _ = build(mode, args, mesh)
        curve = []
        t0 = time.time()
        for s in range(args.steps):
            rng = jax.random.fold_in(jax.random.PRNGKey(args.seed + 7), s)
            state, metrics = step_fn(state, batch_at(s), rng)
            if s % args.log_every == 0 or s == args.steps - 1:
                m = {k: float(v) for k, v in metrics.items()}
                m["step"] = s
                curve.append(m)
                print(f"[{mode}] step {s}: loss {m['loss']:.4f}", flush=True)
        dt = time.time() - t0
        results["modes"][mode] = {
            "curve": curve,
            "wall_s": dt,
            "samples_per_s": args.steps * args.batch_size / dt,
        }
        final_params[mode] = jax.tree.map(np.asarray, state.params)
        del state

    # (b) gradient-cosine trajectory along the implicit run: re-train
    # implicit, probing exact-vs-implicit grads at the SAME params
    _, step_fn, state, _ = build("implicit", args, mesh)
    g_exact = grad_fn_for("exact", args, mesh)
    g_impl = grad_fn_for("implicit", args, mesh)
    cosines = []
    for s in range(args.steps):
        rng = jax.random.fold_in(jax.random.PRNGKey(args.seed + 7), s)
        if s % args.cosine_every == 0 or s == args.steps - 1:
            batch = batch_at(s)
            rngs = {
                "dropout": jax.random.fold_in(rng, 0),
                "masking": jax.random.fold_in(rng, 1),
                "style": jax.random.fold_in(rng, 2),
            }
            ge = g_exact(state.params, batch, rngs)
            gi = g_impl(state.params, batch, rngs)
            c = tree_cosine(ge, gi)
            cosines.append({"step": s, "cosine": c})
            print(f"[cosine] step {s}: {c:.4f}", flush=True)
        state, _ = step_fn(state, batch_at(s), rng)
    results["cosine_trajectory"] = cosines

    # (c) downstream linear probe on frozen cls embeddings
    probe_kwargs = dict(
        wsi_embed_dim=args.wsi_dim, rna_embed_dim=args.rna_dim,
        embed_dim=args.embed_dim, wsi_num_tokens=args.tokens,
        rna_mlp_ratio=2.572, num_prototypes=args.prototypes,
        dtype="bfloat16" if args.bf16 else None,
        use_pallas=args.use_pallas,
    )
    probe_wsi, _, probe_labels = make_structured_batches(
        np.random.default_rng(args.seed + 999), args.n_slides, args.tokens,
        args.wsi_dim, args.rna_dim,
    )
    for mode in ("exact", "implicit"):
        acc = probe_accuracy(probe_kwargs, final_params[mode],
                             probe_wsi, probe_labels)
        results["modes"][mode]["probe_acc"] = acc
        print(f"[probe] {mode}: acc {acc:.4f}", flush=True)

    with open(args.output, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
