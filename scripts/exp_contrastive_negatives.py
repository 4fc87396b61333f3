"""Measure local- vs global-negative contrastive pretraining on a mesh.

VERDICT r4 #5: the multi-chip contrastive default ('global') inverted
SURVEY 2.8's parity posture ('local' == the reference's DDP semantics,
losses/mirror_loss.py:37-50 never gathers embeddings across ranks) without a
measurement. This produces one:

On an 8-device CPU mesh (the same virtual mesh the dryrun uses), with
identical seeds/data/init:
  1. train N steps in each mode, recording all 6 loss terms per step
     (independent trajectories — what each default would actually train);
  2. along the GLOBAL trajectory, also evaluate the local-mode loss and
     gradient at every visited state: per-step loss gap and gradient cosine
     (how different the two objectives' update directions really are);
  3. the math identity: global CE over an 8x larger negative set sits
     ~ln(n_dev) above per-chip CE for random embeddings, so raw loss VALUES
     are not comparable — the artifact records both, plus the
     alignment-excluded remainder (the other 5 terms share semantics).

Writes scripts/../contrastive_study_r5.json and prints a summary.
Run: python scripts/exp_contrastive_negatives.py  (forces CPU, 8 devices)
"""

import json
import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from functools import partial

import numpy as np
import jax.numpy as jnp

from mirror_tpu.losses import MirrorLossWeights, local_clip_loss
from mirror_tpu.parallel import create_mesh, shard_state
from mirror_tpu.registry import create_model
from mirror_tpu.train.harness import _jit_train_step
from mirror_tpu.train.optim import make_optimizer, make_schedule
from mirror_tpu.train.state import create_train_state
from mirror_tpu.train.steps import make_mirror_train_step

from jax.sharding import NamedSharding, PartitionSpec as P

N_STEPS = 40
B = 16  # global batch; local mode sees 2 negatives/chip vs 16 global
WEIGHTS = MirrorLossWeights(0.5, 0.15, 0.15, 0.1, 0.1)


class _Args:
    opt = "adamw"
    opt_eps = None
    opt_betas = None
    momentum = 0.9
    weight_decay = 1e-4
    clip_grad = 1.0
    clip_mode = "norm"
    opt_kwargs = {}
    use_sched = True
    sched = "cosine"
    sched_on_updates = True
    warmup_lr = 1e-6
    min_lr = 1e-8
    epochs = 4
    warmup_epochs = 1
    warmup_prefix = False
    decay_epochs = 90
    decay_rate = 0.1
    decay_milestones = (90,)
    grad_accum_steps = 1


def _model():
    return create_model(
        "mirror", wsi_embed_dim=32, rna_embed_dim=96, embed_dim=48,
        wsi_num_tokens=16, rna_mlp_ratio=2.0, num_prototypes=24,
        style_mlp_hidden_dim=24, style_mlp_out_dim=16, style_latent_dim=8,
    )


def _batches():
    rng = np.random.default_rng(0)
    return [
        {
            "wsi": rng.normal(size=(B, 16, 32)).astype(np.float32),
            "rna": rng.normal(size=(B, 96)).astype(np.float32),
        }
        for _ in range(N_STEPS)
    ]


def _setup(mesh, mode):
    model = _model()
    rngs = dict(zip(
        ["params", "dropout", "masking", "style"],
        jax.random.split(jax.random.PRNGKey(0), 4),
    ))
    params = model.init(
        rngs,
        jnp.zeros((B, 16, 32), jnp.float32),
        jnp.zeros((B, 96), jnp.float32),
        0.75, 0.75, True,
    )["params"]
    schedule = make_schedule(_Args, steps_per_epoch=10, base_lr=1e-3)
    tx = make_optimizer(_Args, schedule)
    fn = partial(local_clip_loss, mesh=mesh) if mode == "local" else None
    step = make_mirror_train_step(
        model, tx, WEIGHTS, ema_decay=None, schedule=schedule,
        alignment_loss_fn=fn,
    )
    state = shard_state(mesh, create_train_state(params, tx))
    return state, step, model, fn


TERMS = ("loss", "alignment_loss", "wsi_retention_loss",
         "rna_retention_loss", "style_loss", "cluster_loss")


def _put(mesh, batch):
    return {
        k: jax.device_put(v, NamedSharding(mesh, P("data")))
        for k, v in batch.items()
    }


def _flat(tree):
    return np.concatenate([
        np.asarray(x, np.float64).ravel() for x in jax.tree.leaves(tree)
    ])


def main():
    mesh = create_mesh(num_devices=8)
    batches = _batches()

    curves = {}
    for mode in ("global", "local"):
        state, step, model, fn = _setup(mesh, mode)
        jitted = _jit_train_step(step, state, mesh)
        per_term = {t: [] for t in TERMS}
        for i, b in enumerate(batches):
            state, metrics = jitted(state, _put(mesh, b), jax.random.PRNGKey(i))
            for t in TERMS:
                per_term[t].append(float(metrics[t]))
        curves[mode] = per_term

    # gradient-direction comparison along the GLOBAL trajectory: at each
    # visited state, grad of the global objective vs grad of the local one
    state, step_g, model, _ = _setup(mesh, "global")
    _, step_l, _, _ = _setup(mesh, "local")
    jit_g = _jit_train_step(step_g, state, mesh)

    from mirror_tpu.losses import mirror_loss

    def make_loss(fn):
        def loss(params, batch, rng):
            rngs = dict(zip(
                ["dropout", "masking", "style"], jax.random.split(rng, 3)
            ))
            out = model.apply(
                {"params": params}, batch["wsi"], batch["rna"],
                0.75, 0.75, False, rngs=rngs,
            )
            return mirror_loss(*out, weights=WEIGHTS, alignment_loss_fn=fn)[0]
        return jax.jit(jax.grad(loss))

    grad_global = make_loss(None)
    grad_local = make_loss(partial(local_clip_loss, mesh=mesh))

    cosines, gap = [], []
    for i, b in enumerate(batches):
        db = _put(mesh, b)
        rng = jax.random.PRNGKey(i)
        gg = _flat(grad_global(state.params, db, rng))
        gl = _flat(grad_local(state.params, db, rng))
        cosines.append(float(
            gg @ gl / (np.linalg.norm(gg) * np.linalg.norm(gl) + 1e-30)
        ))
        state, metrics = jit_g(state, db, rng)
    # loss-value gap on shared states is curves-independent; summarize the
    # alignment-term offset expected from the negative-set size: ln(8)
    align_gap = (
        np.asarray(curves["global"]["alignment_loss"])
        - np.asarray(curves["local"]["alignment_loss"])
    )

    non_align_global = [
        curves["global"][t] for t in TERMS[2:]
    ]
    non_align_local = [
        curves["local"][t] for t in TERMS[2:]
    ]

    result = {
        "n_steps": N_STEPS,
        "global_batch": B,
        "devices": 8,
        "local_negatives_per_chip": B // 8,
        "curves": curves,
        "grad_cosine_local_vs_global": cosines,
        "grad_cosine_mean": float(np.mean(cosines)),
        "grad_cosine_min": float(np.min(cosines)),
        "alignment_gap_mean": float(align_gap.mean()),
        "ln_num_devices": float(np.log(8.0)),
        "non_alignment_term_max_rel_gap": float(np.max(np.abs(
            (np.asarray(non_align_global) - np.asarray(non_align_local))
            / (np.abs(np.asarray(non_align_local)) + 1e-12)
        ))),
    }
    out = os.path.join(os.path.dirname(__file__), "..",
                       "contrastive_study_r5.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: v for k, v in result.items() if k != "curves"
                      and k != "grad_cosine_local_vs_global"}, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
