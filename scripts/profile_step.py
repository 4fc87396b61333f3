#!/usr/bin/env python
"""Profile the flagship MIRROR train step on the real chip and print the
top time-consuming XLA ops, aggregated from a jax.profiler trace.

Usage: python scripts/profile_step.py [--batch 64] [--steps 5] [--fwd-only]
                                      [--no-pallas]
"""

import argparse
import collections
import glob
import os
import sys
import tempfile

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_step(batch, tokens=2048, use_pallas=True, fwd_only=False,
               pinv_grad=None):
    from mirror_tpu.losses import MirrorLossWeights, mirror_loss
    from mirror_tpu.registry import create_model
    from mirror_tpu.train.optim import make_optimizer, make_schedule
    from mirror_tpu.train.state import create_train_state
    from mirror_tpu.train.steps import make_mirror_train_step

    # default to the production/bench default (config.py --pinv-grad);
    # override with MIRROR_BENCH_PINV_GRAD or the pinv_grad arg to profile
    # the reference-faithful exact mode
    if pinv_grad is None:
        pinv_grad = os.environ.get("MIRROR_BENCH_PINV_GRAD", "implicit")
    model = create_model(
        "mirror",
        wsi_embed_dim=768, rna_embed_dim=10234, embed_dim=768,
        wsi_num_tokens=tokens, rna_mlp_ratio=4.0, rna_norm_eps=1e-5,
        use_pallas=use_pallas, pinv_grad=pinv_grad, dtype="bfloat16",
    )

    class A:
        opt = "adam"
        opt_eps = None
        opt_betas = None
        momentum = 0.9
        weight_decay = 0.0
        clip_grad = None
        clip_mode = "norm"
        opt_kwargs = {}
        use_sched = False
        grad_accum_steps = 1

    sched = make_schedule(A, 10, 2e-5)
    tx = make_optimizer(A, sched)
    key = jax.random.PRNGKey(0)
    wsi = jax.random.normal(key, (batch, tokens, 768), jnp.float32)
    rna = jax.random.normal(key, (batch, 10234), jnp.float32)
    rngs = dict(zip(["params", "dropout", "masking", "style"], jax.random.split(key, 4)))
    shapes = jax.eval_shape(
        lambda r, w, x: model.init(r, w, x, 0.75, 0.75, True), rngs, wsi[:2], rna[:2]
    )
    leaves, treedef = jax.tree_util.tree_flatten(shapes)

    @jax.jit
    def fill(k):
        ks = jax.random.split(k, len(leaves))
        return [0.02 * jax.random.normal(kk, s.shape, s.dtype) for kk, s in zip(ks, leaves)]

    params = jax.tree_util.tree_unflatten(treedef, fill(jax.random.PRNGKey(42)))["params"]
    state = create_train_state(params, tx, model_ema=False)
    batch_dict = {"wsi": wsi, "rna": rna}

    if fwd_only:
        weights = MirrorLossWeights(0.5, 0.15, 0.15, 0.1, 0.1)

        @jax.jit
        def step(state, b, rng):
            rngs = dict(zip(["dropout", "masking", "style"], jax.random.split(rng, 3)))
            out = model.apply({"params": state.params}, b["wsi"], b["rna"],
                              0.75, 0.75, False, rngs=rngs)
            return state, {"loss": mirror_loss(*out, weights=weights)[0]}
    else:
        step = jax.jit(make_mirror_train_step(
            model, tx, MirrorLossWeights(0.5, 0.15, 0.15, 0.1, 0.1)))
    return step, state, batch_dict


def _category(name: str) -> str:
    """Rollup key for an HLO op name like '%fusion.611 = bf16[...] ...'."""
    import re

    op = name.lstrip("%").split(" ")[0].split(".")[0]
    m = re.search(r"= \S*? (\w+)\(", name)
    kind = m.group(1) if m else ""
    if op.startswith("attn") or "custom-call" in name and "tpu_custom_call" in name:
        return "pallas:attn"
    if kind == "fusion" or op.startswith("fusion") or "_fusion" in op:
        # classify by shapes in the output: conv/matmul fusions named already
        if "convolution" in op:
            return "fusion:convolution"
        return f"fusion:{op[:40]}"
    if "copy" in op:
        return "copy"
    if "convolution" in op:
        return "convolution"
    if "all-reduce" in op or "all-gather" in op:
        return "collective"
    return op[:40]


def aggregate_trace(trace_dir):
    """Sum device-op durations from the 'XLA Ops' trace line only (module and
    step lines double-count the same wall time)."""
    from jax.profiler import ProfileData

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    assert paths, f"no xplane.pb under {trace_dir}"
    data = ProfileData.from_file(paths[0])
    per_op = collections.Counter()
    per_cat = collections.Counter()
    total = 0.0
    for plane in data.planes:
        if "TPU" not in plane.name:
            continue
        for line in plane.lines:
            if "XLA Ops" not in line.name:
                continue
            for ev in line.events:
                dur = ev.duration_ns
                per_op[ev.name] += dur
                per_cat[_category(ev.name)] += dur
                total += dur
    return per_op, per_cat, total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--fwd-only", action="store_true")
    ap.add_argument("--no-pallas", action="store_true")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    step, state, batch = build_step(
        args.batch, use_pallas=not args.no_pallas, fwd_only=args.fwd_only
    )
    rng = jax.random.PRNGKey(1)
    state, m = step(state, batch, rng)
    print("warmup loss:", float(m["loss"]))

    trace_dir = tempfile.mkdtemp(prefix="mirror_prof_")
    with jax.profiler.trace(trace_dir):
        for i in range(args.steps):
            state, m = step(state, batch, jax.random.fold_in(rng, i))
        float(m["loss"])  # sync inside the trace
    print("trace:", trace_dir)

    per_op, per_cat, total = aggregate_trace(trace_dir)
    print(f"\ntotal device-op time: {total/1e6:.1f} ms over {args.steps} steps "
          f"({total/1e6/args.steps:.1f} ms/step)")
    print(f"\n== categories ==\n{'ms/step':>9}  {'%':>5}  category")
    for name, dur in per_cat.most_common(args.top):
        print(f"{dur/1e6/args.steps:9.2f}  {100*dur/total:5.1f}  {name}")
    print(f"\n== top ops ==\n{'ms/step':>9}  {'%':>5}  op")
    for name, dur in per_op.most_common(args.top):
        print(f"{dur/1e6/args.steps:9.2f}  {100*dur/total:5.1f}  {name[:140]}")


if __name__ == "__main__":
    main()
