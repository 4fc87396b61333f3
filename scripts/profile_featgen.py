#!/usr/bin/env python
"""Profile / time the Phikon ViT-B/16 feature-extraction forward on the
real chip at varying batch sizes and dtypes. Prints patches/s and TFLOP/s
(ViT-B/16 at 224px is ~17.6 GFLOP/img fwd).

Usage: python scripts/profile_featgen.py [--batch 512] [--trace] [--fp32]
"""

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GFLOP_PER_IMG = 17.6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--pallas", action="store_true")
    ap.add_argument("--int8", action="store_true",
                    help="W8A8 QuantDense GEMMs (inference-only)")
    ap.add_argument("--trace", action="store_true")
    ap.add_argument("--steps", type=int, default=8)
    args = ap.parse_args()

    from mirror_tpu.models.feature_extractors import ViTB16

    dtype = None if args.fp32 else "bfloat16"
    model = ViTB16(dtype=dtype, use_pallas=args.pallas,
                   quant="int8" if args.int8 else None)
    key = jax.random.PRNGKey(0)
    imgs = jax.random.normal(key, (args.batch, 224, 224, 3), jnp.float32)
    params = jax.jit(lambda: model.init(key, imgs[:2]))()["params"]

    n_steps = args.steps

    @jax.jit
    def multi(params, imgs):
        def body(carry, i):
            # make the body depend on the carry so the loop isn't hoisted
            out = model.apply({"params": params}, imgs + carry * 0.0)
            return jnp.mean(out), None

        s, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n_steps))
        return s

    s = multi(params, imgs)
    float(s)
    times = []
    for _ in range(3):
        t0 = time.time()
        float(multi(params, imgs))
        times.append((time.time() - t0) / n_steps)
    times.sort()
    dt = times[len(times) // 2]
    pps = args.batch / dt
    print(f"batch={args.batch} dtype={'fp32' if args.fp32 else 'bf16'} "
          f"pallas={args.pallas} int8={args.int8}: {dt*1000:.1f} ms/batch, "
          f"{pps:.0f} patches/s, {pps*GFLOP_PER_IMG/1000:.1f} TFLOP/s")

    if args.trace:
        import tempfile

        from scripts.profile_step import aggregate_trace

        trace_dir = tempfile.mkdtemp(prefix="featgen_prof_")
        with jax.profiler.trace(trace_dir):
            float(multi(params, imgs))
        per_op, per_cat, total = aggregate_trace(trace_dir)
        print(f"\ntotal device-op time over {n_steps} fwds: {total/1e6:.1f} ms")
        print(f"{'ms/fwd':>8}  {'%':>5}  category")
        for name, dur in per_cat.most_common(14):
            print(f"{dur/1e6/n_steps:8.2f}  {100*dur/total:5.1f}  {name}")
        print()
        for name, dur in per_op.most_common(12):
            print(f"{dur/1e6/n_steps:8.2f}  {100*dur/total:5.1f}  {name[:120]}")


if __name__ == "__main__":
    main()
