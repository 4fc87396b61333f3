#!/usr/bin/env python
"""Measure the chip's effective HBM bandwidth and the conv block-DMA floor
under different layouts: plain XLA elementwise, copy kernels with d=96 vs
d=128 lanes, per-(b,h) vs batch-grouped blocks."""

import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from mirror_tpu.ops import conv1d_pallas as cp


def timeit(fn, *args, n=20, reps=3):
    first = args[0]

    @jax.jit
    def multi(first, *rest):
        def body(carry, _):
            out = fn(carry, *rest)
            leaves = jax.tree.leaves(out)
            s = sum(jnp.sum(l).astype(jnp.float32) for l in leaves)
            return carry * (1.0 + 0.0 * s.astype(carry.dtype)), None

        carry, _ = jax.lax.scan(body, first, None, length=n)
        return jnp.sum(carry)

    out = multi(first, *args[1:])
    float(out)
    times = []
    for _ in range(reps):
        t0 = time.time()
        float(multi(first, *args[1:]))
        times.append((time.time() - t0) / n)
    times.sort()
    return times[len(times) // 2]


def copy_floor(x, gb, d, label):
    b, h, n, _ = x.shape

    def copy_kernel(v_ref, o_ref):
        o_ref[...] = v_ref[...]

    def run(xx):
        spec = pl.BlockSpec((gb, 1, n, d), lambda bgi, hi: (bgi, hi, 0, 0),
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            copy_kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            grid=(b // gb, h),
            in_specs=[spec],
            out_specs=spec,
            interpret=cp._use_interpret(),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
        )(xx)

    t = timeit(run, x)
    gbs = 2 * x.size * x.dtype.itemsize / t / 1e9
    print(f"{label:28s} {t*1e3:7.2f} ms  {gbs:6.0f} GB/s")


def main():
    key = jax.random.PRNGKey(0)
    b, h, n, d = 64, 8, 2304, 96

    # 1. XLA elementwise floor on a big flat array (512 MB round trip)
    big = jax.random.normal(key, (64 * 1024 * 1024,), jnp.bfloat16)
    t = timeit(lambda x: x * jnp.bfloat16(1.0001), big)
    gbs = 2 * big.size * 2 / t / 1e9
    print(f"{'xla elementwise flat 128MB':28s} {t*1e3:7.2f} ms  {gbs:6.0f} GB/s")

    v96 = jax.random.normal(key, (b, h, n, d), jnp.bfloat16)
    t = timeit(lambda x: x * jnp.bfloat16(1.0001), v96)
    gbs = 2 * v96.size * 2 / t / 1e9
    print(f"{'xla elementwise [b,h,n,96]':28s} {t*1e3:7.2f} ms  {gbs:6.0f} GB/s")

    v128 = jax.random.normal(key, (b, h, n, 128), jnp.bfloat16)
    t = timeit(lambda x: x * jnp.bfloat16(1.0001), v128)
    gbs = 2 * v128.size * 2 / t / 1e9
    print(f"{'xla elementwise [b,h,n,128]':28s} {t*1e3:7.2f} ms  {gbs:6.0f} GB/s")

    # 2. pallas copy floors
    copy_floor(v96, 8, 96, "copy gb=8 d=96")
    copy_floor(v96, 4, 96, "copy gb=4 d=96")
    copy_floor(v96, 1, 96, "copy gb=1 d=96 (old grid)")
    copy_floor(v128, 8, 128, "copy gb=8 d=128")

    # 3. whole-(b) block: grid over h only
    def copy_kernel(v_ref, o_ref):
        o_ref[...] = v_ref[...]

    def run_flat(xx):
        spec = pl.BlockSpec((b, 1, n, d), lambda hi: (0, hi, 0, 0),
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            copy_kernel,
            out_shape=jax.ShapeDtypeStruct(v96.shape, v96.dtype),
            grid=(h,),
            in_specs=[spec],
            out_specs=spec,
            interpret=cp._use_interpret(),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024),
        )(xx)

    try:
        t = timeit(run_flat, v96)
        gbs = 2 * v96.size * 2 / t / 1e9
        print(f"{'copy whole-b block, grid=h':28s} {t*1e3:7.2f} ms  {gbs:6.0f} GB/s")
    except Exception as e:  # VMEM OOM likely
        print(f"copy whole-b block: {type(e).__name__}")

    # 4. n-tiled blocks (halo-free copy): grid (b//8, h, n_tiles)
    def run_ntile(xx):
        spec = pl.BlockSpec((8, 1, cp.ROW_TILE, d),
                            lambda bgi, hi, ti: (bgi, hi, ti, 0),
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            copy_kernel,
            out_shape=jax.ShapeDtypeStruct(v96.shape, v96.dtype),
            grid=(b // 8, h, n // cp.ROW_TILE),
            in_specs=[spec],
            out_specs=spec,
            interpret=cp._use_interpret(),
        )(xx)

    t = timeit(run_ntile, v96)
    gbs = 2 * v96.size * 2 / t / 1e9
    print(f"{'copy n-tiled 384 blocks':28s} {t*1e3:7.2f} ms  {gbs:6.0f} GB/s")


if __name__ == "__main__":
    main()
