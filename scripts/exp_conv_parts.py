#!/usr/bin/env python
"""Microbenchmark the depthwise res_conv kernel passes (fwd, fused bwd) at
production shapes, plus the XLA depthwise conv for context.

Timing discipline per CLAUDE.md: chain N calls inside one jit via lax.scan
with the carry threaded through, pull a scalar per measurement.
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from mirror_tpu.ops import conv1d_pallas as cp


def timeit(fn, *args, n=20, reps=3):
    first = args[0]

    @jax.jit
    def multi2(first, *rest):
        def body(carry, _):
            out = fn(carry, *rest)
            leaves = jax.tree.leaves(out)
            s = sum(jnp.sum(l).astype(jnp.float32) for l in leaves)
            return carry * (1.0 + 0.0 * s.astype(carry.dtype)), None

        carry, _ = jax.lax.scan(body, first, None, length=n)
        return jnp.sum(carry)

    out = multi2(first, *args[1:])
    float(out)
    times = []
    for _ in range(reps):
        t0 = time.time()
        float(multi2(first, *args[1:]))
        times.append((time.time() - t0) / n)
    times.sort()
    return times[len(times) // 2]


def main():
    b, h, n, d, K = 64, 8, 2304, 96, 33
    key = jax.random.PRNGKey(0)
    v = jax.random.normal(key, (b, h, n, d), jnp.bfloat16)
    g = jax.random.normal(key, (b, h, n, d), jnp.bfloat16)
    kern = jax.random.normal(key, (h, K), jnp.float32)

    t_fwd = timeit(lambda vv, kk: cp._fwd_call(vv, kk), v, kern)
    print(f"fwd             {t_fwd*1e3:7.2f} ms")

    t_bwd = timeit(lambda vv, kk, gg: cp._bwd_call(vv, kk, gg), v, kern, g)
    print(f"bwd fused dv+dk {t_bwd*1e3:7.2f} ms")

    # XLA reference conv for context
    def xla_conv(vv, kk):
        return jax.lax.conv_general_dilated(
            vv.transpose(0, 2, 3, 1), kk.transpose(1, 0)[:, None, None, :],
            (1, 1), ((K // 2, K // 2), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=h,
        )

    t_x = timeit(lambda vv, kk: xla_conv(vv, kk), v, kern.astype(v.dtype))
    print(f"xla fwd         {t_x*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
