#!/usr/bin/env python
"""Exact-mode pinv backward probe (VERDICT r3 next #8).

The exact backward (ops/pinv_pallas._bwd_kernel) replays the 6 forward
iterations stashing (z, xz, t3, a) per iteration — 4*iters [m, m] bf16
tiles = 6.9 MB VMEM scratch at m=384 — then reverse-sweeps with zero
recomputation (12 dots/iter total). It measures ~87% of MXU roofline.
Hypothesis to test: the big scratch blocks cross-grid-step double
buffering, so trading FLOPs for VMEM could win despite more dots.

Variants (same math, bit-comparable outputs):
- full  : current kernel (stash 4/iter, 12 dots/iter)
- z+xz  : stash (z, xz) (3.5 MB), recompute t3/a in reverse (14 dots/iter)
- z     : stash z only (1.7 MB), recompute xz/t3/a (15 dots/iter)

Timed fwd+bwd via jax.grad at the production shape (b=64, h=8, m=384,
iters=6, bf16) on the real chip, carry-chained scan per the tunnel rules.
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mirror_tpu.ops.pinv_pallas import (
    _block_specs,
    _dot,
    _dot_nt,
    _dot_tn,
    _fwd_call,
    moore_penrose_pinv_pallas,
)


def _bwd_kernel_stash(iters, stash, x_ref, s_ref, g_ref, gx_ref, gs_ref,
                      zs_ref):
    """stash: 1 -> z only; 2 -> z + xz. Reverse recomputes the rest."""
    x = x_ref[0, 0, :, :]
    s = s_ref[0]
    g = g_ref[0, 0, :, :]
    m = x.shape[-1]
    eye = jnp.eye(m, dtype=x.dtype)

    z = (x.T / s).astype(x.dtype)
    for t in range(iters):
        zs_ref[stash * t + 0, :, :] = z
        xz = _dot(x, z)
        if stash == 2:
            zs_ref[stash * t + 1, :, :] = xz
        t1 = 7.0 * eye - xz
        t3 = 15.0 * eye - _dot(xz, t1)
        a = 13.0 * eye - _dot(xz, t3)
        z = (0.25 * _dot(z, a)).astype(z.dtype)

    gz = g
    gx = jnp.zeros_like(x, dtype=jnp.float32)
    for t in range(iters - 1, -1, -1):
        z = zs_ref[stash * t + 0, :, :]
        b_ = zs_ref[stash * t + 1, :, :] if stash == 2 else _dot(x, z)
        t1 = 7.0 * eye - b_
        t3 = 15.0 * eye - _dot(b_, t1)
        a = 13.0 * eye - _dot(b_, t3)
        ga = 0.25 * _dot_tn(z, gz)
        gz_next = 0.25 * _dot_nt(gz, a)
        gt4 = -ga
        gb = _dot_nt(gt4, t3)
        gt3 = _dot_tn(b_, gt4)
        gt2 = -gt3
        gb = gb + _dot_nt(gt2, t1)
        gt1 = _dot_tn(b_, gt2)
        gb = gb - gt1
        gx = gx + jax.lax.dot_general(
            gb, z, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        gz = (gz_next + _dot_tn(x, gb)).astype(g.dtype)

    z0 = zs_ref[0, :, :] if iters > 0 else (x.T / s).astype(x.dtype)
    gx = gx + (gz.T.astype(jnp.float32) / s)
    gs = -jnp.sum(gz.astype(jnp.float32) * z0.astype(jnp.float32)) / s
    gx_ref[0, 0, :, :] = gx.astype(gx_ref.dtype)
    gs_ref[0, 0, 0, :] = jnp.full((128,), gs, jnp.float32)


def make_variant(stash):
    def _bwd_call(x, s, g, iters):
        b, h, m, _ = x.shape
        xs, ss = _block_specs(m)
        gs_spec = pl.BlockSpec((1, 1, 1, 128), lambda bi, hi: (bi, hi, 0, 0),
                               memory_space=pltpu.VMEM)
        gx, gs = pl.pallas_call(
            functools.partial(_bwd_kernel_stash, iters, stash),
            out_shape=(
                jax.ShapeDtypeStruct(x.shape, x.dtype),
                jax.ShapeDtypeStruct((b, h, 1, 128), jnp.float32),
            ),
            grid=(b, h),
            in_specs=[xs, ss, xs],
            out_specs=(xs, gs_spec),
            scratch_shapes=[pltpu.VMEM((stash * iters, m, m), x.dtype)],
        )(x, s.reshape(1), g)
        return gx, jnp.sum(gs[..., 0, 0])

    @functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
    def core(x, s, iters):
        return _fwd_call(x, s, iters)

    def fwd(x, s, iters):
        return _fwd_call(x, s, iters), (x, s)

    def bwd(iters, res, g):
        x, s = res
        gx, gs = _bwd_call(x, s, g.astype(x.dtype), iters)
        return gx, gs.astype(s.dtype)

    core.defvjp(fwd, bwd)

    def pinv(x, iters=6):
        abs_x = jnp.abs(x)
        s = (jnp.max(jnp.sum(abs_x, -1)) * jnp.max(jnp.sum(abs_x, -2))).astype(
            jnp.float32)
        return core(x, s, iters)

    return pinv


def _pull(v):
    return float(np.asarray(jax.tree.leaves(v)[0], np.float32).ravel()[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=64)
    ap.add_argument("--h", type=int, default=8)
    ap.add_argument("--m", type=int, default=384)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--chain", type=int, default=6)
    a = ap.parse_args()

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (a.b, a.h, a.m, a.m), jnp.bfloat16)
    R = a.chain

    variants = {
        "full ": lambda t: moore_penrose_pinv_pallas(t, a.iters, grad="exact"),
        "z+xz ": (lambda p: (lambda t: p(t, a.iters)))(make_variant(2)),
        "z    ": (lambda p: (lambda t: p(t, a.iters)))(make_variant(1)),
    }

    # numerical check: all variants compute the same gradient
    small = jax.random.normal(key, (2, 2, a.m, a.m), jnp.bfloat16)
    gref = None
    for name, fn in variants.items():
        gv = jax.grad(lambda t: jnp.sum(fn(t).astype(jnp.float32) ** 2))(small)
        gv = np.asarray(gv, np.float32)
        if gref is None:
            gref = gv
        else:
            cos = float((gref * gv).sum() /
                        (np.linalg.norm(gref) * np.linalg.norm(gv) + 1e-30))
            print(f"# {name} grad cosine vs full: {cos:.6f}")

    def timed(fn):
        def loss(x):
            def body(c, _):
                z = fn(c)
                l = jnp.sum(z.astype(jnp.float32) ** 2)
                c = c + z[:, :, :1, :1].astype(c.dtype).mean()
                return c, l
            c, ls = jax.lax.scan(body, x, None, length=R)
            return ls.sum() + c.astype(jnp.float32).mean()
        g = jax.jit(lambda t: jax.grad(loss)(t).sum())
        _pull(g(x))
        ts = []
        for _ in range(9):
            t0 = time.perf_counter()
            _pull(g(x))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)) / R * 1e3

    for name, fn in variants.items():
        print(f"fwd+bwd  {name}: {timed(fn):7.3f} ms/call")


if __name__ == "__main__":
    main()
