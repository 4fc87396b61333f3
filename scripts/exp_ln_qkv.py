#!/usr/bin/env python
"""Standalone probe: fused LN+qkv Pallas kernel vs the current XLA lowering
(LayerNorm fusion + 3 head-major GEMM fusions) at the production TransLayer
shape, fwd-only and fwd+bwd, real chip.

Timing per the repo's tunnel rules: N reps chained inside one jit with the
carry threaded through (x depends on the previous rep's output), scalar
pulled once; divide by N.
"""

import argparse
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mirror_tpu.ops.ln_qkv_pallas import ln_qkv_fused

EPS = 1e-5


def dense_ln_qkv(x, s, b, w, heads):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu, 0.0)
    y = ((xf - mu) * jax.lax.rsqrt(var + eps_global) * s + b).astype(x.dtype)
    inner = w.shape[1] // 3
    dh = inner // heads
    wr = w.reshape(x.shape[-1], 3, heads, dh)
    q = jnp.einsum("bnd,dhe->bhne", y, wr[:, 0])
    k = jnp.einsum("bnd,dhe->bhne", y, wr[:, 1])
    v = jnp.einsum("bnd,dhe->bhne", y, wr[:, 2])
    return q, k, v


eps_global = EPS


def _pull(out):
    # force a host scalar pull — block_until_ready over chained dispatches
    # returns early through the axon tunnel (CLAUDE.md)
    return float(np.asarray(jax.tree.leaves(out)[0], np.float32).ravel()[0])


def time_fn(fn, *args, reps=9):
    _pull(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _pull(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--n", type=int, default=2117)
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--chain", type=int, default=8, help="reps inside one jit")
    a = ap.parse_args()
    dh = a.d // a.heads

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (a.batch, a.n, a.d), jnp.bfloat16)
    s = jnp.ones((a.d,), jnp.float32)
    b = jnp.zeros((a.d,), jnp.float32)
    w = 0.02 * jax.random.normal(key, (a.d, 3 * a.d), jnp.float32)
    wb = w.astype(jnp.bfloat16)
    R = a.chain

    def chain(core):
        """R dependent reps: fold a scalar from the outputs back into x."""
        def run(x, s, b, w):
            def body(c, _):
                q, k, v = core(c, s, b, w)
                # cheap carry dependence: shift x by a scalar from q
                c = c + q[:, 0, :, :1].astype(c.dtype).mean()
                return c, q.mean() + k.mean() + v.mean()
            c, outs = jax.lax.scan(body, x, None, length=R)
            return outs.sum() + c.mean()
        return run

    fused_core = lambda x, s, b, w: ln_qkv_fused(x, s, b, w.astype(jnp.bfloat16), a.heads, EPS)
    dense_core = lambda x, s, b, w: dense_ln_qkv(x, s, b, w.astype(jnp.bfloat16), a.heads)

    # --- variant: one full-width GEMM (N=3d, full MXU lanes) then 24
    # in-VMEM head-slice writes, vs the library kernel's per-head GEMMs ---
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from mirror_tpu.ops.ln_qkv_pallas import _ln_f32
    from mirror_tpu.ops._common import VMEM_LIMIT_WIDE

    def _big_kernel(heads, dh, d, eps, x_ref, s_ref, b_ref, w_ref,
                    q_ref, k_ref, v_ref):
        s = s_ref[0, :].astype(jnp.float32)
        bb = b_ref[0, :].astype(jnp.float32)
        y, _, _ = _ln_f32(x_ref[0], s, bb, eps)
        y = y.astype(x_ref.dtype)
        qkv = jnp.dot(y, w_ref[...],
                      preferred_element_type=jnp.float32).astype(x_ref.dtype)
        for j, o_ref in enumerate((q_ref, k_ref, v_ref)):
            for h in range(heads):
                off = (j * heads + h) * dh
                o_ref[0, h] = qkv[:, off:off + dh]

    def big_core(x, s, b, w):
        bsz, n, d = x.shape
        heads = a.heads
        dh = d // heads
        # w [d, 3hd]: reorder so columns are [ (j,h) blocks ] contiguous
        w_r = w.astype(jnp.bfloat16).reshape(d, 3, heads, dh).reshape(d, 3 * d)
        xs = pl.BlockSpec((1, n, d), lambda bi: (bi, 0, 0),
                          memory_space=pltpu.VMEM)
        os = pl.BlockSpec((1, heads, n, dh), lambda bi: (bi, 0, 0, 0),
                          memory_space=pltpu.VMEM)
        vec = pl.BlockSpec((1, d), lambda bi: (0, 0), memory_space=pltpu.VMEM)
        ws = pl.BlockSpec((d, 3 * d), lambda bi: (0, 0),
                          memory_space=pltpu.VMEM)
        oshape = jax.ShapeDtypeStruct((bsz, heads, n, dh), x.dtype)
        return pl.pallas_call(
            functools.partial(_big_kernel, heads, dh, d, EPS),
            out_shape=(oshape, oshape, oshape),
            grid=(bsz,),
            in_specs=[xs, vec, vec, ws],
            out_specs=(os, os, os),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=VMEM_LIMIT_WIDE),
        )(x, s.reshape(1, d), b.reshape(1, d), w_r)

    # ---- forward ----
    for name, core in (("xla  ", dense_core), ("fused", fused_core),
                       ("bigg ", big_core)):
        t, _ = time_fn(jax.jit(chain(core)), x, s, b, w)
        print(f"fwd      {name}: {t / R * 1e3:7.3f} ms/call")

    # ---- fwd+bwd ----
    def make_grad(core):
        def loss(x, s, b, w):
            @jax.checkpoint
            def body(c, _):
                q, k, v = core(c, s, b, w)
                l = (jnp.sum(q.astype(jnp.float32) ** 2)
                     + jnp.sum(k.astype(jnp.float32) ** 2)
                     + jnp.sum(v.astype(jnp.float32) ** 2))
                c = c + q[:, 0, :, :1].astype(c.dtype).mean()
                return c, l
            c, ls = jax.lax.scan(body, x, None, length=R)
            return ls.sum() + c.astype(jnp.float32).mean()
        g = jax.grad(loss, argnums=(0, 1, 2, 3))
        return jax.jit(lambda *ar: jax.tree.map(lambda t: t.sum(), g(*ar)))

    for name, core in (("xla  ", dense_core), ("fused", fused_core)):
        t, _ = time_fn(make_grad(core), x, s, b, w)
        print(f"fwd+bwd  {name}: {t / R * 1e3:7.3f} ms/call")


if __name__ == "__main__":
    main()
