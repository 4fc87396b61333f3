#!/usr/bin/env python
"""Fused ViT attention Pallas kernel experiments (feat-gen MXU attack, r3).

The v0 ViT-B/16 forward spends ~74 ms of its 214 ms batch (B=512, N=197) in
the attention core: ~58 ms in the two small batched matmuls (0.73 TFLOP at
~12.6 TFLOP/s effective — transposes + [B,12,197,197] HBM round trips) and
~16 ms in the fp32 softmax (scripts/exp_vit_variants.py v10/v11 probes).
The round-2 per-(batch,head)-program fused kernel LOST (2087 vs 2477
patches/s — 6144 tiny programs). These variants batch G pairs per program:

  xla   the v0 einsum formulation (baseline, from/to [b, n, d_model])
  k1g*  head-major [Z=b*h, n, dh] blocks of G pairs, batched dot_general
  k2g*  same blocks, per-pair unrolled 2D dots
  k3g*  natural-layout [b, n, d_model] blocks of Gb images, heads sliced
        in VMEM (no XLA-side head transpose at all)

Usage: python scripts/exp_vit_attn_kernel.py [--batch 512] [--variants ...]
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

B, N, H, DH = 512, 197, 12, 64
D = H * DH
SCALE = DH**-0.5


# --------------------------------------------------------------------------
# XLA baseline: v0 formulation from models/feature_extractors.py
# --------------------------------------------------------------------------


def attn_xla(q, k, v):
    b, n, d = q.shape
    q = q.reshape(b, n, H, DH)
    k = k.reshape(b, n, H, DH)
    v = v.reshape(b, n, H, DH)
    a = jnp.einsum("bqhd,bkhd->bhqk", q, k) * SCALE
    a = jax.nn.softmax(a.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", a, v).reshape(b, n, d)


# --------------------------------------------------------------------------
# K1: head-major [Z, n, dh], G pairs per program, batched dot_general
# --------------------------------------------------------------------------


def _k1_kernel(q_ref, k_ref, v_ref, o_ref):
    q = q_ref[...]
    k = k_ref[...]
    v = v_ref[...]
    sim = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    attn = jax.nn.softmax(sim * SCALE, axis=-1)
    out = jax.lax.dot_general(
        attn.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = out.astype(o_ref.dtype)


def _k2_kernel(q_ref, k_ref, v_ref, o_ref, *, g):
    for i in range(g):
        q = q_ref[i]
        k = k_ref[i]
        v = v_ref[i]
        sim = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        attn = jax.nn.softmax(sim * SCALE, axis=-1)
        out = jnp.dot(attn.astype(v.dtype), v,
                      preferred_element_type=jnp.float32)
        o_ref[i] = out.astype(o_ref.dtype)


def make_headmajor(kernel, g):
    def fn(q, k, v):
        # q, k, v: [b, n, d_model] -> head-major pairs in XLA
        b, n, d = q.shape

        def hm(x):
            return (
                x.reshape(b, n, H, DH).transpose(0, 2, 1, 3).reshape(b * H, n, DH)
            )

        qz, kz, vz = hm(q), hm(k), hm(v)
        spec = pl.BlockSpec((g, n, DH), lambda zi: (zi, 0, 0),
                            memory_space=pltpu.VMEM)
        oz = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(qz.shape, qz.dtype),
            grid=(b * H // g,),
            in_specs=[spec, spec, spec],
            out_specs=spec,
            cost_estimate=pl.CostEstimate(
                flops=4 * b * H * n * n * DH,
                bytes_accessed=4 * qz.size * qz.dtype.itemsize,
                transcendentals=b * H * n * n,
            ),
        )(qz, kz, vz)
        return (
            oz.reshape(b, H, n, DH).transpose(0, 2, 1, 3).reshape(b, n, d)
        )

    return fn


# --------------------------------------------------------------------------
# K3: natural layout [b, n, d_model], Gb images per program, heads sliced
# in VMEM
# --------------------------------------------------------------------------


def _k3_kernel(q_ref, k_ref, v_ref, o_ref):
    for h in range(H):
        sl = slice(h * DH, (h + 1) * DH)
        q = q_ref[:, :, sl]
        k = k_ref[:, :, sl]
        v = v_ref[:, :, sl]
        sim = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        attn = jax.nn.softmax(sim * SCALE, axis=-1)
        out = jax.lax.dot_general(
            attn.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        o_ref[:, :, sl] = out.astype(o_ref.dtype)


def make_natural(gb):
    def fn(q, k, v):
        b, n, d = q.shape
        spec = pl.BlockSpec((gb, n, d), lambda bi: (bi, 0, 0),
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            _k3_kernel,
            out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
            grid=(b // gb,),
            in_specs=[spec, spec, spec],
            out_specs=spec,
            cost_estimate=pl.CostEstimate(
                flops=4 * b * H * n * n * DH,
                bytes_accessed=4 * q.size * q.dtype.itemsize,
                transcendentals=b * H * n * n,
            ),
        )(q, k, v)

    return fn


VARIANTS = {
    "xla": attn_xla,
    "k1g8": make_headmajor(_k1_kernel, 8),
    "k1g16": make_headmajor(_k1_kernel, 16),
    "k1g32": make_headmajor(_k1_kernel, 32),
    "k2g8": make_headmajor(functools.partial(_k2_kernel, g=8), 8),
    "k2g16": make_headmajor(functools.partial(_k2_kernel, g=16), 16),
    "k3g1": make_natural(1),
    "k3g2": make_natural(2),
    "k3g4": make_natural(4),
    "k3g8": make_natural(8),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=B)
    ap.add_argument("--steps", type=int, default=24)
    ap.add_argument("--variants", nargs="+", default=list(VARIANTS))
    args = ap.parse_args()
    b = args.batch

    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, N, D), jnp.float32).astype(jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, N, D), jnp.float32).astype(jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, N, D), jnp.float32).astype(jnp.bfloat16)

    flops = 4 * b * H * N * N * DH
    ref = None
    for name in args.variants:
        fn = VARIANTS[name]

        try:
            out1 = np.asarray(jax.jit(fn)(q, k, v), np.float32)
        except Exception as e:  # noqa: BLE001 - report and continue
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}")
            continue
        if ref is None:
            ref = out1
        diff = float(np.max(np.abs(out1 - ref)))

        @jax.jit
        def multi(q, k, v, _fn=fn):
            def body(c, _):
                o = _fn(q + c.astype(q.dtype) * 0.0, k, v)
                return jnp.mean(o.astype(jnp.float32)), None

            c, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                length=args.steps)
            return c

        float(multi(q, k, v))  # compile + warm
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            float(multi(q, k, v))
        dt = (time.time() - t0) / (reps * args.steps)
        print(
            f"{name}: {dt * 1e3:7.2f} ms  {flops / dt / 1e12:6.1f} TFLOP/s "
            f" max|Δ| vs xla {diff:.2e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
