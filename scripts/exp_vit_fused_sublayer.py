#!/usr/bin/env python
"""Fused ViT sublayer Pallas experiments (feat-gen MXU attack, round 3b).

After the natural-layout attention kernel landed (ops/vit_attn_pallas,
2436 -> 3028 patches/s), the remaining ViT-B/16 batch splits roughly into
GEMMs (~79 ms floor), exact-erf GELU (~22 ms), and residual/LN glue. The
next HBM lever is fusing the projection GEMMs around the kernels so the
intermediate streams never round-trip HBM:

  xla_attn  y -> q/k/v GEMMs -> fused attn kernel -> out GEMM  (current)
  k5g{G}    one kernel: qkv GEMM + attention + out GEMM, weights resident
            in VMEM across the grid (constant index_map)
  xla_mlp   y -> fc1 -> exact gelu -> fc2                      (current)
  k7g{G}    one kernel: fc1 + erf-gelu (f32, VMEM) + fc2

Usage: python scripts/exp_vit_fused_sublayer.py [--variants ...]
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
MLP = 4 * D
SCALE = DH**-0.5


def make_weights(key):
    ks = jax.random.split(key, 8)
    w = lambda i, s: (jax.random.normal(ks[i], s, jnp.float32) * 0.02).astype(jnp.bfloat16)
    return dict(
        qkv=w(0, (D, 3 * D)), qkv_b=w(1, (1, 3 * D)),
        out=w(2, (D, D)), out_b=w(3, (1, D)),
        fc1=w(4, (D, MLP)), fc1_b=w(5, (1, MLP)),
        fc2=w(6, (MLP, D)), fc2_b=w(7, (1, D)),
        ln_s=1.0 + w(0, (1, D)).astype(jnp.float32),
        ln_b=w(1, (1, D)).astype(jnp.float32),
    )


# --------------------------------------------------------------------------
# XLA baselines (the current formulation, attn via ops/vit_attn_pallas)
# --------------------------------------------------------------------------


def xla_attn(y, wts):
    from mirror_tpu.ops.vit_attn_pallas import mha_natural

    q = y @ wts["qkv"][:, :D] + wts["qkv_b"][0, :D]
    k = y @ wts["qkv"][:, D:2 * D] + wts["qkv_b"][0, D:2 * D]
    v = y @ wts["qkv"][:, 2 * D:] + wts["qkv_b"][0, 2 * D:]
    o = mha_natural(q, k, v, H)
    return o @ wts["out"] + wts["out_b"][0]


def xla_mlp(y, wts):
    h = y @ wts["fc1"] + wts["fc1_b"][0]
    h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(y.dtype)
    return h @ wts["fc2"] + wts["fc2_b"][0]


# --------------------------------------------------------------------------
# K5: fused qkv GEMM + attention + out GEMM
# --------------------------------------------------------------------------


def _k5_kernel(g, y_ref, qkv_ref, qkvb_ref, out_ref, outb_ref, o_ref):
    for i in range(g):
        y = y_ref[i]  # [n, d]
        qkv = jnp.dot(y, qkv_ref[...], preferred_element_type=jnp.float32)
        qkv = (qkv + qkvb_ref[...].astype(jnp.float32)).astype(y.dtype)
        heads = []
        for h in range(H):
            q = qkv[:, h * DH:(h + 1) * DH]
            k = qkv[:, D + h * DH: D + (h + 1) * DH]
            v = qkv[:, 2 * D + h * DH: 2 * D + (h + 1) * DH]
            sim = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            attn = jax.nn.softmax(sim * SCALE, axis=-1)
            ov = jnp.dot(attn.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
            heads.append(ov.astype(y.dtype))
        att = jnp.concatenate(heads, axis=-1)
        o = jnp.dot(att, out_ref[...], preferred_element_type=jnp.float32)
        o_ref[i] = (o + outb_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def make_k5(g):
    def fn(y, wts):
        b, n, d = y.shape
        ys = pl.BlockSpec((g, n, d), lambda bi: (bi, 0, 0),
                          memory_space=pltpu.VMEM)

        def wspec(shape):
            return pl.BlockSpec(shape, lambda bi: tuple(0 for _ in shape),
                                memory_space=pltpu.VMEM)

        return pl.pallas_call(
            functools.partial(_k5_kernel, g),
            out_shape=jax.ShapeDtypeStruct(y.shape, y.dtype),
            grid=(b // g,),
            in_specs=[ys, wspec((D, 3 * D)), wspec((1, 3 * D)),
                      wspec((D, D)), wspec((1, D))],
            out_specs=ys,
            cost_estimate=pl.CostEstimate(
                flops=2 * b * n * d * 4 * d + 4 * b * H * n * n * DH,
                bytes_accessed=2 * y.size * y.dtype.itemsize,
                transcendentals=b * H * n * n,
            ),
        )(y, wts["qkv"], wts["qkv_b"], wts["out"], wts["out_b"])

    return fn


# --------------------------------------------------------------------------
# K7: fused fc1 + exact erf gelu + fc2
# --------------------------------------------------------------------------


def _erf_f32(x):
    # Mosaic has no erf primitive; Abramowitz & Stegun 7.1.26 via exp,
    # |abs err| <= 1.5e-7 — far below bf16 ulp (~3.9e-3) after the cast.
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _k7_kernel(g, y_ref, fc1_ref, fc1b_ref, fc2_ref, fc2b_ref, o_ref):
    for i in range(g):
        y = y_ref[i]
        h = jnp.dot(y, fc1_ref[...], preferred_element_type=jnp.float32)
        h = h + fc1b_ref[...].astype(jnp.float32)
        h = 0.5 * h * (1.0 + _erf_f32(h * (2.0**-0.5)))  # exact gelu, f32
        o = jnp.dot(h.astype(y.dtype), fc2_ref[...],
                    preferred_element_type=jnp.float32)
        o_ref[i] = (o + fc2b_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def make_k7(g):
    def fn(y, wts):
        b, n, d = y.shape
        ys = pl.BlockSpec((g, n, d), lambda bi: (bi, 0, 0),
                          memory_space=pltpu.VMEM)

        def wspec(shape):
            return pl.BlockSpec(shape, lambda bi: tuple(0 for _ in shape),
                                memory_space=pltpu.VMEM)

        return pl.pallas_call(
            functools.partial(_k7_kernel, g),
            out_shape=jax.ShapeDtypeStruct(y.shape, y.dtype),
            grid=(b // g,),
            in_specs=[ys, wspec((D, MLP)), wspec((1, MLP)),
                      wspec((MLP, D)), wspec((1, D))],
            out_specs=ys,
            cost_estimate=pl.CostEstimate(
                flops=4 * b * n * d * MLP,
                bytes_accessed=2 * y.size * y.dtype.itemsize,
                transcendentals=b * n * MLP,
            ),
        )(y, wts["fc1"], wts["fc1_b"], wts["fc2"], wts["fc2_b"])

    return fn


# --------------------------------------------------------------------------
# K8/K9: LN + sublayer + residual add fused (whole half-block per program).
# Each LN/residual between Pallas calls is an XLA fusion boundary with a
# full [b, n, d] HBM round trip; folding them in removes ~4 boundaries per
# block.
# --------------------------------------------------------------------------

LN_EPS = 1e-12


def _ln_f32(x, s, b):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + LN_EPS) * s + b).astype(x.dtype)


def xla_attn_blk(x, wts):
    from mirror_tpu.ops.vit_attn_pallas import attn_sublayer

    y = _ln_f32(x, wts["ln_s"][0], wts["ln_b"][0])
    return x + attn_sublayer(y, wts["qkv"][:, :D], wts["qkv"][:, D:2 * D],
                             wts["qkv"][:, 2 * D:], wts["qkv_b"],
                             wts["out"], wts["out_b"], H)


def xla_mlp_blk(x, wts):
    from mirror_tpu.ops.vit_attn_pallas import mlp_sublayer

    y = _ln_f32(x, wts["ln_s"][0], wts["ln_b"][0])
    return x + mlp_sublayer(y, wts["fc1"], wts["fc1_b"], wts["fc2"],
                            wts["fc2_b"])


def _k8_kernel(g, x_ref, lns_ref, lnb_ref, qkv_ref, qkvb_ref, out_ref,
               outb_ref, o_ref):
    lns = lns_ref[...].astype(jnp.float32)
    lnb = lnb_ref[...].astype(jnp.float32)
    for i in range(g):
        x = x_ref[i]
        y = _ln_f32(x, lns, lnb)
        qkv = jnp.dot(y, qkv_ref[...], preferred_element_type=jnp.float32)
        qkv = (qkv + qkvb_ref[...].astype(jnp.float32)).astype(y.dtype)
        heads = []
        for h in range(H):
            q = qkv[:, h * DH:(h + 1) * DH]
            k = qkv[:, D + h * DH: D + (h + 1) * DH]
            v = qkv[:, 2 * D + h * DH: 2 * D + (h + 1) * DH]
            sim = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            attn = jax.nn.softmax(sim * SCALE, axis=-1)
            heads.append(jnp.dot(attn.astype(v.dtype), v,
                                 preferred_element_type=jnp.float32)
                         .astype(y.dtype))
        att = jnp.concatenate(heads, axis=-1)
        o = jnp.dot(att, out_ref[...], preferred_element_type=jnp.float32)
        o = o + outb_ref[...].astype(jnp.float32)
        o_ref[i] = (x.astype(jnp.float32) + o).astype(o_ref.dtype)


def make_k8(g):
    def fn(x, wts):
        b, n, d = x.shape
        xs = pl.BlockSpec((g, n, d), lambda bi: (bi, 0, 0),
                          memory_space=pltpu.VMEM)

        def wspec(shape):
            return pl.BlockSpec(shape, lambda bi: tuple(0 for _ in shape),
                                memory_space=pltpu.VMEM)

        return pl.pallas_call(
            functools.partial(_k8_kernel, g),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            grid=(b // g,),
            in_specs=[xs, wspec((1, D)), wspec((1, D)), wspec((D, 3 * D)),
                      wspec((1, 3 * D)), wspec((D, D)), wspec((1, D))],
            out_specs=xs,
            cost_estimate=pl.CostEstimate(
                flops=2 * b * N * D * 4 * D + 4 * b * H * N * N * DH,
                bytes_accessed=2 * x.size * x.dtype.itemsize,
                transcendentals=b * H * N * N,
            ),
        )(x, wts["ln_s"], wts["ln_b"], wts["qkv"], wts["qkv_b"],
          wts["out"], wts["out_b"])

    return fn


def _k9_kernel(g, x_ref, lns_ref, lnb_ref, fc1_ref, fc1b_ref, fc2_ref,
               fc2b_ref, o_ref):
    lns = lns_ref[...].astype(jnp.float32)
    lnb = lnb_ref[...].astype(jnp.float32)
    for i in range(g):
        x = x_ref[i]
        y = _ln_f32(x, lns, lnb)
        h = jnp.dot(y, fc1_ref[...], preferred_element_type=jnp.float32)
        h = h + fc1b_ref[...].astype(jnp.float32)
        h = 0.5 * h * (1.0 + _erf_f32(h * (2.0**-0.5)))
        o = jnp.dot(h.astype(y.dtype), fc2_ref[...],
                    preferred_element_type=jnp.float32)
        o = o + fc2b_ref[...].astype(jnp.float32)
        o_ref[i] = (x.astype(jnp.float32) + o).astype(o_ref.dtype)


def make_k9(g):
    def fn(x, wts):
        b, n, d = x.shape
        xs = pl.BlockSpec((g, n, d), lambda bi: (bi, 0, 0),
                          memory_space=pltpu.VMEM)

        def wspec(shape):
            return pl.BlockSpec(shape, lambda bi: tuple(0 for _ in shape),
                                memory_space=pltpu.VMEM)

        return pl.pallas_call(
            functools.partial(_k9_kernel, g),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            grid=(b // g,),
            in_specs=[xs, wspec((1, D)), wspec((1, D)), wspec((D, MLP)),
                      wspec((1, MLP)), wspec((MLP, D)), wspec((1, D))],
            out_specs=xs,
            cost_estimate=pl.CostEstimate(
                flops=4 * b * N * D * MLP,
                bytes_accessed=2 * x.size * x.dtype.itemsize,
                transcendentals=b * N * MLP,
            ),
        )(x, wts["ln_s"], wts["ln_b"], wts["fc1"], wts["fc1_b"],
          wts["fc2"], wts["fc2_b"])

    return fn


VARIANTS = {
    "xla_attn": ("attn", xla_attn),
    "k5g1": ("attn", make_k5(1)),
    "k5g2": ("attn", make_k5(2)),
    "k5g4": ("attn", make_k5(4)),
    "xla_mlp": ("mlp", xla_mlp),
    "k7g1": ("mlp", make_k7(1)),
    "k7g2": ("mlp", make_k7(2)),
    "k7g4": ("mlp", make_k7(4)),
    "xla_attn_blk": ("attn_blk", xla_attn_blk),
    "k8g1": ("attn_blk", make_k8(1)),
    "k8g2": ("attn_blk", make_k8(2)),
    "xla_mlp_blk": ("mlp_blk", xla_mlp_blk),
    "k9g1": ("mlp_blk", make_k9(1)),
    "k9g2": ("mlp_blk", make_k9(2)),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=B)
    ap.add_argument("--steps", type=int, default=24)
    ap.add_argument("--variants", nargs="+", default=list(VARIANTS))
    args = ap.parse_args()
    b = args.batch

    wts = make_weights(jax.random.PRNGKey(0))
    y = jax.random.normal(
        jax.random.PRNGKey(1), (b, N, D), jnp.float32
    ).astype(jnp.bfloat16)

    refs = {}
    for name in args.variants:
        group, fn = VARIANTS[name]
        try:
            out1 = np.asarray(jax.jit(fn)(y, wts), np.float32)
        except Exception as e:  # noqa: BLE001 - report and continue
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            continue
        refs.setdefault(group, out1)
        diff = float(np.max(np.abs(out1 - refs[group])))

        @jax.jit
        def multi(y, wts, _fn=fn):
            def body(c, _):
                o = _fn(y + c.astype(y.dtype) * 0.0, wts)
                return jnp.mean(o.astype(jnp.float32)), None

            c, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                length=args.steps)
            return c

        float(multi(y, wts))  # compile + warm
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            float(multi(y, wts))
        dt = (time.time() - t0) / (reps * args.steps)
        print(f"{name}: {dt * 1e3:7.2f} ms  max|Δ| vs {group} ref {diff:.2e}",
              flush=True)


if __name__ == "__main__":
    main()
