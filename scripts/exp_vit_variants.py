#!/usr/bin/env python
"""ViT-B/16 forward formulation experiments (feat-gen MXU attack, round 3).

Standalone raw-jax 12-block ViT stacks (same math as
models/feature_extractors.ViTB16: LN eps 1e-12, exact GELU, bf16 compute /
fp32 LN stats) measured on the real chip, isolating layout/formulation
variants the flax model shouldn't carry until one wins:

  v0  baseline formulation (3 qkv GEMMs, bhqk attention einsum)
  v1  fused single [d,3d] qkv GEMM
  v2  n-major attention (bnhm einsums; no bhqk batch-transpose)
  v3  v1 + token axis padded 197->256 with masked keys
  v4  v1 + attention over merged (b*h) leading dim

Usage: python scripts/exp_vit_variants.py [--batch 512] [--variants v0 v1 ...]
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

D, H, DH, DEPTH, MLP = 768, 12, 64, 12, 3072
GFLOP_PER_IMG = 17.6


def make_params(key):
    ks = jax.random.split(key, DEPTH * 8 + 2)
    blocks = []
    i = 0

    def w(shape):
        nonlocal i
        i += 1
        return (jax.random.normal(ks[i], shape, jnp.float32) * 0.02)

    for _ in range(DEPTH):
        blocks.append(dict(
            qkv_k=w((D, 3 * D)), qkv_b=jnp.zeros((3 * D,)),
            out_k=w((D, D)), out_b=jnp.zeros((D,)),
            fc1_k=w((D, MLP)), fc1_b=jnp.zeros((MLP,)),
            fc2_k=w((MLP, D)), fc2_b=jnp.zeros((D,)),
            ln1_s=jnp.ones((D,)), ln1_b=jnp.zeros((D,)),
            ln2_s=jnp.ones((D,)), ln2_b=jnp.zeros((D,)),
        ))
    return blocks


def ln(x, s, b, eps=1e-12):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * s + b).astype(x.dtype)


def attn_bhqk(q, k, v, bias=None):
    b, n = q.shape[:2]
    q = q.reshape(b, n, H, DH)
    k = k.reshape(b, n, H, DH)
    v = v.reshape(b, n, H, DH)
    a = jnp.einsum("bqhd,bkhd->bhqk", q, k) * DH**-0.5
    a = a.astype(jnp.float32)
    if bias is not None:
        a = a + bias[None, None, None, :]
    a = jax.nn.softmax(a, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", a, v).reshape(b, n, D)


def attn_nmajor(q, k, v, bias=None):
    b, n = q.shape[:2]
    q = q.reshape(b, n, H, DH)
    k = k.reshape(b, n, H, DH)
    v = v.reshape(b, n, H, DH)
    a = jnp.einsum("bnhd,bmhd->bnhm", q, k) * DH**-0.5
    a = a.astype(jnp.float32)
    if bias is not None:
        a = a + bias[None, None, None, :]
    a = jax.nn.softmax(a, axis=-1).astype(q.dtype)
    return jnp.einsum("bnhm,bmhd->bnhd", a, v).reshape(b, n, D)


def attn_bh(q, k, v, bias=None):
    b, n = q.shape[:2]
    q = q.reshape(b, n, H, DH).transpose(0, 2, 1, 3).reshape(b * H, n, DH)
    k = k.reshape(b, n, H, DH).transpose(0, 2, 1, 3).reshape(b * H, n, DH)
    v = v.reshape(b, n, H, DH).transpose(0, 2, 1, 3).reshape(b * H, n, DH)
    a = jnp.einsum("znd,zmd->znm", q, k) * DH**-0.5
    a = a.astype(jnp.float32)
    if bias is not None:
        a = a + bias[None, None, :]
    a = jax.nn.softmax(a, axis=-1).astype(q.dtype)
    o = jnp.einsum("znm,zmd->znd", a, v)
    return o.reshape(b, H, n, DH).transpose(0, 2, 1, 3).reshape(b, n, D)


def block(x, p, attn, fused, bias=None):
    y = ln(x, p["ln1_s"], p["ln1_b"])
    if fused:
        qkv = y @ p["qkv_k"].astype(y.dtype) + p["qkv_b"].astype(y.dtype)
        q, k, v = qkv[..., :D], qkv[..., D : 2 * D], qkv[..., 2 * D :]
    else:
        q = y @ p["qkv_k"][:, :D].astype(y.dtype) + p["qkv_b"][:D].astype(y.dtype)
        k = y @ p["qkv_k"][:, D : 2 * D].astype(y.dtype) + p["qkv_b"][D : 2 * D].astype(y.dtype)
        v = y @ p["qkv_k"][:, 2 * D :].astype(y.dtype) + p["qkv_b"][2 * D :].astype(y.dtype)
    o = attn(q, k, v, bias)
    x = x + (o @ p["out_k"].astype(o.dtype) + p["out_b"].astype(o.dtype))
    y = ln(x, p["ln2_s"], p["ln2_b"])
    y = y @ p["fc1_k"].astype(y.dtype) + p["fc1_b"].astype(y.dtype)
    y = jax.nn.gelu(y.astype(jnp.float32), approximate=False).astype(y.dtype)
    y = y @ p["fc2_k"].astype(y.dtype) + p["fc2_b"].astype(y.dtype)
    return x + y


def forward(blocks, x, attn, fused, pad_to=0):
    bias = None
    n = x.shape[1]
    if pad_to and pad_to > n:
        x = jnp.pad(x, ((0, 0), (0, pad_to - n), (0, 0)))
        bias = jnp.concatenate(
            [jnp.zeros((n,), jnp.float32),
             jnp.full((pad_to - n,), -1e9, jnp.float32)]
        )
    for p in blocks:
        x = block(x, p, attn, fused, bias)
    return x[:, 0].astype(jnp.float32)


def block_gemms_only(x, p, attn, fused, bias=None):
    """Roofline probe, NOT the real math: the four GEMMs plus residual adds,
    no LN, no softmax (attention matmuls kept as plain chained matmuls)."""
    qkv = x @ p["qkv_k"].astype(x.dtype)
    v = qkv[..., 2 * D :]
    o = v  # stand-in for the attention core (its matmuls are ~4% of FLOPs)
    x = x + o @ p["out_k"].astype(x.dtype)
    y = x @ p["fc1_k"].astype(x.dtype)
    y = y @ p["fc2_k"].astype(x.dtype)
    return x + y


def block_no_ln(x, p, attn, fused, bias=None):
    """Real attention/GEMM math, LNs replaced by a scale (no reductions)."""
    y = (x * p["ln1_s"].astype(x.dtype))
    qkv = y @ p["qkv_k"].astype(y.dtype) + p["qkv_b"].astype(y.dtype)
    q, k, v = qkv[..., :D], qkv[..., D : 2 * D], qkv[..., 2 * D :]
    o = attn(q, k, v, bias)
    x = x + (o @ p["out_k"].astype(o.dtype) + p["out_b"].astype(o.dtype))
    y = (x * p["ln2_s"].astype(x.dtype))
    y = y @ p["fc1_k"].astype(y.dtype) + p["fc1_b"].astype(y.dtype)
    y = jax.nn.gelu(y.astype(jnp.float32), approximate=False).astype(y.dtype)
    y = y @ p["fc2_k"].astype(y.dtype) + p["fc2_b"].astype(y.dtype)
    return x + y


def _gelu_bf16(y):
    # exact erf gelu evaluated in the compute dtype (bf16), no fp32 round-trip
    return jax.nn.gelu(y, approximate=False)


def _gelu_tanh(y):
    return jax.nn.gelu(y, approximate=True)


def make_block_act(act):
    """Full math with a swappable MLP activation (None = identity)."""

    def bf(x, p, attn, fused, bias=None):
        y = ln(x, p["ln1_s"], p["ln1_b"])
        qkv = y @ p["qkv_k"].astype(y.dtype) + p["qkv_b"].astype(y.dtype)
        q, k, v = qkv[..., :D], qkv[..., D : 2 * D], qkv[..., 2 * D :]
        o = attn(q, k, v, bias)
        x = x + (o @ p["out_k"].astype(o.dtype) + p["out_b"].astype(o.dtype))
        y = ln(x, p["ln2_s"], p["ln2_b"])
        y = y @ p["fc1_k"].astype(y.dtype) + p["fc1_b"].astype(y.dtype)
        if act is not None:
            y = act(y)
        y = y @ p["fc2_k"].astype(y.dtype) + p["fc2_b"].astype(y.dtype)
        return x + y

    return bf


def attn_nosoftmax(q, k, v, bias=None):
    """Attention matmuls kept, softmax replaced by a scale (isolates the
    softmax/fp32 cost from the small-matmul cost)."""
    b, n = q.shape[:2]
    q = q.reshape(b, n, H, DH)
    k = k.reshape(b, n, H, DH)
    v = v.reshape(b, n, H, DH)
    a = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (DH**-0.5 / n)
    return jnp.einsum("bhqk,bkhd->bqhd", a, v).reshape(b, n, D)


def attn_passthrough(q, k, v, bias=None):
    """No attention matmuls, no softmax: v straight through."""
    return v


def attn_bf16softmax(q, k, v, bias=None):
    """Standard attention but softmax evaluated in bf16 (no fp32 cast)."""
    b, n = q.shape[:2]
    q = q.reshape(b, n, H, DH)
    k = k.reshape(b, n, H, DH)
    v = v.reshape(b, n, H, DH)
    a = jnp.einsum("bqhd,bkhd->bhqk", q, k) * DH**-0.5
    a = jax.nn.softmax(a, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", a, v).reshape(b, n, D)


def forward_with(block_fn, blocks, x, attn, fused, pad_to=0):
    bias = None
    n = x.shape[1]
    if pad_to and pad_to > n:
        x = jnp.pad(x, ((0, 0), (0, pad_to - n), (0, 0)))
        bias = jnp.concatenate(
            [jnp.zeros((n,), jnp.float32),
             jnp.full((pad_to - n,), -1e9, jnp.float32)]
        )
    for p in blocks:
        x = block_fn(x, p, attn, fused, bias)
    return x[:, 0].astype(jnp.float32)


VARIANTS = {
    "v0": dict(attn=attn_bhqk, fused=False, pad=0),
    "v1": dict(attn=attn_bhqk, fused=True, pad=0),
    "v2": dict(attn=attn_nmajor, fused=True, pad=0),
    "v3": dict(attn=attn_bhqk, fused=True, pad=256),
    "v4": dict(attn=attn_bh, fused=True, pad=0),
    # roofline probes (NOT exact math): v5 = GEMMs only, v6 = real math
    # minus LN reductions, v7 = minus gelu, v10 = minus softmax,
    # v11 = minus the whole attention core
    "v5": dict(attn=attn_bhqk, fused=True, pad=0, block_fn=block_gemms_only),
    "v6": dict(attn=attn_bhqk, fused=True, pad=0, block_fn=block_no_ln),
    "v7": dict(attn=attn_bhqk, fused=True, pad=0, block_fn=make_block_act(None)),
    "v10": dict(attn=attn_nosoftmax, fused=True, pad=0),
    "v11": dict(attn=attn_passthrough, fused=True, pad=0),
    # candidate exact-output-shape levers (numerics differ in low bits only):
    # v8 = erf-gelu in bf16, v9 = tanh-gelu in bf16, v12 = bf16 softmax,
    # v13 = bf16 gelu + bf16 softmax combined
    "v8": dict(attn=attn_bhqk, fused=True, pad=0,
               block_fn=make_block_act(_gelu_bf16)),
    "v9": dict(attn=attn_bhqk, fused=True, pad=0,
               block_fn=make_block_act(_gelu_tanh)),
    "v12": dict(attn=attn_bf16softmax, fused=True, pad=0),
    "v13": dict(attn=attn_bf16softmax, fused=True, pad=0,
                block_fn=make_block_act(_gelu_bf16)),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--tokens", type=int, default=197)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--variants", nargs="+", default=list(VARIANTS))
    args = ap.parse_args()

    key = jax.random.PRNGKey(0)
    blocks = make_params(key)
    x = jax.random.normal(
        jax.random.PRNGKey(1), (args.batch, args.tokens, D), jnp.float32
    ).astype(jnp.bfloat16)

    ref = None
    for name in args.variants:
        v = VARIANTS[name]

        @jax.jit
        def multi(blocks, x, _v=v):
            bf = _v.get("block_fn", block)
            def body(c, _):
                out = forward_with(bf, blocks, x + c.astype(x.dtype) * 0.0,
                                   _v["attn"], _v["fused"], _v["pad"])
                return jnp.mean(out), None
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                length=args.steps)
            return c

        out1 = jax.jit(
            lambda b_, x_, _v=v: forward_with(
                _v.get("block_fn", block), b_, x_, _v["attn"], _v["fused"],
                _v["pad"])
        )(blocks, x)
        out1 = np.asarray(out1)
        if ref is None:
            ref = out1
        diff = float(np.max(np.abs(out1 - ref)))
        float(multi(blocks, x))  # compile + warm
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            float(multi(blocks, x))
        dt = (time.time() - t0) / (reps * args.steps)
        pps = args.batch / dt
        print(
            f"{name}: {dt * 1e3:7.1f} ms/batch  {pps:7.0f} patches/s "
            f"({pps * GFLOP_PER_IMG / 1e3:.1f} TFLOP/s)  max|Δ| vs v0 {diff:.2e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
