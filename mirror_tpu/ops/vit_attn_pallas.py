"""Natural-layout fused multi-head attention Pallas kernel for the ViT.

Feat-gen's ViT-B/16 forward (B=512, 197 tokens) spends 74.3 ms of its
213.5 ms batch in the attention core: XLA's bhqk-batched formulation runs
the two small [197, 64] x [64, 197] matmuls at ~12 TFLOP/s effective and
round-trips the [B, 12, 197, 197] fp32 attention matrices through HBM
(attribution: scripts/exp_vit_variants.py v10/v11 probes, BASELINE.md
round-3). Two earlier fused attempts LOST: the per-(batch, head)-program
nystrom kernel (2087 vs 2477 patches/s — 6,144 tiny programs) and
head-major [b*h, n, dh] blocks (7.0 vs 5.5 ms — the XLA-side transposes
cost more than the fusion saves, scripts/exp_vit_attn_kernel.py k1*).

What wins is keeping the residual stream's NATURAL [b, n, d_model] layout
end to end: each program loads a block of images post-qkv-projection and
slices the head columns in VMEM, so XLA never transposes and the attention
matrix never touches HBM. Measured 3.71 ms vs 5.54 ms XLA per attention
call (k3g2), ~22 ms/batch across the 12 blocks.

Inference-only (feature extraction never differentiates — the backbone is
frozen, matching the reference's eval-mode extractors,
/root/reference/tools/feature_generation/gen_patch_feature.py:141-172);
differentiating through ``pallas_call`` without a VJP raises, which is the
intended guard.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mirror_tpu.ops._common import (
    VMEM_LIMIT_WIDE,
    spmd_wrap as _spmd_wrap,
    use_interpret as _use_interpret,
)


def _kernel(heads: int, dh: int, scale: float, q_ref, k_ref, v_ref, o_ref):
    for h in range(heads):
        sl = slice(h * dh, (h + 1) * dh)
        q = q_ref[:, :, sl]  # [gb, n, dh]
        k = k_ref[:, :, sl]
        v = v_ref[:, :, sl]
        sim = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        attn = jax.nn.softmax(sim * scale, axis=-1)  # fp32, VMEM-resident
        out = jax.lax.dot_general(
            attn.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        o_ref[:, :, sl] = out.astype(o_ref.dtype)


def _mha_natural(q: jax.Array, k: jax.Array, v: jax.Array, heads: int) -> jax.Array:
    """softmax(q k^T / sqrt(dh)) v over ``heads`` head-slices of the last dim.

    q, k, v: [b, n, d_model] straight out of the projection GEMMs (no
    reshape/transpose). Softmax statistics in fp32 like the dense path.
    n and d_model ride the block's last-two dims at full size, satisfying
    the TPU (8, 128)-divisible-or-full-size lowering constraint for the
    odd n=197.
    """
    b, n, d = q.shape
    dh = d // heads
    gb = 4 if b % 4 == 0 else (2 if b % 2 == 0 else 1)  # 3.40/3.71/4.16 ms
    spec = pl.BlockSpec((gb, n, d), lambda bi: (bi, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, heads, dh, dh**-0.5),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(b // gb,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=_use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * heads * n * n * dh,
            bytes_accessed=4 * q.size * q.dtype.itemsize,
            transcendentals=b * heads * n * n,
        ),
    )(q, k, v)


# ---------------------------------------------------------------------------
# Whole-half-block fusions: LayerNorm, the projection GEMMs, and the
# residual add all ride in the same program, weights VMEM-resident across
# the grid (constant index_map), so the y/q/k/v/attn-out/fc1 streams never
# round-trip HBM and no XLA fusion boundary splits the block. Measured per
# block (B=512, scripts/exp_vit_fused_sublayer.py): attention half 5.78 vs
# 6.28 ms (k8 vs LN-in-XLA + projection-fused kernel; 6.31 before any
# projection fusion), MLP half 8.03 vs 8.49 (9.23 before).
# ---------------------------------------------------------------------------


def _wspec(shape):
    return pl.BlockSpec(shape, lambda bi: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


def _ln_f32(x, s, b, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * s + b).astype(x.dtype)


def _attn_block_kernel(g: int, heads: int, dh: int, scale: float, eps: float,
                       x_ref, lns_ref, lnb_ref, wq_ref, wk_ref, wv_ref,
                       bqkv_ref, wo_ref, bo_ref, o_ref):
    d = heads * dh
    lns = lns_ref[...].astype(jnp.float32)
    lnb = lnb_ref[...].astype(jnp.float32)
    for i in range(g):
        x = x_ref[i]  # [n, d]
        y = _ln_f32(x, lns, lnb, eps)
        qf = (jnp.dot(y, wq_ref[...], preferred_element_type=jnp.float32)
              + bqkv_ref[0, :d]).astype(y.dtype)
        kf = (jnp.dot(y, wk_ref[...], preferred_element_type=jnp.float32)
              + bqkv_ref[0, d:2 * d]).astype(y.dtype)
        vf = (jnp.dot(y, wv_ref[...], preferred_element_type=jnp.float32)
              + bqkv_ref[0, 2 * d:]).astype(y.dtype)
        heads_out = []
        for h in range(heads):
            sl = slice(h * dh, (h + 1) * dh)
            sim = jax.lax.dot_general(
                qf[:, sl], kf[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            attn = jax.nn.softmax(sim * scale, axis=-1)
            heads_out.append(
                jnp.dot(attn.astype(y.dtype), vf[:, sl],
                        preferred_element_type=jnp.float32).astype(y.dtype)
            )
        att = jnp.concatenate(heads_out, axis=-1)
        o = jnp.dot(att, wo_ref[...], preferred_element_type=jnp.float32)
        o = o + bo_ref[...].astype(jnp.float32)
        o_ref[i] = (x.astype(jnp.float32) + o).astype(o_ref.dtype)


def _attn_block(x, ln_s, ln_b, wq, wk, wv, bqkv, wo, bo, heads: int,
                eps: float = 1e-12) -> jax.Array:
    """x + out_proj(mha(qkv_proj(layernorm(x)))) — the full pre-LN attention
    half-block in one program.

    x: [b, n, d] residual stream; ln_s/ln_b: [1, d] fp32; w*: [d, d];
    bqkv: [1, 3d] (q|k|v concatenated); bo: [1, d]. LN statistics, softmax,
    GEMM accumulation, and the residual add are fp32. Inference-only
    (no VJP).
    """
    b, n, d = x.shape
    dh = d // heads
    gb = 2 if b % 2 == 0 else 1
    xs = pl.BlockSpec((gb, n, d), lambda bi: (bi, 0, 0),
                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_attn_block_kernel, gb, heads, dh, dh**-0.5, eps),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(b // gb,),
        in_specs=[xs, _wspec((1, d)), _wspec((1, d)), _wspec((d, d)),
                  _wspec((d, d)), _wspec((d, d)), _wspec((1, 3 * d)),
                  _wspec((d, d)), _wspec((1, d))],
        out_specs=xs,
        interpret=_use_interpret(),
        compiler_params=pltpu.CompilerParams(
            # the fp32 path's resident weights + streams exceed the default
            # 16 MB scoped window (e.g. fp32 w1+w2 alone are 18.9 MB)
            vmem_limit_bytes=VMEM_LIMIT_WIDE,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * d * 4 * d + 4 * b * heads * n * n * dh,
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=b * heads * n * n,
        ),
    )(x, ln_s, ln_b, wq, wk, wv, bqkv, wo, bo)


def _erf_f32(x):
    # Mosaic has no erf primitive; Abramowitz & Stegun 7.1.26 via exp,
    # |abs err| <= 1.5e-7 — far below bf16 ulp (~3.9e-3), so the fused MLP
    # matches XLA's own erf polynomial to <= 2 bf16 ulps end to end.
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _mlp_block_kernel(g: int, eps: float, x_ref, lns_ref, lnb_ref,
                      w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    lns = lns_ref[...].astype(jnp.float32)
    lnb = lnb_ref[...].astype(jnp.float32)
    for i in range(g):
        x = x_ref[i]
        y = _ln_f32(x, lns, lnb, eps)
        h = jnp.dot(y, w1_ref[...], preferred_element_type=jnp.float32)
        h = h + b1_ref[...].astype(jnp.float32)
        h = 0.5 * h * (1.0 + _erf_f32(h * (2.0**-0.5)))  # exact gelu, f32
        o = jnp.dot(h.astype(y.dtype), w2_ref[...],
                    preferred_element_type=jnp.float32)
        o = o + b2_ref[...].astype(jnp.float32)
        o_ref[i] = (x.astype(jnp.float32) + o).astype(o_ref.dtype)


def _mlp_block(x, ln_s, ln_b, w1, b1, w2, b2, eps: float = 1e-12) -> jax.Array:
    """x + fc2(gelu(fc1(layernorm(x)))) — the full pre-LN MLP half-block in
    one program, exact-erf GELU evaluated in fp32 in VMEM.

    x: [b, n, d]; ln_s/ln_b: [1, d] fp32; w1: [d, m]; b1: [1, m];
    w2: [m, d]; b2: [1, d]. The [b, n, m] hidden stream never touches HBM.
    Inference-only (no VJP).
    """
    b, n, d = x.shape
    m = w1.shape[1]
    gb = 2 if b % 2 == 0 else 1
    xs = pl.BlockSpec((gb, n, d), lambda bi: (bi, 0, 0),
                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_mlp_block_kernel, gb, eps),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(b // gb,),
        in_specs=[xs, _wspec((1, d)), _wspec((1, d)), _wspec((d, m)),
                  _wspec((1, m)), _wspec((m, d)), _wspec((1, d))],
        out_specs=xs,
        interpret=_use_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_WIDE,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n * d * m,
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=b * n * m,
        ),
    )(x, ln_s, ln_b, w1, b1, w2, b2)


def mha_natural(q: jax.Array, k: jax.Array, v: jax.Array, heads: int) -> jax.Array:
    """Public entry for the natural-layout attention kernel; on a
    multi-device mesh it runs shard_mapped over the batch
    (ops/_common.spmd_wrap — Mosaic custom calls cannot be
    GSPMD-partitioned). See _mha_natural for the kernel contract."""
    if q.shape[-1] % heads:
        raise ValueError(  # see attn_block: unwritten-lane hazard
            f"mha_natural: feature dim {q.shape[-1]} not divisible by "
            f"heads={heads}"
        )
    return _spmd_wrap(lambda q, k, v: _mha_natural(q, k, v, heads), q, k, v)


def attn_block(x, ln_s, ln_b, wq, wk, wv, bqkv, wo, bo, heads: int,
               eps: float = 1e-12) -> jax.Array:
    """Public entry for the attention half-block kernel; weights replicated,
    batch shard_mapped over a multi-device mesh (ops/_common.spmd_wrap).
    See _attn_block for the kernel contract."""
    if x.shape[-1] % heads:
        # the per-head kernel loop writes exactly heads*(d//heads) output
        # lanes; a non-divisible width would leave the remaining lanes as
        # uninitialized VMEM on the compiled path (interpret mode differs,
        # so the CPU suite could never catch it) — refuse loudly instead
        raise ValueError(
            f"attn_block: feature dim {x.shape[-1]} not divisible by "
            f"heads={heads}"
        )
    return _spmd_wrap(
        lambda x, *w: _attn_block(x, *w, heads, eps),
        x, ln_s, ln_b, wq, wk, wv, bqkv, wo, bo,
        replicated=(1, 2, 3, 4, 5, 6, 7, 8),
    )


def mlp_block(x, ln_s, ln_b, w1, b1, w2, b2, eps: float = 1e-12) -> jax.Array:
    """Public entry for the MLP half-block kernel; weights replicated,
    batch shard_mapped over a multi-device mesh (ops/_common.spmd_wrap).
    See _mlp_block for the kernel contract."""
    return _spmd_wrap(
        lambda x, *w: _mlp_block(x, *w, eps),
        x, ln_s, ln_b, w1, b1, w2, b2,
        replicated=(1, 2, 3, 4, 5, 6),
    )
