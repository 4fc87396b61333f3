"""Fused LayerNorm + head-major q/k/v projection as ONE Pallas program per
batch element (custom VJP).

Context: the reference TransLayer (``/root/reference/models/mirror.py:295-314``)
is pre-norm — ``x + attn(norm(x))`` — with the nystrom ``to_qkv`` a bias-free
``Linear(dim, 3*heads*dim_head)``. In the XLA lowering this is a LayerNorm
fusion (one HBM round-trip of the normed stream) followed by three GEMM
fusions emitting head-major ``[b, h, n, dh]`` (see models/nystrom.py
``_QKVProjection``). This kernel applies the pattern that won feat-gen +70%
(ops/vit_attn_pallas.py half-blocks): LN statistics, the three projection
GEMMs, and the head-major emit all ride in one program, so the normed
stream never touches HBM and no fusion boundary splits the sublayer.

**MEASURED NEGATIVE RESULT — parity-tested but NOT wired into the model.**
At the production shape (B=64, n=2117, d=768, h=8, bf16, real chip,
``scripts/exp_ln_qkv.py``): fwd 9.553 ms vs XLA's 7.835; fwd+bwd 24.567 vs
18.346. The dh=96 per-head GEMMs waste 25% of the 128 MXU lanes (a
one-[d,3d]-GEMM variant recovers that and only ties XLA at 7.734), the
full-sequence block leaves no VMEM for cross-grid-step double buffering,
and the custom-call boundary costs XLA's surrounding fusions — the same
tax as the round-2 fused-LN losses. Full memo: BASELINE.md "Round-4".

Shapes and layout:
- x: [b, n, d] (compute dtype, normally bf16); ln scale/bias: [d] fp32.
- w: [d, 3*h*dh] — ``to_qkv``'s param layout; reshaped OUTSIDE the kernel
  to head-major tiles [3, h, d, dh] so the per-head GEMMs read contiguous
  weight tiles instead of lane-slicing at dh (=96) boundaries in VMEM.
- outputs q, k, v: [b, h, n, dh] head-major, matching what the downstream
  landmark/attention kernels consume.
- grid (b,): one full-sequence program per batch element. Per-head GEMMs
  keep every VMEM tile aligned (n rides sublanes, dh=96 is a full-size
  last dim); fp32 accumulation on the MXU, bf16 storage.

Backward (one pass, same grid): recomputes LN from x (cheaper than
stashing the normed stream), accumulates dW [3, h, d, dh] and the LN
scale/bias grads in VMEM-resident output blocks across the sequential
batch grid (the PPEG-kernel reduction pattern), and emits
dx = LN-backward(sum_h dq_h W_q_h^T + ...) exactly.

LN statistics use flax's fast-variance form (E[x^2] - E[x]^2, fp32) so the
fused path is numerically interchangeable with nn.LayerNorm(dtype=bf16,
param_dtype=fp32, epsilon=eps).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mirror_tpu.ops._common import VMEM_LIMIT_WIDE, use_interpret as _use_interpret


def _ln_f32(x, s, b, eps):
    """flax fast-variance LayerNorm; returns (y_f32, xhat_f32, rstd_f32)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (xf - mu) * rstd
    return xhat * s + b, xhat, rstd


def _fwd_kernel(heads, eps, x_ref, s_ref, b_ref, w_ref, q_ref, k_ref, v_ref):
    s = s_ref[0, :].astype(jnp.float32)
    b = b_ref[0, :].astype(jnp.float32)
    y, _, _ = _ln_f32(x_ref[0], s, b, eps)
    y = y.astype(x_ref.dtype)
    for j, o_ref in enumerate((q_ref, k_ref, v_ref)):
        for h in range(heads):
            o_ref[0, h] = jnp.dot(
                y, w_ref[j, h], preferred_element_type=jnp.float32
            ).astype(o_ref.dtype)


def _bwd_kernel(heads, eps, x_ref, s_ref, b_ref, w_ref, gq_ref, gk_ref,
                gv_ref, gx_ref, gw_ref, gs_ref, gb_ref):
    bi = pl.program_id(0)

    @pl.when(bi == 0)
    def _init():
        gw_ref[...] = jnp.zeros_like(gw_ref)
        gs_ref[...] = jnp.zeros_like(gs_ref)
        gb_ref[...] = jnp.zeros_like(gb_ref)

    s = s_ref[0, :].astype(jnp.float32)
    b = b_ref[0, :].astype(jnp.float32)
    y, xhat, rstd = _ln_f32(x_ref[0], s, b, eps)
    yb = y.astype(x_ref.dtype)

    gy = None
    for j, g_ref in enumerate((gq_ref, gk_ref, gv_ref)):
        for h in range(heads):
            gh = g_ref[0, h]  # [n, dh]
            # gy += gh @ w[j,h]^T  (contract dh)
            part = jax.lax.dot_general(
                gh, w_ref[j, h], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            gy = part if gy is None else gy + part
            # dw[j,h] += y^T @ gh  (contract n)
            gw_ref[j, h] = gw_ref[j, h] + jax.lax.dot_general(
                yb, gh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    gs_ref[0, :] = gs_ref[0, :] + jnp.sum(gy * xhat, axis=0)
    gb_ref[0, :] = gb_ref[0, :] + jnp.sum(gy, axis=0)

    gxhat = gy * s
    m1 = jnp.mean(gxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(gxhat * xhat, axis=-1, keepdims=True)
    gx_ref[0] = (rstd * (gxhat - m1 - xhat * m2)).astype(gx_ref.dtype)


def _head_major_w(w, heads, dh):
    """[d, 3*h*dh] -> [3, h, d, dh] contiguous per-head weight tiles."""
    d = w.shape[0]
    return w.reshape(d, 3, heads, dh).transpose(1, 2, 0, 3)


def _fwd_call(x, s, b, w_hm, heads, dh, eps):
    bsz, n, d = x.shape
    xs = pl.BlockSpec((1, n, d), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM)
    os = pl.BlockSpec((1, heads, n, dh), lambda bi: (bi, 0, 0, 0),
                      memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, d), lambda bi: (0, 0), memory_space=pltpu.VMEM)
    ws = pl.BlockSpec((3, heads, d, dh), lambda bi: (0, 0, 0, 0),
                      memory_space=pltpu.VMEM)
    oshape = jax.ShapeDtypeStruct((bsz, heads, n, dh), x.dtype)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, heads, eps),
        out_shape=(oshape, oshape, oshape),
        grid=(bsz,),
        in_specs=[xs, vec, vec, ws],
        out_specs=(os, os, os),
        interpret=_use_interpret(),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT_WIDE),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * n * d * 3 * heads * dh,
            bytes_accessed=4 * x.size * x.dtype.itemsize,
            transcendentals=bsz * n,
        ),
    )(x, s.reshape(1, d), b.reshape(1, d), w_hm)


def _bwd_call(x, s, b, w_hm, gq, gk, gv, heads, dh, eps):
    bsz, n, d = x.shape
    xs = pl.BlockSpec((1, n, d), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM)
    gsqkv = pl.BlockSpec((1, heads, n, dh), lambda bi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, d), lambda bi: (0, 0), memory_space=pltpu.VMEM)
    ws = pl.BlockSpec((3, heads, d, dh), lambda bi: (0, 0, 0, 0),
                      memory_space=pltpu.VMEM)
    accvec = pl.BlockSpec((8, d), lambda bi: (0, 0), memory_space=pltpu.VMEM)
    gx, gw, gs, gb = pl.pallas_call(
        functools.partial(_bwd_kernel, heads, eps),
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((3, heads, d, dh), jnp.float32),
            jax.ShapeDtypeStruct((8, d), jnp.float32),
            jax.ShapeDtypeStruct((8, d), jnp.float32),
        ),
        grid=(bsz,),
        in_specs=[xs, vec, vec, ws, gsqkv, gsqkv, gsqkv],
        out_specs=(xs, ws, accvec, accvec),
        interpret=_use_interpret(),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT_WIDE),
        cost_estimate=pl.CostEstimate(
            flops=4 * bsz * n * d * 3 * heads * dh,
            bytes_accessed=8 * x.size * x.dtype.itemsize,
            transcendentals=bsz * n,
        ),
    )(x, s.reshape(1, d), b.reshape(1, d), w_hm, gq, gk, gv)
    return gx, gw, gs[0], gb[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _ln_qkv_fused(x, ln_scale, ln_bias, w, heads, eps=1e-5):
    d = x.shape[-1]
    dh = w.shape[1] // (3 * heads)
    return _fwd_call(x, ln_scale, ln_bias, _head_major_w(w, heads, dh),
                     heads, dh, eps)


def _vjp_fwd(x, ln_scale, ln_bias, w, heads, eps):
    d = x.shape[-1]
    dh = w.shape[1] // (3 * heads)
    w_hm = _head_major_w(w, heads, dh)
    out = _fwd_call(x, ln_scale, ln_bias, w_hm, heads, dh, eps)
    return out, (x, ln_scale, ln_bias, w_hm, dh)


def _vjp_bwd(heads, eps, res, g):
    x, ln_scale, ln_bias, w_hm, dh = res
    gq, gk, gv = g
    cdt = x.dtype
    gx, gw_hm, gs, gb = _bwd_call(
        x, ln_scale, ln_bias, w_hm,
        gq.astype(cdt), gk.astype(cdt), gv.astype(cdt), heads, dh, eps,
    )
    d = x.shape[-1]
    # [3, h, d, dh] -> [d, 3*h*dh] (inverse of _head_major_w), grad matches
    # the primal w's dtype
    gw = gw_hm.transpose(2, 0, 1, 3).reshape(d, 3 * heads * dh).astype(cdt)
    return gx, gs.astype(ln_scale.dtype), gb.astype(ln_bias.dtype), gw


_ln_qkv_fused.defvjp(_vjp_fwd, _vjp_bwd)


def ln_qkv_fused(x, ln_scale, ln_bias, w, heads, eps=1e-5):
    """(q, k, v) head-major [b, h, n, dh] = split(LN(x; scale, bias) @ w).

    x: [b, n, d]; ln_scale/ln_bias: [d] fp32; w: [d, 3*h*dh] in ``to_qkv``'s
    param layout (q | k | v blocks), already cast to the compute dtype.

    Public entry: like every kernel entry point, shard_maps itself over the
    batch on a multi-device mesh (ops/_common.spmd_wrap — Mosaic custom
    calls cannot be GSPMD-partitioned), weights replicated.
    """
    from mirror_tpu.ops._common import spmd_wrap

    return spmd_wrap(
        lambda x, s, b, w: _ln_qkv_fused(x, s, b, w, heads, eps),
        x, ln_scale, ln_bias, w, replicated=(1, 2, 3),
    )
