"""Fused softmax-attention Pallas TPU kernels for Nystrom attention.

The Nystrom path needs two "softmax(Q K^T) @ W" products per layer
(models/nystrom.py): attn1 @ W with rows n=2304 / cols m=256, and
attn3 @ V with rows m / cols n. In XLA these materialize [n, m] fp32
attention matrices in HBM, making the op bandwidth-bound (~27 TFLOP/s
ceiling measured on v5e). Here each (batch, head) program computes the
similarity tile, the row softmax, and the output product entirely in VMEM —
the attention matrix never touches HBM. A custom VJP recomputes the softmax
in the backward kernel (flash-attention-style) and emits dq/dk/dw in one
pass.

Shapes (head-major): q [b, h, r, d], k [b, h, c, d], w [b, h, c, d] ->
out [b, h, r, d], softmax over c (see ``_specs``: the grid runs one
program per (batch, head) pair over the last-two [rows, d] tiles). Both
r/c configurations (2304/256 and 256/2304) fit comfortably in ~16 MB VMEM:
sim is r*c*4 bytes = 2.36 MB.

Used by ``NystromAttention(use_pallas=True)``; the m x m Moore-Penrose
pseudo-inverse runs as its own Pallas kernel (ops/pinv_pallas.py) whose
global-max scaling scalar stays in XLA to keep the reference's scaling
quirk and its (sub)gradient exact.
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

from mirror_tpu.ops.conv1d_pallas import (
    _band_tiles_xla,
    _banded_kernel,
    _dkern_tap_row,
    _tile_rows,
    _window,
    ROW_TILE,
)


def _softmax_pad(sim, pad):
    """Row softmax of [sim_pad | sim] where sim_pad is `pad` implicit zero
    columns (the Nystrom front-pad rows give k=0 so their logits are
    exactly 0; v=0 so they add nothing to the numerator): the pad's whole
    effect is max(mx, 0) and +pad*exp(-mx) in the denominator. Equals the
    reference's softmax-over-the-padded-sequence without materializing the
    padded k/v streams."""
    if pad == 0:
        return jax.nn.softmax(sim, axis=-1)
    mx = jnp.maximum(jnp.max(sim, axis=-1, keepdims=True), 0.0)
    e = jnp.exp(sim - mx)
    denom = jnp.sum(e, axis=-1, keepdims=True) + pad * jnp.exp(-mx)
    return e / denom


def _attn_fwd_math(q, k, w, pad):
    """out = softmax_pad(q @ k^T) @ w on plain arrays — the single source of
    the attention forward math, shared by the bare and conv-fused kernels."""
    sim = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    attn = _softmax_pad(sim, pad)
    return jnp.dot(attn.astype(w.dtype), w, preferred_element_type=jnp.float32)


def _attn_bwd_math(q, k, w, g, pad):
    """(dq, dk, dw) of _attn_fwd_math, recomputing the softmax in-kernel
    (flash-attention-style). Shared by the bare and conv-fused backward
    kernels. Pad columns need no extra terms: their dattn = g @ 0^T = 0, so
    they drop out of the softmax-VJP row sum too."""
    sim = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    attn = _softmax_pad(sim, pad)  # [r, c] f32

    # dW = attn^T @ g
    dw = jax.lax.dot_general(
        attn.astype(g.dtype), g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # dAttn = g @ w^T ; dSim = attn * (dAttn - rowsum(dAttn * attn))
    dattn = jax.lax.dot_general(
        g, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    tmp = attn * dattn
    dsim = tmp - attn * jnp.sum(tmp, axis=-1, keepdims=True)
    dsim = dsim.astype(q.dtype)

    dq = jnp.dot(dsim, k, preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(
        dsim, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    return dq, dk, dw


def _fwd_kernel(pad: int, q_ref, k_ref, w_ref, o_ref):
    out = _attn_fwd_math(q_ref[0, 0, :, :], k_ref[0, 0, :, :],
                         w_ref[0, 0, :, :], pad)
    o_ref[0, 0, :, :] = out.astype(o_ref.dtype)


def _bwd_kernel(pad: int, q_ref, k_ref, w_ref, g_ref, dq_ref, dk_ref, dw_ref):
    dq, dk, dw = _attn_bwd_math(
        q_ref[0, 0, :, :], k_ref[0, 0, :, :], w_ref[0, 0, :, :],
        g_ref[0, 0, :, :], pad,
    )
    dq_ref[0, 0, :, :] = dq.astype(dq_ref.dtype)
    dk_ref[0, 0, :, :] = dk.astype(dk_ref.dtype)
    dw_ref[0, 0, :, :] = dw.astype(dw_ref.dtype)


def _specs(b, h, r, c, d):
    # head-major [b, h, n, d]: block last-two dims (n, d) satisfy the TPU
    # (8, 128)-divisible-or-full-size lowering constraint (d == full dim).
    qs = pl.BlockSpec((1, 1, r, d), lambda bi, hi: (bi, hi, 0, 0),
                      memory_space=pltpu.VMEM)
    ks = pl.BlockSpec((1, 1, c, d), lambda bi, hi: (bi, hi, 0, 0),
                      memory_space=pltpu.VMEM)
    return qs, ks


def _fwd_call(q, k, w, pad=0):
    b, h, r, d = q.shape
    c = k.shape[2]
    qs, ks = _specs(b, h, r, c, d)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, pad),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(b, h),
        in_specs=[qs, ks, ks],
        out_specs=qs,
        interpret=_use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * r * c * d,
            bytes_accessed=2 * (q.size + 2 * k.size) * q.dtype.itemsize,
            transcendentals=b * h * r * c,
        ),
    )(q, k, w)


def _bwd_call(q, k, w, g, pad=0):
    b, h, r, d = q.shape
    c = k.shape[2]
    qs, ks = _specs(b, h, r, c, d)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, pad),
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(w.shape, w.dtype),
        ),
        grid=(b, h),
        in_specs=[qs, ks, ks, qs],
        out_specs=(qs, ks, ks),
        interpret=_use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * b * h * r * c * d,
            bytes_accessed=4 * (q.size + 2 * k.size) * q.dtype.itemsize,
            transcendentals=b * h * r * c,
        ),
    )(q, k, w, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fused_softmax_attn(q, k, w, pad=0):
    return _fwd_call(q, k, w, pad)


def _vjp_fwd(q, k, w, pad):
    return _fwd_call(q, k, w, pad), (q, k, w)


def _vjp_bwd(pad, residuals, g):
    q, k, w = residuals
    return _bwd_call(q, k, w, g.astype(q.dtype), pad)


_fused_softmax_attn.defvjp(_vjp_fwd, _vjp_bwd)


def fused_softmax_attn(q, k, w, pad=0):
    """softmax(q @ k^T over the c axis) @ w, fused per (batch, head).

    q: [b, h, r, d]; k, w: [b, h, c, d] -> [b, h, r, d]. `pad` virtual
    zero columns (zero k rows AND zero w rows) participate in the softmax
    exactly as the reference's front-padded sequence (see _softmax_pad).

    On a multi-device mesh the kernel runs shard_mapped over the batch
    (ops/_common.spmd_wrap — Mosaic custom calls cannot be GSPMD-
    partitioned).
    """
    return _spmd_wrap(lambda q, k, w: _fused_softmax_attn(q, k, w, pad), q, k, w)


def softmax_matmul_landmark_kv(q_l, k, v, pad=0):
    """r3 = softmax(q_l @ k^T) @ v : [b, h, m, d] (softmax over n + pad
    virtual zero tokens)."""
    return fused_softmax_attn(q_l, k, v, pad)


def softmax_matmul_landmark_q(q, k_l, w):
    """out = softmax(q @ k_l^T) @ w : [b, h, n, d] (softmax over m)."""
    return fused_softmax_attn(q, k_l, w)


# ---------------------------------------------------------------------------
# Attention + residual-conv megafusion
#
# The Nystrom residual conv consumes v and its output is added to this
# kernel's output (models/nystrom.py) — as a separate op it costs two extra
# full HBM passes forward (read v, write res; this chip's effective HBM
# bandwidth is only ~120-270 GB/s, BASELINE.md HBM-floor memo) and re-reads
# g in the backward. Riding the banded-matmul conv (see ops/conv1d_pallas)
# inside the attention programs removes those passes: forward reads v once
# and writes the summed output; backward reads g/v once and emits
# dq/dk_l/dw AND dv/dkern together. (Round 1 tried an attn+conv megafusion
# with serial VPU tap-MACs and lost — the banded MXU formulation is what
# makes it ride for free.)
# ---------------------------------------------------------------------------

def _fwd_conv_kernel(K: int, n: int, pad: int, q_ref, k_ref, w_ref, v_ref,
                     band_ref, o_ref):
    out = _attn_fwd_math(q_ref[0, 0, :, :], k_ref[0, 0, :, :],
                         w_ref[0, 0, :, :], pad)  # [n, d] f32
    band = band_ref[0, :, :]
    for s0, rows in _tile_rows(n):
        win = _window(v_ref, 0, s0, rows, K, n)
        conv = jax.lax.dot(
            band[:rows, : rows + K - 1], win,
            preferred_element_type=jnp.float32,
        )
        o_ref[0, 0, pl.dslice(s0, rows), :] = (
            out[s0:s0 + rows, :] + conv
        ).astype(o_ref.dtype)


def _bwd_conv_kernel(K: int, n: int, pad: int, q_ref, k_ref, w_ref, v_ref,
                     bandf_ref, g_ref, dq_ref, dk_ref, dw_ref, dv_ref,
                     dkern_ref, acc_ref):
    bi = pl.program_id(1)

    @pl.when(bi == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    g = g_ref[0, 0, :, :]
    dq, dk, dw = _attn_bwd_math(
        q_ref[0, 0, :, :], k_ref[0, 0, :, :], w_ref[0, 0, :, :], g, pad
    )
    dq_ref[0, 0, :, :] = dq.astype(dq_ref.dtype)
    dk_ref[0, 0, :, :] = dk.astype(dk_ref.dtype)
    dw_ref[0, 0, :, :] = dw.astype(dw_ref.dtype)

    # conv backward riding along (shared with conv1d_pallas._bwd_kernel):
    # dv = flipped-Band @ g, then the K-tap dkern gradient row
    _banded_kernel(K, n, 1, g.shape[-1], g_ref, bandf_ref, dv_ref)
    row = _dkern_tap_row(K, n, g.astype(jnp.float32), v_ref[0, 0, :, :])
    acc_ref[0, :] = acc_ref[0, :] + row
    dkern_ref[0, :, :] = jnp.broadcast_to(acc_ref[0, :][None, :], (8, 128))


def _conv_specs(n, m, d):
    # grid (h, b): the dkern accumulator block stays resident per head
    qs = pl.BlockSpec((1, 1, n, d), lambda hi, bi: (bi, hi, 0, 0),
                      memory_space=pltpu.VMEM)
    ks = pl.BlockSpec((1, 1, m, d), lambda hi, bi: (bi, hi, 0, 0),
                      memory_space=pltpu.VMEM)
    return qs, ks


def _fwd_conv_call(q, k_l, w, v, kern, pad=0):
    b, h, n, d = q.shape
    m = k_l.shape[2]
    K = kern.shape[1]
    qs, ks = _conv_specs(n, m, d)
    band_spec = pl.BlockSpec(
        (1, ROW_TILE, ROW_TILE + K - 1), lambda hi, bi: (hi, 0, 0),
        memory_space=pltpu.VMEM,
    )
    bands = _band_tiles_xla(kern, ROW_TILE, K, flip=False, dtype=v.dtype)
    return pl.pallas_call(
        functools.partial(_fwd_conv_kernel, K, n, pad),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(h, b),
        in_specs=[qs, ks, ks, qs, band_spec],
        out_specs=qs,
        interpret=_use_interpret(),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT_WIDE),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * n * m * d
            + 2 * b * h * n * (ROW_TILE + K - 1) * d,
            bytes_accessed=2 * (q.size + v.size + 2 * k_l.size)
            * q.dtype.itemsize,
            transcendentals=b * h * n * m,
        ),
    )(q, k_l, w, v, bands)


def _bwd_conv_call(q, k_l, w, v, kern, g, pad=0):
    b, h, n, d = q.shape
    m = k_l.shape[2]
    K = kern.shape[1]
    qs, ks = _conv_specs(n, m, d)
    band_spec = pl.BlockSpec(
        (1, ROW_TILE, ROW_TILE + K - 1), lambda hi, bi: (hi, 0, 0),
        memory_space=pltpu.VMEM,
    )
    dkern_spec = pl.BlockSpec((1, 8, 128), lambda hi, bi: (hi, 0, 0),
                              memory_space=pltpu.VMEM)
    bands_f = _band_tiles_xla(kern, ROW_TILE, K, flip=True, dtype=g.dtype)
    dq, dkl, dw, dv, dkern = pl.pallas_call(
        functools.partial(_bwd_conv_kernel, K, n, pad),
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k_l.shape, k_l.dtype),
            jax.ShapeDtypeStruct(w.shape, w.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
            jax.ShapeDtypeStruct((h, 8, 128), jnp.float32),
        ),
        grid=(h, b),
        in_specs=[qs, ks, ks, qs, band_spec, qs],
        out_specs=(qs, ks, ks, qs, dkern_spec),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
        interpret=_use_interpret(),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT_WIDE),
    )(q, k_l, w, v, bands_f, g)
    return dq, dkl, dw, dv, dkern[:, 0, :K].astype(kern.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _fused_softmax_attn_conv(q, k_l, w, v, kern, pad=0):
    return _fwd_conv_call(q, k_l, w, v, kern, pad)


def _vjp_conv_fwd(q, k_l, w, v, kern, pad):
    return _fwd_conv_call(q, k_l, w, v, kern, pad), (q, k_l, w, v, kern)


def _vjp_conv_bwd(pad, residuals, g):
    q, k_l, w, v, kern = residuals
    return _bwd_conv_call(q, k_l, w, v, kern, g.astype(q.dtype), pad)


_fused_softmax_attn_conv.defvjp(_vjp_conv_fwd, _vjp_conv_bwd)


def fused_softmax_attn_conv(q, k_l, w, v, kern, pad=0):
    """softmax(q @ k_l^T over m + pad virtual zero cols) @ w
    + depthwise_conv1d_seq(v, kern), fused.

    q, v: [b, h, n, d]; k_l, w: [b, h, m, d]; kern: [h, K] (K odd)
    -> [b, h, n, d]. The conv is the SAME zero-padded 33-tap residual conv
    of the Nystrom attention (ref nystrom_attention res_conv). The Nystrom
    caller softmaxes over the m landmarks (never padded), so it passes
    pad=0; `pad` exists so the softmax semantics stay identical to
    fused_softmax_attn if this kernel is ever reused on a padded axis.

    On a multi-device mesh the kernel runs shard_mapped over the batch
    with the conv taps replicated (ops/_common.spmd_wrap)."""
    return _spmd_wrap(
        lambda q, k_l, w, v, kern: _fused_softmax_attn_conv(
            q, k_l, w, v, kern, pad
        ),
        q, k_l, w, v, kern, replicated=(4,),
    )
