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

Shapes: q [b, r, h, d], k [b, c, h, d], w [b, c, h, d] -> out [b, r, h, d],
softmax over c. Both r and c configurations (2304/256 and 256/2304) fit
comfortably in ~16 MB VMEM: sim is r*c*4 bytes = 2.36 MB.

Used by ``NystromAttention(use_pallas=True)``; the m x m Moore-Penrose
pseudo-inverse stays in XLA to preserve the reference's global-max scaling
(see models/nystrom.py docstring).
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _fwd_kernel(q_ref, k_ref, w_ref, o_ref):
    q = q_ref[0, 0, :, :]
    k = k_ref[0, 0, :, :]
    w = w_ref[0, 0, :, :]
    sim = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    attn = jax.nn.softmax(sim, axis=-1)
    out = jnp.dot(attn.astype(w.dtype), w, preferred_element_type=jnp.float32)
    o_ref[0, 0, :, :] = out.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, w_ref, g_ref, dq_ref, dk_ref, dw_ref):
    q = q_ref[0, 0, :, :]
    k = k_ref[0, 0, :, :]
    w = w_ref[0, 0, :, :]
    g = g_ref[0, 0, :, :]
    sim = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    attn = jax.nn.softmax(sim, axis=-1)  # [r, c] f32

    # dW = attn^T @ g
    dw = jax.lax.dot_general(
        attn.astype(g.dtype), g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dw_ref[0, 0, :, :] = dw.astype(dw_ref.dtype)

    # dAttn = g @ w^T ; dSim = attn * (dAttn - rowsum(dAttn * attn))
    dattn = jax.lax.dot_general(
        g, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    tmp = attn * dattn
    dsim = tmp - attn * jnp.sum(tmp, axis=-1, keepdims=True)
    dsim = dsim.astype(q.dtype)

    dq = jnp.dot(dsim, k, preferred_element_type=jnp.float32)
    dq_ref[0, 0, :, :] = dq.astype(dq_ref.dtype)
    dk = jax.lax.dot_general(
        dsim, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dk_ref[0, 0, :, :] = dk.astype(dk_ref.dtype)


def _specs(b, h, r, c, d):
    # head-major [b, h, n, d]: block last-two dims (n, d) satisfy the TPU
    # (8, 128)-divisible-or-full-size lowering constraint (d == full dim).
    qs = pl.BlockSpec((1, 1, r, d), lambda bi, hi: (bi, hi, 0, 0),
                      memory_space=pltpu.VMEM)
    ks = pl.BlockSpec((1, 1, c, d), lambda bi, hi: (bi, hi, 0, 0),
                      memory_space=pltpu.VMEM)
    return qs, ks


def _fwd_call(q, k, w):
    b, h, r, d = q.shape
    c = k.shape[2]
    qs, ks = _specs(b, h, r, c, d)
    return pl.pallas_call(
        _fwd_kernel,
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


def _bwd_call(q, k, w, g):
    b, h, r, d = q.shape
    c = k.shape[2]
    qs, ks = _specs(b, h, r, c, d)
    return pl.pallas_call(
        _bwd_kernel,
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


@jax.custom_vjp
def fused_softmax_attn(q, k, w):
    """softmax(q @ k^T over the c axis) @ w, fused per (batch, head).

    q: [b, h, r, d]; k, w: [b, h, c, d] -> [b, h, r, d].
    """
    return _fwd_call(q, k, w)


def _vjp_fwd(q, k, w):
    return _fwd_call(q, k, w), (q, k, w)


def _vjp_bwd(residuals, g):
    q, k, w = residuals
    return _bwd_call(q, k, w, g.astype(q.dtype))


fused_softmax_attn.defvjp(_vjp_fwd, _vjp_bwd)


def softmax_matmul_landmark_kv(q_l, k, v):
    """r3 = softmax(q_l @ k^T) @ v : [b, h, m, d] (softmax over n)."""
    return fused_softmax_attn(q_l, k, v)


def softmax_matmul_landmark_q(q, k_l, w):
    """out = softmax(q @ k_l^T) @ w : [b, h, n, d] (softmax over m)."""
    return fused_softmax_attn(q, k_l, w)


# ---------------------------------------------------------------------------
# Attention + depthwise-conv residual, fully fused (the kernel-B position of
# Nystrom attention): out = softmax(q k_l^T) @ w + conv1d_depthwise(v).
# The reference's res_conv is a (K=33, 1) grouped Conv2d along the sequence
# (models/mirror.py via nystrom_attention's res_conv); fusing it removes
# three forward convolutions and their six backward convolutions per step
# from the XLA graph (depthwise kernel-grad convs are notably slow on TPU).
# ---------------------------------------------------------------------------


def _conv_rows(vp, kern_row, n, K):
    """res[i] = sum_j kern[j] * vp[i + j] for zero-padded vp [n + K - 1, d]."""
    res = kern_row[0] * vp[0:n, :]
    for j in range(1, K):
        res = res + kern_row[j] * vp[j : j + n, :]
    return res


def _attn_conv_fwd_kernel(q_ref, k_ref, w_ref, v_ref, kern_ref, o_ref):
    q = q_ref[0, 0, :, :]
    k = k_ref[0, 0, :, :]
    w = w_ref[0, 0, :, :]
    v = v_ref[0, 0, :, :]
    kern = kern_ref[pl.program_id(1), :]  # [K] for this head
    n, d = q.shape
    K = kern.shape[0]
    half = K // 2
    sim = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    attn = jax.nn.softmax(sim, axis=-1)
    out = jnp.dot(attn.astype(w.dtype), w, preferred_element_type=jnp.float32)
    zeros = jnp.zeros((half, d), v.dtype)
    vp = jnp.concatenate([zeros, v, zeros], axis=0)
    out = out + _conv_rows(vp, kern.astype(jnp.float32), n, K)
    o_ref[0, 0, :, :] = out.astype(o_ref.dtype)


def _attn_conv_specs(r, c, d, K):
    qs = pl.BlockSpec((1, 1, r, d), lambda bi, hi: (bi, hi, 0, 0),
                      memory_space=pltpu.VMEM)
    ks = pl.BlockSpec((1, 1, c, d), lambda bi, hi: (bi, hi, 0, 0),
                      memory_space=pltpu.VMEM)
    # the [h, K] conv kernel is tiny: give every program the full array
    del K
    kern_s = pl.BlockSpec(memory_space=pltpu.VMEM)
    return qs, ks, kern_s


def _attn_conv_fwd_call(q, k, w, v, kern):
    b, h, r, d = q.shape
    c = k.shape[2]
    K = kern.shape[1]
    qs, ks, kern_s = _attn_conv_specs(r, c, d, K)
    return pl.pallas_call(
        _attn_conv_fwd_kernel,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(b, h),
        in_specs=[qs, ks, ks, qs, kern_s],
        out_specs=qs,
        interpret=_use_interpret(),
    )(q, k, w, v, kern)


@jax.custom_vjp
def fused_softmax_attn_conv(q, k, w, v, kern):
    """softmax(q k^T) @ w + depthwise_conv1d(v, kern) per (batch, head).

    q, v: [b, h, n, d]; k, w: [b, h, m, d]; kern: [h, K] -> [b, h, n, d].
    """
    return _attn_conv_fwd_call(q, k, w, v, kern)


def _attn_conv_vjp_fwd(q, k, w, v, kern):
    return _attn_conv_fwd_call(q, k, w, v, kern), (q, k, w, v, kern)


def _attn_conv_vjp_bwd(res, g):
    """Hybrid backward: the attention grads reuse the fused _bwd_call kernel;
    the conv grads run in XLA (the fully-fused backward needs ~18 MB of
    scoped VMEM at production shapes — over the 16 MB core limit)."""
    q, k, w, v, kern = res
    g = g.astype(q.dtype)
    dq, dk, dw = _bwd_call(q, k, w, g)
    K = kern.shape[1]
    half = K // 2
    gf = g.astype(jnp.float32)
    n = q.shape[2]
    gp = jnp.pad(gf, ((0, 0), (0, 0), (half, half), (0, 0)))
    kern_f = kern.astype(jnp.float32)
    # dv[p] = sum_s kern[K-1-s] * gpad[p + s]
    dv = sum(
        kern_f[None, :, K - 1 - sft, None, None]
        * jax.lax.dynamic_slice_in_dim(gp, sft, n, 2)
        for sft in range(K)
    ).astype(v.dtype)
    # dkern[h, j] = sum_{b, i, d} g * vpad[i + j]
    vpf = jnp.pad(
        v.astype(jnp.float32), ((0, 0), (0, 0), (half, half), (0, 0))
    )
    dkern = jnp.stack(
        [
            jnp.sum(gf * jax.lax.dynamic_slice_in_dim(vpf, j, n, 2), axis=(0, 2, 3))
            for j in range(K)
        ],
        axis=1,
    )
    return dq, dk, dw, dv, dkern.astype(kern.dtype)


fused_softmax_attn_conv.defvjp(_attn_conv_vjp_fwd, _attn_conv_vjp_bwd)
