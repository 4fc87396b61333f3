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
