"""Fused landmark-means + landmark-softmax Pallas TPU kernel.

In the Nystrom attention, the landmark path computes q_l/k_l (mean over
contiguous groups of l tokens) and attn2 = softmax(q_l @ k_l^T). Left to
XLA at production shapes this materializes fp32 copies of the full q/k
streams for the mean accumulation (f32[1,64,8,2304,96] converts, 452 MB
each) and keeps BOTH sim2 and the softmax output as f32[64,8,384,384]
(302 MB each) alive for the backward — ~1 GB/layer of fp32 HBM the math
never needed (HLO dump, round-2 profile).

One (batch, head) program reads the bf16 q/k rows once, computes the group
means and the softmax entirely in VMEM (fp32 statistics), and writes bf16
q_l, k_l, attn2. The custom VJP recomputes the softmax from q_l/k_l (74 KB
each) instead of saving any [384,384] fp32 tensor, and routes the mean
gradient as the broadcast/l it is.

Numerics match models/nystrom.py's jnp path: fp32 mean accumulation cast to
bf16, fp32 dot for sim2, fp32 softmax cast to the compute dtype.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _group_mean(x, m, l, dh):
    """[n_pad, dh] -> [m, dh] mean over contiguous groups of l (fp32 acc)."""
    xf = x.astype(jnp.float32).reshape(m, l, dh)
    return (jnp.sum(xf, axis=1) * (1.0 / l)).astype(x.dtype)


def _softmax_f32(sim):
    p = jax.nn.softmax(sim, axis=-1)
    return p


def _fwd_kernel(m: int, l: int, q_ref, k_ref, ql_ref, kl_ref, a2_ref):
    dh = q_ref.shape[-1]
    q_l = _group_mean(q_ref[0, 0, :, :], m, l, dh)
    k_l = _group_mean(k_ref[0, 0, :, :], m, l, dh)
    ql_ref[0, 0, :, :] = q_l
    kl_ref[0, 0, :, :] = k_l
    sim = jax.lax.dot_general(
        q_l, k_l, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    a2_ref[0, 0, :, :] = _softmax_f32(sim).astype(a2_ref.dtype)


def _bwd_kernel(
    m: int, l: int,
    q_ref, k_ref, gql_ref, gkl_ref, ga2_ref,
    dq_ref, dk_ref,
):
    dh = q_ref.shape[-1]
    q_l = _group_mean(q_ref[0, 0, :, :], m, l, dh)
    k_l = _group_mean(k_ref[0, 0, :, :], m, l, dh)
    sim = jax.lax.dot_general(
        q_l, k_l, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    p = _softmax_f32(sim)
    ga2 = ga2_ref[0, 0, :, :].astype(jnp.float32)
    tmp = p * ga2
    dsim = (tmp - p * jnp.sum(tmp, axis=-1, keepdims=True)).astype(q_l.dtype)
    # dq_l = dsim @ k_l ; dk_l = dsim^T @ q_l (+ direct cotangents)
    dq_l = jax.lax.dot(
        dsim, k_l, preferred_element_type=jnp.float32
    ) + gql_ref[0, 0, :, :].astype(jnp.float32)
    dk_l = jax.lax.dot_general(
        dsim, q_l, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + gkl_ref[0, 0, :, :].astype(jnp.float32)
    # mean backward: broadcast / l over each group
    n_pad = q_ref.shape[-2]
    dq = jnp.broadcast_to(
        (dq_l * (1.0 / l))[:, None, :], (m, l, dh)
    ).reshape(n_pad, dh)
    dk = jnp.broadcast_to(
        (dk_l * (1.0 / l))[:, None, :], (m, l, dh)
    ).reshape(n_pad, dh)
    dq_ref[0, 0, :, :] = dq.astype(dq_ref.dtype)
    dk_ref[0, 0, :, :] = dk.astype(dk_ref.dtype)


def _specs(n_pad, m, dh):
    seq = pl.BlockSpec((1, 1, n_pad, dh), lambda bi, hi: (bi, hi, 0, 0),
                       memory_space=pltpu.VMEM)
    lm = pl.BlockSpec((1, 1, m, dh), lambda bi, hi: (bi, hi, 0, 0),
                      memory_space=pltpu.VMEM)
    a2 = pl.BlockSpec((1, 1, m, m), lambda bi, hi: (bi, hi, 0, 0),
                      memory_space=pltpu.VMEM)
    return seq, lm, a2


def _fwd_call(q, k, m):
    b, h, n_pad, dh = q.shape
    l = n_pad // m
    seq, lm, a2 = _specs(n_pad, m, dh)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, m, l),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, m, dh), q.dtype),
            jax.ShapeDtypeStruct((b, h, m, dh), q.dtype),
            jax.ShapeDtypeStruct((b, h, m, m), q.dtype),
        ),
        grid=(b, h),
        in_specs=[seq, seq],
        out_specs=(lm, lm, a2),
        interpret=_use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * m * m * dh + 4 * b * h * n_pad * dh,
            bytes_accessed=2 * (q.size + k.size) * q.dtype.itemsize,
            transcendentals=b * h * m * m,
        ),
    )(q, k)


def _bwd_call(q, k, m, gql, gkl, ga2):
    b, h, n_pad, dh = q.shape
    l = n_pad // m
    seq, lm, a2 = _specs(n_pad, m, dh)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, m, l),
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k.shape, k.dtype),
        ),
        grid=(b, h),
        in_specs=[seq, seq, lm, lm, a2],
        out_specs=(seq, seq),
        interpret=_use_interpret(),
    )(q, k, gql, gkl, ga2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def landmark_softmax(q, k, m):
    """(q_l, k_l, attn2) from head-major q, k [b, h, n_pad, dh].

    q_l/k_l: contiguous-group means ([b, h, m, dh]); attn2 =
    softmax(q_l @ k_l^T) in the input dtype. n_pad must be a multiple of m.
    """
    return _fwd_call(q, k, m)


def _vjp_fwd(q, k, m):
    return _fwd_call(q, k, m), (q, k)


def _vjp_bwd(m, res, gs):
    q, k = res
    gql, gkl, ga2 = gs
    dq, dk = _bwd_call(
        q, k, m,
        gql.astype(q.dtype), gkl.astype(k.dtype), ga2.astype(q.dtype),
    )
    return dq, dk


landmark_softmax.defvjp(_vjp_fwd, _vjp_bwd)
