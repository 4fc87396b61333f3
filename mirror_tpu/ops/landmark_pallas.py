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

from mirror_tpu.ops._common import spmd_wrap as _spmd_wrap, use_interpret as _use_interpret


def _group_matrix(m, l, dtype, pad=0):
    """[m, m*l - pad] 0/1 matrix G with G[g, i] = 1 when real row i lands in
    group g of the FRONT-PADDED sequence: (i + pad) // l == g. The Nystrom
    front pad is all-zero rows, so dropping their columns leaves the group
    sums unchanged while the divisor stays 1/l — the means are exactly the
    padded means without ever materializing the padded stream (the jnp.pad
    round trip was ~2 full-stream HBM passes per layer).

    Group means run on the MXU as (G @ x) * (1/l) instead of a
    reshape-[m, l, dh]-sum: l=6 rows per group straddle the 8-row sublane
    tiles, so Mosaic lowered the reshape-sum (and the broadcast-back in the
    backward) as strided sublane relayouts — ~30% of kernel time at
    production shapes. The ones matrix is exact in bf16 and the dot
    accumulates fp32, so the math is unchanged (scale by 1/l stays fp32).
    Built once in XLA per call site and kept VMEM-resident across the grid
    (constant index_map).
    """
    n = m * l - pad
    rows = jax.lax.broadcasted_iota(jnp.int32, (m, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (m, n), 1)
    return jnp.where(((cols + pad) // l) == rows, 1.0, 0.0).astype(dtype)


def _group_mean_mxu(x, g_mat, l):
    s = jax.lax.dot(g_mat, x, preferred_element_type=jnp.float32)
    return (s * (1.0 / l)).astype(x.dtype)


def _fwd_kernel(m: int, l: int, q_ref, k_ref, g_ref, ql_ref, kl_ref, a2_ref):
    g_mat = g_ref[:, :]
    q_l = _group_mean_mxu(q_ref[0, 0, :, :], g_mat, l)
    k_l = _group_mean_mxu(k_ref[0, 0, :, :], g_mat, l)
    ql_ref[0, 0, :, :] = q_l
    kl_ref[0, 0, :, :] = k_l
    sim = jax.lax.dot_general(
        q_l, k_l, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    a2_ref[0, 0, :, :] = jax.nn.softmax(sim, axis=-1).astype(a2_ref.dtype)


def _bwd_kernel(
    m: int, l: int,
    q_ref, k_ref, gql_ref, gkl_ref, ga2_ref, g_ref,
    dq_ref, dk_ref,
):
    g_mat = g_ref[:, :]
    q_l = _group_mean_mxu(q_ref[0, 0, :, :], g_mat, l)
    k_l = _group_mean_mxu(k_ref[0, 0, :, :], g_mat, l)
    sim = jax.lax.dot_general(
        q_l, k_l, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    p = jax.nn.softmax(sim, axis=-1)  # sim is f32 from the dot above
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
    # mean backward: broadcast / l over each group == G^T @ (d_l / l),
    # another MXU dot instead of a strided sublane broadcast
    dql_s = (dq_l * (1.0 / l)).astype(dq_ref.dtype)
    dkl_s = (dk_l * (1.0 / l)).astype(dk_ref.dtype)
    dq_ref[0, 0, :, :] = jax.lax.dot_general(
        g_mat, dql_s, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dq_ref.dtype)
    dk_ref[0, 0, :, :] = jax.lax.dot_general(
        g_mat, dkl_s, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dk_ref.dtype)


def _specs(n, m, dh):
    seq = pl.BlockSpec((1, 1, n, dh), lambda bi, hi: (bi, hi, 0, 0),
                       memory_space=pltpu.VMEM)
    lm = pl.BlockSpec((1, 1, m, dh), lambda bi, hi: (bi, hi, 0, 0),
                      memory_space=pltpu.VMEM)
    a2 = pl.BlockSpec((1, 1, m, m), lambda bi, hi: (bi, hi, 0, 0),
                      memory_space=pltpu.VMEM)
    gm = pl.BlockSpec((m, n), lambda bi, hi: (0, 0),
                      memory_space=pltpu.VMEM)
    return seq, lm, a2, gm


def _fwd_call(q, k, m, pad):
    b, h, n, dh = q.shape
    l = (n + pad) // m
    seq, lm, a2, gm = _specs(n, m, dh)
    g_mat = _group_matrix(m, l, q.dtype, pad)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, m, l),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, m, dh), q.dtype),
            jax.ShapeDtypeStruct((b, h, m, dh), q.dtype),
            jax.ShapeDtypeStruct((b, h, m, m), q.dtype),
        ),
        grid=(b, h),
        in_specs=[seq, seq, gm],
        out_specs=(lm, lm, a2),
        interpret=_use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * m * m * dh + 4 * b * h * n * dh,
            bytes_accessed=2 * (q.size + k.size) * q.dtype.itemsize,
            transcendentals=b * h * m * m,
        ),
    )(q, k, g_mat)


def _bwd_call(q, k, m, pad, gql, gkl, ga2):
    b, h, n, dh = q.shape
    l = (n + pad) // m
    seq, lm, a2, gm = _specs(n, m, dh)
    g_mat = _group_matrix(m, l, q.dtype, pad)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, m, l),
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k.shape, k.dtype),
        ),
        grid=(b, h),
        in_specs=[seq, seq, lm, lm, a2, gm],
        out_specs=(seq, seq),
        interpret=_use_interpret(),
    )(q, k, gql, gkl, ga2, g_mat)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _landmark_softmax(q, k, m, pad=0):
    return _fwd_call(q, k, m, pad)


def _vjp_fwd(q, k, m, pad):
    return _fwd_call(q, k, m, pad), (q, k)


def _vjp_bwd(m, pad, res, gs):
    q, k = res
    gql, gkl, ga2 = gs
    dq, dk = _bwd_call(
        q, k, m, pad,
        gql.astype(q.dtype), gkl.astype(k.dtype), ga2.astype(q.dtype),
    )
    return dq, dk


_landmark_softmax.defvjp(_vjp_fwd, _vjp_bwd)


def landmark_softmax(q, k, m, pad=0):
    """(q_l, k_l, attn2) from head-major q, k [b, h, n, dh].

    q_l/k_l: contiguous-group means over the virtually FRONT-PADDED
    sequence of length n + pad (the pad rows are implicit zeros; the
    divisor stays the group size l = (n + pad) // m), so the result equals
    the reference's pad-then-mean without materializing the pad.
    attn2 = softmax(q_l @ k_l^T) in the input dtype. n + pad must be a
    multiple of m.

    On a multi-device mesh the kernel runs shard_mapped over the batch
    (ops/_common.spmd_wrap — Mosaic custom calls cannot be GSPMD-
    partitioned).
    """
    return _spmd_wrap(lambda q, k: _landmark_softmax(q, k, m, pad), q, k)
