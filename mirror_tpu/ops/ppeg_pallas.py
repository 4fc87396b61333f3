"""PPEG's merged 7x7 depthwise conv + identity + bias as ONE Pallas pass
per direction (custom VJP).

PPEG (ref models/mirror.py:317-331) sums three SAME-centered depthwise
convs with the identity; models/transmil.py merges the pyramid into one
7x7 kernel (conv is linear in the kernel), so the whole module body is
``out = img + b_eff + dwconv7x7(img, k_eff)``. XLA lowers the depthwise
conv as VPU shifted multiply-adds with separate passes for the conv, the
adds, and (backward) the kernel/bias gradients; on this chip HBM passes
are the dominant cost (~120-270 GB/s effective, BASELINE.md HBM-floor
memo), so this kernel does each direction in a single pass:

- forward: read img once, write ``img + b + sum_t k[t] * shift_t(img)``;
  the 49 tap windows are static slices of an in-VMEM zero-padded copy;
- backward: read g and img once, emit dimg (= g + flipped-tap conv of g,
  the identity path riding along), dk [49, C] (per-tap spatial
  correlations) and db [C] — three gradients, one pass, with dk/db
  accumulated across the sequential batch grid in resident blocks.

Layout: img [b, H, W, C] NHWC (C rides the lanes; W is the sublane dim,
so the dx in 0..6 tap slices are sublane shifts). Depthwise conv is
channel-independent, so the grid blocks over (channel-block, batch): one
[1, H, W, CBLK] tile per program. At production shape (46x46x768 fp32
accumulation, 49 unrolled taps) a full-C program needs >76M of scoped
VMEM (Mosaic keeps several tap temporaries live) vs the 64M limit;
CBLK<=256 keeps every buffer under ~2.3M. Batch is the innermost
(fastest) grid dim so the dk/db scratch accumulators sweep each channel
block's batch contiguously. 49 unrolled tap FMAs per body keeps Mosaic
compile time sane (the conv1d kernel's 264-op body blew past 12 min)."""

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

K = 7  # merged pyramid kernel size (7x7 holds 7/5/3)


def _cblk(C: int) -> int:
    """Largest channel tile <=256 that divides C (lane-aligned when C is)."""
    for cand in (256, 128):
        if C % cand == 0:
            return cand
    return C


def _fwd_kernel(H: int, W: int, img_ref, k_ref, b_ref, o_ref):
    img = img_ref[0]  # [H, W, C]
    pad = jnp.pad(img, ((K // 2, K // 2), (K // 2, K // 2), (0, 0)))
    acc = img.astype(jnp.float32) + b_ref[0, :][None, None, :]
    for dy in range(K):
        for dx in range(K):
            tap = k_ref[dy * K + dx, :].astype(jnp.float32)
            win = pad[dy:dy + H, dx:dx + W, :].astype(jnp.float32)
            acc = acc + win * tap[None, None, :]
    o_ref[0] = acc.astype(o_ref.dtype)


def _bwd_kernel(H: int, W: int, g_ref, img_ref, kf_ref, dimg_ref, dk_ref,
                db_ref, dk_acc, db_acc):
    bi = pl.program_id(1)  # batch is the innermost (fastest) grid dim

    @pl.when(bi == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        db_acc[...] = jnp.zeros_like(db_acc)

    g = g_ref[0].astype(jnp.float32)  # [H, W, C]
    g_pad = jnp.pad(g, ((K // 2, K // 2), (K // 2, K // 2), (0, 0)))
    # dimg = g (identity path) + conv of g with the flipped taps
    acc = g
    for dy in range(K):
        for dx in range(K):
            tap = kf_ref[dy * K + dx, :].astype(jnp.float32)
            acc = acc + g_pad[dy:dy + H, dx:dx + W, :] * tap[None, None, :]
    dimg_ref[0] = acc.astype(dimg_ref.dtype)

    # dk[t] = sum_{y,x} g[y,x,:] * img_pad[y+dy, x+dx, :]; db = sum g
    img = img_ref[0]
    img_pad = jnp.pad(img, ((K // 2, K // 2), (K // 2, K // 2), (0, 0)))
    row = jax.lax.broadcasted_iota(jnp.int32, (K * K + 7, 1), 0)
    dk = jnp.zeros(dk_acc.shape, dk_acc.dtype)
    for dy in range(K):
        for dx in range(K):
            win = img_pad[dy:dy + H, dx:dx + W, :].astype(jnp.float32)
            s = jnp.sum(g * win, axis=(0, 1))  # [C]
            dk = dk + jnp.where(row == dy * K + dx, s[None, :], 0.0)
    dk_acc[...] = dk_acc[...] + dk
    dk_ref[...] = dk_acc[...]
    db_acc[0, :] = db_acc[0, :] + jnp.sum(g, axis=(0, 1))
    db_ref[...] = jnp.broadcast_to(db_acc[0, :][None, :], db_ref.shape)


def _fwd_call(img, kern, bias):
    b, H, W, C = img.shape
    cb = _cblk(C)
    img_spec = pl.BlockSpec((1, H, W, cb), lambda ci, bi: (bi, 0, 0, ci),
                            memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec((K * K + 7, cb), lambda ci, bi: (0, ci),
                          memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((8, cb), lambda ci, bi: (0, ci),
                          memory_space=pltpu.VMEM)
    k_pad = jnp.pad(kern.reshape(K * K, C), ((0, 7), (0, 0)))
    b_pad = jnp.broadcast_to(bias[None, :], (8, C))
    return pl.pallas_call(
        functools.partial(_fwd_kernel, H, W),
        out_shape=jax.ShapeDtypeStruct(img.shape, img.dtype),
        grid=(C // cb, b),
        in_specs=[img_spec, k_spec, b_spec],
        out_specs=img_spec,
        interpret=_use_interpret(),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT_WIDE),
    )(img, k_pad, b_pad)


def _bwd_call(img, kern, g):
    b, H, W, C = img.shape
    cb = _cblk(C)
    seq_spec = pl.BlockSpec((1, H, W, cb), lambda ci, bi: (bi, 0, 0, ci),
                            memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec((K * K + 7, cb), lambda ci, bi: (0, ci),
                          memory_space=pltpu.VMEM)
    dk_spec = pl.BlockSpec((K * K + 7, cb), lambda ci, bi: (0, ci),
                           memory_space=pltpu.VMEM)
    db_spec = pl.BlockSpec((8, cb), lambda ci, bi: (0, ci),
                           memory_space=pltpu.VMEM)
    kf = kern[::-1, ::-1, :].reshape(K * K, C)
    kf_pad = jnp.pad(kf, ((0, 7), (0, 0)))
    dimg, dk, db = pl.pallas_call(
        functools.partial(_bwd_kernel, H, W),
        out_shape=(
            jax.ShapeDtypeStruct(img.shape, img.dtype),
            jax.ShapeDtypeStruct((K * K + 7, C), jnp.float32),
            jax.ShapeDtypeStruct((8, C), jnp.float32),
        ),
        grid=(C // cb, b),
        in_specs=[seq_spec, seq_spec, k_spec],
        out_specs=(seq_spec, dk_spec, db_spec),
        scratch_shapes=[
            pltpu.VMEM((K * K + 7, cb), jnp.float32),
            pltpu.VMEM((8, cb), jnp.float32),
        ],
        interpret=_use_interpret(),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT_WIDE),
    )(g, img, kf_pad)
    return dimg, dk[:K * K].reshape(K, K, C).astype(kern.dtype), \
        db[0].astype(kern.dtype)


@jax.custom_vjp
def _ppeg_fused(img, kern, bias):
    return _fwd_call(img, kern, bias)


def _vjp_fwd(img, kern, bias):
    # bias rides the residuals ([C], negligible) so db can match ITS dtype:
    # tying db to kern.dtype breaks the custom_vjp aval contract whenever
    # the two primals differ (e.g. bf16 taps with an fp32 bias)
    return _fwd_call(img, kern, bias), (img, kern, bias)


def _vjp_bwd(res, g):
    img, kern, bias = res
    dimg, dk, db = _bwd_call(img, kern, g.astype(img.dtype))
    return dimg, dk, db.astype(bias.dtype)


_ppeg_fused.defvjp(_vjp_fwd, _vjp_bwd)


def ppeg_fused(img, kern, bias):
    """out = img + bias + SAME depthwise 7x7 conv of img with per-channel
    taps. img [b, H, W, C]; kern [7, 7, C]; bias [C].

    On a multi-device mesh the kernel runs shard_mapped over the batch with
    the taps/bias replicated (ops/_common.spmd_wrap — Mosaic custom calls
    cannot be GSPMD-partitioned); dkern/dbias psum across shards via the
    shard_map transpose of the replicated in_spec."""
    return _spmd_wrap(_ppeg_fused, img, kern, bias, replicated=(1, 2))
