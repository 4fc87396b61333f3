"""Depthwise 1-D convolution along the sequence axis as a BANDED MATMUL on
the MXU (Pallas TPU kernel, custom VJP).

The Nystrom residual value-conv (one K=33 kernel per head over [b, h, n, d],
ref nystrom_attention res_conv; models/mirror.py:299-309 sets residual=True)
costs 48.8 ms/step at B=64 when XLA lowers it as a depthwise convolution —
depthwise convs are VPU-bound shifted multiply-adds, and the backward
kernel-gradient pass is worse. But a depthwise conv along a sequence is
exactly ``Band @ v`` where Band[i, i+j] = kern[j]: materializing the band as
[R, R+K-1] tiles in VMEM turns the forward and the dv pass (flipped band)
into dense MXU matmuls.

This op is HBM-bound, not MXU-bound (33-tap conv at [64, 8, 2304, 96] bf16
is ~0.5 ms of MXU work on 455 MB of traffic; this host's tunnel chip
measured only ~120-270 GB/s effective HBM bandwidth, scripts/exp_hbm_floor),
so the design minimizes PASSES over the data:

- each program holds a GROUP of gb batch items' full sequences in VMEM and
  builds every haloed window with static slices + zero-pad edges in-kernel,
  so there is NO XLA pre-pad pass (2.4 ms/pass measured) and no overlapping
  block specs;
- the backward runs dv AND dkern in ONE kernel that reads g and v once
  (separate kernels re-read g: 4 passes -> 3);
- the band is built gather-free with a skew reshape (a jnp.take gather here
  measured 1.5 ms/call, scalar-core bound);
- grouping batch items widens the matmul RHS to [R + K - 1, gb * d] (the
  windows of all gb items concatenated along d), cutting the grid from
  b*h programs of [384, 416] @ [416, 96] slivers to (b/gb)*h programs of
  [384, 416] @ [416, 768] MXU matmuls.

Layout: v [b, h, n, d] head-major (matching the attention kernels), kern
[h, K], K odd, any n >= 1 (taps with no overlap are skipped — tiny slides
with n <= K//2 work). Zero 'SAME' padding, no bias — the reference conv's
exact semantics (torch Conv2d(h, h, (K,1), padding=(K//2,0), groups=h,
bias=False)).
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

ROW_TILE = 384  # divides the Nystrom padded lengths (2688, 2304)


def _batch_group(b: int) -> int:
    """Largest batch-group size that divides b."""
    for g in (8, 4, 2):
        if b % g == 0:
            return g
    return 1


def _band_tiles_xla(kern, rows, K, flip, dtype):
    """[h, rows, rows + K - 1] band tiles with Band[h, i, i + j] = kern[h, j]
    (flipped for the transpose conv of the backward pass).

    Built with the skew-reshape trick instead of a gather: broadcast the taps
    to [h, rows, K], pad each row to cols + 1, and flatten — element
    [r, r + j] of the [rows, cols] view lands on flat index
    r * (cols + 1) + j, i.e. padded-row r, slot j. Everything off-band hits
    the zero padding: j' in [K, cols] for c > r + K - 1, and the c < r
    wraparound lands at j' = cols + 1 + (c - r) >= K since
    c - r >= -(rows - 1) and cols = rows + K - 1."""
    cols = rows + K - 1
    kf = kern.astype(jnp.float32)
    if flip:
        kf = kf[:, ::-1]
    h = kf.shape[0]
    a = jnp.broadcast_to(kf[:, None, :], (h, rows, K))
    a = jnp.pad(a, ((0, 0), (0, 0), (0, cols + 1 - K)))
    flat = a.reshape(h, rows * (cols + 1))
    return flat[:, : rows * cols].reshape(h, rows, cols).astype(dtype)


def _tile_rows(n):
    """Static (start, rows) for each row tile; the last tile may be short."""
    tiles = []
    s = 0
    while s < n:
        tiles.append((s, min(ROW_TILE, n - s)))
        s += ROW_TILE
    return tiles


def _window(x_ref, g, s0, rows, K, n):
    """The zero-padded haloed window [rows + K - 1, d] for output rows
    [s0, s0 + rows): source rows [s0 - half, s0 + rows + half) clamped to
    [0, n), edges zero-padded in-register (no XLA pre-pad pass)."""
    half = (K - 1) // 2
    top = max(0, half - s0)
    bot = max(0, s0 + rows + half - n)
    start = s0 - half + top
    length = rows + K - 1 - top - bot
    core = x_ref[g, 0, pl.dslice(start, length), :]
    if top or bot:
        core = jnp.pad(core, ((top, bot), (0, 0)))
    return core


def _banded_kernel(K: int, n: int, gb: int, d: int, x_ref, band_ref, o_ref):
    """o = Band @ x tile-wise over a group of gb batch items: concatenate
    every item's window along d and hit the MXU once per row tile with a
    [rows, rows + K - 1] @ [rows + K - 1, gb * d] dot (the band is shared
    across the group — it depends only on the head)."""
    band = band_ref[0, :, :]
    for s0, rows in _tile_rows(n):
        win = jnp.concatenate(
            [_window(x_ref, g, s0, rows, K, n) for g in range(gb)], axis=1
        )
        out = jax.lax.dot(
            band[:rows, : rows + K - 1], win,
            preferred_element_type=jnp.float32,
        )
        for g in range(gb):
            o_ref[g, 0, pl.dslice(s0, rows), :] = out[
                :, g * d:(g + 1) * d
            ].astype(o_ref.dtype)


def _dkern_tap_row(K: int, n: int, g32, v):
    """dkern tap gradients as one 128-lane row (lane j holds tap j):
    dkern[j] = sum_i g[i] . v[i + j - K//2], overlap-sliced at the edges.
    Taps with no g/v overlap (n <= |offset|) are exactly zero — skipping
    them also avoids negative-size slices at trace time when n <= K//2."""
    half = (K - 1) // 2
    lane = jax.lax.iota(jnp.int32, 128)
    row = jnp.zeros((128,), jnp.float32)
    for jj in range(K):
        off = jj - half  # v index = i + off
        if abs(off) >= n:
            continue
        if off >= 0:
            ga = g32[: n - off, :]
            va = v[off:, :]
        else:
            ga = g32[-off:, :]
            va = v[: n + off, :]
        tap = jnp.sum(ga * va.astype(jnp.float32))
        row = row + jnp.where(lane == jj, tap, 0.0)
    return row


def _bwd_kernel(K: int, n: int, gb: int, d: int, g_ref, v_ref, band_ref,
                dv_ref, dk_ref, acc_ref):
    """Fused backward: dv = flipped-Band @ g (banded MXU matmul) and
    dkern[h, j] = sum_{b, i, d} g[b,h,i,d] * v[b,h,i+j-K//2,d] (K direct
    shifted inner products, VPU multiply-reduce) in one kernel so g and v
    stream from HBM once. Grid is (h, b/gb) so each head's dkern
    accumulator block stays resident across the batch groups."""
    bgi = pl.program_id(1)

    @pl.when(bgi == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    _banded_kernel(K, n, gb, d, g_ref, band_ref, dv_ref)

    # concatenate the group along lanes ONCE so the tap loop is K ops over
    # [n, gb*d] instead of gb*K ops (a gb*K-unrolled body exploded Mosaic
    # compile time past 12 min at gb=8, K=33)
    g_all = jnp.concatenate(
        [g_ref[g, 0, :, :] for g in range(gb)], axis=1
    ).astype(jnp.float32)
    v_all = jnp.concatenate([v_ref[g, 0, :, :] for g in range(gb)], axis=1)
    acc_ref[0, :] = acc_ref[0, :] + _dkern_tap_row(K, n, g_all, v_all)
    dk_ref[0, :, :] = jnp.broadcast_to(acc_ref[0, :][None, :], (8, 128))


def _fwd_call(v, kern):
    b, h, n, d = v.shape
    K = kern.shape[1]
    gb = _batch_group(b)
    seq_spec = pl.BlockSpec(
        (gb, 1, n, d), lambda bgi, hi: (bgi, hi, 0, 0),
        memory_space=pltpu.VMEM,
    )
    bands = _band_tiles_xla(kern, ROW_TILE, K, flip=False, dtype=v.dtype)
    band_spec = pl.BlockSpec(
        (1, ROW_TILE, ROW_TILE + K - 1), lambda bgi, hi: (hi, 0, 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        functools.partial(_banded_kernel, K, n, gb, d),
        out_shape=jax.ShapeDtypeStruct((b, h, n, d), v.dtype),
        grid=(b // gb, h),
        in_specs=[seq_spec, band_spec],
        out_specs=seq_spec,
        interpret=_use_interpret(),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT_WIDE),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * n * (ROW_TILE + K - 1) * d,
            bytes_accessed=2 * v.size * v.dtype.itemsize,
            transcendentals=0,
        ),
    )(v, bands)


def _bwd_call(v, kern, g):
    b, h, n, d = v.shape
    K = kern.shape[1]
    gb = _batch_group(b)
    seq_spec = pl.BlockSpec(
        (gb, 1, n, d), lambda hi, bgi: (bgi, hi, 0, 0),
        memory_space=pltpu.VMEM,
    )
    bands_f = _band_tiles_xla(kern, ROW_TILE, K, flip=True, dtype=g.dtype)
    band_spec = pl.BlockSpec(
        (1, ROW_TILE, ROW_TILE + K - 1), lambda hi, bgi: (hi, 0, 0),
        memory_space=pltpu.VMEM,
    )
    # (1, 8, 128) blocks keep the dk out spec (8,128)-tiling-legal; only
    # sublane 0 carries data
    dk_spec = pl.BlockSpec((1, 8, 128), lambda hi, bgi: (hi, 0, 0),
                           memory_space=pltpu.VMEM)
    dv, dk = pl.pallas_call(
        functools.partial(_bwd_kernel, K, n, gb, d),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, n, d), v.dtype),
            jax.ShapeDtypeStruct((h, 8, 128), jnp.float32),
        ),
        grid=(h, b // gb),
        in_specs=[seq_spec, seq_spec, band_spec],
        out_specs=(seq_spec, dk_spec),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
        interpret=_use_interpret(),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT_WIDE),
    )(g, v, bands_f)
    return dv, dk[:, 0, :K].astype(kern.dtype)


@jax.custom_vjp
def _depthwise_conv1d_seq(v, kern):
    return _fwd_call(v, kern)


def _vjp_fwd(v, kern):
    return _fwd_call(v, kern), (v, kern)


def _vjp_bwd(res, g):
    v, kern = res
    dv, dk = _bwd_call(v, kern, g.astype(v.dtype))
    return dv, dk


_depthwise_conv1d_seq.defvjp(_vjp_fwd, _vjp_bwd)


def depthwise_conv1d_seq(v, kern):
    """SAME zero-padded depthwise conv along axis 2: out[..., i, :] =
    sum_j kern[h, j] * v[..., i + j - K//2, :]. v: [b, h, n, d]; kern: [h, K]
    (K odd, any n >= 1).

    On a multi-device mesh the kernel runs shard_mapped over the batch with
    the taps replicated (ops/_common.spmd_wrap)."""
    return _spmd_wrap(_depthwise_conv1d_seq, v, kern, replicated=(1,))
