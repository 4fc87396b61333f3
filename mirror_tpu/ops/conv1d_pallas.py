"""Depthwise 1-D convolution along the sequence axis as a BANDED MATMUL on
the MXU (Pallas TPU kernel, custom VJP).

The Nystrom residual value-conv (one K=33 kernel per head over [b, h, n, d],
ref nystrom_attention res_conv; models/mirror.py:299-309 sets residual=True)
costs 48.8 ms/step at B=64 when XLA lowers it as a depthwise convolution —
depthwise convs are VPU-bound shifted multiply-adds, and the backward
kernel-gradient pass is worse. But a depthwise conv along a sequence is
exactly ``Band @ v`` where Band[i, i+j] = kern[j]: materializing the band as
[R, R+K-1] tiles in VMEM turns every pass — forward, dv (flipped band), and
the kernel gradient (near-diagonal sums of g @ v^T tiles) — into dense MXU
matmuls.

Each (batch, head) program holds its full padded sequence in VMEM (~0.5 MB
at production shapes) and tiles the band matmul internally, so there are no
overlapping (halo) block specs.

Layout: v [b, h, n, d] head-major (matching the attention kernels), kern
[h, K], K odd. Zero 'SAME' padding, no bias — the reference conv's exact
semantics (torch Conv2d(h, h, (K,1), padding=(K//2,0), groups=h, bias=False)).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_TILE = 384  # divides the Nystrom padded lengths (2688, 2304)


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _band_tiles_xla(kern, rows, K, flip, dtype):
    """[h, rows, rows + K - 1] band tiles with Band[h, i, i + j] = kern[h, j]
    (flipped for the transpose conv of the backward pass). Built ONCE in XLA
    per call and streamed to the kernel as an input instead of K=33
    masked-select passes per (batch, head) program — measured speed-neutral
    at production shapes (the in-kernel build overlapped with DMA), kept for
    the simpler kernel body."""
    cols = rows + K - 1
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
    j = c - r  # [rows, cols], tap index at each position
    kf = kern.astype(jnp.float32)
    if flip:
        kf = kf[:, ::-1]
    taps = jnp.pad(kf, ((0, 0), (0, 1)))  # slot K holds 0 for off-band
    j_idx = jnp.where((j >= 0) & (j < K), j, K)
    return jnp.take(taps, j_idx, axis=1).astype(dtype)  # [h, rows, cols]


def _banded_matmul(v_ref, o_ref, band, n_tiles, K):
    """o[i] = sum_j band[0, j] pattern applied tile-wise: for each row tile,
    read the haloed [R + K - 1, d] window from VMEM and hit the MXU."""
    for t in range(n_tiles):
        win = v_ref[0, 0, pl.dslice(t * ROW_TILE, ROW_TILE + K - 1), :]
        o_ref[0, 0, pl.dslice(t * ROW_TILE, ROW_TILE), :] = jax.lax.dot(
            band, win, preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)


def _fwd_kernel(K: int, n_tiles: int, v_ref, band_ref, o_ref):
    _banded_matmul(v_ref, o_ref, band_ref[0, :, :], n_tiles, K)


def _dv_kernel(K: int, n_tiles: int, g_ref, band_ref, dv_ref):
    _banded_matmul(g_ref, dv_ref, band_ref[0, :, :], n_tiles, K)


def _dkern_kernel(K: int, n_tiles: int, g_ref, v_ref, dk_ref, acc_ref):
    """dkern[h, j] = sum_{b, i, d} g[b,h,i,d] * vpad[b,h,i+j,d], computed as
    K direct shifted inner products <g, vpad[j:j+n]> over the full VMEM
    sequence (pure VPU multiply-reduce; cheaper than materializing
    g @ vpad^T and mask-summing its diagonals). Accumulated over b; grid is
    (h, b) so all steps for one head are consecutive (the output block stays
    resident)."""
    bi = pl.program_id(1)

    @pl.when(bi == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    n_rows = n_tiles * ROW_TILE
    lane = jax.lax.iota(jnp.int32, 128)
    g = g_ref[0, 0, :, :].astype(jnp.float32)
    row = jnp.zeros((128,), jnp.float32)
    for jj in range(K):
        win = v_ref[0, 0, pl.dslice(jj, n_rows), :].astype(jnp.float32)
        tap = jnp.sum(g * win)
        row = row + jnp.where(lane == jj, tap, 0.0)
    acc_ref[0, :] = acc_ref[0, :] + row
    dk_ref[0, :, :] = jnp.broadcast_to(acc_ref[0, :][None, :], (8, 128))


def _pad_seq(x, K, n_tiles):
    """SAME zero pad + round the sequence up to the tiled length + halo."""
    b, h, n, d = x.shape
    half = (K - 1) // 2
    total = n_tiles * ROW_TILE + K - 1
    return jnp.pad(x, ((0, 0), (0, 0), (half, total - n - half), (0, 0)))


def _specs(n_padded, d):
    full = pl.BlockSpec(
        (1, 1, n_padded, d), lambda bi, hi: (bi, hi, 0, 0),
        memory_space=pltpu.VMEM,
    )
    kern_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return full, kern_spec


def _fwd_call(v, kern):
    b, h, n, d = v.shape
    K = kern.shape[1]
    n_tiles = -(-n // ROW_TILE)
    vp = _pad_seq(v, K, n_tiles)
    full_in, _ = _specs(vp.shape[2], d)
    out_spec = pl.BlockSpec(
        (1, 1, n_tiles * ROW_TILE, d), lambda bi, hi: (bi, hi, 0, 0),
        memory_space=pltpu.VMEM,
    )
    bands = _band_tiles_xla(kern, ROW_TILE, K, flip=False, dtype=v.dtype)
    band_spec = pl.BlockSpec(
        (1, ROW_TILE, ROW_TILE + K - 1), lambda bi, hi: (hi, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, K, n_tiles),
        out_shape=jax.ShapeDtypeStruct((b, h, n_tiles * ROW_TILE, d), v.dtype),
        grid=(b, h),
        in_specs=[full_in, band_spec],
        out_specs=out_spec,
        interpret=_use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * n_tiles * ROW_TILE * (ROW_TILE + K - 1) * d,
            bytes_accessed=2 * v.size * v.dtype.itemsize,
            transcendentals=0,
        ),
    )(vp, bands)
    return out[:, :, :n, :] if n_tiles * ROW_TILE != n else out


def _bwd_call(v, kern, g):
    b, h, n, d = v.shape
    K = kern.shape[1]
    n_tiles = -(-n // ROW_TILE)
    gp = _pad_seq(g, K, n_tiles)
    full_in, _ = _specs(gp.shape[2], d)
    out_spec = pl.BlockSpec(
        (1, 1, n_tiles * ROW_TILE, d), lambda bi, hi: (bi, hi, 0, 0),
        memory_space=pltpu.VMEM,
    )
    bands_f = _band_tiles_xla(kern, ROW_TILE, K, flip=True, dtype=g.dtype)
    band_spec = pl.BlockSpec(
        (1, ROW_TILE, ROW_TILE + K - 1), lambda bi, hi: (hi, 0, 0),
        memory_space=pltpu.VMEM,
    )
    dv = pl.pallas_call(
        functools.partial(_dv_kernel, K, n_tiles),
        out_shape=jax.ShapeDtypeStruct((b, h, n_tiles * ROW_TILE, d), v.dtype),
        grid=(b, h),
        in_specs=[full_in, band_spec],
        out_specs=out_spec,
        interpret=_use_interpret(),
    )(gp, bands_f)
    dv = dv[:, :, :n, :] if n_tiles * ROW_TILE != n else dv

    # dkern: grid (h, b) so each head's accumulation is consecutive
    vp = _pad_seq(v, K, n_tiles)
    g_flat = (
        jnp.pad(g, ((0, 0), (0, 0), (0, n_tiles * ROW_TILE - n), (0, 0)))
        if n_tiles * ROW_TILE != n
        else g
    )
    g_spec = pl.BlockSpec(
        (1, 1, n_tiles * ROW_TILE, d), lambda hi, bi: (bi, hi, 0, 0),
        memory_space=pltpu.VMEM,
    )
    v_spec = pl.BlockSpec(
        (1, 1, vp.shape[2], d), lambda hi, bi: (bi, hi, 0, 0),
        memory_space=pltpu.VMEM,
    )
    # (1, 8, 128) blocks keep the out spec (8,128)-tiling-legal; only
    # sublane 0 carries data
    dk_spec = pl.BlockSpec((1, 8, 128), lambda hi, bi: (hi, 0, 0),
                           memory_space=pltpu.VMEM)
    dk = pl.pallas_call(
        functools.partial(_dkern_kernel, K, n_tiles),
        out_shape=jax.ShapeDtypeStruct((h, 8, 128), jnp.float32),
        grid=(h, b),
        in_specs=[g_spec, v_spec],
        out_specs=dk_spec,
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
        interpret=_use_interpret(),
    )(g_flat, vp)
    return dv, dk[:, 0, :K].astype(kern.dtype)


@jax.custom_vjp
def depthwise_conv1d_seq(v, kern):
    """SAME zero-padded depthwise conv along axis 2: out[..., i, :] =
    sum_j kern[h, j] * v[..., i + j - K//2, :]. v: [b, h, n, d]; kern: [h, K]
    (K odd)."""
    return _fwd_call(v, kern)


def _vjp_fwd(v, kern):
    return _fwd_call(v, kern), (v, kern)


def _vjp_bwd(res, g):
    v, kern = res
    dv, dk = _bwd_call(v, kern, g.astype(v.dtype))
    return dv, dk


depthwise_conv1d_seq.defvjp(_vjp_fwd, _vjp_bwd)
