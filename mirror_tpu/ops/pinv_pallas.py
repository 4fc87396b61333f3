"""Fused Moore-Penrose pseudo-inverse Pallas TPU kernel.

The Nystrom attention's 6-iteration pinv of the [b, h, m, m] landmark
attention matrix is 45% of the flagship train step when left to XLA
(measured: scripts/ablate_step.py, 214.6 of 480 ms/step at B=64): every
iteration materializes several [64, 8, 384, 384] intermediates in HBM, and
``jax.checkpoint`` re-runs the whole forward for the backward pass.

Here one (batch, head) program runs all 6 iterations with every intermediate
in VMEM (x, z and two temporaries: ~1.2 MB bf16), and a custom VJP replays
the iterations in-kernel for the backward sweep — z_t saved in a VMEM
scratch stack, everything else recomputed per iteration. HBM traffic drops
from ~24 tensors/iteration-chain to exactly one read of x and one write of z
(plus gx/partial-gs on the backward).

Numerics mirror models/nystrom.py::moore_penrose_pinv exactly (same
iteration z <- 0.25 z (13I - xz(15I - xz(7I - xz))), same bf16 matmuls with
fp32 MXU accumulation, same GLOBAL-max z0 scaling quirk of the reference
package — the global scalar is computed in XLA and passed in, so its
gradient path is identical to torch autograd's through max()).
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


def _dot(a, b):
    """Matmul in the operand dtype with fp32 MXU accumulation, result cast
    back to the operand dtype — the same numerics as jnp's a @ b on bf16."""
    return jax.lax.dot(a, b, preferred_element_type=jnp.float32).astype(a.dtype)


def _dot_nt(a, b):
    """a @ b.T without materializing the transpose (MXU-native)."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(a.dtype)


def _dot_tn(a, b):
    """a.T @ b without materializing the transpose (MXU-native)."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(a.dtype)


def _iter_body(x, z, eye):
    xz = _dot(x, z)
    t1 = 7.0 * eye - xz
    t3 = 15.0 * eye - _dot(xz, t1)
    a = 13.0 * eye - _dot(xz, t3)
    return (0.25 * _dot(z, a)).astype(z.dtype)


def _fwd_kernel(iters: int, x_ref, s_ref, z_ref):
    x = x_ref[0, 0, :, :]
    s = s_ref[0]
    m = x.shape[-1]
    eye = jnp.eye(m, dtype=x.dtype)
    z = (x.T / s).astype(x.dtype)
    for _ in range(iters):
        z = _iter_body(x, z, eye)
    z_ref[0, 0, :, :] = z


def _bwd_kernel(iters: int, x_ref, s_ref, g_ref, gx_ref, gs_ref, zs_ref):
    """Replay the forward storing z_t in VMEM scratch, then reverse-sweep.

    Per-iteration forward: B = x z; t1 = 7I - B; t2 = B t1; t3 = 15I - t2;
    t4 = B t3; A = 13I - t4; z' = 0.25 z A. Reverse (g = dL/dz'):
      gA   = 0.25 z^T g          gz  = 0.25 g A^T
      gt4  = -gA                 gB  = gt4 t3^T ; gt3 = B^T gt4
      gt2  = -gt3                gB += gt2 t1^T ; gt1 = B^T gt2
      gB  += -gt1
      gx  += gB z^T              gz += x^T gB
    z0 = x^T / s:  gx += gz0^T / s ;  gs = -sum(gz0 * z0) / s.
    """
    x = x_ref[0, 0, :, :]
    s = s_ref[0]
    g = g_ref[0, 0, :, :]
    m = x.shape[-1]
    eye = jnp.eye(m, dtype=x.dtype)

    # replay the forward, stashing z_t, B_t = x z_t, t3_t, A_t in VMEM so
    # the reverse sweep does no recomputation (8 instead of 11 dots/iter)
    z = (x.T / s).astype(x.dtype)
    for t in range(iters):
        zs_ref[4 * t + 0, :, :] = z
        xz = _dot(x, z)
        t1 = 7.0 * eye - xz
        t3 = 15.0 * eye - _dot(xz, t1)
        a = 13.0 * eye - _dot(xz, t3)
        zs_ref[4 * t + 1, :, :] = xz
        zs_ref[4 * t + 2, :, :] = t3
        zs_ref[4 * t + 3, :, :] = a
        z = (0.25 * _dot(z, a)).astype(z.dtype)

    gz = g
    gx = jnp.zeros_like(x, dtype=jnp.float32)
    for t in range(iters - 1, -1, -1):
        z = zs_ref[4 * t + 0, :, :]
        b_ = zs_ref[4 * t + 1, :, :]
        t3 = zs_ref[4 * t + 2, :, :]
        a = zs_ref[4 * t + 3, :, :]
        t1 = 7.0 * eye - b_
        ga = 0.25 * _dot_tn(z, gz)
        gz_next = 0.25 * _dot_nt(gz, a)
        gt4 = -ga
        gb = _dot_nt(gt4, t3)
        gt3 = _dot_tn(b_, gt4)
        gt2 = -gt3
        gb = gb + _dot_nt(gt2, t1)
        gt1 = _dot_tn(b_, gt2)
        gb = gb - gt1
        gx = gx + jax.lax.dot_general(
            gb, z, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        gz = (gz_next + _dot_tn(x, gb)).astype(g.dtype)

    # through z0 = x^T / s. iters is static: with 0 iterations the scratch
    # is zero-size, so recompute z0 instead of reading slot 0
    z0 = zs_ref[0, :, :] if iters > 0 else (x.T / s).astype(x.dtype)
    gx = gx + (gz.T.astype(jnp.float32) / s)
    gs = -jnp.sum(gz.astype(jnp.float32) * z0.astype(jnp.float32)) / s
    gx_ref[0, 0, :, :] = gx.astype(gx_ref.dtype)
    # scalar-per-program output as one 128-lane row (VMEM tiling-legal);
    # lane 0 is read back outside
    gs_ref[0, 0, 0, :] = jnp.full((128,), gs, jnp.float32)


def _block_specs(m):
    xs = pl.BlockSpec((1, 1, m, m), lambda bi, hi: (bi, hi, 0, 0),
                      memory_space=pltpu.VMEM)
    ss = pl.BlockSpec(memory_space=pltpu.VMEM)  # broadcast scalar (as [1])
    return xs, ss


def _fwd_call(x, s, iters):
    b, h, m, _ = x.shape
    xs, ss = _block_specs(m)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, iters),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(b, h),
        in_specs=[xs, ss],
        out_specs=xs,
        interpret=_use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * (4 * iters) * m**3,
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(x, s.reshape(1))


def _bwd_call(x, s, g, iters):
    b, h, m, _ = x.shape
    xs, ss = _block_specs(m)
    gs_spec = pl.BlockSpec((1, 1, 1, 128), lambda bi, hi: (bi, hi, 0, 0),
                           memory_space=pltpu.VMEM)
    gx, gs = pl.pallas_call(
        functools.partial(_bwd_kernel, iters),
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((b, h, 1, 128), jnp.float32),
        ),
        grid=(b, h),
        in_specs=[xs, ss, xs],
        out_specs=(xs, gs_spec),
        scratch_shapes=[pltpu.VMEM((4 * iters, m, m), x.dtype)],
        interpret=_use_interpret(),
        # the (4*iters, m, m) replay scratch alone is 12.6 MB at m=512
        # (--embed_dim 1024); without the raised limit the backward is the
        # one kernel that fails Mosaic's 16 MB default at non-default dims
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT_WIDE),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * (11 * iters) * m**3,
            bytes_accessed=4 * x.size * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(x, s.reshape(1), g)
    return gx, jnp.sum(gs[..., 0, 0])


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _pinv_core(x, s, iters):
    return _fwd_call(x, s, iters)


def _pinv_core_fwd(x, s, iters):
    return _fwd_call(x, s, iters), (x, s)


def _pinv_core_bwd(iters, res, g):
    x, s = res
    gx, gs = _bwd_call(x, s, g.astype(x.dtype), iters)
    return gx, gs.astype(s.dtype)


_pinv_core.defvjp(_pinv_core_fwd, _pinv_core_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _pinv_core_implicit(x, s, iters):
    return _fwd_call(x, s, iters)


def _pinv_core_implicit_fwd(x, s, iters):
    z = _fwd_call(x, s, iters)
    return z, z


def _pinv_core_implicit_bwd(iters, z, g):
    """Implicit-function gradient at the converged point: for Z ~= X^-1,
    dL/dX = -Z^T (dL/dZ) Z^T — two [m, m] matmuls instead of the 66-dot
    reverse sweep through the 6 iterations (the exact path's backward kernel
    is 22 ms/step per layer at B=64, ~87% of the MXU roofline, i.e. the
    FLOPs themselves are the cost). The converged limit does not depend on
    the z0 scaling, so the scale gets zero gradient (the exact path's scale
    gradient is O(residual) tiny)."""
    zt = jnp.swapaxes(z, -1, -2)
    gx = -(zt @ (g.astype(z.dtype) @ zt))
    return gx.astype(z.dtype), jnp.zeros((), jnp.float32)


_pinv_core_implicit.defvjp(_pinv_core_implicit_fwd, _pinv_core_implicit_bwd)


def moore_penrose_pinv_pallas(
    x: jax.Array, iters: int = 6, grad: str = "exact"
) -> jax.Array:
    """Drop-in replacement for models.nystrom.moore_penrose_pinv on TPU.

    x: [b, h, m, m] (m a multiple of 128 for MXU alignment). The global-max
    scaling scalar stays in XLA so its (sub)gradient matches autodiff through
    the reference's max() exactly.

    grad: "exact" (default) differentiates through the 6 iterations like
    torch autograd does in the reference; "implicit" uses the implicit-
    function gradient of the converged pseudo-inverse (-Z^T g Z^T) — a
    documented deviation that trades gradient exactness on ill-conditioned
    landmark matrices for skipping the entire backward iteration sweep.
    """
    if grad not in ("exact", "implicit"):
        raise ValueError(f"pinv grad must be 'exact' or 'implicit', got {grad!r}")
    # the GLOBAL-max scale (reference quirk: one scalar over the whole
    # [b, h, m, m] tensor) stays in XLA so it reduces over the FULL batch
    # even when the kernel itself runs shard_mapped per data shard
    abs_x = jnp.abs(x)
    col = jnp.sum(abs_x, axis=-1)
    row = jnp.sum(abs_x, axis=-2)
    s = (jnp.max(col) * jnp.max(row)).astype(jnp.float32)
    core = _pinv_core_implicit if grad == "implicit" else _pinv_core
    return _spmd_wrap(
        lambda x, s: core(x, s, iters), x, s, replicated=(1,)
    )
