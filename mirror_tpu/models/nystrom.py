"""Nystrom linear-complexity attention (flax.linen).

Re-derivation of the algorithm used by the reference via the external
``nystrom_attention`` pip package (instantiated at
/root/reference/models/mirror.py:299-309 with dim_head=dim//8, heads=8,
num_landmarks=dim//2, pinv_iterations=6, residual=True, dropout=0.1):

1. front-pad the sequence with zeros to a multiple of ``num_landmarks``
2. landmarks = mean over contiguous groups of l = ceil(n/m) tokens
3. three softmax similarity matrices: (q, k_l), (q_l, k_l), (q_l, k)
4. the middle m x m matrix is pseudo-inverted with 6 Moore-Penrose
   iterations (z <- 0.25 z (13I - xz(15I - xz(7I - xz))), z0 = x^T scaled by
   the *global* max row/col absolute sums)
5. out = attn1 @ pinv(attn2) @ (attn3 @ v) + depthwise-conv residual over the
   value path (kernel 33 along the sequence, one filter per head, no bias)

TPU design notes:
- tensors stay in ``[b, n, h, dh]`` layout end-to-end; head transposes are
  expressed inside einsums so XLA folds them into the matmuls instead of
  materializing 600 MB+ relayout copies (observed in the HBM dump of the
  first implementation);
- softmaxes accumulate in fp32, matmuls run in bf16 on the MXU;
- ``use_pallas=True`` swaps the two n-length softmax-matmul pipelines for
  fused Pallas kernels (mirror_tpu.ops.nystrom_pallas) that keep the
  [n, m] attention matrices in VMEM, and runs the m x m pinv iteration as
  a Pallas kernel too (mirror_tpu.ops.pinv_pallas) — its global-max
  scaling scalar stays in XLA so the reference's scaling quirk and its
  (sub)gradient are preserved exactly.
"""

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import RematDropout, dense, torch_bias_init, torch_default_init


import functools

# debug hook for cost-attribution ablations (scripts/ablate_step.py):
# disables the depthwise value-conv residual without touching configs
_ABLATE_RES_CONV = False


@functools.partial(jax.checkpoint, static_argnums=(1,))
def moore_penrose_pinv(x: jax.Array, iters: int = 6) -> jax.Array:
    """Iterative Moore-Penrose pseudoinverse of [..., m, m] matrices.

    Matches the reference package: z0 = x^T / (max(col_sums) * max(row_sums))
    where both maxes are GLOBAL over the batch/head dims (a quirk of the
    original torch code that we reproduce).

    The iteration is unrolled (static count) and rematerialized: a scanned
    loop makes XLA stack per-iteration [iters, b, h, m, m] residuals for the
    backward pass (~4 GB at batch 64), while recomputing the cheap m x m
    iterations costs ~one extra forward.
    """
    abs_x = jnp.abs(x)
    col = jnp.sum(abs_x, axis=-1)  # row sums of |x| ("col" in the original)
    row = jnp.sum(abs_x, axis=-2)
    z = jnp.swapaxes(x, -1, -2) / (jnp.max(col) * jnp.max(row))
    m = x.shape[-1]
    eye = jnp.eye(m, dtype=x.dtype)

    for _ in range(iters):
        xz = x @ z
        z = 0.25 * z @ (13.0 * eye - (xz @ (15.0 * eye - (xz @ (7.0 * eye - xz)))))
    return z


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def moore_penrose_pinv_implicit(x: jax.Array, iters: int = 6) -> jax.Array:
    """moore_penrose_pinv with the implicit-function gradient instead of
    autodiff through the iterations: dL/dX = -Z^T (dL/dZ) Z^T at the
    converged point (2 matmuls vs ~60 in the unrolled reverse sweep). Exact
    in the limit of convergence; a documented deviation from the reference's
    autograd-through-iterations on matrices the 6 iterations leave
    unconverged. Selected via pinv_grad="implicit"."""
    return moore_penrose_pinv(x, iters)


def _pinv_implicit_fwd(x, iters):
    z = moore_penrose_pinv(x, iters)
    return z, z


def _pinv_implicit_bwd(iters, z, g):
    zt = jnp.swapaxes(z, -1, -2)
    return (-(zt @ (g.astype(z.dtype) @ zt)).astype(z.dtype),)


moore_penrose_pinv_implicit.defvjp(_pinv_implicit_fwd, _pinv_implicit_bwd)


class _QKVProjection(nn.Module):
    """qkv projection whose param path matches nn.Dense ("to_qkv"/"kernel")
    but can emit head-major [b, h, n, dh] tensors straight from the einsum —
    letting XLA fold the relayout into the GEMM output instead of
    materializing [b, n, h, dh] -> [b, h, n, dh] copies."""

    heads: int
    dim_head: int
    kernel_init: callable
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, head_major: bool):
        b, n, d = x.shape
        inner = self.heads * self.dim_head
        kernel = self.param("kernel", self.kernel_init, (d, 3 * inner), jnp.float32)
        cdt = self.dtype or jnp.float32
        x = x.astype(cdt)
        if head_major:
            # three separate GEMMs (weight statically sliced) instead of one
            # packed [3,b,h,n,dh] einsum: the packed form made XLA produce
            # the [3,...] tuple then copy out three slices (~8 ms/step of
            # pure data movement at B=64 in the op profile)
            w = kernel.reshape(d, 3, self.heads, self.dim_head).astype(cdt)
            q = jnp.einsum("bnd,dhe->bhne", x, w[:, 0])
            k = jnp.einsum("bnd,dhe->bhne", x, w[:, 1])
            v = jnp.einsum("bnd,dhe->bhne", x, w[:, 2])
            return q, k, v  # each [b, h, n, dh]
        qkv = x @ kernel.astype(cdt)
        q = qkv[..., :inner].reshape(b, n, self.heads, self.dim_head)
        k = qkv[..., inner : 2 * inner].reshape(b, n, self.heads, self.dim_head)
        v = qkv[..., 2 * inner :].reshape(b, n, self.heads, self.dim_head)
        return q, k, v


class _OutProjection(nn.Module):
    """Output projection with nn.Dense's exact param tree ("to_out"/kernel
    [h*dh, d] + bias [d]) that consumes head-major [b, h, n, dh] directly:
    out = einsum(bhne,heo->bno). The head-merge transpose folds into the GEMM
    instead of materializing a [b, n, h, dh] relayout copy of the attention
    output (+ its mirror in the backward)."""

    out_features: int
    heads: int
    dim_head: int
    kernel_init: callable
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x_hm: jax.Array) -> jax.Array:
        inner = self.heads * self.dim_head
        kernel = self.param(
            "kernel", self.kernel_init, (inner, self.out_features), jnp.float32
        )
        bias_init = (
            jax.nn.initializers.zeros
            if self.kernel_init is not torch_default_init
            else torch_bias_init(inner)
        )
        bias = self.param("bias", bias_init, (self.out_features,), jnp.float32)
        cdt = self.dtype or jnp.float32
        w = kernel.reshape(self.heads, self.dim_head, self.out_features)
        out = jnp.einsum("bhne,heo->bno", x_hm.astype(cdt), w.astype(cdt))
        return out + bias.astype(cdt)


class NystromAttention(nn.Module):
    dim: int
    dim_head: int = 64
    heads: int = 8
    num_landmarks: int = 256
    pinv_iterations: int = 6
    residual: bool = True
    residual_conv_kernel: int = 33
    # (the reference package's `eps` only guards MASKED landmark means; this
    # port supports no key mask, so the field was dead config and is removed)
    dropout: float = 0.0
    use_pallas: bool = False
    pinv_grad: str = "exact"  # "exact" | "implicit" (see moore_penrose_pinv_implicit)
    xavier_init: bool = False  # hybrid WSI encoder xavier-inits all Linears
    dtype: Optional[jnp.dtype] = None

    def _res_kernel(self, h: int):
        return self.param(
            "res_conv_kernel",
            # torch conv default init with fan_in = (in_ch/groups)*K*1 = K
            lambda key, shape: jax.random.uniform(
                key, shape, jnp.float32,
                -1.0 / jnp.sqrt(float(self.residual_conv_kernel)),
                1.0 / jnp.sqrt(float(self.residual_conv_kernel)),
            ),
            (h, 1, self.residual_conv_kernel, 1),
        )

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        b, n, d = x.shape
        h, m = self.heads, self.num_landmarks
        dh = self.dim_head
        inner = h * dh
        scale = dh**-0.5

        kernel_init = (
            jax.nn.initializers.xavier_uniform() if self.xavier_init else None
        )

        padding = (m - n % m) % m
        n_pad = n + padding
        if padding > 0 and not self.use_pallas:
            # dense path: materialize the reference's front pad. The Pallas
            # path never pads — the kernels are pad-aware (the pad rows are
            # zero through the bias-free to_qkv, so their landmark-mean and
            # softmax contributions have closed forms; see
            # ops/landmark_pallas._group_matrix and
            # ops/nystrom_pallas._softmax_pad), which removes the ~4 full-
            # stream pad/trim HBM passes per layer and 9% of the row count.
            x = jnp.pad(x, ((0, 0), (padding, 0), (0, 0)))  # front-pad

        l = n_pad // m
        proj = _QKVProjection(
            heads=h, dim_head=dh,
            kernel_init=kernel_init or torch_default_init,
            dtype=self.dtype, name="to_qkv",
        )
        if self.use_pallas:
            # head-major q/k/v straight out of the projection einsum: the
            # [b,n,h,dh] -> [b,h,n,dh] relayout folds into the GEMM output
            # (explicit transposes were 22% of encoder time in the profile).
            # Landmark means + landmark softmax run fused in VMEM
            # (ops/landmark_pallas) — XLA materialized fp32 copies of the
            # full q/k streams and kept fp32 [m,m] softmax tensors for the
            # backward (~1 GB/layer of fp32 HBM, see the kernel docstring).
            from mirror_tpu.ops.landmark_pallas import landmark_softmax

            q, k, v = proj(x, head_major=True)
            q = q * scale
            q_l, k_l, attn2 = landmark_softmax(q, k, m, padding)
        else:
            q, k, v = proj(x, head_major=False)  # each [b, n, h, dh]
            q = q * scale
            q_l = jnp.mean(q.reshape(b, m, l, h, dh), axis=2)
            k_l = jnp.mean(k.reshape(b, m, l, h, dh), axis=2)

            # attn2^+ : [b, h, m, m] — small. The iteration runs in the
            # compute dtype: under AMP the torch reference's pinv matmuls
            # are fp16 (autocast), so bf16 here is the faithful (and 4x
            # faster on the MXU) equivalent; fp32 mode keeps it fp32.
            sim2 = jnp.einsum(
                "bihd,bjhd->bhij", q_l, k_l, preferred_element_type=jnp.float32
            )
            attn2 = jax.nn.softmax(sim2, axis=-1)
            attn2 = attn2.astype(self.dtype or jnp.float32)
        if self.use_pallas:
            # fused kernel: all 6 iterations VMEM-resident with an in-kernel
            # backward sweep — the XLA version was 45% of the train step
            # (ablation in scripts/ablate_step.py; kernel in ops/pinv_pallas)
            from mirror_tpu.ops.pinv_pallas import moore_penrose_pinv_pallas

            attn2_inv = moore_penrose_pinv_pallas(
                attn2, self.pinv_iterations, grad=self.pinv_grad
            )
        elif self.pinv_grad == "implicit":
            attn2_inv = moore_penrose_pinv_implicit(attn2, self.pinv_iterations)
        else:
            attn2_inv = moore_penrose_pinv(attn2, self.pinv_iterations)

        if self.use_pallas:
            from mirror_tpu.ops.nystrom_pallas import (
                fused_softmax_attn_conv,
                softmax_matmul_landmark_q,
                softmax_matmul_landmark_kv,
            )

            # everything already head-major [b, h, n, dh] (UNPADDED: the
            # front pad's softmax terms ride as `padding` virtual columns)
            # r3 = softmax(q_l k^T) v : [b, h, m, dh]
            r3 = softmax_matmul_landmark_kv(q_l, k, v, padding)
            w = attn2_inv @ r3  # [b, h, m, dh], compute dtype
            if self.residual and not _ABLATE_RES_CONV:
                # the banded-matmul residual conv (ops/conv1d_pallas; the
                # XLA depthwise conv's fwd+bwd was 48.8 ms/step at B=64)
                # rides INSIDE the final attention kernel: the op is
                # HBM-pass-bound on this chip and the fusion removes the
                # conv's separate read-v/write-res passes and the backward
                # re-read of g. (Round 1's losing megafusion used serial
                # VPU tap-MACs; the banded MXU form is what rides free.)
                res_kernel = self._res_kernel(h)
                cdt = self.dtype or jnp.float32
                kern2d = res_kernel.reshape(h, self.residual_conv_kernel)
                out_hm = fused_softmax_attn_conv(
                    q, k_l, w.astype(q.dtype), v.astype(q.dtype),
                    kern2d.astype(cdt),
                )
            else:
                out_hm = softmax_matmul_landmark_q(q, k_l, w.astype(q.dtype))
            # head-major out-projection: head merge folds into the GEMM
            out = _OutProjection(
                out_features=d, heads=h, dim_head=dh,
                kernel_init=kernel_init or torch_default_init,
                dtype=self.dtype, name="to_out",
            )(out_hm.astype(x.dtype))
            out = RematDropout(self.dropout, name="out_dropout")(
                out, deterministic
            )
            return out  # never padded: all n rows are real
        else:
            cdt = self.dtype or jnp.float32
            sim1 = jnp.einsum(
                "bihd,bjhd->bhij", q, k_l, preferred_element_type=jnp.float32
            )  # [b,h,n,m]
            sim3 = jnp.einsum(
                "bihd,bjhd->bhij", q_l, k, preferred_element_type=jnp.float32
            )  # [b,h,m,n]
            # fp32 softmax, then matmuls in the compute dtype — the same
            # numerics as torch AMP (softmax fp32, matmul fp16/bf16)
            attn1 = jax.nn.softmax(sim1, axis=-1).astype(cdt)
            attn3 = jax.nn.softmax(sim3, axis=-1).astype(cdt)
            r3 = jnp.einsum("bhij,bjhd->bhid", attn3, v)
            w = attn2_inv @ r3  # [b,h,m,dh]
            out = jnp.einsum("bhij,bhjd->bihd", attn1, w)  # [b,n,h,dh]
            out = out.astype(x.dtype)

        if self.residual and not self.use_pallas and not _ABLATE_RES_CONV:
            # torch Conv2d(heads, heads, (K, 1), padding=(K//2, 0),
            # groups=heads, bias=False) over [b, h, n, dh]: a depthwise conv
            # along the sequence axis, one kernel per head, shared across dh.
            # Expressed on the [b, n, h, dh] layout as an NHWC conv with
            # spatial dims (n, dh) and channel = h.
            kernel = self._res_kernel(h)
            # NHWC: input [b, n, dh, h], kernel HWIO [K, 1, 1, h] (grouped).
            # depthwise_conv_nhwc == conv_general_dilated with
            # feature_group_count=h, but with a GSPMD-safe weight gradient
            # (XLA doubles grouped-conv kernel grads per unused mesh axis;
            # ops/depthwise_xla.py)
            from mirror_tpu.ops.depthwise_xla import depthwise_conv_nhwc

            cdt = self.dtype or jnp.float32
            res = depthwise_conv_nhwc(
                v.transpose(0, 1, 3, 2).astype(cdt),
                kernel.transpose(2, 3, 1, 0).astype(cdt),
                ((self.residual_conv_kernel // 2,) * 2, (0, 0)),
            ).transpose(0, 1, 3, 2).astype(out.dtype)
            out = out + res

        # merge heads: [b, n, h, dh] -> [b, n, h*dh] (no transpose needed)
        out = out.reshape(b, n_pad, inner)
        out = dense(
            d, inner, kernel_init=kernel_init, name="to_out", dtype=self.dtype
        )(out)
        out = RematDropout(self.dropout, name="out_dropout")(out, deterministic)
        return out[:, -n:]  # drop the front padding
