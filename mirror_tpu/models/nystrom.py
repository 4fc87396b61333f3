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

This dense implementation is the parity reference; ``use_pallas=True``
routes the three-matrix product through the fused Pallas TPU kernel in
``mirror_tpu.ops.nystrom_pallas`` (identical math, tiled for VMEM).

TPU notes: all matmuls carry ``preferred_element_type=float32`` via fp32
softmax; shapes are static (sequence length fixed by config) so XLA tiles
everything onto the MXU.
"""

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import dense


def moore_penrose_pinv(x: jax.Array, iters: int = 6) -> jax.Array:
    """Iterative Moore-Penrose pseudoinverse of [..., m, m] matrices.

    Matches the reference package: z0 = x^T / (max(col_sums) * max(row_sums))
    where both maxes are GLOBAL over the batch/head dims (a quirk of the
    original torch code that we reproduce).
    """
    abs_x = jnp.abs(x)
    col = jnp.sum(abs_x, axis=-1)  # row sums of |x| ("col" in the original)
    row = jnp.sum(abs_x, axis=-2)
    z = jnp.swapaxes(x, -1, -2) / (jnp.max(col) * jnp.max(row))
    m = x.shape[-1]
    eye = jnp.eye(m, dtype=x.dtype)

    def body(_, z):
        xz = x @ z
        return 0.25 * z @ (13.0 * eye - (xz @ (15.0 * eye - (xz @ (7.0 * eye - xz)))))

    return jax.lax.fori_loop(0, iters, body, z)


class NystromAttention(nn.Module):
    dim: int
    dim_head: int = 64
    heads: int = 8
    num_landmarks: int = 256
    pinv_iterations: int = 6
    residual: bool = True
    residual_conv_kernel: int = 33
    eps: float = 1e-8
    dropout: float = 0.0
    use_pallas: bool = False
    xavier_init: bool = False  # hybrid WSI encoder xavier-inits all Linears
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        b, n, d = x.shape
        h, m = self.heads, self.num_landmarks
        inner = h * self.dim_head
        scale = self.dim_head**-0.5

        kernel_init = (
            jax.nn.initializers.xavier_uniform() if self.xavier_init else None
        )

        padding = (m - n % m) % m
        n_pad = n + padding
        if padding > 0:
            x = jnp.pad(x, ((0, 0), (padding, 0), (0, 0)))  # front-pad

        qkv = dense(
            inner * 3, d, use_bias=False, kernel_init=kernel_init, name="to_qkv",
            dtype=self.dtype,
        )(x)
        qkv = qkv.reshape(b, n_pad, 3, h, self.dim_head)
        q, k, v = (
            jnp.transpose(qkv[:, :, i], (0, 2, 1, 3)) for i in range(3)
        )  # each [b, h, n_pad, dh]
        q = q * scale

        # landmarks: mean over contiguous groups of l tokens
        l = n_pad // m
        q_l = jnp.mean(q.reshape(b, h, m, l, self.dim_head), axis=3)
        k_l = jnp.mean(k.reshape(b, h, m, l, self.dim_head), axis=3)

        if self.use_pallas:
            from mirror_tpu.ops.nystrom_pallas import nystrom_attention_core

            out = nystrom_attention_core(q, k, v, q_l, k_l, self.pinv_iterations)
        else:
            sim1 = jnp.einsum("bhid,bhjd->bhij", q, k_l)  # [b,h,n,m]
            sim2 = jnp.einsum("bhid,bhjd->bhij", q_l, k_l)  # [b,h,m,m]
            sim3 = jnp.einsum("bhid,bhjd->bhij", q_l, k)  # [b,h,m,n]
            attn1 = jax.nn.softmax(sim1.astype(jnp.float32), axis=-1)
            attn2 = jax.nn.softmax(sim2.astype(jnp.float32), axis=-1)
            attn3 = jax.nn.softmax(sim3.astype(jnp.float32), axis=-1)
            attn2_inv = moore_penrose_pinv(attn2, self.pinv_iterations)
            out = (attn1 @ attn2_inv) @ (attn3 @ v.astype(jnp.float32))
            out = out.astype(x.dtype)

        if self.residual:
            # torch Conv2d(heads, heads, (K, 1), padding=(K//2, 0),
            # groups=heads, bias=False) over [b, h, n, dh]: a depthwise conv
            # along the sequence axis, one kernel per head, shared across dh.
            kernel = self.param(
                "res_conv_kernel",
                # torch conv default init with fan_in = (in_ch/groups)*K*1 = K
                lambda key, shape: jax.random.uniform(
                    key, shape, jnp.float32,
                    -1.0 / jnp.sqrt(float(self.residual_conv_kernel)),
                    1.0 / jnp.sqrt(float(self.residual_conv_kernel)),
                ),
                (h, 1, self.residual_conv_kernel, 1),
            )
            res = jax.lax.conv_general_dilated(
                v.astype(jnp.float32),
                kernel.astype(jnp.float32),
                window_strides=(1, 1),
                padding=((self.residual_conv_kernel // 2,) * 2, (0, 0)),
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
                feature_group_count=h,
            ).astype(out.dtype)
            out = out + res

        # merge heads: [b, h, n, dh] -> [b, n, h*dh]
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, n_pad, inner)
        out = dense(
            d, inner, kernel_init=kernel_init, name="to_out", dtype=self.dtype
        )(out)
        out = nn.Dropout(self.dropout, deterministic=deterministic, name="out_dropout")(out)
        return out[:, -n:]  # drop the front padding
