"""TransMIL WSI encoder family (flax.linen), TPU-first.

Behavioral parity targets (reference /root/reference/models/mirror.py):
- ``PPEG``            :317-331 — pyramid position encoding via 3 depthwise convs
- ``TransLayer``      :295-314 — pre-norm Nystrom-attention residual block
- ``FeatureTransMIL`` :334-380 — Linear+ReLU embed, wrap-pad to a square token
  grid, cls token, 2 TransLayers around a PPEG, LayerNorm, cls output
- ``FeatureTransMILHybrid`` :575-714 — adds alignment head and a masked-token
  retention decoder (MAE-style token masking), with xavier init on every
  Linear (:609-622)

All shapes are static: the caller fixes ``n`` tokens per slide via the
dataset's with-replacement sampling, so ceil(sqrt(n)) padding, landmark
counts, and mask lengths are compile-time constants — XLA sees one graph.
"""

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import dense, l2_normalize, normal_init, torch_bias_init, torch_default_init, trunc_normal_init
from .nystrom import NystromAttention


class _DepthwiseConvParams(nn.Module):
    """Registers exactly nn.Conv's depthwise param tree (kernel
    [k, k, 1, c] + bias [c], torch-default inits) without running a conv —
    PPEG consumes the raw params so the three pyramid kernels can be merged
    into one conv (see PPEG). Param paths stay checkpoint-identical."""

    kernel_size: int
    features: int

    @nn.compact
    def __call__(self):
        k = self.kernel_size
        kernel = self.param(
            "kernel", torch_default_init, (k, k, 1, self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", torch_bias_init(k * k), (self.features,), jnp.float32
        )
        return kernel, bias


def merge_ppeg_pyramid(k7, k5, k3, b7, b5, b3):
    """Merge the 7/5/3 SAME-centered depthwise pyramid into ONE 7x7 conv:
    k_eff = k7 + pad(k5) + pad(k3), b_eff = b7 + b5 + b3. Exact because conv
    is linear in the kernel; gradients flow through the pad/sum back to the
    per-size params. Single source for both PPEG.__call__ and the
    context-parallel encoder (parallel/context_parallel.py::_ppeg)."""
    k_eff = (
        k7
        + jnp.pad(k5, ((1, 1), (1, 1), (0, 0), (0, 0)))
        + jnp.pad(k3, ((2, 2), (2, 2), (0, 0), (0, 0)))
    )
    return k_eff, b7 + b5 + b3


class PPEG(nn.Module):
    """Pyramid Position Encoding Generator (ref :317-331): depthwise convs of
    kernel 7/5/3 over the token grid; the cls token bypasses.

    The three SAME-centered depthwise convs are summed, so they are merged
    into ONE 7x7 depthwise conv whose kernel is k7 + pad(k5) + pad(k3) and
    whose bias is b7 + b5 + b3 — mathematically exact (conv is linear in the
    kernel; gradients flow through the pad/sum back to the per-size params),
    and 49 taps in one pass instead of 83 taps in three passes over the
    token grid. Param tree is unchanged (proj/proj1/proj2 kernel+bias).

    use_pallas additionally runs the merged conv + identity + bias as ONE
    fused Pallas pass per direction (ops/ppeg_pallas: the backward emits
    dimg/dk/db from a single read of g and img) — the op is HBM-pass-bound
    on this chip (BASELINE.md HBM-floor memo)."""

    dim: int = 512
    use_pallas: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, h: int, w: int) -> jax.Array:
        b, _, c = x.shape
        cls_token, feat = x[:, :1], x[:, 1:]
        img = feat.reshape(b, h, w, c)  # NHWC (TPU-native layout)

        k7, b7 = _DepthwiseConvParams(7, c, name="proj")()
        k5, b5 = _DepthwiseConvParams(5, c, name="proj1")()
        k3, b3 = _DepthwiseConvParams(3, c, name="proj2")()
        k_eff, b_eff = merge_ppeg_pyramid(k7, k5, k3, b7, b5, b3)

        cdt = self.dtype or jnp.float32
        if self.use_pallas:
            from mirror_tpu.ops.ppeg_pallas import ppeg_fused

            out = ppeg_fused(
                img.astype(cdt),
                k_eff[:, :, 0, :].astype(cdt),
                b_eff.astype(cdt),
            )
        else:
            # GSPMD-safe depthwise conv: XLA mis-partitions grouped-conv
            # WEIGHT gradients under a mesh axis the conv does not use
            # (ops/depthwise_xla.py) — same math as conv_general_dilated
            # with feature_group_count=c
            from mirror_tpu.ops.depthwise_xla import depthwise_conv_nhwc

            dw = depthwise_conv_nhwc(
                img.astype(cdt), k_eff.astype(cdt), ((3, 3), (3, 3))
            )
            out = dw + b_eff.astype(cdt) + img
        out = out.reshape(b, h * w, c)
        return jnp.concatenate([cls_token, out], axis=1)


class TransLayer(nn.Module):
    """Pre-norm Nystrom attention residual block (ref :295-314).

    NystromAttention hyperparams are derived from dim exactly as the
    reference: dim_head=dim//8, heads=8, landmarks=dim//2, 6 pinv iters,
    residual conv on, dropout 0.1. LayerNorm eps is the torch default 1e-5.
    """

    dim: int = 512
    xavier_init: bool = False
    use_pallas: bool = False
    pinv_grad: str = "exact"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        y = nn.LayerNorm(
            epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name="norm"
        )(x)
        y = NystromAttention(
            dim=self.dim,
            dim_head=self.dim // 8,
            heads=8,
            num_landmarks=self.dim // 2,
            pinv_iterations=6,
            residual=True,
            dropout=0.1,
            xavier_init=self.xavier_init,
            use_pallas=self.use_pallas,
            pinv_grad=self.pinv_grad,
            dtype=self.dtype,
            name="attn",
        )(y, deterministic)
        return x + y


def _square_pad_tokens(h: jax.Array) -> Tuple[jax.Array, int, int]:
    """Wrap-pad [B, n, D] to the next square grid (ref :357-361)."""
    n = h.shape[1]
    side = int(math.ceil(math.sqrt(n)))
    add_length = side * side - n
    if add_length > 0:
        h = jnp.concatenate([h, h[:, :add_length, :]], axis=1)
    return h, side, add_length


class FeatureTransMIL(nn.Module):
    """TransMIL over precomputed patch features (ref :334-380).

    ``__call__`` returns the cls vector (downstream classifier use);
    ``encode`` returns the full normed token sequence plus pad length
    (shared with the Hybrid pretraining subclass).
    """

    input_dim: int = 1024
    embed_dim: int = 512
    xavier_init: bool = False
    cls_token_std: float = 1.0  # plain randn in the reference (ref :347)
    use_pallas: bool = False
    pinv_grad: str = "exact"
    grad_checkpointing: bool = False
    dtype: Optional[jnp.dtype] = None

    def _layer_cls(self):
        """TransLayer, rematerialized when grad checkpointing is on — trades
        recompute for activation HBM (the reference's --grad-checkpointing)."""
        # static_argnums=(2,): `deterministic` is a python bool, not a tracer
        return (
            nn.remat(TransLayer, static_argnums=(2,))
            if self.grad_checkpointing
            else TransLayer
        )

    def setup(self):
        kernel_init = (
            jax.nn.initializers.xavier_uniform() if self.xavier_init else None
        )
        layer_cls = self._layer_cls()
        self.fc1 = dense(
            self.embed_dim, self.input_dim, kernel_init=kernel_init, name="fc1",
            dtype=self.dtype,
        )
        self.cls_token = self.param(
            "cls_token", normal_init(self.cls_token_std), (1, 1, self.embed_dim)
        )
        self.layer1 = layer_cls(
            dim=self.embed_dim, xavier_init=self.xavier_init,
            use_pallas=self.use_pallas, pinv_grad=self.pinv_grad, dtype=self.dtype,
        )
        self.layer2 = layer_cls(
            dim=self.embed_dim, xavier_init=self.xavier_init,
            use_pallas=self.use_pallas, pinv_grad=self.pinv_grad, dtype=self.dtype,
        )
        self.pos_layer = PPEG(
            dim=self.embed_dim, use_pallas=self.use_pallas, dtype=self.dtype
        )
        self.norm = nn.LayerNorm(
            epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32
        )

    def encode(
        self, h: jax.Array, deterministic: bool = True
    ) -> Tuple[jax.Array, int]:
        """[B, n, input_dim] -> ([B, 1 + side^2, embed_dim] normed, add_length)."""
        h = h.astype(self.dtype or jnp.float32)
        h = nn.relu(self.fc1(h))
        h, side, add_length = _square_pad_tokens(h)
        cls = jnp.broadcast_to(
            self.cls_token.astype(h.dtype), (h.shape[0], 1, self.embed_dim)
        )
        h = jnp.concatenate([cls, h], axis=1)
        h = self.layer1(h, deterministic)
        h = self.pos_layer(h, side, side)
        h = self.layer2(h, deterministic)
        h = self.norm(h)
        return h, add_length

    def __call__(self, h: jax.Array, deterministic: bool = True) -> jax.Array:
        h, _ = self.encode(h, deterministic)
        return h[:, 0]


def random_token_masking(
    key: jax.Array, batch: int, num_tokens: int, mask_ratio: float
) -> jax.Array:
    """MAE-style random mask (ref :624-649 and :510-533).

    Returns mask [B, N] with 1 == masked. Same algorithm as the reference:
    rank positions by uniform noise via double argsort; the first
    ``len_keep = int(N * (1 - mask_ratio))`` ranks are kept.

    (The reference then gathers kept tokens, appends mask tokens, and
    un-shuffles; that is algebraically ``where(mask, mask_token, x)`` with
    this mask — one select instead of two gathers, which is what TPUs want.)
    """
    len_keep = int(num_tokens * (1 - mask_ratio))
    noise = jax.random.uniform(key, (batch, num_tokens))
    ids_shuffle = jnp.argsort(noise, axis=1)
    ranks = jnp.argsort(ids_shuffle, axis=1)  # ids_restore == rank of each pos
    return (ranks >= len_keep).astype(jnp.float32)


class FeatureTransMILHybrid(FeatureTransMIL):
    """Pretraining TransMIL: encoder + alignment head + retention decoder
    (ref :575-714). Defaults give reference-init parity: xavier on all
    Linears and cls_token ~ N(0, 0.02) (``init_weights`` at :609-622)."""

    num_tokens: int = 2048
    retention_decoder_depth: int = 1
    xavier_init: bool = True
    cls_token_std: float = 0.02

    def setup(self):
        super().setup()
        kernel_init = (
            jax.nn.initializers.xavier_uniform() if self.xavier_init else None
        )
        self.alignment_head = dense(
            self.embed_dim, self.embed_dim, kernel_init=kernel_init,
            name="alignment_head", dtype=self.dtype,
        )
        self.retention_embed = dense(
            self.embed_dim, self.embed_dim, kernel_init=kernel_init,
            name="retention_embed", dtype=self.dtype,
        )
        self.mask_token = self.param(
            "mask_token", normal_init(0.02), (1, 1, self.embed_dim)
        )
        self.retention_gene_embed = self.param(
            "retention_gene_embed",
            trunc_normal_init(0.02),
            (1, self.num_tokens + 1, self.embed_dim),
        )
        layer_cls = self._layer_cls()
        self.retention_blocks = [
            layer_cls(
                dim=self.embed_dim, xavier_init=self.xavier_init,
                use_pallas=self.use_pallas, pinv_grad=self.pinv_grad, dtype=self.dtype,
                name=f"retention_block_{i}",
            )
            for i in range(self.retention_decoder_depth)
        ]
        self.retention_norm = nn.LayerNorm(
            epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32
        )
        self.retention_head = dense(
            self.embed_dim, self.embed_dim, kernel_init=kernel_init,
            name="retention_head", dtype=self.dtype,
        )

    def forward_encoder(self, h: jax.Array, deterministic: bool = True) -> jax.Array:
        """Full normed sequence trimmed back to [B, 1 + n, D] (ref :651-679)."""
        h, add_length = self.encode(h, deterministic)
        if add_length > 0:
            h = h[:, : h.shape[1] - add_length, :]
        return h

    def forward_alignment_head(self, h: jax.Array) -> jax.Array:
        h = l2_normalize(h)
        return self.alignment_head(h[:, 0, :])

    def forward_retention_head(
        self, h: jax.Array, mask_ratio: float, mask_rng: jax.Array,
        deterministic: bool = True,
    ) -> Tuple[jax.Array, jax.Array]:
        rh = self.retention_embed(h)
        cls, tokens = rh[:, :1, :], rh[:, 1:, :]
        mask = random_token_masking(
            mask_rng, tokens.shape[0], tokens.shape[1], mask_ratio
        )
        tokens = jnp.where(
            mask[..., None] > 0, self.mask_token.astype(tokens.dtype), tokens
        )
        rh = jnp.concatenate([cls, tokens], axis=1)
        rh = rh + self.retention_gene_embed.astype(rh.dtype)
        for blk in self.retention_blocks:
            rh = blk(rh, deterministic)
        rh = self.retention_norm(rh)
        rh = self.retention_head(rh)
        return rh[:, 1:, :], mask

    def forward_decoders(
        self, h: jax.Array, mask_ratio: float, mask_rng: jax.Array,
        deterministic: bool = True,
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        alignment_h = self.forward_alignment_head(h)
        retention_h, mask = self.forward_retention_head(
            h, mask_ratio, mask_rng, deterministic
        )
        return alignment_h, retention_h, mask

    def __call__(
        self, h: jax.Array, mask_ratio: float = 0.75, deterministic: bool = True
    ):
        mask_rng = self.make_rng("masking")
        h = self.forward_encoder(h, deterministic)
        alignment_h, retention_h, mask = self.forward_decoders(
            h, mask_ratio, mask_rng, deterministic
        )
        retention_target_h = h[:, 1:, :]
        return alignment_h, retention_h, retention_target_h, mask
