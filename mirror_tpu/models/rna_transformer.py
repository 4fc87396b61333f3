"""RNA (transcriptomics) transformer family (flax.linen).

Behavioral parity targets (reference /root/reference/models/mirror.py):
- ``TransFormer``       :155-289 — MLP embedding (in -> 2E -> E with mid
  LayerNorm), additive learnable gene embedding (1, E), ``depth`` pre-norm
  blocks over the single vector with the heads-as-sequence attention quirk,
  final norm. Stochastic-depth rates follow the linspace decay rule.
- ``TransFormerHybrid`` :386-569 — adds an alignment head on the L2-normed
  encoding and a scalar-level masked retention decoder whose proj/fc2
  weights are rescaled by 1/sqrt(2*layer_id) at init (:503-508).

The RNA "sequence" is a single 10k-dim vector — all compute is GEMMs, which
is exactly what the MXU wants; no Pallas needed on this path.
"""

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import (
    Mlp,
    RnaBlock,
    dense,
    l2_normalize,
    normal_init,
    trunc_normal_init,
)


class TransFormer(nn.Module):
    input_dim: int = 10234
    embed_dim: int = 768
    depth: int = 2
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_norm: bool = False
    init_values: Optional[float] = None
    gene_embed: str = "learn"
    pre_norm: bool = False
    final_norm: bool = True
    embed_drop_rate: float = 0.0
    pos_drop_rate: float = 0.0
    proj_drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    fix_init: bool = False
    norm_eps: float = 1e-6  # 1e-5 when config passes norm_layer="layernorm"
    dtype: Optional[jnp.dtype] = None

    def _dpr(self, i: int) -> float:
        """Stochastic-depth decay rule: linspace(0, rate, depth)[i]."""
        if self.depth == 1:
            return 0.0
        return self.drop_path_rate * i / (self.depth - 1)

    def _rescale(self, i: int) -> float:
        return 1.0 / math.sqrt(2.0 * (i + 1)) if self.fix_init else 1.0

    def setup(self):
        self.embedding = Mlp(
            hidden_features=self.embed_dim * 2,
            out_features=self.embed_dim,
            use_norm=True,
            norm_eps=self.norm_eps,
            drop=self.embed_drop_rate,
            dtype=self.dtype,
        )
        if self.gene_embed in ("", "none"):
            self.gene_embed_param = None
        else:
            self.gene_embed_param = self.param(
                "gene_embed", trunc_normal_init(0.02), (1, self.embed_dim)
            )
        self.pos_drop = nn.Dropout(self.pos_drop_rate)
        if self.pre_norm:
            self.norm_pre = nn.LayerNorm(
                epsilon=self.norm_eps, dtype=self.dtype, param_dtype=jnp.float32
            )
        self.blocks = [
            RnaBlock(
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                qk_norm=self.qk_norm,
                init_values=self.init_values,
                proj_drop=self.proj_drop_rate,
                attn_drop=self.attn_drop_rate,
                drop_path=self._dpr(i),
                norm_eps=self.norm_eps,
                rescale_init=self._rescale(i),
                dtype=self.dtype,
                name=f"block_{i}",
            )
            for i in range(self.depth)
        ]
        if self.final_norm:
            self.norm = nn.LayerNorm(
                epsilon=self.norm_eps, dtype=self.dtype, param_dtype=jnp.float32
            )

    def encode(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        x = x.astype(self.dtype or jnp.float32)
        x = self.embedding(x, deterministic)
        if self.gene_embed_param is not None:
            x = x + self.gene_embed_param.astype(x.dtype)
            x = self.pos_drop(x, deterministic=deterministic)
        if self.pre_norm:
            x = self.norm_pre(x)
        for blk in self.blocks:
            x = blk(x, deterministic)
        if self.final_norm:
            x = self.norm(x)
        return x

    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        return self.encode(x, deterministic)


def random_scalar_masking(
    key: jax.Array, batch: int, num_features: int, mask_ratio: float
) -> jax.Array:
    """Scalar-level MAE masking over the embedding features (ref :510-533):
    the same double-argsort ranking as the WSI token mask, so it IS that
    function — one implementation of the algorithm (transmil.py holds it)."""
    from mirror_tpu.models.transmil import random_token_masking

    return random_token_masking(key, batch, num_features, mask_ratio)


class TransFormerHybrid(TransFormer):
    """Pretraining RNA encoder (ref :386-569)."""

    retention_decoder_depth: int = 1

    def setup(self):
        super().setup()
        self.alignment_head = dense(
            self.embed_dim, self.embed_dim, name="alignment_head", dtype=self.dtype
        )
        self.retention_embed = dense(
            self.embed_dim, self.embed_dim, name="retention_embed", dtype=self.dtype
        )
        # scalar mask token (1, 1), N(0, 0.02) (ref :473,500)
        self.mask_token = self.param("mask_token", normal_init(0.02), (1, 1))
        self.retention_gene_embed = self.param(
            "retention_gene_embed", trunc_normal_init(0.02), (1, self.embed_dim)
        )
        self.retention_blocks = [
            RnaBlock(
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                qk_norm=self.qk_norm,
                init_values=self.init_values,
                proj_drop=self.proj_drop_rate,
                attn_drop=self.attn_drop_rate,
                drop_path=0.0,
                norm_eps=self.norm_eps,
                # always rescaled in the reference (init_weights_ :503-508)
                rescale_init=1.0 / math.sqrt(2.0 * (i + 1)),
                dtype=self.dtype,
                name=f"retention_block_{i}",
            )
            for i in range(self.retention_decoder_depth)
        ]
        self.retention_norm = nn.LayerNorm(
            epsilon=self.norm_eps, dtype=self.dtype, param_dtype=jnp.float32
        )
        self.retention_head = dense(
            self.embed_dim, self.embed_dim, name="retention_head", dtype=self.dtype
        )

    def forward_encoder(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        return self.encode(x, deterministic)

    def forward_alignment_head(self, x: jax.Array) -> jax.Array:
        return self.alignment_head(l2_normalize(x))

    def forward_retention_head(
        self, x: jax.Array, mask_ratio: float, mask_rng: jax.Array,
        deterministic: bool = True,
    ) -> Tuple[jax.Array, jax.Array]:
        rx = self.retention_embed(x)
        mask = random_scalar_masking(mask_rng, rx.shape[0], rx.shape[1], mask_ratio)
        rx = jnp.where(mask > 0, self.mask_token[0, 0].astype(rx.dtype), rx)
        rx = rx + self.retention_gene_embed.astype(rx.dtype)
        for blk in self.retention_blocks:
            rx = blk(rx, deterministic)
        rx = self.retention_norm(rx)
        rx = self.retention_head(rx)
        return rx, mask

    def forward_decoders(
        self, x: jax.Array, mask_ratio: float, mask_rng: jax.Array,
        deterministic: bool = True,
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        alignment_x = self.forward_alignment_head(x)
        retention_x, mask = self.forward_retention_head(
            x, mask_ratio, mask_rng, deterministic
        )
        return alignment_x, retention_x, mask

    def __call__(
        self, x: jax.Array, mask_ratio: float = 0.75, deterministic: bool = True
    ):
        mask_rng = self.make_rng("masking")
        x = self.forward_encoder(x, deterministic)
        alignment_x, retention_x, mask = self.forward_decoders(
            x, mask_ratio, mask_rng, deterministic
        )
        retention_target_x = x
        return alignment_x, retention_x, retention_target_x, mask
