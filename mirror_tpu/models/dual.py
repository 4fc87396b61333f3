"""Vanilla CLIP-style dual encoder for train_pretrain.py.

The reference's ``train_pretrain.py`` expects ``model(wsi, rna) ->
(wsi_emb, rna_emb)`` (/root/reference/train_pretrain.py:1119-1122) but
registers no such model — a user must supply one. This fills that gap with
the obvious composition: FeatureTransMIL cls vector + TransFormer vector,
each L2-ready via a linear projection head.
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import dense
from .rna_transformer import TransFormer
from .transmil import FeatureTransMIL


class MIRRORDual(nn.Module):
    wsi_embed_dim: int = 768
    rna_embed_dim: int = 10234
    embed_dim: int = 768
    projection_dim: Optional[int] = None
    rna_encoder_depth: int = 2
    rna_gene_embed: str = "learn"
    rna_mlp_ratio: float = 2.572
    rna_pos_drop_rate: float = 0.0
    rna_proj_drop_rate: float = 0.1
    rna_attn_drop_rate: float = 0.0
    rna_drop_path_rate: float = 0.0
    rna_norm_eps: float = 1e-6
    use_pallas: bool = False
    pinv_grad: str = "exact"
    grad_checkpointing: bool = False
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        proj_dim = self.projection_dim or self.embed_dim
        self.wsi_encoder = FeatureTransMIL(
            input_dim=self.wsi_embed_dim,
            embed_dim=self.embed_dim,
            use_pallas=self.use_pallas,
            pinv_grad=self.pinv_grad,
            grad_checkpointing=self.grad_checkpointing,
            dtype=self.dtype,
        )
        self.rna_encoder = TransFormer(
            input_dim=self.rna_embed_dim,
            embed_dim=self.embed_dim,
            depth=self.rna_encoder_depth,
            gene_embed=self.rna_gene_embed,
            mlp_ratio=self.rna_mlp_ratio,
            pos_drop_rate=self.rna_pos_drop_rate,
            proj_drop_rate=self.rna_proj_drop_rate,
            attn_drop_rate=self.rna_attn_drop_rate,
            drop_path_rate=self.rna_drop_path_rate,
            norm_eps=self.rna_norm_eps,
            dtype=self.dtype,
        )
        self.wsi_projection = dense(
            proj_dim, self.embed_dim, name="wsi_projection", dtype=self.dtype
        )
        self.rna_projection = dense(
            proj_dim, self.embed_dim, name="rna_projection", dtype=self.dtype
        )

    def __call__(
        self, wsi_emb: jax.Array, rna_emb: jax.Array, deterministic: bool = True
    ) -> Tuple[jax.Array, jax.Array]:
        wsi = self.wsi_projection(self.wsi_encoder(wsi_emb, deterministic))
        rna = self.rna_projection(self.rna_encoder(rna_emb, deterministic))
        return wsi, rna
