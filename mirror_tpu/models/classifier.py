"""MIRROR downstream classifier (flax.linen).

Parity target: /root/reference/models/mirror.py:921-1015 — FeatureTransMIL
(cls vector) + TransFormer (RNA vector), add/concat fusion, linear head.
The RNA branch is optional at call time (WSI-only evaluation).
"""

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import dense
from .rna_transformer import TransFormer
from .transmil import FeatureTransMIL


class MIRRORClassifier(nn.Module):
    # wsi_embed_dim default = the 1024-d truncated-ResNet50 feature, matching
    # the reference downstream default (FeatureTransMIL input_dim=1024,
    # /root/reference/models/mirror.py:334-336; the reference classifier has
    # no default at all and configs always set it).
    wsi_embed_dim: int = 1024
    rna_embed_dim: int = 10234
    embed_dim: int = 768
    num_classes: int = 2
    rna_encoder_depth: int = 2
    rna_gene_embed: str = "learn"
    rna_mlp_ratio: float = 2.572
    rna_pos_drop_rate: float = 0.0
    rna_proj_drop_rate: float = 0.1
    rna_attn_drop_rate: float = 0.0
    rna_drop_path_rate: float = 0.0
    rna_norm_eps: float = 1e-6
    fusion: str = "concat"
    use_pallas: bool = False
    pinv_grad: str = "exact"
    grad_checkpointing: bool = False
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        assert self.fusion in ("add", "concat"), "Fusion must be add or concat"
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
        head_in = self.embed_dim * 2 if self.fusion == "concat" else self.embed_dim
        self.head = dense(self.num_classes, head_in, name="head", dtype=self.dtype)

    def __call__(
        self,
        wsi_emb: jax.Array,
        rna_emb: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        wsi_emb = self.wsi_encoder(wsi_emb, deterministic)
        return self.head_from_wsi(wsi_emb, rna_emb, deterministic)

    def head_from_wsi(
        self,
        wsi_emb: jax.Array,
        rna_emb: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        """Classify from a PRECOMPUTED wsi cls embedding [B, embed_dim] —
        the whole-slide serving path (tools/predict.py --whole-slide feeds
        the context-parallel encoder's cls row here); fusion/head semantics
        identical to __call__."""
        if rna_emb is None and self.fusion == "concat":
            # fail loudly like the reference's Linear(2*embed_dim, C) would:
            # running concat-fusion wsi-only would silently build an
            # embed_dim-wide head incompatible with the fused eval path
            raise ValueError(
                "fusion='concat' requires an RNA input; use fusion='add' "
                "(or wsi_feature_only mode) for WSI-only classification"
            )
        fused = None
        if rna_emb is not None:
            rna_emb = self.rna_encoder(rna_emb, deterministic)
            if self.fusion == "add":
                fused = wsi_emb + rna_emb
            else:
                fused = jnp.concatenate([wsi_emb, rna_emb], axis=1)
        if fused is not None:
            return self.head(fused)
        return self.head(wsi_emb)
