"""MIRROR pretraining model (flax.linen).

Parity target: /root/reference/models/mirror.py:720-915 —
dual hybrid encoders + learnable logit scale + style-clustering VAE
(shared MLP -> mu/logstd -> reparameterized latent -> decoder -> prototype
scores) with orthogonally-initialized prototypes.

Functionalized mutable-state notes (TPU design):
- the per-step prototype L2 renorm (train_mirror.py:1133-1137) and the
  logit-scale clamp to [0, ln 100] (train_mirror.py:1254-1256) are applied
  inside the jitted train step (see mirror_tpu.train.steps), not here;
- VAE sampling consumes the ``style`` rng stream, token masking the
  ``masking`` stream, dropout the ``dropout`` stream.
"""

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import Mlp, dense
from .rna_transformer import TransFormerHybrid
from .transmil import FeatureTransMILHybrid


class MirrorOutput(NamedTuple):
    """The reference 15-tuple (models/mirror.py:899-915), in order."""

    wsi_alignment_emb: jax.Array
    wsi_retention_emb: jax.Array
    wsi_retention_target: jax.Array
    wsi_mask: jax.Array
    wsi_score: jax.Array
    wsi_mu: jax.Array
    wsi_logstd: jax.Array
    rna_alignment_emb: jax.Array
    rna_retention_emb: jax.Array
    rna_retention_target: jax.Array
    rna_mask: jax.Array
    rna_score: jax.Array
    rna_mu: jax.Array
    rna_logstd: jax.Array
    logit_scale: jax.Array


class MIRROR(nn.Module):
    wsi_embed_dim: int = 768
    rna_embed_dim: int = 10234
    embed_dim: int = 768
    wsi_num_tokens: int = 2048
    wsi_retention_decoder_depth: int = 1
    rna_encoder_depth: int = 2
    rna_gene_embed: str = "learn"
    rna_mlp_ratio: float = 2.572
    rna_pos_drop_rate: float = 0.0
    rna_proj_drop_rate: float = 0.1
    rna_attn_drop_rate: float = 0.0
    rna_drop_path_rate: float = 0.0
    rna_norm_eps: float = 1e-6  # "layernorm" in config -> 1e-5
    rna_retention_decoder_depth: int = 1
    init_logit_scale: float = math.log(1 / 0.07)
    style_mlp_hidden_dim: int = 512
    style_mlp_out_dim: int = 256
    style_latent_dim: int = 128
    num_prototypes: int = 3000
    use_pallas: bool = False
    pinv_grad: str = "exact"
    grad_checkpointing: bool = False
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.logit_scale = self.param(
            "logit_scale",
            lambda key, shape: jnp.full(shape, self.init_logit_scale, jnp.float32),
            (),
        )
        self.wsi_encoder = FeatureTransMILHybrid(
            input_dim=self.wsi_embed_dim,
            embed_dim=self.embed_dim,
            num_tokens=self.wsi_num_tokens,
            retention_decoder_depth=self.wsi_retention_decoder_depth,
            use_pallas=self.use_pallas,
            pinv_grad=self.pinv_grad,
            grad_checkpointing=self.grad_checkpointing,
            dtype=self.dtype,
        )
        self.rna_encoder = TransFormerHybrid(
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
            retention_decoder_depth=self.rna_retention_decoder_depth,
            dtype=self.dtype,
        )
        self.style_encoder_mlp = Mlp(
            hidden_features=self.style_mlp_hidden_dim,
            out_features=self.style_mlp_out_dim,
            drop=0.0,
            dtype=self.dtype,
        )
        self.style_mu = dense(
            self.style_latent_dim, self.style_mlp_out_dim, name="style_mu",
            dtype=self.dtype,
        )
        self.style_logstd = dense(
            self.style_latent_dim, self.style_mlp_out_dim, name="style_logstd",
            dtype=self.dtype,
        )
        self.style_decoder = dense(
            self.embed_dim, self.style_latent_dim, name="style_decoder",
            dtype=self.dtype,
        )
        # prototypes: Linear(embed_dim -> P, bias=False), orthogonal init
        # (ref :827-828). flax kernel is the transpose of the torch weight;
        # orthogonal along the last (prototype) axis gives K @ K^T = I_D,
        # matching torch's row-orthonormal (P, D) weight.
        self.prototypes = nn.Dense(
            self.num_prototypes,
            use_bias=False,
            kernel_init=jax.nn.initializers.orthogonal(column_axis=0),
            name="prototypes",
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )

    def reparameterize(self, mu: jax.Array, logstd: jax.Array, rng) -> jax.Array:
        std = jnp.exp(0.5 * logstd)
        return mu + std * jax.random.normal(rng, mu.shape, mu.dtype)

    def forward_style_clustering(
        self, wsi_emb: jax.Array, rna_emb: jax.Array, deterministic: bool = True
    ):
        rng_wsi = self.make_rng("style")
        rng_rna = self.make_rng("style")

        wsi_emb = self.style_encoder_mlp(wsi_emb, deterministic)
        wsi_mu = self.style_mu(wsi_emb)
        wsi_logstd = self.style_logstd(wsi_emb)
        wsi_z = self.reparameterize(wsi_mu, wsi_logstd, rng_wsi)
        wsi_z = self.style_decoder(wsi_z)
        wsi_score = self.prototypes(wsi_z)

        rna_emb = self.style_encoder_mlp(rna_emb, deterministic)
        rna_mu = self.style_mu(rna_emb)
        rna_logstd = self.style_logstd(rna_emb)
        rna_z = self.reparameterize(rna_mu, rna_logstd, rng_rna)
        rna_z = self.style_decoder(rna_z)
        rna_score = self.prototypes(rna_z)
        return wsi_score, wsi_mu, wsi_logstd, rna_score, rna_mu, rna_logstd

    def __call__(
        self,
        wsi_emb: jax.Array,
        rna_emb: jax.Array,
        wsi_mask_ratio: float = 0.75,
        rna_mask_ratio: float = 0.75,
        deterministic: bool = True,
    ) -> MirrorOutput:
        wsi_mask_rng = self.make_rng("masking")
        rna_mask_rng = self.make_rng("masking")

        wsi_emb = self.wsi_encoder.forward_encoder(wsi_emb, deterministic)
        wsi_alignment_emb, wsi_retention_emb, wsi_mask = (
            self.wsi_encoder.forward_decoders(
                wsi_emb, wsi_mask_ratio, wsi_mask_rng, deterministic
            )
        )
        wsi_retention_target = wsi_emb[:, 1:, :]

        rna_emb = self.rna_encoder.forward_encoder(rna_emb, deterministic)
        rna_alignment_emb, rna_retention_emb, rna_mask = (
            self.rna_encoder.forward_decoders(
                rna_emb, rna_mask_ratio, rna_mask_rng, deterministic
            )
        )
        rna_retention_target = rna_emb

        wsi_score, wsi_mu, wsi_logstd, rna_score, rna_mu, rna_logstd = (
            self.forward_style_clustering(
                wsi_emb[:, 0, :], rna_emb, deterministic
            )
        )

        return MirrorOutput(
            wsi_alignment_emb=wsi_alignment_emb,
            wsi_retention_emb=wsi_retention_emb,
            wsi_retention_target=wsi_retention_target,
            wsi_mask=wsi_mask,
            wsi_score=wsi_score,
            wsi_mu=wsi_mu,
            wsi_logstd=wsi_logstd,
            rna_alignment_emb=rna_alignment_emb,
            rna_retention_emb=rna_retention_emb,
            rna_retention_target=rna_retention_target,
            rna_mask=rna_mask,
            rna_score=rna_score,
            rna_mu=rna_mu,
            rna_logstd=rna_logstd,
            logit_scale=jnp.exp(self.logit_scale),
        )
