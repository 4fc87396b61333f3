"""MIRROR pre-training losses as pure JAX functions.

Semantics match the reference implementation
(/root/reference/losses/mirror_loss.py:16-135):

- ``clip_loss``: symmetric cross-entropy over ``logit_scale * W @ R^T`` in both
  directions with arange labels. Negatives are **local to the per-device
  batch** by default, exactly like the reference (which never gathers
  embeddings across ranks). Pass ``gather_axis`` to opt into a cross-chip
  ``all_gather`` of embeddings over an SPMD mesh axis — a TPU-native extension
  (default off for parity).
- ``mirror_loss``: total = w_a*align + w_wr*wsi_ret + w_rr*rna_ret +
  w_s*style + w_c*cluster, returning the 6-tuple of (total, align, wsi_ret,
  rna_ret, style, cluster).

All functions are jit-friendly (static shapes, no Python branching on traced
values) and differentiable.
"""

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


def _softmax_xent(
    logits: jax.Array, labels: jax.Array, valid: Optional[jax.Array] = None
) -> jax.Array:
    """Mean cross entropy with integer labels (== F.cross_entropy default).

    ``valid`` ([B] 0/1) excludes padded rows from the mean AND padded columns
    from the softmax normalizer, making the padded computation exactly equal
    to the unpadded one (eval tail batches on a mesh pad to a device
    multiple; negatives must not include the padding)."""
    if valid is not None:
        logits = logits + jnp.where(valid[None, :] > 0, 0.0, -1e9)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
        return jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1.0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))


def clip_loss(
    wsi_features: jax.Array,
    rna_features: jax.Array,
    logit_scale: jax.Array,
    gather_axis: Optional[str] = None,
    valid: Optional[jax.Array] = None,
) -> jax.Array:
    """Symmetric CLIP contrastive loss (ref: losses/mirror_loss.py:37-52).

    Args:
        wsi_features: [B, D] WSI alignment embeddings.
        rna_features: [B, D] RNA alignment embeddings.
        logit_scale: scalar, already exponentiated.
        gather_axis: optional SPMD mesh axis name. When set (inside shard_map /
            jit with a mesh axis), embeddings are all-gathered over the axis so
            negatives span the global batch. ``None`` == reference behavior.
        valid: optional [B] 0/1 row mask for padded eval tail batches.
    """
    if gather_axis is not None:
        # Cross-chip negatives ride ICI; gradients flow through the local shard
        # and are correct because each chip computes the identical global loss.
        wsi_features = jax.lax.all_gather(wsi_features, gather_axis, tiled=True)
        rna_features = jax.lax.all_gather(rna_features, gather_axis, tiled=True)
        if valid is not None:
            valid = jax.lax.all_gather(valid, gather_axis, tiled=True)
    logits_per_wsi = logit_scale * (wsi_features @ rna_features.T)
    logits_per_rna = logit_scale * (rna_features @ wsi_features.T)
    labels = jnp.arange(logits_per_wsi.shape[0])
    return (
        _softmax_xent(logits_per_wsi, labels, valid)
        + _softmax_xent(logits_per_rna, labels, valid)
    ) / 2.0


def local_clip_loss(
    wsi_features: jax.Array,
    rna_features: jax.Array,
    logit_scale: jax.Array,
    mesh,
    axis_name: str = "data",
    valid: Optional[jax.Array] = None,
) -> jax.Array:
    """Per-shard contrastive loss — the reference's EXACT multi-GPU
    semantics: every rank computes CE over only its local batch's negatives
    and DDP averages the losses (losses/mirror_loss.py:37-50 has no
    cross-rank gather; SURVEY.md section 2.8).

    Under plain jit the batch-sharded matmul is global mathematics, so the
    local-negatives behavior needs shard_map: each shard computes its own
    [b_local, b_local] CE and the shards' losses are averaged (pmean) —
    identical to N DDP ranks of batch b_local.
    """
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    from jax.sharding import PartitionSpec as P

    if valid is None:
        valid = jnp.ones((wsi_features.shape[0],), jnp.float32)

    def per_shard(w, r, ls, v):
        # per-shard masked CE (clip_loss handles the valid rows/negatives);
        # average over shards that hold any valid rows — the DDP analogue of
        # averaging per-rank means. A fully-padded shard (eval tail) is
        # excluded instead of contributing NaN.
        has = jnp.sum(v) > 0
        loss = jnp.where(has, clip_loss(w, r, ls[0], valid=v), 0.0)
        num = jax.lax.psum(loss, axis_name)
        den = jax.lax.psum(has.astype(jnp.float32), axis_name)
        return num / jnp.maximum(den, 1.0)

    return shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(), P(axis_name)),
        out_specs=P(),
    )(wsi_features, rna_features, logit_scale[None], valid)


class MirrorLossWeights(NamedTuple):
    """Loss-term weights. Defaults match the reference class defaults
    (losses/mirror_loss.py:58-63); the shipped config uses
    (0.5, 0.15, 0.15, 0.1, 0.1) (configs/pretrain/mirror.template.yaml:104-110)."""

    alignment: float = 0.5
    wsi_retention: float = 0.1
    rna_retention: float = 0.1
    style: float = 0.1
    cluster: float = 0.2


def mirror_loss(
    wsi_alignment_emb: jax.Array,
    wsi_retention_emb: jax.Array,
    wsi_retention_target: jax.Array,
    wsi_mask: jax.Array,
    wsi_score: jax.Array,
    wsi_mu: jax.Array,
    wsi_logstd: jax.Array,
    rna_alignment_emb: jax.Array,
    rna_retention_emb: jax.Array,
    rna_retention_target: jax.Array,
    rna_mask: jax.Array,
    rna_score: jax.Array,
    rna_mu: jax.Array,
    rna_logstd: jax.Array,
    logit_scale: jax.Array,
    weights: MirrorLossWeights = MirrorLossWeights(),
    gather_axis: Optional[str] = None,
    alignment_loss_fn=None,
    valid: Optional[jax.Array] = None,
):
    """Five-term MIRROR loss (ref: losses/mirror_loss.py:74-135).

    Returns (total, alignment, wsi_retention, rna_retention, style, cluster).
    ``alignment_loss_fn(w, r, scale)`` overrides the contrastive term (used
    for the local-negatives parity mode, see ``local_clip_loss``).
    ``valid`` ([B] 0/1) excludes padded rows everywhere — pad+mask eval tail
    batches compute the exact unpadded loss while staying mesh-sharded.
    """
    if alignment_loss_fn is not None:
        alignment_loss = alignment_loss_fn(
            wsi_alignment_emb, rna_alignment_emb, logit_scale, valid=valid
        )
    else:
        alignment_loss = clip_loss(
            wsi_alignment_emb, rna_alignment_emb, logit_scale,
            gather_axis=gather_axis, valid=valid,
        )

    # fp32 at the loss boundary for the non-contrastive terms: the torch
    # reference under autocast runs F.softmax/F.kl_div in fp32 and its
    # half-precision reductions accumulate in fp32, so with model
    # dtype=bfloat16 a bf16 log_softmax over 3000 prototypes (~0.09 max abs
    # logprob error) or bf16 style/retention sums would diverge ~1e-3 rel
    # from the reference every step. The contrastive matmul above stays in
    # compute dtype — the reference's autocast logits matmul is fp16 there
    # (CLAUDE.md: bf16 is faithful for matmuls on the compute path).
    f32 = lambda x: jnp.asarray(x, jnp.float32)  # noqa: E731
    wsi_retention_emb, wsi_retention_target = map(
        f32, (wsi_retention_emb, wsi_retention_target))
    rna_retention_emb, rna_retention_target = map(
        f32, (rna_retention_emb, rna_retention_target))
    wsi_mask, rna_mask = f32(wsi_mask), f32(rna_mask)
    wsi_mu, wsi_logstd, rna_mu, rna_logstd = map(
        f32, (wsi_mu, wsi_logstd, rna_mu, rna_logstd))
    wsi_score, rna_score = f32(wsi_score), f32(rna_score)

    if valid is None:
        n_valid = jnp.asarray(float(wsi_alignment_emb.shape[0]), jnp.float32)
        row_w = None
    else:
        n_valid = jnp.maximum(jnp.sum(valid), 1.0)
        row_w = valid

    # WSI retention: per-token feature-mean MSE, masked mean over tokens
    # (ref :98-100).
    wsi_ret = jnp.mean((wsi_retention_emb - wsi_retention_target) ** 2, axis=-1)
    wsi_tok_mask = wsi_mask if row_w is None else wsi_mask * row_w[:, None]
    wsi_denom = jnp.sum(wsi_tok_mask)

    # RNA retention: elementwise MSE * mask / mask.sum — NO feature mean; this
    # reference quirk (ref :102-103) is reproduced deliberately.
    rna_ret = (rna_retention_emb - rna_retention_target) ** 2
    rna_tok_mask = rna_mask if row_w is None else rna_mask * row_w[:, None]
    rna_denom = jnp.sum(rna_tok_mask)

    if row_w is not None:
        # the valid-mask path is a TPU-only extension (padded eval tails):
        # guard its 0-valid 0/0 like the style/cluster terms' n_valid. The
        # plain path keeps the reference's NaN on an all-zero mask
        # (mask_ratio=0 misconfiguration) — a loud signal, parity-faithful.
        wsi_denom = jnp.maximum(wsi_denom, 1.0)
        rna_denom = jnp.maximum(rna_denom, 1.0)
    wsi_retention_loss = jnp.sum(wsi_ret * wsi_tok_mask) / wsi_denom
    rna_retention_loss = jnp.sum(rna_ret * rna_tok_mask) / rna_denom

    # Closed-form KL(N(mu, sigma) || N(0, 1)) summed over latent dims, batch
    # mean, averaged over the two modalities (ref :105-112).
    wsi_kl = jnp.sum(jnp.exp(wsi_logstd) + wsi_mu**2 - 1.0 - wsi_logstd, axis=1)
    rna_kl = jnp.sum(jnp.exp(rna_logstd) + rna_mu**2 - 1.0 - rna_logstd, axis=1)
    if row_w is not None:
        wsi_kl = wsi_kl * row_w
        rna_kl = rna_kl * row_w
    style_loss = 0.5 * (jnp.sum(wsi_kl) + jnp.sum(rna_kl)) / n_valid

    # Symmetric KL between prototype-assignment distributions (ref :114-119).
    wsi_logprob = jax.nn.log_softmax(wsi_score, axis=-1)
    rna_logprob = jax.nn.log_softmax(rna_score, axis=-1)
    wsi_prob = jnp.exp(wsi_logprob)
    rna_prob = jnp.exp(rna_logprob)
    kl_a = jnp.sum(rna_prob * (rna_logprob - wsi_logprob), axis=-1)
    kl_b = jnp.sum(wsi_prob * (wsi_logprob - rna_logprob), axis=-1)
    if row_w is not None:
        kl_a = kl_a * row_w
        kl_b = kl_b * row_w
    cluster_loss = 0.5 * (jnp.sum(kl_a) + jnp.sum(kl_b)) / n_valid

    total_loss = (
        weights.alignment * alignment_loss
        + weights.wsi_retention * wsi_retention_loss
        + weights.rna_retention * rna_retention_loss
        + weights.style * style_loss
        + weights.cluster * cluster_loss
    )
    return (
        total_loss,
        alignment_loss,
        wsi_retention_loss,
        rna_retention_loss,
        style_loss,
        cluster_loss,
    )
