"""InfoNCE contrastive loss (ref: /root/reference/losses/info_nce.py:9-172).

Pure function; supports the same three negative modes as the reference:
- negative_keys=None: in-batch negatives (off-diagonal), optional symmetric.
- unpaired: negatives [M, D] shared across queries.
- paired: negatives [N, M, D] per query.
"""

from typing import Optional

import jax
import jax.numpy as jnp


def _l2_normalize(x: jax.Array, eps: float = 1e-12) -> jax.Array:
    # F.normalize default semantics (the reference's info_nce.py uses the
    # default eps=1e-12). Delegates to the shared implementation so the
    # alignment-head and InfoNCE paths normalize with identical numerics
    # (fp32-accumulated norm — a bf16 sum of 768 squares is ~1% off).
    from mirror_tpu.models.layers import l2_normalize

    return l2_normalize(x, eps=eps)


def _xent(
    logits: jax.Array,
    labels: jax.Array,
    reduction: str,
    valid: Optional[jax.Array] = None,
) -> jax.Array:
    """``valid`` ([B] 0/1) drops padded rows from the reduction and padded
    columns from the softmax normalizer (exact pad+mask eval tails)."""
    if valid is not None:
        logits = logits + jnp.where(valid[None, :] > 0, 0.0, -1e9)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    if valid is not None:
        if reduction == "mean":
            return jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1.0)
        if reduction == "sum":
            return jnp.sum(nll * valid)
        return nll * valid
    if reduction == "mean":
        return jnp.mean(nll)
    if reduction == "sum":
        return jnp.sum(nll)
    return nll


def info_nce(
    query: jax.Array,
    positive_key: jax.Array,
    negative_keys: Optional[jax.Array] = None,
    temperature: float = 0.1,
    reduction: str = "mean",
    negative_mode: str = "unpaired",
    symmetric: bool = False,
    valid: Optional[jax.Array] = None,
) -> jax.Array:
    if valid is not None and negative_keys is not None:
        raise ValueError("valid mask is only supported with in-batch negatives")
    if query.ndim != 2 or positive_key.ndim != 2:
        raise ValueError("<query>/<positive_key> must have 2 dimensions.")
    if negative_keys is not None:
        if negative_mode == "unpaired" and negative_keys.ndim != 2:
            raise ValueError("unpaired negative_keys must be 2-D")
        if negative_mode == "paired" and negative_keys.ndim != 3:
            raise ValueError("paired negative_keys must be 3-D")

    query = _l2_normalize(query)
    positive_key = _l2_normalize(positive_key)
    if negative_keys is not None:
        negative_keys = _l2_normalize(negative_keys)
        positive_logit = jnp.sum(query * positive_key, axis=1, keepdims=True)
        if negative_mode == "unpaired":
            negative_logits = query @ negative_keys.T
        else:  # paired
            negative_logits = jnp.einsum("nd,nmd->nm", query, negative_keys)
        # fp32 from here: the reference's F.cross_entropy promotes its half
        # logits to fp32 under autocast; the similarity matmuls above stay
        # in compute dtype (autocast fp16 there — bf16 is faithful)
        logits = jnp.concatenate(
            [positive_logit, negative_logits], axis=1
        ).astype(jnp.float32)
        labels = jnp.zeros(logits.shape[0], dtype=jnp.int32)
        return _xent(logits / temperature, labels, reduction)

    # In-batch negatives: positives on the diagonal. fp32 after the matmul,
    # as above.
    logits = (query @ positive_key.T).astype(jnp.float32)
    labels = jnp.arange(logits.shape[0], dtype=jnp.int32)
    if symmetric:
        logits2 = (positive_key @ query.T).astype(jnp.float32)
        return 0.5 * _xent(logits / temperature, labels, reduction, valid) + 0.5 * _xent(
            logits2 / temperature, labels, reduction, valid
        )
    return _xent(logits / temperature, labels, reduction, valid)


def local_info_nce(
    query: jax.Array,
    positive_key: jax.Array,
    mesh,
    temperature: float = 0.1,
    symmetric: bool = False,
    valid: Optional[jax.Array] = None,
    axis_name: str = "data",
) -> jax.Array:
    """Per-shard in-batch InfoNCE — the reference's exact multi-GPU
    semantics for train_pretrain (the torch loss sees only its rank's batch
    and DDP averages the losses; ref losses/info_nce.py:9-172 has no
    cross-rank gather). Under plain jit the sharded logit matmul is global
    mathematics, so local negatives need shard_map: each data shard
    computes its own [b_local, b_local] CE and the shards pmean — identical
    to N DDP ranks of batch b_local. Mirrors losses/mirror_loss.py::
    local_clip_loss, including the fully-padded-shard exclusion for eval
    tails."""
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    from jax.sharding import PartitionSpec as P

    if valid is None:
        valid = jnp.ones((query.shape[0],), jnp.float32)

    def per_shard(q, pk, v):
        has = jnp.sum(v) > 0
        loss = jnp.where(
            has,
            info_nce(q, pk, temperature=temperature, symmetric=symmetric,
                     valid=v),
            0.0,
        )
        num = jax.lax.psum(loss, axis_name)
        den = jax.lax.psum(has.astype(jnp.float32), axis_name)
        return num / jnp.maximum(den, 1.0)

    return shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(axis_name)),
        out_specs=P(),
    )(query, positive_key, valid)
