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
    # F.normalize semantics: x / max(||x||, eps)
    norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
    return x / jnp.maximum(norm, eps)


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
        logits = jnp.concatenate([positive_logit, negative_logits], axis=1)
        labels = jnp.zeros(logits.shape[0], dtype=jnp.int32)
        return _xent(logits / temperature, labels, reduction)

    # In-batch negatives: positives on the diagonal.
    logits = query @ positive_key.T
    labels = jnp.arange(logits.shape[0], dtype=jnp.int32)
    if symmetric:
        logits2 = positive_key @ query.T
        return 0.5 * _xent(logits / temperature, labels, reduction, valid) + 0.5 * _xent(
            logits2 / temperature, labels, reduction, valid
        )
    return _xent(logits / temperature, labels, reduction, valid)
