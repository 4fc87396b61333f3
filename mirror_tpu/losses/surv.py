"""Discrete-time survival losses as pure JAX functions.

Semantics match the reference implementations:
- ``nll_surv_loss``  == /root/reference/losses/nll_surv.py:5-94
- ``ce_surv_loss``   == /root/reference/losses/cross_entropy_surv.py:5-105

Conventions (identical to the reference):
- ``logits``: [N, M] raw outputs; hazards = sigmoid(logits).
- ``event_times``: [N] integer interval index T_i (the discretized bin).
- ``censoring``: [N]; 1 == event occurred at T_i (uncensored / DECEASED),
  0 == censored at T_i. NOTE the reference's ``censorship`` column is derived
  from "1:DECEASED" so 1 means *event*, opposite of the usual "censored" flag.
"""

import jax
import jax.numpy as jnp


def _reduce(loss: jax.Array, reduction: str, valid=None) -> jax.Array:
    """Per-sample -> reduced loss; ``valid`` ([N] 0/1) excludes padded rows
    so a loader-padded tail batch reduces exactly like the reference's
    small tail batch."""
    if valid is not None:
        loss = loss * valid
        if reduction == "mean":
            return jnp.sum(loss) / jnp.maximum(jnp.sum(valid), 1.0)
        if reduction == "sum":
            return jnp.sum(loss)
        return loss
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    return loss


def nll_surv_loss(
    logits: jax.Array,
    event_times: jax.Array,
    censoring: jax.Array,
    alpha: float = 0.0,
    eps: float = 1e-7,
    reduction: str = "mean",
    valid=None,
) -> jax.Array:
    """Negative log-likelihood for discrete survival (ref: losses/nll_surv.py).

    ``valid`` ([N] 0/1, optional) drops loader-padded tail rows from the
    reduction — the padded multi-chip tail batch then yields exactly the
    reference's small-tail-batch loss/gradients."""
    n, m = logits.shape
    hazards = jax.nn.sigmoid(logits)
    hazards = jnp.clip(hazards, eps, 1.0 - eps)
    log_h = jnp.log(hazards)
    log_1mh = jnp.log(1.0 - hazards)

    t = event_times.astype(jnp.int32)[:, None]
    time_range = jnp.arange(m, dtype=jnp.int32)[None, :]
    uncensored = (censoring == 1)
    censored = (censoring == 0)

    # Uncensored: survived intervals < T, event at T.
    unc_survival = jnp.sum(jnp.where(time_range < t, log_1mh, 0.0), axis=1)
    unc_event = jnp.sum(jnp.where(time_range == t, log_h, 0.0), axis=1)
    uncensored_nll = -(unc_survival + unc_event)

    # Censored: survived intervals <= T.
    cen_survival = jnp.sum(jnp.where(time_range <= t, log_1mh, 0.0), axis=1)
    censored_nll = -cen_survival

    neg_l = jnp.where(uncensored, uncensored_nll, 0.0) + jnp.where(
        censored, censored_nll, 0.0
    )
    uncensored_only = jnp.where(uncensored, uncensored_nll, 0.0)
    loss = (1.0 - alpha) * neg_l + alpha * uncensored_only
    return _reduce(loss, reduction, valid)


def ce_surv_loss(
    logits: jax.Array,
    event_times: jax.Array,
    censoring: jax.Array,
    eps: float = 1e-7,
    reduction: str = "mean",
    valid=None,
) -> jax.Array:
    """Cross-entropy over the full discrete event distribution
    (ref: losses/cross_entropy_surv.py).

    Builds p(event at t) = h_t * prod_{j<t}(1-h_j) for t in [0, M), plus
    p(no event) = S_M as class M, renormalizes, and takes CE against the
    target bin (censored -> class M). ``valid`` as in nll_surv_loss.
    """
    n, m = logits.shape
    hazards = jnp.clip(jax.nn.sigmoid(logits), eps, 1.0 - eps)
    one_minus_h = 1.0 - hazards
    survival = jnp.cumprod(one_minus_h, axis=1)  # S_t = prod_{j<=t}(1-h_j)
    survival_padded = jnp.concatenate(
        [jnp.ones((n, 1), dtype=survival.dtype), survival], axis=1
    )
    p_event = hazards * survival_padded[:, :-1]
    p_no_event = survival[:, -1:]
    p_dist = jnp.concatenate([p_event, p_no_event], axis=1)  # [N, M+1]
    p_dist = p_dist / jnp.clip(jnp.sum(p_dist, axis=1, keepdims=True), eps)

    targets = jnp.where(
        censoring == 1, event_times.astype(jnp.int32), jnp.full_like(event_times, m)
    ).astype(jnp.int32)
    chosen_p = jnp.clip(
        jnp.take_along_axis(p_dist, targets[:, None], axis=1)[:, 0], eps
    )
    loss = -jnp.log(chosen_p)
    return _reduce(loss, reduction, valid)
