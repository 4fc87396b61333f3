"""Functional train state.

Everything the reference mutates in-place on the nn.Module / optimizer
(weights, Adam moments, EMA shadow weights, the per-step prototype renorm
and logit-scale clamp) lives here as an immutable pytree, updated inside the
jitted train step.
"""

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any
    ema_params: Optional[Any] = None


def create_train_state(params, tx, model_ema: bool = False) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        ema_params=jax.tree.map(jnp.copy, params) if model_ema else None,
    )
