"""Deterministic seeding.

The reference seeds torch/numpy global RNGs per rank
(/root/reference/train_mirror.py:682 via timm.utils.random_seed). JAX has no
global RNG: we seed numpy (host-side data sampling) and hand out an explicit
root ``jax.random`` key for everything on device.
"""

import random

import jax
import numpy as np


def random_seed(seed: int = 42, rank: int = 0) -> jax.Array:
    """Seed host RNGs and return the root JAX PRNG key for this process."""
    np.random.seed(seed + rank)
    random.seed(seed + rank)
    return jax.random.PRNGKey(seed + rank)
