"""Opt-in tensor parallelism over the mesh's ``model`` axis.

The reference has no tensor parallelism (SURVEY.md section 2.7 lists it as
an optional TPU-side extension); MIRROR-scale models fit one chip, but a
``model`` axis earns its keep when the data axis is starved — few-shot
fine-tunes whose clamped batch is below the chip count, and memory-bound
whole-cohort eval sweeps. The design is the idiomatic-JAX Megatron split:
annotate PARAMETER shardings only and let GSPMD propagate activation
shardings and insert the collectives (scaling-book recipe — no hand-written
all-reduces).

What gets sharded (per-leaf rules on the trailing path names):

- column-parallel (kernel axis 1, bias/LN vectors along ``model``): the RNA
  embedding ``fc1`` (rna_dim x 2*embed — the widest GEMM in the model), its
  mid-LayerNorm vectors, every transformer-block MLP ``fc1``, the RNA
  ``retention_head`` (embed x rna_dim), and the ``prototypes`` matrix
  (embed x num_prototypes).
- row-parallel (kernel axis 0): the matching second GEMMs — ``fc2`` of the
  embedding Mlp and of the block MLPs (GSPMD turns the contraction over the
  sharded axis into partial sums + all-reduce).
- everything else replicated: attention projections (12 tiny heads — the
  packed qkv split does not pay for its collectives at this width) and the
  whole WSI encoder (its hot path runs in Pallas kernels, which are
  batch-shard_mapped over ``data`` and see replicated weights;
  ops/_common.spmd_wrap).

A leaf whose shard axis does not divide the ``model`` size falls back to
replicated (logged once) — semantics never change, only the layout.

Optimizer/EMA state shards identically: the rules match on TRAILING path
segments, and optax's mu/nu (and the EMA copy) mirror the param tree under
their own prefixes.
"""

import logging
from typing import Any, Tuple

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_logger = logging.getLogger(__name__)

# (trailing path, sharded kernel axis); axis None = 1-D vector along "model"
_COL = (
    ("embedding", "fc1", "kernel"),
    ("mlp", "fc1", "kernel"),
    ("retention_head", "kernel"),
    ("prototypes", "kernel"),
)
_ROW = (
    ("embedding", "fc2", "kernel"),
    ("mlp", "fc2", "kernel"),
)
_VEC = (
    ("embedding", "fc1", "bias"),
    ("mlp", "fc1", "bias"),
    ("retention_head", "bias"),
    ("embedding", "norm", "scale"),
    ("embedding", "norm", "bias"),
)


def _path_names(path) -> Tuple[str, ...]:
    return tuple(
        str(getattr(k, "key", getattr(k, "name", getattr(k, "idx", k))))
        for k in path
    )


def _endswith(names: Tuple[str, ...], suffix: Tuple[str, ...]) -> bool:
    return len(names) >= len(suffix) and names[-len(suffix):] == suffix


def param_spec(path, leaf, model_parallel: int) -> P:
    """PartitionSpec for one state leaf (replicated when nothing matches)."""
    names = _path_names(path)
    if any(_endswith(names, s) for s in _COL):
        if leaf.ndim == 2 and leaf.shape[1] % model_parallel == 0:
            return P(None, "model")
    elif any(_endswith(names, s) for s in _ROW):
        if leaf.ndim == 2 and leaf.shape[0] % model_parallel == 0:
            return P("model", None)
    elif any(_endswith(names, s) for s in _VEC):
        if leaf.ndim == 1 and leaf.shape[0] % model_parallel == 0:
            return P("model")
    return P()


# TrainState fields whose leaves ZeRO-1 shards over ``data``: the Adam
# moments / grad-accumulation buffers under ``opt_state`` and the EMA shadow
# weights — state that is only READ elementwise inside the optimizer update,
# never by the model forward. ``params`` must stay replicated (the Pallas
# kernels' shard_map consumes them with in_spec P(); ops/_common.spmd_wrap).
_ZERO1_FIELDS = ("opt_state", "ema_params")


def zero1_spec(leaf, base: P, data_size: int) -> P:
    """Add a ``data``-axis shard to ``base`` on the first free divisible axis.

    ZeRO stage 1 (Rajbhandari et al. 2020) partitions optimizer state over
    the data-parallel ranks; the GSPMD form is a per-leaf PartitionSpec with
    ``data`` on one axis. Composes with tensor parallelism: axes ``base``
    already shards over ``model`` are skipped. Leaves with no axis divisible
    by ``data_size`` (scalars, odd vectors) stay at ``base`` — semantics are
    unchanged either way, only the layout."""
    ndim = getattr(leaf, "ndim", 0)
    if ndim == 0 or data_size == 1:
        return base
    entries = list(base) + [None] * (ndim - len(base))
    for i in range(ndim):
        if entries[i] is None and leaf.shape[i] % data_size == 0:
            return P(*entries[:i], "data", *entries[i + 1:])
    return base


def shard_state(mesh: Mesh, tree: Any, zero1: bool = False) -> Any:
    """Place a host-side state/params pytree on the mesh with tensor-parallel
    parameter shardings (falls back to plain replication when the ``model``
    axis is 1). With ``zero1`` (the ``--optimizer-sharding`` flag), optimizer
    and EMA state additionally shards over the ``data`` axis — ZeRO-1: pure
    DP replicates the fp32 Adam moments (2x param bytes) on every chip; the
    sharded layout divides that by the data size, for the per-step cost of
    one update all-gather (the train-step jit pins these shardings so they
    persist across donated steps — train/harness.py). Works multi-host:
    leaves are assembled per-shard via ``make_array_from_callback`` like
    ``replicate_from_host``."""
    mp = mesh.shape.get("model", 1)
    data_size = mesh.shape.get("data", 1)
    zero1 = zero1 and data_size > 1
    if mp == 1 and not zero1:
        from .mesh import replicate

        return replicate(mesh, tree)

    fallbacks = []

    def sharding_for(path, x):
        spec = param_spec(path, x, mp) if mp > 1 else P()
        names = _path_names(path)
        if mp > 1 and spec == P() and any(
            _endswith(names, s) for s in _COL + _ROW + _VEC
        ):
            fallbacks.append("/".join(names))
        if zero1 and names and names[0] in _ZERO1_FIELDS:
            spec = zero1_spec(x, spec, data_size)
        return NamedSharding(mesh, spec)

    shardings = jax.tree_util.tree_map_with_path(sharding_for, tree)
    if jax.process_count() > 1:
        # Per-shard host assembly (jit can't consume process-local numpy
        # over a multi-process mesh). np.array (copy) not np.asarray: on CPU
        # backends asarray can view the source device buffer, so the placed
        # leaves would alias the caller's tree and a later donated step
        # would delete both — same contract as parallel/mesh.py::fresh_copy_to.
        def put(x, sharding):
            xh = np.array(x)
            return jax.make_array_from_callback(
                xh.shape, sharding, lambda idx: xh[idx]
            )

        out = jax.tree.map(put, tree, shardings)
    else:
        from .mesh import fresh_copy_to

        out = fresh_copy_to(tree, shardings)
    if fallbacks:
        _logger.info(
            "model-parallel: %d leaves do not divide model=%d and stay "
            "replicated (e.g. %s)", len(fallbacks), mp, fallbacks[0],
        )
    return out
