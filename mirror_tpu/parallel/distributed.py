"""Multi-host (multi-process) SPMD support.

The reference trains multi-NODE via torchrun's c10d elastic rendezvous
(/root/reference/scripts/run_train_mirror.sh:62-68) with a DistributedSampler
sharding the sample space per rank (/root/reference/train_mirror.py:849-852).
The JAX equivalent is one process per host in a single SPMD program:

- ``maybe_initialize`` runs ``jax.distributed.initialize`` (the rendezvous)
  behind a flag/env, after which ``jax.devices()`` spans every host;
- the ``Loader`` shards each epoch's GLOBAL batch into per-process blocks
  (``local_block``), the DistributedSampler analogue — but blocked rather
  than strided, so the assembled global batch is IDENTICAL to the
  single-process batch at any process count (the index permutation is
  derived from the shared seed, so no rank communication is needed);
- ``assemble_global_batch`` turns each host's block into the global
  jax.Array via ``jax.make_array_from_process_local_data`` (devices in a
  mesh built from ``jax.devices()`` are process-major, matching the blocked
  layout);
- eval pulls per-host shards back with ``global_array_to_host_local_array``
  and reassembles the full batch on every host with ``process_allgather``
  (process-major tiling == global row order).

Single-process behavior is unchanged: every helper degrades to the identity
when ``jax.process_count() == 1``.

Env contract (the torchrun-rendezvous analogue for non-TPU-pod backends):
``MIRROR_COORDINATOR=host:port MIRROR_NUM_PROCESSES=N MIRROR_PROCESS_ID=i``.
On TPU pods, ``--distributed`` alone lets JAX auto-detect all three.
"""

import logging
import os
from typing import Any, Optional, Tuple

import numpy as np

_logger = logging.getLogger(__name__)


def maybe_initialize(args: Any = None) -> bool:
    """Initialize the JAX distributed runtime when requested.

    Triggers: ``args.distributed`` flag or the ``MIRROR_COORDINATOR`` env.
    Returns True when running multi-process after the call.
    """
    import jax

    if jax.distributed.is_initialized():
        return jax.process_count() > 1
    coord = os.environ.get("MIRROR_COORDINATOR")
    if not (coord or bool(getattr(args, "distributed", False))):
        return False
    kwargs = {}
    if coord:
        kwargs = dict(
            coordinator_address=coord,
            num_processes=int(os.environ["MIRROR_NUM_PROCESSES"]),
            process_id=int(os.environ["MIRROR_PROCESS_ID"]),
        )
    jax.distributed.initialize(**kwargs)
    _logger.info(
        "distributed: process %d/%d, %d global / %d local devices",
        jax.process_index(), jax.process_count(),
        jax.device_count(), jax.local_device_count(),
    )
    return jax.process_count() > 1


def process_info(
    process_index: Optional[int] = None, process_count: Optional[int] = None
) -> Tuple[int, int]:
    """Resolve (process_index, process_count), defaulting to the live JAX
    runtime (0/1 when not distributed)."""
    if process_index is None or process_count is None:
        import jax

        process_index = jax.process_index() if process_index is None else process_index
        process_count = jax.process_count() if process_count is None else process_count
    return process_index, process_count


def local_block(
    chunk: np.ndarray, process_index: int, process_count: int
) -> np.ndarray:
    """This process's rows of one GLOBAL batch chunk (len divisible by
    process_count). Blocked layout: process p owns rows
    [p*lbs, (p+1)*lbs) — the row order ``make_array_from_process_local_data``
    realizes on a process-major device mesh, so concatenating the blocks in
    process order reproduces the single-process batch exactly."""
    n = len(chunk)
    assert n % process_count == 0, (n, process_count)
    lbs = n // process_count
    return chunk[process_index * lbs : (process_index + 1) * lbs]


def assemble_global_batch(mesh, local_batch: Any) -> Any:
    """Per-host local block -> global batch-sharded jax.Array tree."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    def put(x):
        spec = P("data", *([None] * (x.ndim - 1)))
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), np.asarray(x)
        )

    return jax.tree.map(put, local_batch)


def replicate_from_host(mesh, tree: Any) -> Any:
    """Replicate identical host values onto every device of a (possibly
    multi-host) mesh. All processes must hold the same values — guaranteed
    here because params/state are derived from the shared seed."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P())

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])

    return jax.tree.map(put, tree)


def host_local_rows(mesh, array) -> np.ndarray:
    """This process's rows of a batch-sharded global array (inverse of
    assemble_global_batch for one leaf)."""
    import jax
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P

    if jax.process_count() == 1:
        return np.asarray(array)
    spec = P("data", *([None] * (array.ndim - 1)))
    local = multihost_utils.global_array_to_host_local_array(array, mesh, spec)
    return np.asarray(local)


def allgather_rows(array: np.ndarray) -> np.ndarray:
    """Concatenate per-process host arrays along axis 0 in process order
    (== global row order under the blocked layout). Identity when
    single-process."""
    import jax

    if jax.process_count() == 1:
        return np.asarray(array)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(array, tiled=True))
