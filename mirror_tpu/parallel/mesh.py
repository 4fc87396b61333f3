"""Device mesh + sharding helpers (SPMD data parallelism).

The reference's only parallelism is torchrun DDP over NCCL
(/root/reference/train_mirror.py:801-813, SURVEY.md section 2.7/2.8). The TPU
equivalent is single-controller SPMD: one ``jax.sharding.Mesh`` with a
``data`` axis; the batch is sharded over it and XLA derives gradient
all-reduces over ICI from the sharding annotations. No process groups, no
DistributedSampler — the host-side loader shards the sample index space.

A ``model`` axis is reserved for optional tensor-parallel sharding of the
10k-dim RNA embedding matmul (not needed for parity; mesh shape (N, 1) by
default).
"""

import functools
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    num_devices: Optional[int] = None,
    model_parallel: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if num_devices is not None:
        devices = devices[:num_devices]
    n = len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    grid = np.array(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, ("data", "model"))


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Place a host batch on the mesh, sharded along the leading axis.

    Multi-process: the host batch is this process's BLOCK of the global
    batch (the Loader's blocked sharding); the global array is assembled
    via make_array_from_process_local_data (parallel/distributed.py)."""
    if jax.process_count() > 1:
        from .distributed import assemble_global_batch

        return assemble_global_batch(mesh, batch)

    def put(x):
        spec = P("data", *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree.map(put, batch)


def _copy_body(tree):
    import jax.numpy as jnp

    return jax.tree.map(jnp.copy, tree)


@functools.lru_cache(maxsize=32)
def _copy_fn(treedef, sharding_leaves):
    shardings = jax.tree.unflatten(treedef, list(sharding_leaves))
    return jax.jit(_copy_body, out_shardings=shardings)


def fresh_copy_to(tree: Any, shardings: Any) -> Any:
    """Place ``tree`` with per-leaf ``shardings``, guaranteeing fresh buffers.

    Contract: the returned leaves never alias the caller's buffers. A bare
    ``jax.device_put`` may reuse the source device-0 buffer on some backends;
    the harness's donated train step then deletes it, silently killing the
    caller's copy (the round-4 red ZeRO-1 test). A jitted copy with pinned
    ``out_shardings`` meets the contract on-device: without donation, jit
    output buffers are always newly allocated — and unlike a host-numpy
    round trip it never pulls already-on-device state back over PCIe (or,
    on this rig, the MB/s-scale tunnel). The jitted copy is memoized on
    (treedef, shardings) so repeat placements of same-structured state
    don't re-trace (the remote-compile service here makes even trivial
    recompiles expensive)."""
    leaves, treedef = jax.tree.flatten(tree)
    if not leaves:
        return tree
    sharding_leaves = tuple(jax.tree.leaves(shardings))
    return _copy_fn(treedef, sharding_leaves)(tree)


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Replicate a pytree over the mesh (fresh buffers — see fresh_copy_to)."""
    if jax.process_count() > 1:
        from .distributed import replicate_from_host

        return replicate_from_host(mesh, tree)
    sharding = NamedSharding(mesh, P())
    return fresh_copy_to(tree, jax.tree.map(lambda _: sharding, tree))


def fit_mesh_to_batch(mesh: Mesh, batch_size: int) -> Mesh:
    """Shrink a data-parallel mesh so ``batch_size`` divides it.

    Few-shot fine-tuning clamps the batch below the chip count (a 2-shot
    support set is <= 2*num_classes samples; the reference's power-of-2
    clamp at train_subtyping.py:935-939 then runs it on its single GPU).
    On a TPU slice the exact equivalent is data parallelism over the
    largest divisor of the clamped batch — gcd(batch, n_devices) chips —
    leaving the rest idle for the (seconds-long) probe rather than
    changing semantics by padding or resampling. Single-process only:
    multi-host meshes must keep every process's devices."""
    import math

    model_parallel = mesh.shape.get("model", 1)
    # the batch shards over the DATA axis only (shard_batch): with tensor
    # parallelism the model axis must not enter the divisibility test
    n = mesh.shape.get("data", mesh.devices.size)
    if batch_size % n == 0:
        return mesh
    if jax.process_count() > 1:
        raise SystemExit(
            f"batch_size {batch_size} must divide over the data axis ({n}) "
            "(cannot shrink a multi-process mesh)"
        )
    d = math.gcd(batch_size, n)
    sub = create_mesh(num_devices=d * model_parallel,
                      model_parallel=model_parallel,
                      devices=list(mesh.devices.flat))
    # keep the Pallas layer's shard_map mesh in sync with the shrunk mesh
    from mirror_tpu.ops._common import active_spmd_mesh, set_spmd_mesh

    if active_spmd_mesh() is not None:
        set_spmd_mesh(sub)
    return sub


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
