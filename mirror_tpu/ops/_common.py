"""Shared plumbing for the Pallas TPU kernels.

Single source for the interpret-mode check (non-TPU backends fall back to
``pl.pallas_call(interpret=True)`` so the CPU test suite exercises the same
kernel code), the widened scoped-VMEM budget used by the batch-grouped /
channel-blocked kernels whose working sets exceed Mosaic's 16 MB default,
and the SPMD shard_map wrapper every public kernel entry point goes
through on a multi-device mesh.

Why the wrapper exists: XLA's SPMD partitioner cannot partition Mosaic
custom calls — jitting a Pallas op for >1 device raises
``NotImplementedError: Mosaic kernels cannot be automatically partitioned.
Please wrap the call in a shard_map.`` (jax/_src/tpu_custom_call.py, the
``ShardingContext.num_devices != 1`` branch). Every kernel here is
batch-parallel (the grid blocks over batch/heads/channels and never mixes
rows of different batch elements), so the correct SPMD form is a shard_map
over the mesh with the batch dim split along ``data`` and weights
replicated — each chip runs the unmodified kernel on its shard, exactly
the DDP decomposition of the reference (SURVEY.md section 2.7). Training
entry points register the live mesh via :func:`set_spmd_mesh` (the train
harness does this right after ``create_mesh``); with no mesh registered —
or a 1-device mesh, e.g. the single-chip bench — ops call the kernel
directly and nothing changes.
"""

import functools
from typing import Any, Optional, Sequence

import jax
from jax.sharding import Mesh, PartitionSpec as P

# gb=8 batch-grouped conv blocks and the channel-blocked PPEG overflow the
# 16 MB default scoped window; the chip's physical VMEM is 128 MB, and 64 MB
# leaves headroom for Mosaic's own temporaries (measured: the fused PPEG
# backward at [64,46,46,768] needs >76 MB unblocked — see BASELINE.md).
VMEM_LIMIT_WIDE = 64 * 1024 * 1024


def use_interpret() -> bool:
    """True off-TPU: run the kernel in Pallas interpret mode."""
    return jax.default_backend() != "tpu"


_SPMD_MESH: Optional[Mesh] = None


def set_spmd_mesh(mesh: Optional[Mesh]) -> None:
    """Register the mesh whose ``data`` axis batches are sharded over.

    Call sites: the train harness (``common_setup``), the data-parallel
    feature-gen extractor, and multi-device tests. Pass ``None`` (or a
    1-device mesh) to restore direct kernel calls.

    jit trace caches key on (function, avals) but NOT on this context, so a
    function traced before registration would silently reuse its unwrapped
    trace afterwards — changing the registered value therefore clears jax's
    compilation caches (a per-process-startup event in practice; tests that
    toggle it pay a retrace, which is the point)."""
    global _SPMD_MESH
    new = None
    if mesh is not None and mesh.devices.size > 1:
        assert "data" in mesh.axis_names, mesh
        new = mesh
    # content comparison (Mesh defines __eq__): re-registering an equal but
    # distinct Mesh object (predict after common_setup, tests re-entering a
    # CLI) must NOT throw away every compiled program — a full-model
    # retrace is ~30 s through this rig's remote-compile service
    if new != _SPMD_MESH:
        _SPMD_MESH = new
        jax.clear_caches()


def active_spmd_mesh() -> Optional[Mesh]:
    return _SPMD_MESH


def spmd_wrap(fn, *args: Any, replicated: Sequence[int] = ()) -> Any:
    """Run a batch-parallel kernel, shard_mapped over the active mesh.

    ``fn`` must take only array arguments (close over statics). Every arg
    not listed in ``replicated`` is split on its leading (batch) dim along
    the mesh's ``data`` axis; ``replicated`` args (weights, scalars) are
    passed whole to every shard. With no active mesh this is ``fn(*args)``.
    """
    mesh = _SPMD_MESH
    if mesh is None:
        return fn(*args)
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    n_data = mesh.shape["data"]
    for i, a in enumerate(args):
        if i in replicated:
            continue
        if a.ndim == 0 or a.shape[0] % n_data:
            raise ValueError(
                f"Pallas op batch dim {a.shape} (arg {i}) does not divide "
                f"the mesh's data axis ({n_data}); pad the batch to a "
                "device multiple (the loaders' pad_last does this)"
            )
    in_specs = tuple(
        P() if i in replicated else P("data") for i in range(len(args))
    )
    # out_specs as a pytree PREFIX: every kernel output is batch-sharded, so
    # a single P("data") covers any output structure — no jax.eval_shape
    # pre-trace (which abstractly traced every kernel a second time per
    # compilation on a rig where full-model retraces already cost ~30 s).
    # check_vma=False: the bodies are custom_vjp pallas calls whose
    # replication types shard_map cannot infer; outputs are genuinely
    # batch-sharded so no correctness is lost.
    return shard_map(
        fn, mesh=mesh, in_specs=in_specs, out_specs=P("data"),
        check_vma=False,
    )(*args)


def spmd_wrapped(replicated: Sequence[int] = ()):
    """Decorator form of :func:`spmd_wrap` for array-only entry points."""

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*args):
            return spmd_wrap(fn, *args, replicated=replicated)

        return wrapper

    return deco
