from .mesh import create_mesh, fit_mesh_to_batch, shard_batch, replicate
from .tensor_parallel import shard_state
from .distributed import (
    allgather_rows,
    assemble_global_batch,
    host_local_rows,
    local_block,
    maybe_initialize,
    process_info,
)

__all__ = [
    "create_mesh", "fit_mesh_to_batch", "shard_batch", "replicate",
    "shard_state",
    "allgather_rows", "assemble_global_batch", "host_local_rows",
    "local_block", "maybe_initialize", "process_info",
]
