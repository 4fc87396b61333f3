from .mesh import create_mesh, shard_batch, replicate

__all__ = ["create_mesh", "shard_batch", "replicate"]
