from .mesh import make_mesh, MeshSpec
from .sharding import shard_batch, shard_params, replicate, to_host_local

__all__ = [
    "make_mesh",
    "MeshSpec",
    "shard_batch",
    "shard_params",
    "replicate",
    "to_host_local",
]
