from .mesh import MeshConfig, build_mesh, local_batch_slice
from .sharding import batch_sharding, param_shardings, replicated

__all__ = [
    "MeshConfig",
    "build_mesh",
    "local_batch_slice",
    "batch_sharding",
    "param_shardings",
    "replicated",
]
