from gabby_tpu.parallel.mesh import make_mesh, local_mesh
from gabby_tpu.parallel.sharding import (
    param_specs, param_shardings, shard_params, cache_specs, cache_shardings,
)

__all__ = [
    "make_mesh", "local_mesh", "param_specs", "param_shardings",
    "shard_params", "cache_specs", "cache_shardings",
]
