from gabby_tpu.parallel.mesh import initialize_multihost, local_mesh, make_mesh
from gabby_tpu.parallel.sharding import (
    cache_shardings, cache_specs, paged_cache_shardings, paged_cache_specs,
    param_shardings, param_specs, shard_params, sharded_device_put_fn,
)

__all__ = [
    "make_mesh", "local_mesh", "initialize_multihost",
    "param_specs", "param_shardings", "shard_params",
    "sharded_device_put_fn", "cache_specs", "cache_shardings",
    "paged_cache_specs", "paged_cache_shardings",
]
