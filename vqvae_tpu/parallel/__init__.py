from .mesh import (
    get_mesh,
    run_on_cpu,
    data_sharding,
    replicated_sharding,
    source_sharding,
    shard_batch,
    local_device_count,
)

__all__ = [
    "get_mesh",
    "run_on_cpu",
    "data_sharding",
    "replicated_sharding",
    "source_sharding",
    "shard_batch",
    "local_device_count",
]
