from .mesh import (
    make_mesh,
    replicate,
    shard_batch,
    batch_sharding,
    replicated_sharding,
    sync_metrics,
)
from .dist import initialize_distributed, process_index, process_count, is_master

__all__ = [
    "make_mesh",
    "replicate",
    "shard_batch",
    "batch_sharding",
    "replicated_sharding",
    "sync_metrics",
    "initialize_distributed",
    "process_index",
    "process_count",
    "is_master",
]
