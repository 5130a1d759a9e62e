from .sharding import (
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
    replicate,
    pad_to_multiple,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "replicate",
    "pad_to_multiple",
]
