from . import comm
from .mesh import (
    batch_sharding,
    get_mesh,
    global_mesh,
    replicate,
    replicated,
    set_global_mesh,
    shard_batch,
)

__all__ = [
    "batch_sharding",
    "comm",
    "get_mesh",
    "global_mesh",
    "replicate",
    "replicated",
    "set_global_mesh",
    "shard_batch",
]
