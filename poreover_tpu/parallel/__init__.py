from .sharding import (
    make_mesh,
    merge_stats,
    shard_reads_for_host,
    sharded_train_step,
)

__all__ = [
    "make_mesh",
    "merge_stats",
    "shard_reads_for_host",
    "sharded_train_step",
]
