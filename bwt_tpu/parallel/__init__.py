from bwt_tpu.parallel.mesh import (
    gather_hits,
    make_mesh,
    replicate_index,
    shard_index,
    sharded_search_step,
    shard_patterns,
)

__all__ = [
    "gather_hits",
    "make_mesh",
    "replicate_index",
    "shard_index",
    "sharded_search_step",
    "shard_patterns",
]
