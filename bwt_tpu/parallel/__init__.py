from bwt_tpu.parallel.mesh import (
    gather_hits,
    init_distributed,
    make_mesh,
    replicate_index,
    shard_index,
    sharded_search_step,
    shard_patterns,
    tp_locate,
)

__all__ = [
    "gather_hits",
    "init_distributed",
    "make_mesh",
    "replicate_index",
    "shard_index",
    "sharded_search_step",
    "shard_patterns",
    "tp_locate",
]
