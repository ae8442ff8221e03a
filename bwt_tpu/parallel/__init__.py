from bwt_tpu.parallel.mesh import (
    gather_hits,
    init_distributed,
    make_mesh,
    replicate_index,
    shard_index,
    sharded_search_step,
    shard_patterns,
    fmi_spec_tree,
    tp_locate,
    tp_view,
)
from bwt_tpu.parallel.suffix_dist import (
    build_index_sharded,
    sharded_suffix_array,
)

__all__ = [
    "build_index_sharded",
    "gather_hits",
    "init_distributed",
    "make_mesh",
    "replicate_index",
    "shard_index",
    "sharded_search_step",
    "shard_patterns",
    "sharded_suffix_array",
    "fmi_spec_tree",
    "tp_locate",
    "tp_view",
]
