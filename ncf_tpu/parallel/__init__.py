from ncf_tpu.parallel.embedding_sharding import ShardedEmbedding
from ncf_tpu.parallel.sharded_topk import (
    ShardedPreparedItems, ShardedPreparedItemsInt8, shard_items,
    shard_prepare_items, shard_prepare_items_int8,
    sharded_topk_scores, sharded_topk_scores_prepared)
from ncf_tpu.parallel.multihost import (
    initialize_distributed,
    is_primary,
    local_batch_slice,
    mesh_shape_for_hosts,
    sync_hosts,
)
from ncf_tpu.parallel.mesh import (
    DCN_AXIS,
    ICI_AXIS,
    batch_sharding,
    stacked_batch_sharding,
    make_mesh,
    pad_rows,
    param_shardings,
    param_spec,
    replicated,
    shard_pytree,
    state_shardings,
    state_spec,
)

__all__ = [
    "ShardedEmbedding",
    "initialize_distributed",
    "is_primary",
    "local_batch_slice",
    "mesh_shape_for_hosts",
    "sync_hosts",
    "DCN_AXIS",
    "ICI_AXIS",
    "make_mesh",
    "param_shardings",
    "param_spec",
    "state_shardings",
    "state_spec",
    "batch_sharding",
    "stacked_batch_sharding",
    "replicated",
    "shard_pytree",
    "pad_rows",
    "ShardedPreparedItems",
    "ShardedPreparedItemsInt8",
    "shard_items",
    "shard_prepare_items",
    "shard_prepare_items_int8",
    "sharded_topk_scores",
    "sharded_topk_scores_prepared",
]
