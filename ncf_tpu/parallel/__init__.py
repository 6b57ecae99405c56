from ncf_tpu.parallel.mesh import (
    DCN_AXIS,
    ICI_AXIS,
    batch_sharding,
    make_mesh,
    pad_rows,
    param_shardings,
    param_spec,
    replicated,
    shard_pytree,
)

__all__ = [
    "DCN_AXIS",
    "ICI_AXIS",
    "make_mesh",
    "param_shardings",
    "param_spec",
    "batch_sharding",
    "replicated",
    "shard_pytree",
    "pad_rows",
]
