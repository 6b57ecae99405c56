"""Device mesh construction and sharding specs.

TPU-native replacement for torchrec ``DistributedModelParallel``
(reference: src/model/trainer.py:85-88 wraps the model over GPU device
ids with NCCL underneath; SURVEY.md §2.8).  Here parallelism is declared,
not wrapped: a ``Mesh`` with ``('dcn', 'ici')`` axes (hosts x chips),
embedding tables row-sharded over ``'ici'`` with ``P('ici', None)``, the
dense attention/MLP tower replicated, and the batch sharded over both axes
— XLA then inserts the all-gather/psum collectives that NCCL performed
imperatively in the reference stack.
"""

from __future__ import annotations

import logging
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

log = logging.getLogger(__name__)

DCN_AXIS = "dcn"
ICI_AXIS = "ici"

# param-path substrings identifying row-shardable embedding tables
EMBEDDING_TABLE_KEYS = (
    "user_emb", "item_emb",           # AdvancedNCF fused tables
    "mf_user", "mf_item", "mlp_user", "mlp_item",  # NCF/NeuMF tables
    "gmf_user", "gmf_item",
)

# optimizer-state-only leaves that shard with their table's row axis:
# the sparse-update path's rowwise accumulators (train/step.py::
# init_sparse_opt_state) are keyed by table, not by param path
EMBEDDING_STATE_KEYS = EMBEDDING_TABLE_KEYS + ("user_acc", "item_acc")


def make_mesh(
    dcn: int = 1, ici: int = -1, devices: Optional[list] = None
) -> Mesh:
    """Build a (dcn, ici) mesh.  ``ici=-1`` uses all remaining devices.
    Single-chip still gets a (1, 1) mesh so the same code path runs
    everywhere."""
    devices = list(devices if devices is not None else jax.devices())
    if ici == -1:
        ici = len(devices) // dcn
    n = dcn * ici
    if n > len(devices):
        raise ValueError(f"mesh {dcn}x{ici} needs {n} devices, have {len(devices)}")
    arr = np.array(devices[:n]).reshape(dcn, ici)
    return Mesh(arr, (DCN_AXIS, ICI_AXIS))


def _path_name(path) -> str:
    return ".".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def param_spec(path, leaf, mesh: Mesh, shard_embeddings: bool = True) -> P:
    """PartitionSpec for one parameter leaf: embedding tables row-sharded
    over ICI (when divisible), everything else replicated."""
    name = _path_name(path)
    ici_size = mesh.shape[ICI_AXIS]
    if (
        shard_embeddings
        and ici_size > 1
        and hasattr(leaf, "ndim") and leaf.ndim == 2
        and any(k in name for k in EMBEDDING_TABLE_KEYS)
    ):
        if leaf.shape[0] % ici_size == 0:
            return P(ICI_AXIS, None)
        log.warning(
            "table %s rows=%d not divisible by ici=%d; replicating "
            "(pad the table with pad_rows())", name, leaf.shape[0], ici_size)
    return P()


def param_shardings(params: Any, mesh: Mesh, shard_embeddings: bool = True):
    """Pytree of NamedShardings matching ``params``."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(
            mesh, param_spec(path, leaf, mesh, shard_embeddings)),
        params)


def state_spec(path, leaf, mesh: Mesh, shard_embeddings: bool = True) -> P:
    """PartitionSpec for an optimizer-state leaf: any state whose path
    names a table and whose leading axis is the table's row axis shards
    with the table.  Covers 2D Adam moments ([rows, d], same rule as
    param_spec) AND the 1D rowwise-Adagrad accumulators ([rows]) that
    ``train.embedding_optimizer=rowwise_adagrad`` introduces — those are
    fresh ``jnp.full`` arrays, not ``zeros_like(param)``, so they do not
    inherit the param sharding and must be placed explicitly."""
    name = _path_name(path)
    ici_size = mesh.shape[ICI_AXIS]
    if (
        shard_embeddings
        and ici_size > 1
        and hasattr(leaf, "ndim") and leaf.ndim in (1, 2)
        and any(k in name for k in EMBEDDING_STATE_KEYS)
        and leaf.shape[0] % ici_size == 0
    ):
        return P(ICI_AXIS, *([None] * (leaf.ndim - 1)))
    return P()


def state_shardings(state: Any, mesh: Mesh, shard_embeddings: bool = True):
    """Pytree of NamedShardings for an optax optimizer state."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(
            mesh, state_spec(path, leaf, mesh, shard_embeddings)),
        state)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Data-parallel batch: leading axis split over (dcn, ici)."""
    return NamedSharding(mesh, P((DCN_AXIS, ICI_AXIS)))


def stacked_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Multi-step dispatch batches [K, B]: the scan axis K is replicated,
    the batch axis B is data-parallel."""
    return NamedSharding(mesh, P(None, (DCN_AXIS, ICI_AXIS)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_pytree(tree: Any, shardings: Any):
    """device_put every leaf with its sharding."""
    return jax.tree_util.tree_map(jax.device_put, tree, shardings)


def pad_rows(num_rows: int, ici: int) -> int:
    """Round a table's row count up so it divides the ICI axis (embedding
    ids beyond the true vocabulary are simply never looked up)."""
    return -(-num_rows // ici) * ici
