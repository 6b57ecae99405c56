"""Item-sharded top-k retrieval: catalogs beyond one chip's HBM.

The reference serves candidates from Vertex Vector Search (a managed ANN
service; reference: src/api/routes.py:59, setup_tree_ah_endpoint.py) —
this framework retrieves exactly on-chip (ncf_tpu.ops.topk), and for
catalogs that exceed one chip's HBM (a 100M-item x d=64 bf16 table is
~13 GB) the table row-shards across the mesh's 'ici' axis:

    per chip:   local streaming top-k over its item-table shard
    merge:      all_gather of the k (value, global-id) winners per shard
                over ICI (B x k x ndev x 8 bytes — tiny) + a replicated
                lax.top_k over the ndev*k candidates

The local pass is the single-chip kernel unchanged (MXU-bound); the
merge's ICI traffic is k*ndev values per user, independent of catalog
size, so scaling across chips is embarrassingly parallel.  Exactness is
inherited from the local kernel (exact on CPU impls; quasi-exact
streaming recall on TPU, see ops.topk.topk_scores_streaming).

Tested on the 8-virtual-device CPU mesh (tests/test_sharded_topk.py)
against the single-device exact reference.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ncf_tpu.ops.topk import (NEG_INF, PreparedItems, PreparedItemsInt8,
                              _auto_block_items, _fold_bias_columns,
                              prepare_items_int8, topk_scores,
                              topk_scores_streaming,
                              topk_scores_streaming_int8)


def shard_items(
    items: jax.Array,              # [I, D] (host or single-device)
    bias: Optional[jax.Array],     # [I] or None
    mesh: Mesh,
    axis_name: str = "ici",
) -> Tuple[jax.Array, jax.Array, int]:
    """Pad the catalog to a shard multiple and lay it out row-sharded
    ``P(axis_name, None)`` across the mesh.  Returns
    ``(items_sharded, bias_sharded, num_items)`` — padded rows carry
    NEG_INF bias so they can never win retrieval."""
    I, _ = items.shape
    ndev = mesh.shape[axis_name]
    ipad = -(-I // ndev) * ndev
    items_p = jnp.pad(items, ((0, ipad - I), (0, 0)))
    b32 = (bias.astype(jnp.float32) if bias is not None
           else jnp.zeros((I,), jnp.float32))
    bias_p = jnp.pad(b32, (0, ipad - I), constant_values=NEG_INF)
    items_s = jax.device_put(
        items_p, NamedSharding(mesh, P(axis_name, None)))
    bias_s = jax.device_put(bias_p, NamedSharding(mesh, P(axis_name)))
    return items_s, bias_s, I


@functools.partial(
    jax.jit,
    static_argnames=("k", "num_items", "mesh", "axis_name", "impl"))
def sharded_topk_scores(
    queries: jax.Array,            # [B, D], replicated
    items: jax.Array,              # [Ipad, D], P(axis_name, None)
    bias: jax.Array,               # [Ipad], P(axis_name) — NEG_INF padded
    num_items: int,
    mesh: Mesh,
    k: int = 10,
    axis_name: str = "ici",
    impl: str = "auto",
) -> Tuple[jax.Array, jax.Array]:
    """Exact-semantics top-k over a row-sharded catalog: returns
    replicated ``(values [B, k], global ids [B, k])``.  Build the
    operands with :func:`shard_items`."""
    k = min(k, num_items)
    ndev = mesh.shape[axis_name]
    i_loc = items.shape[0] // ndev

    def local(q, t, b):
        # shard_map hands the [i_loc, D] / [i_loc] per-device blocks
        kk = min(k, i_loc)
        vals, idxs = topk_scores(q, t, kk, b, impl=impl)
        gids = idxs + jax.lax.axis_index(axis_name) * i_loc
        # padded rows carry NEG_INF bias already; clamp ids for safety
        gids = jnp.minimum(gids, num_items - 1)
        av = jax.lax.all_gather(vals, axis_name, axis=1, tiled=True)
        ai = jax.lax.all_gather(gids, axis_name, axis=1, tiled=True)
        mv, sel = jax.lax.top_k(av, k)            # [B, k] of ndev*kk
        return mv, jnp.take_along_axis(ai, sel, axis=1)

    specs_in = (P(), P(axis_name, None), P(axis_name))
    fn = jax.shard_map(local, mesh=mesh, in_specs=specs_in,
                       out_specs=(P(), P()), check_vma=False)
    return fn(queries, items, bias)


class ShardedPreparedItemsInt8:
    """Row-sharded int8 catalog for :func:`sharded_topk_scores_prepared`
    — the sharded counterpart of ``ops.topk.PreparedItemsInt8``.

    This is where the int8 tier's HBM halving actually bites: a
    100M-item x d=64 catalog is ~13 GB in bf16 (augmented) but ~6.7 GB
    in int8, so half as many chips hold it.  Scores come back
    dequantized (LSB = q_scale, one global scale so the ICI merge
    compares like with like); there is no sharded exact-rescore phase —
    the sharded tier has 'int8-fast' semantics.  Build via
    :func:`shard_prepare_items_int8`."""

    def __init__(self, table: jax.Array, col_scale: jax.Array,
                 q_scale: jax.Array, num_items: int, dim: int,
                 block_items: int, seg_width: int, user_tile: int):
        self.table = table            # [ndev * rows_loc, dim + 3] int8
        self.col_scale = col_scale    # [dim] f32, replicated
        self.q_scale = q_scale        # [] f32, replicated
        self.num_items = num_items
        self.dim = dim
        self.block_items = block_items
        self.seg_width = seg_width
        self.user_tile = user_tile

    def tree_flatten(self):
        return ((self.table, self.col_scale, self.q_scale),
                (self.num_items, self.dim, self.block_items,
                 self.seg_width, self.user_tile))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


jax.tree_util.register_pytree_node(
    ShardedPreparedItemsInt8,
    lambda p: p.tree_flatten(),
    ShardedPreparedItemsInt8.tree_unflatten)


def shard_prepare_items_int8(
    items: jax.Array,              # [I, D]
    bias: Optional[jax.Array],     # [I] or None
    queries: jax.Array,            # [N, D] query sample fixing q_scale
    mesh: Mesh,
    axis_name: str = "ici",
    block_items: Optional[int] = None,
    seg_width: int = 128,
    user_tile: int = 256,
) -> ShardedPreparedItemsInt8:
    """Quantize + shard the catalog once for the int8 sharded tier:
    one GLOBAL quantization (per-dimension item scales, one query/bias
    scale — so dequantized scores are comparable across shards in the
    merge), padded so every shard's row count is a block multiple.
    Padded rows carry the bias-digit floor and lose every merge against
    any real candidate above it (see ops.topk guarantee note)."""
    I, D = items.shape
    if block_items is None:
        block_items = _auto_block_items(D, 1, user_tile, seg_width)
    if block_items % seg_width:
        raise ValueError("block_items must be a multiple of seg_width")
    ndev = mesh.shape[axis_name]
    chunk = ndev * block_items
    ipad = -(-I // chunk) * chunk
    # quantize with the single-chip quantizer (scales computed over the
    # REAL rows only), then extend its block-multiple padding up to the
    # ndev*block_items multiple with more digit-floor rows
    base = prepare_items_int8(items, bias, queries,
                              block_items=block_items,
                              seg_width=seg_width, user_tile=user_tile)
    table = base.table
    if table.shape[0] < ipad:
        pad = jnp.zeros((ipad - table.shape[0], D + 3), jnp.int8)
        pad = pad.at[:, D:].set(jnp.int8(-127))
        table = jnp.concatenate([table, pad], axis=0)
    table = jax.device_put(table, NamedSharding(mesh, P(axis_name, None)))
    rep = NamedSharding(mesh, P())
    return ShardedPreparedItemsInt8(
        table, jax.device_put(base.col_scale, rep),
        jax.device_put(base.q_scale, rep), I, D, block_items, seg_width,
        user_tile)


class ShardedPreparedItems:
    """A row-sharded pre-augmented item table for
    :func:`sharded_topk_scores_prepared` — the sharded counterpart of
    ``ops.topk.PreparedItems``.

    ``sharded_topk_scores`` re-folds its shard of the table into the
    streaming kernel's operand on EVERY call (pad + bias-column fold, a
    full shard copy — the exact per-call cost ``prepare_items`` removes
    on one chip: ~3 ms of a 6.4 ms retrieval at 1M items).  This holds
    the augmented table built ONCE, laid out ``P(axis, None)`` with
    per-shard row counts that are a block multiple, so each device's
    local slice IS a valid prepared table for the single-chip kernel.

    Registered as a pytree (the sharded table is the only child)."""

    def __init__(self, table: jax.Array, num_items: int, dim: int,
                 block_items: int, seg_width: int, user_tile: int):
        self.table = table            # [ndev * rows_loc, dim + 3]
        self.num_items = num_items    # global unpadded catalog size
        self.dim = dim
        self.block_items = block_items
        self.seg_width = seg_width
        self.user_tile = user_tile

    def tree_flatten(self):
        return ((self.table,), (self.num_items, self.dim,
                                self.block_items, self.seg_width,
                                self.user_tile))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], *aux)


jax.tree_util.register_pytree_node(
    ShardedPreparedItems,
    lambda p: p.tree_flatten(),
    ShardedPreparedItems.tree_unflatten)


def shard_prepare_items(
    items: jax.Array,              # [I, D]
    bias: Optional[jax.Array],     # [I] or None
    mesh: Mesh,
    axis_name: str = "ici",
    block_items: Optional[int] = None,
    seg_width: int = 128,
    user_tile: int = 256,
) -> ShardedPreparedItems:
    """Build the sharded streaming-kernel operand ONCE: pad the catalog
    so every shard holds a block-multiple row count, fold the bias in
    as bf16-exact columns (globally-padded rows get a NEG_INF hi column
    and can never win), and lay the augmented table out
    ``P(axis_name, None)``.  ``block_items=None`` uses the same
    VMEM-budget auto-sizing as the single-chip ``prepare_items``.
    """
    I, D = items.shape
    if block_items is None:
        block_items = _auto_block_items(
            D, jnp.dtype(items.dtype).itemsize, user_tile, seg_width)
    if block_items % seg_width:
        raise ValueError("block_items must be a multiple of seg_width")
    ndev = mesh.shape[axis_name]
    chunk = ndev * block_items
    ipad = -(-I // chunk) * chunk
    table = _fold_bias_columns(items, bias, ipad)
    table = jax.device_put(table, NamedSharding(mesh, P(axis_name, None)))
    return ShardedPreparedItems(table, I, D, block_items, seg_width,
                                user_tile)


@functools.partial(
    jax.jit,
    static_argnames=("k", "mesh", "axis_name", "seg_top", "interpret"))
def sharded_topk_scores_prepared(
    queries: jax.Array,            # [B, D], replicated
    items: ShardedPreparedItems,
    mesh: Mesh,
    k: int = 10,
    axis_name: str = "ici",
    seg_top: int = 2,
    interpret: bool = False,       # CPU-test hook for the Pallas kernel
) -> Tuple[jax.Array, jax.Array]:
    """Item-sharded top-k over a ONCE-prepared table: per-shard
    streaming kernel on the local augmented slice + the same tiny ICI
    merge as :func:`sharded_topk_scores`, without re-folding the shard
    per call.  Returns replicated ``(values [B, k], global ids [B, k])``.
    """
    ndev = mesh.shape[axis_name]
    rows_loc = items.table.shape[0] // ndev
    num_items = items.num_items
    k = min(k, num_items)
    is_int8 = isinstance(items, ShardedPreparedItemsInt8)

    def local(q, t_loc, *scales):
        # the local slice is a valid single-chip prepared table: padded
        # rows carry NEG_INF hi columns (bf16) / the bias-digit floor
        # (int8) and lose every merge against real candidates
        kk = min(k, rows_loc)
        if is_int8:
            prep = PreparedItemsInt8(t_loc, scales[0], scales[1],
                                     rows_loc, items.dim,
                                     items.block_items, items.seg_width,
                                     items.user_tile)
            vals, idxs = topk_scores_streaming_int8(
                q, prep, kk, seg_top=seg_top, interpret=interpret)
        else:
            prep = PreparedItems(t_loc, rows_loc, items.dim,
                                 items.block_items, items.seg_width,
                                 items.user_tile)
            vals, idxs = topk_scores_streaming(
                q, prep, kk, seg_top=seg_top, interpret=interpret)
        gids = idxs + jax.lax.axis_index(axis_name) * rows_loc
        gids = jnp.minimum(gids, num_items - 1)
        av = jax.lax.all_gather(vals, axis_name, axis=1, tiled=True)
        ai = jax.lax.all_gather(gids, axis_name, axis=1, tiled=True)
        mv, sel = jax.lax.top_k(av, k)
        return mv, jnp.take_along_axis(ai, sel, axis=1)

    if is_int8:
        fn = jax.shard_map(local, mesh=mesh,
                           in_specs=(P(), P(axis_name, None), P(), P()),
                           out_specs=(P(), P()), check_vma=False)
        return fn(queries, items.table, items.col_scale, items.q_scale)
    fn = jax.shard_map(local, mesh=mesh,
                       in_specs=(P(), P(axis_name, None)),
                       out_specs=(P(), P()), check_vma=False)
    return fn(queries, items.table)
