"""Row-sharded embedding tables with explicit all-to-all ID exchange.

The TPU-native equivalent of torchrec DistributedModelParallel's sharded
EmbeddingBagCollection path (reference: src/model/trainer.py:85-88; the
library-internal NCCL flow is: all-to-all KJT id redistribution ->
per-shard lookup -> all-to-all pooled-embedding return -> reverse path
for gradients; SURVEY.md §2.8/§5.8).  Here the same dance is written
explicitly in ``jax.shard_map`` over the mesh's ``'ici'`` axis with XLA
collectives, so it rides ICI links and composes with jit/grad:

  1. each device buckets its local ids by owner shard
     (capacity-bucketed: fixed [E, C] send buffer, SURVEY.md §7 hard
     part 1 — static shapes, padded with a sentinel);
  2. ``all_to_all`` exchanges id buckets;
  3. each shard gathers its owned rows;
  4. ``all_to_all`` returns the vectors;
  5. un-permutation scatters vectors back to request order.

The backward pass is the exact reverse: bucket gradient rows, exchange,
segment-sum into the local table shard (duplicate ids within a shard are
accumulated by ``segment_sum`` before the scatter — no atomics needed).
Implemented as a custom VJP so ``jax.grad`` of a sharded model just
works.

The simpler ``pjit`` path (NamedSharding on the table + jnp.take, XLA
chooses collectives) remains the default in ncf_tpu.parallel.mesh; this
module is the explicit-schedule alternative for when XLA's choice is not
the fast one (e.g. cross-DCN lookups).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ncf_tpu.parallel.mesh import DCN_AXIS, ICI_AXIS

# plain int, not jnp.int32(...): a module-level jnp scalar would
# initialize the XLA backend at import time, which breaks
# jax.distributed.initialize in multi-process launches
SENTINEL = 2**30


def _bucket_by_owner(ids: jax.Array, num_shards: int, rows_per_shard: int,
                     capacity: int):
    """Pack local ids into a fixed [E, C] send buffer by owner shard.

    Returns (send_ids [E, C] global ids padded with SENTINEL,
    slot_of_id [n] flat position of each id in the send buffer).
    Static shapes throughout; ids beyond capacity would be dropped, so
    choose C >= ceil(n / E) * slack (checked by callers/tests).
    """
    n = ids.shape[0]
    owner = ids // rows_per_shard                              # [n]
    # rank of each element within its owner group, via stable sort
    order = jnp.argsort(owner, stable=True)                    # [n]
    sorted_owner = owner[order]
    pos = jnp.arange(n, dtype=jnp.int32)
    # start index of each owner's run
    first_of_owner = jnp.searchsorted(sorted_owner, jnp.arange(
        num_shards, dtype=sorted_owner.dtype), side="left")
    rank_sorted = pos - first_of_owner[sorted_owner]           # [n]
    rank = jnp.zeros(n, jnp.int32).at[order].set(rank_sorted)

    # over-capacity ids are ROUTED TO A DUMMY SLOT, never aliased onto
    # another id's slot: their send entry is dropped (owner returns
    # nothing) and their result row reads deterministic zeros.  Skewed id
    # streams exceeding capacity therefore degrade gracefully (zero
    # vectors / dropped gradient rows) instead of silently corrupting
    # neighbours; size capacity_factor for the worst shard, not the mean.
    overflow = rank >= capacity
    slot = owner * capacity + rank                             # [n]
    send_slot = jnp.where(overflow, num_shards * capacity, slot)  # OOB=drop
    send = jnp.full((num_shards * capacity,), SENTINEL, jnp.int32)
    send = send.at[send_slot].set(ids.astype(jnp.int32), mode="drop")
    gather_slot = jnp.where(overflow, num_shards * capacity, slot)
    return send.reshape(num_shards, capacity), gather_slot


def _exchange_lookup(table_shard: jax.Array, ids: jax.Array,
                     num_shards: int, capacity: int,
                     axis: str) -> jax.Array:
    """Inside shard_map: the 5-step lookup dance.  table_shard [R, D],
    ids [n] global -> [n, D]."""
    R, D = table_shard.shape
    my = jax.lax.axis_index(axis)

    send_ids, slot = _bucket_by_owner(ids, num_shards, R, capacity)
    recv_ids = jax.lax.all_to_all(
        send_ids, axis, split_axis=0, concat_axis=0, tiled=False)
    # recv_ids [E, C]: bucket e = ids requested by source device e
    local_rows = recv_ids.reshape(-1) - my * R
    valid = (recv_ids.reshape(-1) != SENTINEL) & (local_rows >= 0) & (
        local_rows < R)
    safe = jnp.where(valid, local_rows, 0)
    vecs = jnp.take(table_shard, safe, axis=0)
    vecs = jnp.where(valid[:, None], vecs, 0.0)
    vecs = vecs.reshape(num_shards, capacity, D)

    back = jax.lax.all_to_all(
        vecs, axis, split_axis=0, concat_axis=0, tiled=False)
    # back [E, C, D]: bucket e = vectors for the ids we sent to shard e;
    # an appended zeros row serves over-capacity (dummy-slot) ids
    flat = jnp.concatenate(
        [back.reshape(num_shards * capacity, D),
         jnp.zeros((1, D), back.dtype)], axis=0)
    return flat[slot]


def _exchange_grad(g: jax.Array, ids: jax.Array, num_shards: int,
                   rows_per_shard: int, capacity: int,
                   axis: str) -> jax.Array:
    """Reverse path: route grad rows to owner shards and segment-sum into
    the local shard's gradient. g [n, D] -> table_shard_grad [R, D]."""
    D = g.shape[1]
    my = jax.lax.axis_index(axis)
    send_ids, slot = _bucket_by_owner(ids, num_shards, rows_per_shard,
                                      capacity)
    # place grad rows at their send slots (duplicate ids occupy distinct
    # slots; summation happens at the owner); over-capacity rows are
    # dropped, mirroring the zero vectors their lookups returned
    send_g = jnp.zeros((num_shards * capacity, D), g.dtype).at[slot].add(
        g, mode="drop")
    send_g = send_g.reshape(num_shards, capacity, D)

    recv_ids = jax.lax.all_to_all(
        send_ids, axis, split_axis=0, concat_axis=0, tiled=False)
    recv_g = jax.lax.all_to_all(
        send_g, axis, split_axis=0, concat_axis=0, tiled=False)

    rows = recv_ids.reshape(-1) - my * rows_per_shard
    valid = (recv_ids.reshape(-1) != SENTINEL) & (rows >= 0) & (
        rows < rows_per_shard)
    rows = jnp.where(valid, rows, rows_per_shard)  # park invalid in pad row
    flat_g = jnp.where(valid[:, None], recv_g.reshape(-1, D), 0.0)
    summed = jax.ops.segment_sum(flat_g, rows,
                                 num_segments=rows_per_shard + 1)
    return summed[:rows_per_shard]


def exchange_lookup(mesh: Mesh, table: jax.Array, ids: jax.Array,
                    capacity_factor: float = 0.0) -> jax.Array:
    """Differentiable explicit all-to-all lookup for the REAL training
    step: arbitrary ids shapes, a full ('dcn','ici') mesh, and exact
    gradients (psum over the dcn replicas of the table).

    This is what ``cfg.mesh.embedding_exchange='explicit'`` routes every
    row-sharded-table gather through (ncf_tpu.ops.embedding registry) —
    the integrated form of the torchrec-DMP all-to-all dance (reference
    trainer.py:85-88), vs. the default pjit path where XLA chooses the
    collectives.

    table [N, D] sharded P('ici', None); ids int[...] sharded over the
    batch axes P(('dcn','ici')).  Returns [..., D].

    ``capacity_factor <= 0`` (default) selects EXACT capacity — every
    device's full local id set fits in each owner bucket, so no id can
    overflow regardless of skew.  The framework's default input pipeline
    sorts users within each batch (data/pipeline.py sort_by_user) and
    draws sorted stratified negatives, which makes owner skew maximal
    (a device's ids land almost entirely on one shard) — a fractional
    capacity would silently drop lookups there.  Exact capacity costs
    E-times the ideal all-to-all payload; set a positive factor only for
    iid id streams.
    """
    E = int(mesh.shape[ICI_AXIS])
    G = int(mesh.shape[DCN_AXIS])
    if E == 1:
        return jnp.take(table, ids, axis=0)
    N, D = table.shape
    if N % E != 0:
        raise ValueError(f"table rows {N} must divide ici={E}")
    R = N // E

    orig_shape = ids.shape
    flat = ids.reshape(-1).astype(jnp.int32)
    n = flat.shape[0]
    total = E * G
    n_pad = -(-n // total) * total
    if n_pad != n:
        flat = jnp.concatenate(
            [flat, jnp.zeros((n_pad - n,), jnp.int32)])
    local = n_pad // total
    if capacity_factor and capacity_factor > 0:
        capacity = min(local, max(8, int(np.ceil(local / E
                                                 * capacity_factor))))
    else:
        capacity = local

    @jax.custom_vjp
    def _lookup(table, ids):
        fn = jax.shard_map(
            functools.partial(_exchange_lookup, num_shards=E,
                              capacity=capacity, axis=ICI_AXIS),
            mesh=mesh,
            in_specs=(P(ICI_AXIS, None), P((DCN_AXIS, ICI_AXIS))),
            out_specs=P((DCN_AXIS, ICI_AXIS), None))
        return fn(table, ids)

    def fwd(table, ids):
        return _lookup(table, ids), ids

    def bwd(ids, g):
        def body(g, ids):
            grad = _exchange_grad(g, ids, num_shards=E, rows_per_shard=R,
                                  capacity=capacity, axis=ICI_AXIS)
            # each dcn replica saw a disjoint batch slice; the table is
            # replicated over dcn, so its gradient is the dcn-sum
            return jax.lax.psum(grad, DCN_AXIS)

        fn = jax.shard_map(
            body, mesh=mesh,
            in_specs=(P((DCN_AXIS, ICI_AXIS), None), P((DCN_AXIS, ICI_AXIS))),
            out_specs=P(ICI_AXIS, None))
        return fn(g, ids), None

    _lookup.defvjp(fwd, bwd)
    out = _lookup(table, flat)
    if n_pad != n:
        out = out[:n]
    return out.reshape(*orig_shape, D)


class ShardedEmbedding:
    """A row-sharded embedding table with explicit all-to-all lookup.

    Use: construct with the mesh; ``shard(table)`` places the [N, D]
    array; ``lookup(table, ids)`` is differentiable and jit-able.
    """

    def __init__(self, mesh: Mesh, num_rows: int, dim: int,
                 capacity_factor: float = 2.0, axis: str = ICI_AXIS):
        self.mesh = mesh
        self.axis = axis
        self.num_shards = int(mesh.shape[axis])
        if num_rows % self.num_shards != 0:
            raise ValueError(
                f"num_rows {num_rows} must divide the {axis}={self.num_shards}"
                f" axis (pad with parallel.pad_rows)")
        self.num_rows = num_rows
        self.dim = dim
        self.rows_per_shard = num_rows // self.num_shards
        self.capacity_factor = capacity_factor

        self.table_sharding = NamedSharding(mesh, P(axis, None))
        self.batch_sharding = NamedSharding(mesh, P(axis))

    def shard(self, table: jax.Array) -> jax.Array:
        return jax.device_put(table, self.table_sharding)

    def _capacity(self, ids_len_per_shard: int) -> int:
        c = int(np.ceil(ids_len_per_shard / self.num_shards
                        * self.capacity_factor))
        return max(8, c)

    def lookup(self, table: jax.Array, ids: jax.Array) -> jax.Array:
        """Differentiable sharded lookup: ids [n] (sharded over the axis)
        -> vectors [n, D] (sharded over the axis)."""
        n = ids.shape[0]
        per_shard = n // self.num_shards
        capacity = self._capacity(per_shard)
        E, axis = self.num_shards, self.axis
        R = self.rows_per_shard

        @jax.custom_vjp
        def _lookup(table, ids):
            fn = jax.shard_map(
                functools.partial(_exchange_lookup, num_shards=E,
                                  capacity=capacity, axis=axis),
                mesh=self.mesh,
                in_specs=(P(axis, None), P(axis)),
                out_specs=P(axis, None))
            return fn(table, ids)

        def fwd(table, ids):
            return _lookup(table, ids), ids

        def bwd(ids, g):
            fn = jax.shard_map(
                functools.partial(_exchange_grad, num_shards=E,
                                  rows_per_shard=R, capacity=capacity,
                                  axis=axis),
                mesh=self.mesh,
                in_specs=(P(axis, None), P(axis)),
                out_specs=P(axis, None))
            return fn(g, ids), None

        _lookup.defvjp(fwd, bwd)
        return _lookup(table, ids)
