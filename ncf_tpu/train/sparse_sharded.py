"""Sparse table updates on ROW-SHARDED embedding tables: the
fbgemm-fused-sparse-optimizer-under-DistributedModelParallel equivalent.

The reference's whole scaling story is torchrec DMP (sharded tables,
reference src/model/trainer.py:85-88) *composed with* fbgemm fused
sparse optimizers (reference Dockerfile:24-28) — sharded tables whose
per-step updates touch only the rows a batch references.  Round 3 had
both halves separately (parallel/embedding_sharding.py for sharding,
train/sparse.py for sparse updates); this module composes them so the
big-vocab regime (single-chip ceiling measured at 16M-22M entities,
BENCH_NOTES) scales past one chip.

Design (all static shapes, one ``shard_map`` over the ('dcn','ici')
mesh):

  1. each device holds per-OCCURRENCE row gradients for its batch slice
     ([n_local, d], from ``jax.grad`` w.r.t. injected rows — no [V, d]
     buffer ever exists);
  2. grads are bucketed by owner ICI shard (capacity-bucketed fixed
     [E, C] send buffers, reusing parallel/embedding_sharding's
     schedule) and exchanged with ``all_to_all`` over 'ici';
  3. an ``all_gather`` over 'dcn' unifies the occurrence sets of the
     data-parallel replicas, so every device in an ici column sees the
     identical multiset of (id, grad) rows for its shard — replicas
     stay bit-identical without a dense psum;
  4. duplicates are combined by sort + segment-sum into per-unique-row
     totals IN LOCAL ROW SPACE, which is also where the global-norm
     clip contribution is computed (sum of squared totals, psum over
     'ici') — exactly the dense path's table-gradient norm;
  5. rowwise Adagrad applies by scatter on the local table/accumulator
     shard (train/sparse.py::sparse_rowwise_adagrad_apply).

Per-step traffic is O(global batch) per device — independent of vocab —
vs the dense sharded path's O(vocab / n_chips) table-gradient write.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ncf_tpu.parallel.embedding_sharding import SENTINEL, _bucket_by_owner
from ncf_tpu.parallel.mesh import DCN_AXIS, ICI_AXIS
from ncf_tpu.train.sparse import (combine_duplicate_rows,
                                  sparse_rowwise_adagrad_apply)


def _route_combine(ids: jax.Array, g: jax.Array, num_shards: int,
                   rows_per_shard: int, capacity: int, dcn_size: int):
    """Inside shard_map: route per-occurrence grads to owner shards and
    combine into per-unique-LOCAL-row totals.

    ids [n_local] global row ids, g [n_local, d] ->
    (rep_ids [m], totals [m, d]) with m = dcn_size * num_shards *
    capacity; invalid/padding entries carry ids >= rows_per_shard (the
    apply's scatters drop them).
    """
    D = g.shape[-1]
    my = jax.lax.axis_index(ICI_AXIS)
    send_ids, slot = _bucket_by_owner(ids, num_shards, rows_per_shard,
                                      capacity)
    # each occurrence owns a distinct slot; over-capacity rows drop
    # (impossible at exact capacity, the default)
    send_g = jnp.zeros((num_shards * capacity, D), jnp.float32).at[slot].add(
        g.astype(jnp.float32), mode="drop")
    recv_ids = jax.lax.all_to_all(
        send_ids, ICI_AXIS, split_axis=0, concat_axis=0, tiled=False)
    recv_g = jax.lax.all_to_all(
        send_g.reshape(num_shards, capacity, D), ICI_AXIS,
        split_axis=0, concat_axis=0, tiled=False)
    if dcn_size > 1:
        # unify the data-parallel replicas' occurrence sets: afterwards
        # every device in an ici column holds the identical buffer, so
        # the updates they compute are bit-identical (tables stay
        # replicated over 'dcn' without a dense psum)
        recv_ids = jax.lax.all_gather(recv_ids, DCN_AXIS)
        recv_g = jax.lax.all_gather(recv_g, DCN_AXIS)
    flat_ids = recv_ids.reshape(-1)
    flat_g = recv_g.reshape(-1, D)
    local = flat_ids - my * rows_per_shard
    valid = (flat_ids != SENTINEL) & (local >= 0) & (local < rows_per_shard)
    local = jnp.where(valid, local, rows_per_shard).astype(jnp.int32)
    flat_g = jnp.where(valid[:, None], flat_g, 0.0)
    # invalid entries form one zero-grad segment with id == rows_per_shard
    # (out of range -> dropped by the apply's scatters)
    return combine_duplicate_rows(local, flat_g, rows_per_shard)


def sharded_sparse_rowwise_adagrad_update(
    mesh: Mesh,
    tables: Sequence[jax.Array],   # each [V_t, d], sharded P('ici', None)
    accs: Sequence[jax.Array],     # each [V_t] f32, sharded P('ici')
    ids_list: Sequence[jax.Array],  # each int32 [n_t], batch-sharded
    grads_list: Sequence[jax.Array],  # each [n_t, d], batch-sharded
    lr,                             # scalar learning rate (schedule applied)
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    clip: float = 0.0,
    dense_sq=None,                  # scalar: sum of squared DENSE grads
) -> Tuple[list, list, jax.Array]:
    """One sharded sparse rowwise-Adagrad step over every table at once.

    Returns (new_tables, new_accs, gscale).  When ``clip > 0`` the
    global-norm clip factor is computed over the per-unique-row totals
    of ALL tables (psum over 'ici') plus ``dense_sq`` — the same norm
    the dense path's ``optax.clip_by_global_norm`` sees — and applied
    to the totals before the update; the caller scales its dense grads
    by the returned ``gscale``.  With ``clip == 0`` gscale is 1.
    """
    E = int(mesh.shape[ICI_AXIS])
    G = int(mesh.shape[DCN_AXIS])
    T = len(tables)
    rows_per, caps = [], []
    for t, ids in zip(tables, ids_list):
        V = t.shape[0]
        if V % E != 0:
            raise ValueError(f"table rows {V} must divide ici={E}")
        n = ids.shape[0]
        if n % (E * G) != 0:
            raise ValueError(
                f"id count {n} must divide the device count {E * G}")
        rows_per.append(V // E)
        # exact capacity: a device's whole local id set may target one
        # shard (the pipeline sorts users within batches — skew-proof)
        caps.append(n // (E * G))
    if dense_sq is None:
        dense_sq = jnp.zeros([], jnp.float32)

    def body(dense_sq, lr, *flat):
        tabs = list(flat[:T])
        acs = list(flat[T:2 * T])
        idss = flat[2 * T:3 * T]
        gs = flat[3 * T:4 * T]
        reps, tots = [], []
        for t in range(T):
            rep, tot = _route_combine(idss[t], gs[t], E, rows_per[t],
                                      caps[t], G)
            reps.append(rep)
            tots.append(tot)
        if clip > 0:
            sq = sum(jnp.sum(jnp.square(tot)) for tot in tots)
            sq = jax.lax.psum(sq, ICI_AXIS)
            # identical across 'dcn' already (post-all_gather data);
            # pmean re-marks it replicated without changing the value
            sq = jax.lax.pmean(sq, DCN_AXIS)
            gnorm = jnp.sqrt(sq + dense_sq)
            gscale = jnp.minimum(clip / gnorm, 1.0)
            tots = [tot * gscale for tot in tots]
        else:
            gscale = jnp.ones([], jnp.float32)
        for t in range(T):
            tabs[t], acs[t] = sparse_rowwise_adagrad_apply(
                tabs[t], acs[t], reps[t], tots[t], lr, eps, weight_decay)
        return tuple(tabs) + tuple(acs) + (gscale,)

    table_specs = tuple(P(ICI_AXIS, None) for _ in range(T))
    acc_specs = tuple(P(ICI_AXIS) for _ in range(T))
    id_specs = tuple(P((DCN_AXIS, ICI_AXIS)) for _ in range(T))
    g_specs = tuple(P((DCN_AXIS, ICI_AXIS), None) for _ in range(T))
    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P()) + table_specs + acc_specs + id_specs + g_specs,
        out_specs=table_specs + acc_specs + (P(),),
        # outputs ARE replicated over 'dcn' by construction (step 3's
        # all_gather), but the vma checker cannot prove it
        check_vma=False)
    out = fn(jnp.asarray(dense_sq, jnp.float32),
             jnp.asarray(lr, jnp.float32),
             *tables, *accs,
             *(ids.astype(jnp.int32) for ids in ids_list), *grads_list)
    return list(out[:T]), list(out[T:2 * T]), out[2 * T]
