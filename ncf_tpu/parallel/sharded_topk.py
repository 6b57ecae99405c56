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

from ncf_tpu.ops.topk import NEG_INF, topk_scores


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
