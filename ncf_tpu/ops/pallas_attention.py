"""Fused single-query candidate attention as a Pallas kernel.

The small-candidate-axis MHA kernel of SURVEY.md §2.8/§7-PR3: the
reference's ``user_product_attention`` over the (1+negatives) slot axis
(reference: src/model/architecture.py:315-326), in this framework's
single-query form (see models/advanced_ncf.py).  One kernel fuses the
Q/K/V projections, per-head scores, softmax, value pooling and output
projection over a batch tile — zero HBM round-trips for intermediates.

Forward-only Pallas; the custom VJP backs the gradient with ``jax.vjp``
of the identical XLA formula (same math, so grads are exact).  The
training step keeps the XLA path by default (its dropout-on-weights
variant isn't expressed here); enable with
``ncf_tpu.ops.attention_impl("pallas")`` for deterministic paths.
"""

from __future__ import annotations

import functools
import math
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _reference(wq, bq, wk, bk, wv, bv, wo, bo, user, items, num_heads):
    """XLA formula (identical math; used for the backward pass and
    parity tests)."""
    B, S, D = items.shape
    H, hd = num_heads, D // num_heads
    q = user @ wq + bq
    k = items @ wk + bk
    v = items @ wv + bv
    scores = (q[:, None, :] * k).reshape(B, S, H, hd).sum(-1) / math.sqrt(hd)
    w = jax.nn.softmax(scores.astype(jnp.float32), axis=1)
    pooled = (w.astype(v.dtype)[..., None] * v.reshape(B, S, H, hd)).sum(1)
    return pooled.reshape(B, D) @ wo + bo


def _kernel(num_heads, wq_r, bq_r, wk_r, bk_r, wv_r, bv_r, wo_r, bo_r,
            hm_ref, u_ref, it_ref, out_ref):
    """Mosaic note: lane-splitting reshapes ([*, D] -> [*, H, hd]) fail
    'infer-vector-layout'; per-head reductions/broadcasts are expressed
    as matmuls with the head-mask HM[d, h] = 1[d // hd == h] instead, so
    every reshape only regroups leading (sublane-side) dims."""
    TB, D = u_ref.shape
    S = it_ref.shape[1]
    hd = D // num_heads

    u = u_ref[:]
    items = it_ref[:].reshape(TB * S, D)
    q = jax.lax.dot_general(u, wq_r[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) + bq_r[:]
    k = jax.lax.dot_general(items, wk_r[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) + bk_r[:]
    v = jax.lax.dot_general(items, wv_r[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) + bv_r[:]

    q_b = jnp.broadcast_to(q.reshape(TB, 1, D), (TB, S, D)).reshape(TB * S, D)
    hm = hm_ref[:]                                        # [D, H]
    # per-head scores: sum qk over each head's lane span via HM matmul
    scores = jax.lax.dot_general(
        q_b * k, hm, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) / math.sqrt(hd)  # [TB*S, H]
    w = jax.nn.softmax(scores.reshape(TB, S, -1), axis=1).reshape(TB * S, -1)
    # expand head weights back to lanes and pool over S
    w_exp = jax.lax.dot_general(
        w, hm, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)               # [TB*S, D]
    pooled = (w_exp * v).reshape(TB, S, D).sum(axis=1)    # [TB, D]
    out = jax.lax.dot_general(
        pooled, wo_r[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bo_r[:]
    out_ref[:] = out


@functools.partial(jax.jit, static_argnames=("num_heads", "batch_tile",
                                             "interpret"))
def _pallas_forward(wq, bq, wk, bk, wv, bv, wo, bo, user, items,
                    num_heads: int, batch_tile: int = 256,
                    interpret: bool = False):
    B, S, D = items.shape
    TB = min(batch_tile, max(8, B))
    Bpad = -(-B // TB) * TB
    u = jnp.pad(user, ((0, Bpad - B), (0, 0))).astype(jnp.float32)
    it = jnp.pad(items, ((0, Bpad - B), (0, 0), (0, 0))).astype(jnp.float32)

    H = num_heads
    hd = D // H
    head_mask = (jax.lax.broadcasted_iota(jnp.int32, (D, H), 0) // hd
                 == jax.lax.broadcasted_iota(jnp.int32, (D, H), 1)
                 ).astype(jnp.float32)

    wspec = pl.BlockSpec((D, D), lambda i: (0, 0), memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((D,), lambda i: (0,), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, num_heads),
        grid=(Bpad // TB,),
        in_specs=[wspec, bspec, wspec, bspec, wspec, bspec, wspec, bspec,
                  pl.BlockSpec((D, H), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((TB, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((TB, S, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TB, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bpad, D), jnp.float32),
        interpret=interpret,
    )(wq.astype(jnp.float32), bq.astype(jnp.float32),
      wk.astype(jnp.float32), bk.astype(jnp.float32),
      wv.astype(jnp.float32), bv.astype(jnp.float32),
      wo.astype(jnp.float32), bo.astype(jnp.float32), head_mask, u, it)
    return out[:B]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_single_query_attention(
    p: Dict, user: jax.Array, items: jax.Array, num_heads: int,
) -> jax.Array:
    """p: {'q','k','v','o'} each {'w' [D,D], 'b' [D]};
    user [B, D], items [B, S, D] -> [B, D]."""
    return _pallas_forward(
        p["q"]["w"], p["q"]["b"], p["k"]["w"], p["k"]["b"],
        p["v"]["w"], p["v"]["b"], p["o"]["w"], p["o"]["b"],
        user, items, num_heads)


def _fwd(p, user, items, num_heads):
    return fused_single_query_attention(p, user, items, num_heads), (
        p, user, items)


def _bwd(num_heads, res, g):
    p, user, items = res
    # exact gradients via the XLA formula (same function)
    def ref(p, user, items):
        return _reference(
            p["q"]["w"], p["q"]["b"], p["k"]["w"], p["k"]["b"],
            p["v"]["w"], p["v"]["b"], p["o"]["w"], p["o"]["b"],
            user, items, num_heads)

    _, vjp = jax.vjp(ref, p, user, items)
    return vjp(g)


fused_single_query_attention.defvjp(_fwd, _bwd)
