"""Temporal encoding: learned hour/day/month embeddings + sinusoidal
day-of-year positional buffer.

Semantics of the reference ``TemporalEncoding``
(reference: src/model/architecture.py:59-94): summed hour(24)/day(7)/
month(12) learned embeddings plus a fixed sinusoidal ``pe[365, d]`` table
indexed by ``days_since % 365``.  Unlike the reference — which zeroes
temporal features in the main forward (architecture.py:329-334, defect
SURVEY.md §2.9.6) — this encoding is wired into training for real.

The sinusoidal table is a pure function of static shapes, so it is
computed inside the traced function and constant-folded by XLA rather
than stored in the checkpoint (the reference registers it as a buffer,
which is what made its sharded checkpoints need a special case at
consolidate_shards.py:97-101).
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp

from ncf_tpu.models.layers import embedding_init
from ncf_tpu.ops.embedding import embedding_lookup

MAX_PERIOD = 365


def init(key: jax.Array, embed_dim: int) -> Dict[str, jax.Array]:
    kh, kd, km = jax.random.split(key, 3)
    return {
        "hour": embedding_init(kh, 24, embed_dim),
        "day": embedding_init(kd, 7, embed_dim),
        "month": embedding_init(km, 12, embed_dim),
    }


def sinusoidal_table(embed_dim: int, max_period: int = MAX_PERIOD) -> jax.Array:
    """pe[p, 2i] = sin(p * w_i), pe[p, 2i+1] = cos(p * w_i)
    with w_i = exp(-2i * ln(10000)/d)  (architecture.py:79-84)."""
    position = jnp.arange(max_period, dtype=jnp.float32)[:, None]
    half = (embed_dim + 1) // 2
    div = jnp.exp(jnp.arange(half, dtype=jnp.float32) * 2.0
                  * (-math.log(10000.0) / embed_dim))
    angles = position * div[None, :]
    pe = jnp.zeros((max_period, embed_dim), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(angles)[:, : (embed_dim + 1) // 2])
    pe = pe.at[:, 1::2].set(jnp.cos(angles)[:, : embed_dim // 2])
    return pe


def apply(
    params: Dict[str, jax.Array],
    hour: jax.Array,
    day: jax.Array,
    month: jax.Array,
    days_since: jax.Array,
) -> jax.Array:
    """(hour + day + month) learned embeddings + seasonal sinusoid
    (architecture.py:86-94).  All index arrays share a leading shape; the
    result has trailing dim = embed_dim."""
    embed_dim = params["hour"].shape[-1]
    pe = sinusoidal_table(embed_dim)
    if (hour.ndim == 1 and hour.shape[0] >= 4096
            and jax.default_backend() == "tpu"):
        # fused one-kernel path: 4 one-hot matmul lookups + sum in VMEM
        # (~4x 25us of XLA gather fusions collapse; ops/pallas_temporal)
        from ncf_tpu.ops.pallas_temporal import fused_lookup_sum

        ids = jnp.stack([hour, day, month, days_since % MAX_PERIOD])
        return fused_lookup_sum(
            ids, (params["hour"], params["day"], params["month"], pe))
    temporal = (
        embedding_lookup(params["hour"], hour)
        + embedding_lookup(params["day"], day)
        + embedding_lookup(params["month"], month)
    )
    seasonal = jnp.take(pe, days_since % MAX_PERIOD, axis=0)
    return temporal + seasonal
