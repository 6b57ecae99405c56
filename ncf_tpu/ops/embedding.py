"""Embedding lookup dispatch: XLA gather or the Pallas TPU kernel.

This is the framework's equivalent of the fbgemm/TorchRec embedding-bag
kernels the reference pulls in as a dependency (reference: Dockerfile:24-28
installs torchrec/fbgemm-gpu; src/model/architecture.py:153-190 builds
EmbeddingBagCollections with single-element SUM bags — i.e. plain row
lookup).  Forward is a row gather; backward is a scatter-add over
(possibly duplicate) ids.

``set_impl("pallas")`` routes through the hand-written kernel in
``ncf_tpu.ops.pallas_embedding`` (double-buffered HBM->VMEM row DMA with a
custom VJP); the default "xla" path lowers to XLA's native dynamic-gather,
which the kernel must beat to earn the default slot.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_IMPL = "xla"


def set_impl(impl: str) -> None:
    global _IMPL
    if impl not in ("xla", "pallas"):
        raise ValueError(f"unknown embedding impl {impl!r}")
    _IMPL = impl


def get_impl() -> str:
    return _IMPL


def embedding_lookup(table: jax.Array, ids: jax.Array) -> jax.Array:
    """Gather rows: table [N, D], ids int[...]  ->  [..., D]."""
    if _IMPL == "pallas":
        from ncf_tpu.ops.pallas_embedding import pallas_embedding_lookup

        return pallas_embedding_lookup(table, ids)
    return jnp.take(table, ids, axis=0)
