"""Embedding lookup dispatch: XLA gather or the Pallas TPU kernels.

This is the framework's equivalent of the fbgemm/TorchRec embedding-bag
kernels the reference pulls in as a dependency (reference: Dockerfile:24-28
installs torchrec/fbgemm-gpu; src/model/architecture.py:153-190 builds
EmbeddingBagCollections with single-element SUM bags — i.e. plain row
lookup).  Forward is a row gather; backward is a scatter-add over
(possibly duplicate) ids.

Forward impl (``set_impl``): "xla" (default) lowers to XLA's native
dynamic-gather; "pallas" routes through the double-buffered HBM->VMEM
row-DMA kernel in ``ncf_tpu.ops.pallas_embedding``.

Backward impl (``set_scatter_impl``): "auto" (default) uses the Pallas
one-hot-matmul scatter kernel (``ncf_tpu.ops.pallas_scatter``) on TPU
whenever the table's f32 accumulator fits in VMEM — XLA's scatter-add
serializes on colliding rows and costs ~0.33 ms/step for even the tiny
temporal tables at batch 16k; the one-hot kernel turns the same update
into MXU work.  "xla" forces the native scatter; "pallas" forces the
kernel (errors if the shape doesn't fit).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_IMPL = "xla"
_SCATTER_IMPL = "auto"
_SCATTER_MODE = "split"   # pallas matmul precision: split | bf16 | f32
_EXCHANGE = None          # explicit all-to-all routing, see set_exchange


def set_exchange(mesh, rows, capacity_factor: float = 0.0) -> None:
    """Route lookups of row-sharded tables through the EXPLICIT all-to-all
    exchange (ncf_tpu.parallel.embedding_sharding.exchange_lookup) instead
    of letting pjit/XLA pick the collectives — the integrated torchrec-DMP
    path (reference trainer.py:85-88), selected by
    ``cfg.mesh.embedding_exchange='explicit'``.

    ``rows``: the row counts of the tables that are sharded P('ici', None)
    (from parallel.mesh.param_shardings); any 2-D table whose leading dim
    matches is routed, including vocab-precomputed derived tables, which
    inherit the raw table's sharding.  ``capacity_factor<=0`` = exact
    (skew-proof) bucket capacity.
    """
    global _EXCHANGE
    _EXCHANGE = {"mesh": mesh, "rows": frozenset(int(r) for r in rows),
                 "capacity_factor": capacity_factor}


def clear_exchange() -> None:
    global _EXCHANGE
    _EXCHANGE = None


def get_exchange():
    return _EXCHANGE


def set_impl(impl: str) -> None:
    global _IMPL
    if impl not in ("xla", "pallas"):
        raise ValueError(f"unknown embedding impl {impl!r}")
    _IMPL = impl


def get_impl() -> str:
    return _IMPL


def set_scatter_impl(impl: str, mode: str = "split") -> None:
    """impl:
      - "auto" (default): on TPU, route tables where the kernel beats XLA
        (small tables); precision per ``mode``.
      - "fast": on TPU, route every VMEM-fitting table with bf16 matmul
        operands — validated convergence-neutral at ML-1M scale
        (results/bf16_scatter_metrics.jsonl vs the XLA control run:
        hr@10 matches within +-0.0015 at every epoch); ~27% faster steps.
      - "pallas": force the kernel for every fitting shape (any backend —
        use for kernel testing).
      - "xla": native scatter everywhere.
    """
    global _SCATTER_IMPL, _SCATTER_MODE
    if impl not in ("auto", "xla", "pallas", "fast"):
        raise ValueError(f"unknown scatter impl {impl!r}")
    if mode not in ("split", "bf16", "f32"):
        raise ValueError(f"unknown scatter mode {mode!r}")
    _SCATTER_IMPL = impl
    _SCATTER_MODE = "bf16" if impl == "fast" else mode


def get_scatter_impl() -> str:
    return _SCATTER_IMPL


def _xla_scatter_grad(ids, g, shape, dtype):
    flat_ids = ids.reshape(-1)
    flat_g = g.reshape(-1, shape[1]).astype(dtype)
    return jnp.zeros(shape, dtype).at[flat_ids].add(flat_g)


@functools.lru_cache(maxsize=None)
def _make_pallas_scatter_lookup(shape: tuple, dtype_name: str, mode: str,
                                forced: bool):
    """custom_vjp lookup specialized on (table shape, dtype, matmul mode)
    — statics are closed over because custom_vjp residuals must be JAX
    types.  ``forced`` (impl="pallas") routes every VMEM-fitting shape;
    auto mode only routes shapes where the kernel beats XLA."""
    dtype = jnp.dtype(dtype_name)

    @jax.custom_vjp
    def lookup(table, ids):
        return jnp.take(table, ids, axis=0)

    def fwd(table, ids):
        return lookup(table, ids), ids

    def bwd(ids, g):
        from ncf_tpu.ops.pallas_scatter import (
            onehot_scatter_add, scatter_fits, scatter_preferred)

        if forced:
            use = scatter_fits(shape[0], shape[1], ids.size)
        else:
            use = scatter_preferred(shape[0], shape[1], ids.size, mode)
        if use:
            grad = onehot_scatter_add(
                ids, g, shape[0], mode=mode).astype(dtype)
        else:
            grad = _xla_scatter_grad(ids, g, shape, dtype)
        return grad, None

    lookup.defvjp(fwd, bwd)
    return lookup


def _use_pallas_scatter() -> bool:
    if _SCATTER_IMPL == "xla":
        return False
    if _SCATTER_IMPL == "pallas":
        return True
    # auto/fast: the one-hot kernel is TPU-only (Mosaic)
    return jax.default_backend() == "tpu"


def embedding_lookup(table: jax.Array, ids: jax.Array) -> jax.Array:
    """Gather rows: table [N, D], ids int[...]  ->  [..., D]."""
    if (_EXCHANGE is not None and table.ndim == 2
            and table.shape[0] in _EXCHANGE["rows"]):
        from ncf_tpu.parallel.embedding_sharding import exchange_lookup

        return exchange_lookup(_EXCHANGE["mesh"], table, ids,
                               _EXCHANGE["capacity_factor"])
    if _IMPL == "pallas":
        from ncf_tpu.ops.pallas_embedding import pallas_embedding_lookup

        return pallas_embedding_lookup(table, ids)
    if _use_pallas_scatter():
        # "pallas" forces the kernel for every VMEM-fitting shape;
        # "auto"/"fast" route per the measured cost model
        fn = _make_pallas_scatter_lookup(
            tuple(table.shape), jnp.dtype(table.dtype).name, _SCATTER_MODE,
            _SCATTER_IMPL == "pallas")
        return fn(table, ids)
    return jnp.take(table, ids, axis=0)
