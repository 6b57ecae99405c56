"""Pallas embedding lookup: pipelined HBM row-DMA gather with custom VJP.

The fbgemm/TorchRec embedding-kernel equivalent (SURVEY.md §2.8: the
reference's native embedding compute lives in fbgemm-gpu CUDA kernels,
Dockerfile:24-28): ids scalar-prefetched to SMEM, one row DMA per id
with _INFLIGHT outstanding copies, _UNROLL issues per loop iteration.

STATUS (measured 2026-08-20, v5e, 81920 random 256-byte rows from a
1M x 64 f32 table, scan-chained marginal timing): NOT the default —
XLA's gather wins and the gap is structural, not tunable.  This kernel
is DMA-ISSUE-RATE bound on the scalar core (~60 ns per row issue):
in-flight depth 16 -> 64 changes nothing (5.83 -> 5.74 ms), loop
unrolling 1 -> 8 only amortizes loop overhead (5.83 -> 5.02 ms), vs
XLA gather ~2.8 ms.  Closing the 1.8x would need either multiple rows
per DMA (impossible for random ids) or a vectorized in-VMEM gather
primitive Mosaic does not expose; a sort-ids + stream-the-whole-table
design moves the HBM traffic to sequential block DMAs but still pays
the same per-row scalar-issued VMEM copies, and the un-permute gather
at the end re-introduces the original problem.  Kept as the measured
alternative (parity-tested, selectable via ops.embedding.set_impl);
the production grad path is the Pallas one-hot-MXU scatter kernel
(ops/pallas_scatter.py), which IS the default where its cost model
wins.

Backward is a scatter-add over possibly-duplicate ids; it uses XLA's
scatter (sort+segment variants measured equal) — a Pallas read-modify-
write backward serializes on row latency and loses.  The custom VJP
exists so the forward kernel composes with jax.grad.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# ids processed per grid step / DMAs in flight / issues per loop
# iteration (measured best: 5.02 ms at 1024/32/8 vs 5.83 at 512/16/1)
_CHUNK = 1024
_INFLIGHT = 32
_UNROLL = 8


def _gather_kernel(ids_ref, table_ref, out_ref, sems):
    """One grid step: DMA _CHUNK rows table[ids[base+c]] -> out[c], with
    _INFLIGHT outstanding copies, _UNROLL issue pairs per iteration."""
    gi = pl.program_id(0)
    base = gi * _CHUNK

    def get_dma(c, slot):
        return pltpu.make_async_copy(
            table_ref.at[ids_ref[base + c]],
            out_ref.at[c],
            sems.at[slot],
        )

    # warm-up: start the first _INFLIGHT DMAs
    for s in range(_INFLIGHT):
        get_dma(s, s).start()

    def body(c0, _):
        for u in range(_UNROLL):
            c = c0 * _UNROLL + u
            slot = jax.lax.rem(c, _INFLIGHT)
            get_dma(c, slot).wait()

            @pl.when(c + _INFLIGHT < _CHUNK)
            def _():
                get_dma(c + _INFLIGHT, slot).start()

        return ()

    jax.lax.fori_loop(0, _CHUNK // _UNROLL, body, (), unroll=False)


def _pack_128_lanes(table: jax.Array):
    """Reinterpret rows as >=128-lane int32 vectors so single-row DMAs
    satisfy the Mosaic lane-tiling rule (row DMAs of 64-wide f32 rows are
    rejected: 'must be aligned to tiling (128)').  Returns (packed int32
    [I, lanes], unpack) where unpack restores [N, D] of the original
    dtype."""
    I, D = table.shape
    dtype = table.dtype
    itemsize = jnp.dtype(dtype).itemsize
    row_bytes = D * itemsize
    if row_bytes % 4 != 0:
        raise ValueError(f"row bytes {row_bytes} not 4-byte aligned")
    words = row_bytes // 4

    if itemsize == 4:
        as_words = jax.lax.bitcast_convert_type(table, jnp.int32)
    elif itemsize == 2:
        as_words = jax.lax.bitcast_convert_type(
            table.reshape(I, words, 2), jnp.int32)
    else:
        raise ValueError(f"unsupported itemsize {itemsize}")

    lanes = -(-words // 128) * 128
    packed = (as_words if lanes == words
              else jnp.pad(as_words, ((0, 0), (0, lanes - words))))

    def unpack(out32: jax.Array) -> jax.Array:
        w = out32[:, :words]
        if itemsize == 4:
            return jax.lax.bitcast_convert_type(w, dtype)
        return jax.lax.bitcast_convert_type(w, dtype).reshape(-1, D)

    return packed, unpack


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_gather(table: jax.Array, ids: jax.Array,
                   interpret: bool = False) -> jax.Array:
    N = ids.shape[0]
    D = table.shape[1]
    Npad = -(-N // _CHUNK) * _CHUNK
    ids_p = jnp.pad(ids, (0, Npad - N)).astype(jnp.int32)

    packed, unpack = _pack_128_lanes(table)
    lanes = packed.shape[1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Npad // _CHUNK,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],  # table in HBM
        out_specs=pl.BlockSpec((_CHUNK, lanes), lambda gi, ids: (gi, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((_INFLIGHT,))],
    )
    out = pl.pallas_call(
        _gather_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Npad, lanes), jnp.int32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(ids_p, packed)
    return unpack(out[:N])


@jax.custom_vjp
def pallas_embedding_lookup(table: jax.Array, ids: jax.Array) -> jax.Array:
    """table [I, D], ids int[...] -> [..., D] (Pallas forward, XLA
    scatter-add backward)."""
    flat = ids.reshape(-1)
    out = _pallas_gather(table, flat)
    return out.reshape(*ids.shape, table.shape[1])


def _fwd(table, ids):
    return pallas_embedding_lookup(table, ids), (ids, table.shape, table.dtype)


def _bwd(res, g):
    ids, shape, dtype = res
    flat_ids = ids.reshape(-1)
    flat_g = g.reshape(-1, shape[1]).astype(dtype)
    grad = jnp.zeros(shape, dtype).at[flat_ids].add(flat_g)
    return grad, None


pallas_embedding_lookup.defvjp(_fwd, _bwd)
