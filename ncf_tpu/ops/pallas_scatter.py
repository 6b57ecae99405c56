"""Pallas embedding-gradient scatter-add: one-hot matmuls into a VMEM
accumulator.

The backward of an embedding lookup is a scatter-add of N row-gradients
(duplicate ids allowed) into an [I, D] table gradient — the TorchRec/
fbgemm backward the reference gets as a CUDA dependency (SURVEY.md §2.8;
reference Dockerfile:24-28).  XLA's native options (scatter-add,
sort+segment_sum, one-hot matmul through HBM) all measure ~1.9 ms for
the ML-1M-scale step's item grads ([81920, 128] into [3706, 128] —
BENCH_NOTES.md / docs/ROADMAP.md item 1).

This kernel holds the FULL f32 accumulator in VMEM (ML-1M item table
grad: 3712 x 128 x 4B = 1.9 MB; user table 2.9 MB — both far under the
16 MB budget), streams the id/grad chunks from HBM exactly once, and
converts the scatter into MXU work: for each chunk, build the one-hot
tile [rows_tile, chunk] in registers/VMEM (never HBM) and accumulate
``acc += onehot @ grads_chunk``.  HBM traffic is therefore the roofline
minimum (read grads once + write the table grad once).

Precision modes for the matmul operand:
  - "split" (default): grads are split g = hi + lo with hi = bf16(g),
    lo = bf16(g - hi); two bf16 MXU matmuls accumulate in f32.  ~16
    mantissa bits — gradient-exact for training purposes (validated to
    rtol 2e-6 against XLA's f32 scatter in tests).
  - "bf16": single matmul on bf16-cast grads (fastest, ~8 mantissa bits).
  - "f32": single f32 matmul (exact, MXU runs f32 at reduced rate).

Use ``ncf_tpu.ops.embedding.set_scatter_impl("pallas")`` to route every
``embedding_lookup`` backward through this kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CHUNK = 1024       # ids consumed per grid step
_ROWS_TILE = 512    # accumulator rows per one-hot matmul
_NARROW = 1024      # narrow-span fast path: one dynamic row window


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _make_kernel(i_pad: int, mode: str):
    tiles = []
    r = 0
    while r < i_pad:
        t = min(_ROWS_TILE, i_pad - r)
        tiles.append((r, t))
        r += t
    # Narrow-span fast path only pays off when it skips real tiles, and
    # needs a full window to slice.
    use_narrow = i_pad >= 2 * _NARROW

    def kernel(ids_ref, g_ref, out_ref, acc_ref):
        nc = pl.program_id(0)

        @pl.when(nc == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        ids = ids_ref[nc, :]                      # [C] int32
        g = g_ref[:]                              # [C, D] f32

        if mode == "split":
            g = g.astype(jnp.float32)
            g_hi = g.astype(jnp.bfloat16)
            g_lo = (g - g_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            operands = (g_hi, g_lo)
            oh_dtype = jnp.bfloat16
        elif mode == "bf16":
            operands = (g if g.dtype == jnp.bfloat16
                        else g.astype(jnp.bfloat16),)
            oh_dtype = jnp.bfloat16
        elif mode == "f32":
            operands = (g,)
            oh_dtype = jnp.float32
        else:  # pragma: no cover
            raise ValueError(f"unknown scatter mode {mode!r}")

        c = ids.shape[0]

        def accumulate(start, rows, dynamic):
            row_ids = start + jax.lax.broadcasted_iota(
                jnp.int32, (rows, c), 0)
            onehot = (row_ids == ids[None, :]).astype(oh_dtype)
            update = jnp.dot(onehot, operands[0],
                             preferred_element_type=jnp.float32)
            for op in operands[1:]:
                update = update + jnp.dot(
                    onehot, op, preferred_element_type=jnp.float32)
            if dynamic:
                sl = pl.ds(start, rows)
                acc_ref[sl, :] += update
            else:
                acc_ref[start:start + rows, :] += update

        def full_sweep():
            for row0, rows in tiles:
                accumulate(row0, rows, dynamic=False)

        if not use_narrow:
            full_sweep()
        else:
            # Chunk id range: when the caller's ids arrive in sorted runs
            # (host-sorted batches, stratified sorted negatives — see
            # onehot_scatter_add), the chunk's ids span a narrow row band
            # and ONE dynamically-placed _NARROW-row matmul replaces the
            # whole tile sweep.  Random ids take the branch-free full
            # sweep; the single per-chunk branch costs ~nothing either
            # way.  Padding (-1) is excluded from lo and matches no row.
            chunk_lo = jnp.min(jnp.where(ids < 0, jnp.int32(2**30), ids))
            chunk_hi = jnp.max(ids)
            start = jnp.minimum((chunk_lo // _ROWS_TILE) * _ROWS_TILE,
                                jnp.int32(i_pad - _NARROW))
            narrow = chunk_hi < start + _NARROW

            @pl.when(narrow)
            def _():
                accumulate(start, _NARROW, dynamic=True)

            @pl.when(jnp.logical_not(narrow))
            def _():
                full_sweep()

        @pl.when(nc == pl.num_programs(0) - 1)
        def _():
            out_ref[:] = acc_ref[:]

    return kernel


@functools.partial(
    jax.jit, static_argnames=("num_rows", "mode", "interpret"))
def _scatter_add(ids: jax.Array, grads: jax.Array, num_rows: int,
                 mode: str = "split", interpret: bool = False) -> jax.Array:
    n = ids.shape[0]
    d = grads.shape[1]
    n_pad = _round_up(max(n, _CHUNK), _CHUNK)
    i_pad = _round_up(num_rows, 128)

    # keep bf16 grads in bf16 when the matmul operand is bf16 anyway —
    # an f32 upcast would double the kernel's HBM read traffic
    in_dtype = (jnp.bfloat16
                if mode == "bf16" and grads.dtype == jnp.bfloat16
                else jnp.float32)
    # pad ids with -1 (matches no row) and grads with zeros
    ids_p = jnp.pad(ids.astype(jnp.int32), (0, n_pad - n),
                    constant_values=-1)
    grads_p = (grads.astype(in_dtype) if n_pad == n
               else jnp.pad(grads.astype(in_dtype),
                            ((0, n_pad - n), (0, 0))))
    nc = n_pad // _CHUNK

    out = pl.pallas_call(
        _make_kernel(i_pad, mode),
        grid=(nc,),
        in_specs=[
            # all ids resident (nc x C int32 is small); per-chunk row read
            pl.BlockSpec((nc, _CHUNK), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_CHUNK, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((i_pad, d), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((i_pad, d), jnp.float32),
        scratch_shapes=[pltpu.VMEM((i_pad, d), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * i_pad * n_pad * d * (2 if mode == "split" else 1),
            bytes_accessed=n_pad * (4 + 4 * d) + i_pad * d * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(ids_p.reshape(nc, _CHUNK), grads_p)
    return out[:num_rows]


def onehot_scatter_add(ids: jax.Array, grads: jax.Array, num_rows: int,
                       *, mode: str = "split",
                       interpret: bool = False) -> jax.Array:
    """Dense table gradient: sum of ``grads`` rows per id.

    ids int[...], grads float[..., D]  ->  f32 [num_rows, D] where
    ``out[i] = sum over n with ids[n] == i of grads[n]``.
    Ids outside [0, num_rows) contribute nothing (used for padding).

    2-D ids [B, S] are flattened SLOT-major (column-major): scatter
    output is order-invariant, but slot-major keeps each candidate
    slot's ids contiguous across chunks — so when a slot's ids are
    sorted runs (host-sorted batches, stratified sorted negatives) the
    kernel's per-chunk tile skip engages.
    """
    if ids.ndim == 2:
        flat_ids = ids.T.reshape(-1)
        flat_g = jnp.swapaxes(grads, 0, 1).reshape(-1, grads.shape[-1])
    else:
        flat_ids = ids.reshape(-1)
        flat_g = grads.reshape(-1, grads.shape[-1])
    return _scatter_add(flat_ids, flat_g, num_rows, mode, interpret)


# Heuristic routing: the VMEM-accumulator kernel needs the [I_pad, D]
# f32 accumulator (plus chunk buffers) to fit on chip, and only beats
# XLA scatter when there is real MXU work to amortize.
_VMEM_ACC_BUDGET = 10 * 1024 * 1024


def scatter_fits(num_rows: int, d: int, n: int) -> bool:
    acc_bytes = _round_up(num_rows, 128) * d * 4
    return (acc_bytes <= _VMEM_ACC_BUDGET
            and n >= 2048      # below this XLA's scatter is cheap enough
            and d % 8 == 0)


# v5e-measured cost model (see git history for the profiles):
#   XLA scatter-add wall time is ~linear in n (collision-serialized row
#   updates): standalone slope ~6.7-7 ns/row (113us @ n=16384 f32,
#   552-577us @ n=81920), but in-graph (bf16 operands, layout
#   conversions) it measures closer to 12 ns/row; 9.0 reproduces every
#   measured in-step preference (items-bf16/users/temporal -> kernel,
#   items-split -> XLA).
#   The one-hot kernel runs at MXU peak: i_pad*n*d MACs (x2 for split)
#   at ~98.5e12 MAC/s bf16, plus ~10us fixed overhead.
_XLA_NS_PER_ROW = 9.0
_KERNEL_MAC_PER_S = 98.5e12
_KERNEL_OVERHEAD_US = 10.0


def _kernel_cost_us(num_rows: int, d: int, n: int, mode: str) -> float:
    macs = _round_up(num_rows, 128) * n * d * (2 if mode == "split" else 1)
    return macs / _KERNEL_MAC_PER_S * 1e6 + _KERNEL_OVERHEAD_US


def scatter_preferred(num_rows: int, d: int, n: int,
                      mode: str = "split") -> bool:
    """Whether the one-hot kernel is expected to BEAT XLA's scatter for
    this shape, per the measured cost model above.  Small tables always
    win (the matmul is trivial while XLA still pays per-row); very large
    tables lose (MXU work grows with rows x n x d)."""
    if not scatter_fits(num_rows, d, n):
        return False
    return _kernel_cost_us(num_rows, d, n, mode) < _XLA_NS_PER_ROW * n / 1e3
