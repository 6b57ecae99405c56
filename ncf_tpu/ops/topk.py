"""Streaming top-k candidate scoring: scores = Q @ T^T (+ bias) -> top-k.

The serving hot path (SURVEY.md §3.4): the reference retrieves candidates
from Vertex Vector Search and rescores them over HTTP
(reference: src/api/routes.py:56-67, src/inference/setup_tree_ah_endpoint.py)
— here retrieval is exact brute-force scoring on-chip, blocked over the
item table so the [B, num_items] score matrix is never materialized in
HBM.

Implementations with identical call semantics:
- ``topk_scores_streaming`` — THE production kernel (see its docstring):
  fused MXU matmul + per-segment top-2 (exact value, exact item id) +
  in-VMEM running top-k merge; 319k users/s over 1M items on v5e (prepared table).
- ``topk_scores_xla``   — jax.lax.fori_loop over item blocks with a
  lax.top_k merge carry; robust reference.
- ``topk_scores_pallas``— fused Pallas kernel: MXU matmul per (user tile,
  item block) + in-VMEM iterative top-k merge over ALL items (O(k·I) VPU
  work — superseded by streaming).
- ``topk_scores_segmented`` — key-packing segmax variant (quantizes
  scores to pack offsets; superseded by streaming, kept for comparison).

All support a per-item additive bias, which makes them an *exact* full
AdvancedNCF scorer: in eval mode the model's logit decomposes as
``dot(u', i') + bias(i, temporal)`` (see ncf_tpu.serving.scorer).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -3.0e38  # python float: jnp scalars would be captured tracers in kernels


# ------------------------------------------------------------ XLA reference

@functools.partial(jax.jit, static_argnames=("k",))
def topk_scores_dense(
    queries: jax.Array,            # [B, D]
    items: jax.Array,              # [I, D]
    k: int = 10,
    bias: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """One-shot exact top-k: materialize [B, I] scores, lax.top_k.  The
    right tool when B*I*4 bytes comfortably fits HBM (small catalogs)."""
    scores = jax.lax.dot_general(
        queries, items, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    if bias is not None:
        scores = scores + bias[None, :].astype(jnp.float32)
    return jax.lax.top_k(scores, min(k, items.shape[0]))


@functools.partial(jax.jit, static_argnames=("k", "block_items"))
def topk_scores_xla(
    queries: jax.Array,            # [B, D]
    items: jax.Array,              # [I, D]
    k: int = 10,
    bias: Optional[jax.Array] = None,   # [I]
    block_items: int = 4096,
) -> Tuple[jax.Array, jax.Array]:
    """Blocked exact top-k: returns (values [B, k], indices [B, k])."""
    B, D = queries.shape
    I = items.shape[0]
    nblocks = -(-I // block_items)
    Ipad = nblocks * block_items
    items_p = jnp.pad(items, ((0, Ipad - I), (0, 0)))
    bias_p = jnp.full((Ipad,), NEG_INF, jnp.float32)
    bias_p = bias_p.at[:I].set(
        bias.astype(jnp.float32) if bias is not None else 0.0)

    def body(j, carry):
        vals, idxs = carry                      # [B, k] each
        blk = jax.lax.dynamic_slice(
            items_p, (j * block_items, 0), (block_items, D))
        b = jax.lax.dynamic_slice(bias_p, (j * block_items,), (block_items,))
        scores = jax.lax.dot_general(
            queries, blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) + b[None, :]
        bvals, bidx = jax.lax.top_k(scores, k)
        bidx = bidx + j * block_items
        cat_v = jnp.concatenate([vals, bvals], axis=1)
        cat_i = jnp.concatenate([idxs, bidx], axis=1)
        mvals, sel = jax.lax.top_k(cat_v, k)
        return mvals, jnp.take_along_axis(cat_i, sel, axis=1)

    init = (jnp.full((B, k), NEG_INF), jnp.zeros((B, k), jnp.int32))
    vals, idxs = jax.lax.fori_loop(0, nblocks, body, init)
    return vals, idxs


# ------------------------------------------------------------ Pallas kernel

def _extract_topk(scores: jax.Array, idx_of_col: jax.Array, k: int):
    """Iterative k-round max extraction over the last axis.

    ``idx_of_col [R, C]`` carries the (global) index labelling each
    column; returns (vals [R, k], idxs [R, k]).  Ties resolve to the
    lowest column.  Pure max/where/iota VPU ops — the top-k primitive is
    not available inside Mosaic kernels.
    """
    R, C = scores.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
    work = scores
    vals, idxs = [], []
    for _ in range(k):
        m = jnp.max(work, axis=1, keepdims=True)              # [R, 1]
        sel = jnp.min(jnp.where(work == m, col, C), axis=1)   # [R] first max
        hit = col == sel[:, None]
        vals.append(m[:, 0])
        idxs.append(jnp.sum(jnp.where(hit, idx_of_col, 0), axis=1))
        work = jnp.where(hit, NEG_INF, work)
    return jnp.stack(vals, axis=1), jnp.stack(idxs, axis=1)


def _topk_kernel(num_items, k, block_items,
                 q_ref, t_ref, bias_ref, vals_out, idxs_out,
                 vals_c, idxs_c):
    """Grid (user_tiles, item_blocks); item axis minor => carry scratch
    (vals_c/idxs_c) holds the running top-k for the current user tile."""
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        vals_c[:] = jnp.full_like(vals_c[:], NEG_INF)
        idxs_c[:] = jnp.zeros_like(idxs_c[:])

    scores = jax.lax.dot_general(
        q_ref[:], t_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                   # [TU, TI]
    scores = scores + bias_ref[0, :].reshape(1, -1)

    # mask padded items (global col >= num_items)
    base = j * block_items
    gcol = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) + base
    scores = jnp.where(gcol < num_items, scores, NEG_INF)

    bvals, bidx = _extract_topk(scores, gcol, k)              # [TU, k]

    # merge with carry over [TU, 2k]
    cat_v = jnp.concatenate([vals_c[:], bvals], axis=1)
    cat_i = jnp.concatenate([idxs_c[:], bidx], axis=1)
    mv, mi = _extract_topk(cat_v, cat_i, k)
    vals_c[:] = mv
    idxs_c[:] = mi

    @pl.when(j == nj - 1)
    def _():
        vals_out[:] = vals_c[:]
        idxs_out[:] = idxs_c[:]


@functools.partial(
    jax.jit, static_argnames=("k", "block_items", "user_tile", "interpret"))
def topk_scores_pallas(
    queries: jax.Array,            # [B, D]
    items: jax.Array,              # [I, D]
    k: int = 10,
    bias: Optional[jax.Array] = None,
    block_items: int = 2048,
    user_tile: int = 256,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Fused MXU matmul + on-chip top-k merge.  Semantics identical to
    ``topk_scores_xla`` (parity-tested in tests/test_ops_topk.py)."""
    B, D = queries.shape
    I = items.shape[0]
    TU = min(user_tile, max(8, B))
    Bpad = -(-B // TU) * TU
    nblocks = -(-I // block_items)
    Ipad = nblocks * block_items

    q = jnp.pad(queries, ((0, Bpad - B), (0, 0)))
    t = jnp.pad(items, ((0, Ipad - I), (0, 0)))
    b2 = jnp.zeros((1, Ipad), jnp.float32)
    if bias is not None:
        b2 = b2.at[0, :I].set(bias.astype(jnp.float32))

    kernel = functools.partial(_topk_kernel, I, k, block_items)
    vals, idxs = pl.pallas_call(
        kernel,
        grid=(Bpad // TU, nblocks),
        in_specs=[
            pl.BlockSpec((TU, D), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_items, D), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_items), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TU, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TU, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bpad, k), jnp.float32),
            jax.ShapeDtypeStruct((Bpad, k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((TU, k), jnp.float32),
            pltpu.VMEM((TU, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Bpad * Ipad * D,
            bytes_accessed=(Bpad * D + Ipad * D) * 2 + Bpad * k * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q, t, b2)
    return vals[:B], idxs[:B]


# ---------------------------------- streaming segmax kernel (the default)

# scoped-VMEM budget for the streaming kernel's working set; the compiler
# limit is 16 MB and the kernel needs headroom for scratch/temporaries
_STREAM_VMEM_BUDGET = 12 * 1024 * 1024


class PreparedItems:
    """A pre-augmented item table for ``topk_scores_streaming``.

    Building the kernel operand — pad the catalog to a block multiple and
    fold the bias in as three bf16-exact columns — costs a full copy of
    the table (~134 MB at 1M x 64 bf16) and XLA re-materializes it on
    EVERY call when done inline: measured 6.4 ms/call at B=1024 x I=1M,
    of which only ~2.0 ms is the kernel.  The item table is static per
    model version (rebuilt on index refresh), so serving prepares it once
    and streams queries against it: 3.3 ms/call (seg_top=2).

    Construct via :func:`prepare_items`.  Registered as a pytree (the
    table is the only child; shape metadata is static aux), so it passes
    through jit/scan unchanged.
    """

    def __init__(self, table: jax.Array, num_items: int, dim: int,
                 block_items: int, seg_width: int, user_tile: int = 256):
        self.table = table            # [Ipad, dim + 3], bias folded
        self.num_items = num_items
        self.dim = dim
        self.block_items = block_items
        self.seg_width = seg_width
        self.user_tile = user_tile    # max tile the block sizing assumed

    def tree_flatten(self):
        return ((self.table,), (self.num_items, self.dim,
                                self.block_items, self.seg_width,
                                self.user_tile))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], *aux)

    def unfold(self) -> Tuple[jax.Array, jax.Array]:
        """Recover ``(items [I, D], bias [I])`` from the augmented
        table (bias exact to ~2^-24 — the sum of its three bf16-exact
        term columns).  Used when a call must route to a non-streaming
        implementation (e.g. very large k)."""
        t = self.table[:self.num_items]
        bias = (t[:, self.dim].astype(jnp.float32)
                + t[:, self.dim + 1].astype(jnp.float32)
                + t[:, self.dim + 2].astype(jnp.float32))
        return t[:, :self.dim], bias


jax.tree_util.register_pytree_node(
    PreparedItems,
    lambda p: p.tree_flatten(),
    PreparedItems.tree_unflatten)


def _fold_bias_columns(items: jax.Array, bias: Optional[jax.Array],
                       ipad: int) -> jax.Array:
    """[I, D] + bias [I] -> [Ipad, D+3]: the streaming kernel's item
    operand.  The bias rides the MXU matmul as THREE bf16-exact term
    columns (hi = bf16(b), mid = bf16(b-hi), lo = bf16(residual)) against
    ones-columns on the queries: the MXU truncates matmul operands to
    bf16 passes even for f32 inputs, so each column must be
    bf16-representable for the fold to be lossless; three terms
    reconstruct the f32 bias to ~2^-24 relative inside the f32
    accumulator.  Lanes pad to 128 anyway (D<=125), so the extra columns
    are free.  Padded item rows get hi = NEG_INF, which also replaces
    the padded-row validity mask the kernel used to apply per tile."""
    I = items.shape[0]
    dt = items.dtype
    b32 = (bias.astype(jnp.float32) if bias is not None
           else jnp.zeros((I,), jnp.float32))
    # NOT .astype(bf16).astype(f32): XLA's allow_excess_precision (on by
    # default) elides downcast-upcast round-trips, which collapses the
    # split to (b32, 0, 0) and loses the low bits in the MXU pass
    # (measured ~4e-4 relative).  reduce_precision is the primitive that
    # survives the simplifier.
    _bf16 = functools.partial(jax.lax.reduce_precision,
                              exponent_bits=8, mantissa_bits=7)
    hi = _bf16(b32)
    mid = _bf16(b32 - hi)
    lo = _bf16(b32 - hi - mid)
    hi = jnp.pad(hi.astype(dt), (0, ipad - I), constant_values=NEG_INF)
    mid = jnp.pad(mid.astype(dt), (0, ipad - I))
    lo = jnp.pad(lo.astype(dt), (0, ipad - I))
    return jnp.concatenate(
        [jnp.pad(items, ((0, ipad - I), (0, 0))),
         hi[:, None], mid[:, None], lo[:, None]], axis=1)


@functools.partial(jax.jit, static_argnames=(
    "block_items", "seg_width", "user_tile"))
def prepare_items(
    items: jax.Array,              # [I, D]
    bias: Optional[jax.Array] = None,   # [I]
    block_items: Optional[int] = None,
    seg_width: int = 128,
    user_tile: int = 256,
) -> PreparedItems:
    """Build the streaming kernel's item operand ONCE (pad to a block
    multiple + fold the bias — see :class:`PreparedItems`).  Pass the
    result as ``items`` to ``topk_scores_streaming``/``topk_scores``
    (with ``bias=None``: it is baked in).  ``user_tile`` here is the
    LARGEST user tile later calls will use — the auto block sizing is
    conservative in it."""
    I, D = items.shape
    if block_items is None:
        block_items = _auto_block_items(
            D, jnp.dtype(items.dtype).itemsize, user_tile, seg_width)
    if block_items % seg_width:
        raise ValueError("block_items must be a multiple of seg_width")
    nblocks = -(-I // block_items)
    table = _fold_bias_columns(items, bias, nblocks * block_items)
    return PreparedItems(table, I, D, block_items, seg_width, user_tile)


def _auto_block_items(d: int, item_bytes: int, tu: int,
                      seg_width: int) -> int:
    """Largest power-of-two item block (multiple of seg_width, <=8192)
    whose streaming-kernel working set fits scoped VMEM.

    Dominant terms per grid step: the [TI, TU] f32 score tile and the
    double-buffered [TI, lanes] item block, where lanes is D+3 rounded
    up to the 128-lane tile (TPU buffers lane-pad: a [TI, 67] block
    occupies 128 lanes).  Before the bias was folded into the matmul,
    the lane-padded [TI, 1] f32 bias block added 8 MB at TI=8192 and
    OOMed the f32 default (16.09 MB scoped > the 16 MB v5e limit);
    this sizing keeps the public default safe for any operand dtype."""
    lanes = -(-(d + 3) // 128) * 128
    ti = 8192
    while ti > seg_width:
        work = (ti * tu * 4                  # f32 score tile
                + ti * lanes * item_bytes * 2)  # double-buffered items
        if work <= _STREAM_VMEM_BUDGET:
            break
        ti //= 2
    return max(ti, seg_width)

def _extract_topk_rows(scores: jax.Array, row_ids: jax.Array, k: int):
    """Top-k over axis 0 (sublanes) of ``scores [R, C]``; ``row_ids``
    carries an int32 label per element.  Returns (vals [k, C],
    ids [k, C]).  Ties resolve to the lowest row.  Pure max/where/iota
    VPU ops — Mosaic has no top-k primitive."""
    R, C = scores.shape
    row = jax.lax.broadcasted_iota(jnp.int32, (R, C), 0)
    work = scores
    vals, ids = [], []
    for _ in range(k):
        m = jnp.max(work, axis=0, keepdims=True)                # [1, C]
        sel = jnp.min(jnp.where(work == m, row, R), axis=0)     # [C]
        hit = row == sel[None, :]
        vals.append(m)
        ids.append(jnp.sum(jnp.where(hit, row_ids, 0), axis=0, keepdims=True))
        work = jnp.where(hit, NEG_INF, work)
    return jnp.concatenate(vals, 0), jnp.concatenate(ids, 0)


def _streaming_kernel(block_items, seg_width, k, seg_top,
                      t_ref, q_ref, vout, iout, vals_c, idx_c):
    """Grid (user_tiles, item_blocks), item minor: the per-user-tile
    running top-k (value, item-id) carry lives in [k, TU] VMEM scratch.

    Scores are computed ITEMS-ON-SUBLANES ([TI, TU]) so the per-segment
    max is a sublane-group tree reduction.  The per-item bias arrives
    FOLDED INTO THE MATMUL: the caller appends three bf16-exact bias
    term columns to the item block and matching ones-columns to the
    queries (see ``topk_scores_streaming``), so there is no [TI, 1]
    bias operand — that block lane-pads to 128 on TPU (4 MB per buffer
    at TI=8192, 8 MB double-buffered) and was the kernel's largest VMEM
    consumer — and padded rows carry NEG_INF bias, so no validity mask
    pass either.
    Each segment surfaces its top ``seg_top`` (value, exact global item
    id) pairs via argmax-by-equality; the merge keeps exact f32 scores
    end to end (no key quantization)."""
    i = pl.program_id(1)
    ni = pl.num_programs(1)
    TU = q_ref.shape[0]
    nseg = block_items // seg_width

    @pl.when(i == 0)
    def _():
        vals_c[:] = jnp.full((k, TU), NEG_INF, jnp.float32)
        idx_c[:] = jnp.zeros((k, TU), jnp.int32)

    scores = jax.lax.dot_general(
        t_ref[:], q_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                     # [TI, TU]

    s3 = scores.reshape(nseg, seg_width, TU)
    seg_base = (jax.lax.broadcasted_iota(jnp.int32, (nseg, TU), 0) * seg_width
                + i * block_items)
    off_iota = jax.lax.broadcasted_iota(jnp.int32, s3.shape, 1)
    m1 = jnp.max(s3, axis=1)                                    # [nseg, TU]
    off1 = jnp.min(jnp.where(s3 == m1[:, None, :], off_iota, seg_width),
                   axis=1)
    g1 = seg_base + off1
    if seg_top == 2:
        # second-best per segment: mask the argmax element (first hit
        # only — equal-valued runners-up stay eligible) and re-reduce
        s3b = jnp.where(off_iota == off1[:, None, :], NEG_INF, s3)
        m2 = jnp.max(s3b, axis=1)
        off2 = jnp.min(jnp.where(s3b == m2[:, None, :], off_iota, seg_width),
                       axis=1)
        g2 = seg_base + jnp.minimum(off2, seg_width - 1)
        segvals = jnp.concatenate([m1, m2], axis=0)
        segids = jnp.concatenate([g1, g2], axis=0)
    else:
        segvals, segids = m1, g1

    cat_v = jnp.concatenate([vals_c[:], segvals], axis=0)
    cat_i = jnp.concatenate([idx_c[:], segids], axis=0)
    mv, mi = _extract_topk_rows(cat_v, cat_i, k)
    vals_c[:] = mv
    idx_c[:] = mi

    @pl.when(i == ni - 1)
    def _():
        vout[:] = mv
        iout[:] = mi


@functools.partial(jax.jit, static_argnames=(
    "k", "block_items", "user_tile", "seg_width", "seg_top", "interpret"))
def topk_scores_streaming(
    queries: jax.Array,            # [B, D]
    items: jax.Array,              # [I, D]
    k: int = 10,
    bias: Optional[jax.Array] = None,
    block_items: Optional[int] = None,
    user_tile: int = 256,
    seg_width: Optional[int] = None,   # None: prepared value, else 128
    seg_top: int = 2,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Quasi-exact streaming top-k at matmul speed (the TPU default for
    large catalogs).

    One fused kernel: MXU matmul per (user tile, item block) -> per-
    segment top-``seg_top`` (exact f32 value, exact item id) -> in-VMEM
    running top-k merge.  The [B, I] score matrix never exists in HBM,
    there is no phase-2 rescoring gather (HBM-latency-bound at these
    sizes), and returned scores are exact f32 — unlike the superseded
    ``topk_scores_segmented``, which quantizes scores to pack offsets.

    Recall: an item is missed only when > ``seg_top`` of the true top-k
    land in one ``seg_width``-item segment — probability ~C(k, seg_top+1)
    * (seg_width/I)^seg_top; ~2e-6 for k=10, seg_top=2, I=1e6.  Measured
    ladder (TPU v5e, B=1024 x I=1M x D=64 bf16, prepared table, k=10):

        seg_width=128 seg_top=2   3.21 ms  319k users/s  recall 1.00000
        seg_width=64  seg_top=1   1.89 ms  542k users/s  recall 0.99980
        seg_width=128 seg_top=1   2.01 ms  510k users/s  recall 0.99932

    seg_top=1 runs at the matmul floor (its VPU extraction hides fully
    under the four MXUs); halving seg_width buys back most of the
    recall for free since the miss probability is linear in seg_width
    at seg_top=1.  The exact default stays (128, 2).

    Measured (TPU v5e, chained scan timing, B=1024 x I=1M x D=64 bf16
    with bias): 6.5 ms/call with the item operand built inline, of which
    only ~2.0 ms is the kernel (seg_top=1 body; +1.4 ms for the
    seg_top=2 second-best block) — the rest is XLA re-materializing the
    padded+bias-folded item table every call.  Pass a
    :class:`PreparedItems` (see :func:`prepare_items`) to pay that once:
    3.3 ms/call at seg_top=2.  Kernel anatomy (ablated): the matmul
    floor is ~1.5 ms — the four MXUs retire 128x128 output tiles at
    ~512 outputs/cycle regardless of contraction depth K=D<=128 — and
    the per-segment max + eq-argmax VPU passes hide entirely under the
    MXU; the seg_top=2 re-reduction exceeds the overlap budget and
    costs ~1.4 ms.  The superseded segmented kernel measured 34 ms and
    one-shot XLA matmul+approx_max_k 9.4 ms (OOM-bound).

    ``block_items=None`` picks the largest block whose working set fits
    the ~16 MB scoped-VMEM budget (the [TI, TU] f32 score tile + the
    double-buffered item block dominate); f32 operands at I>=1M OOM the
    default 8192 block, bf16 fits.
    """
    if seg_top not in (1, 2):
        raise ValueError("seg_top must be 1 or 2")
    B = queries.shape[0]
    TU = min(user_tile, max(8, -(-B // 8) * 8))
    if isinstance(items, PreparedItems):
        if bias is not None:
            raise ValueError(
                "bias must be None with PreparedItems (it is baked in)")
        if block_items is not None and block_items != items.block_items:
            raise ValueError("block_items fixed at prepare_items time")
        if seg_width is not None and seg_width != items.seg_width:
            raise ValueError("seg_width fixed at prepare_items time")
        if TU > items.user_tile:
            raise ValueError(
                f"user tile {TU} exceeds the prepare_items sizing "
                f"assumption ({items.user_tile}): the block could "
                "overflow scoped VMEM — re-prepare with a larger "
                "user_tile")
        I, D = items.num_items, items.dim
        seg_width = items.seg_width
        block_items = items.block_items
        t = items.table
        dt = t.dtype
    else:
        if seg_width is None:
            seg_width = 128
        I, D = items.shape
        dt = items.dtype
        if block_items is None:
            block_items = _auto_block_items(
                D, jnp.dtype(dt).itemsize, TU, seg_width)
        if block_items % seg_width:
            raise ValueError("block_items must be a multiple of seg_width")
        t = _fold_bias_columns(
            items, bias, -(-I // block_items) * block_items)
    if seg_width & (seg_width - 1):
        raise ValueError("seg_width must be a power of two")
    k = min(k, I)
    Bpad = -(-B // TU) * TU
    n_utiles = Bpad // TU
    nblocks = -(-I // block_items)
    Ipad = nblocks * block_items
    nseg = block_items // seg_width

    ones = jnp.ones((Bpad, 1), dt)
    q = jnp.concatenate(
        [jnp.pad(queries.astype(dt), ((0, Bpad - B), (0, 0))),
         ones, ones, ones], axis=1)
    Dk = D + 3

    kernel = functools.partial(
        _streaming_kernel, block_items, seg_width, k, seg_top)
    vals, idxs = pl.pallas_call(
        kernel,
        grid=(n_utiles, nblocks),
        in_specs=[
            pl.BlockSpec((block_items, Dk), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TU, Dk), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((k, TU), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, TU), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((k, Bpad), jnp.float32),
            jax.ShapeDtypeStruct((k, Bpad), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((k, TU), jnp.float32),
            pltpu.VMEM((k, TU), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Bpad * Ipad * Dk,
            bytes_accessed=(Bpad * Dk + Ipad * Dk * n_utiles) * 2
            + Bpad * k * 8,
            transcendentals=0),
        interpret=interpret,
    )(t, q)
    return vals.T[:B], jnp.minimum(idxs.T[:B], I - 1)


# ------------------------------------------------- int8 streaming tier

# int32 "minus infinity" for masked scores inside the int8 kernel: far
# below any reachable accumulator value (|acc| <= D*127^2 + 32385 < 2^21)
# yet safe against wrap-around in max/where ops
_INT_NEG = -(2 ** 30)
# bias digit range with query-side weights (127, 127, 1): see
# _bias_digits — |B_int| <= 127*254 + 64
_BIAS_INT_LIM = 32322.0
# accumulator value of a padded row: zero vector + all digits at -127
# (127*-127 + 127*-127 + -127); winners at or below this floor report
# as empty slots (see topk_scores_streaming_int8)
_PAD_FLOOR = -32385.0


class PreparedItemsInt8:
    """An int8-quantized augmented item table for
    :func:`topk_scores_streaming_int8` — the approximate retrieval tier.

    The TPU v5e MXU retires int8 matmul outputs ~1.38x faster than bf16
    (measured 770 vs 559 G outputs/s on a dot+max kernel — BENCH_NOTES),
    and the streaming top-k kernel is matmul-bound at seg_top=1, so an
    int8 item operand moves the whole retrieval floor.  Fair parity: the
    reference's own retrieval is approximate ANN (Tree-AH,
    src/inference/setup_tree_ah_endpoint.py:25-33).

    Quantization scheme (all scales fixed at prepare time):
      - items:  per-DIMENSION symmetric scales ``col_scale[d] =
        max_i |v[i,d]| / 127``; the int8 table stores exact integers
        ``round(v[:,d] / col_scale[d])``.
      - queries: the column scales fold into the query side
        (q . v == (q o col_scale) . (v / col_scale)), then one global
        scale ``q_scale = max |q o col_scale| / 127`` quantizes the
        folded query.  ``q_scale`` is computed from the query sample
        given to :func:`prepare_items_int8` (serving: the full static
        user-query table), so later calls quantize against a FIXED
        scale and the bias fold below stays valid; out-of-range query
        entries clip.
      - bias:  folded into the matmul as THREE int8 digit columns with
        query-side weights (127, 127, 1), encoding
        ``B_int = round(bias / q_scale)`` clipped to +-32322 — i.e. the
        bias lands in the int32 accumulator with the same LSB as the
        dot product itself.

    Dequantized score = ``acc * q_scale``; error is dominated by the
    query rounding (+-0.5 LSB per dimension).  Construct via
    :func:`prepare_items_int8`; registered as a pytree.
    """

    def __init__(self, table: jax.Array, col_scale: jax.Array,
                 q_scale: jax.Array, num_items: int, dim: int,
                 block_items: int, seg_width: int, user_tile: int = 256):
        self.table = table            # [Ipad, dim + 3] int8
        self.col_scale = col_scale    # [dim] f32
        self.q_scale = q_scale        # [] f32
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

    def unfold(self) -> Tuple[jax.Array, jax.Array]:
        """Dequantized ``(items [I, D] f32, bias [I] f32)`` — approximate
        (item rounding error <= col_scale/2 per entry).  Used when a call
        must route to a non-streaming implementation (very large k)."""
        t = self.table[:self.num_items].astype(jnp.float32)
        items = t[:, :self.dim] * self.col_scale[None, :]
        d = self.dim
        bias = (127.0 * t[:, d] + 127.0 * t[:, d + 1] + t[:, d + 2]
                ) * self.q_scale
        return items, bias


jax.tree_util.register_pytree_node(
    PreparedItemsInt8,
    lambda p: p.tree_flatten(),
    PreparedItemsInt8.tree_unflatten)


def _bias_digits(b_int: jax.Array) -> jax.Array:
    """Decompose integer bias values (f32-held, clipped to +-32322) into
    three int8 digits (d1, d2, d3) such that 127*d1 + 127*d2 + d3 ==
    b_int exactly: hi = round(b/127) split across two +-127 digits, the
    residual (|.| <= 64) rides the weight-1 column.  Returns [I, 3]."""
    hi = jnp.clip(jnp.round(b_int / 127.0), -254.0, 254.0)
    d3 = b_int - 127.0 * hi
    d1 = jnp.ceil(hi / 2.0)
    d2 = hi - d1
    return jnp.stack([d1, d2, d3], axis=1)


@functools.partial(jax.jit, static_argnames=(
    "block_items", "seg_width", "user_tile", "clip_quantile"))
def prepare_items_int8(
    items: jax.Array,              # [I, D] float
    bias: Optional[jax.Array],     # [I] or None
    queries: jax.Array,            # [N, D] query sample fixing q_scale
    block_items: Optional[int] = None,
    seg_width: int = 64,
    user_tile: int = 256,
    clip_quantile: Optional[float] = None,
) -> PreparedItemsInt8:
    """Quantize the catalog for the int8 streaming tier (see
    :class:`PreparedItemsInt8`).  ``queries`` fixes the query/bias scale:
    pass the full static user-query table (or a [1, D] per-dimension
    max-abs row for a cheap exact bound).

    ``clip_quantile``: scales from the |value| QUANTILE instead of the
    max — MEASURED WORSE at every setting; keep the default (None).
    Round-3 A/B at 1M items (results/int8_recall_diag.jsonl,
    2026-08-21): recall@10 at over-fetch +6 is 0.99346 max-based vs
    0.99170 (clip 0.9999), 0.98105 (0.999), 0.91426 (0.99).  The
    outlier entries a clip would sacrifice carry exactly the top-score
    signal (high-scoring items are the ones whose large entries align
    with the query), so coarser outliers hurt more than finer typical
    entries help.  The parameter stays for reproducing the experiment.

    Recall bound (same diagnosis): the 'int8' preset's 0.99336 recall
    plateau at over-fetch >= 6 is intrinsic to 8-bit x 64-dim dot
    products at this catalog density — 60/67 lost true-top-10 items
    score below >64 int8 segment winners (score noise ~0.2 rms vs
    top-of-1M rank spacing of the same order), 7/67 are seg_top=1
    segment-stage losses (seg_top=2 buys +0.0006 recall for +30% time —
    rejected).  For recall >= 0.999, serve the bf16 'fast' (0.9998) or
    'exact' (1.0) presets."""
    I, D = items.shape
    if seg_width & (seg_width - 1):
        # the packed-key recovery shifts by log2(seg_width) and masks
        # seg_width-1: silently wrong for non-powers-of-two
        raise ValueError("seg_width must be a power of two")
    if D > 1024:
        # merge exactness and key packing assume |acc| <= D*127^2 +
        # 32385 < 2^24 (exact in the f32 carry) and |acc|*seg_width <
        # 2^31 (no int32 wrap): both bound D at ~1038
        raise ValueError(
            f"int8 tier supports dim <= 1024 (got {D}): the packed-key "
            "accumulator bound |acc| < 2^24 would not hold")
    if block_items is None:
        block_items = _auto_block_items(D, 1, user_tile, seg_width)
    if block_items % seg_width:
        raise ValueError("block_items must be a multiple of seg_width")
    nblocks = -(-I // block_items)
    ipad = nblocks * block_items

    v32 = items.astype(jnp.float32)
    if clip_quantile is not None:
        col_bound = jnp.quantile(jnp.abs(v32), clip_quantile, axis=0)
    else:
        col_bound = jnp.max(jnp.abs(v32), axis=0)
    col_scale = jnp.maximum(col_bound / 127.0, 1e-30)
    # out-of-bound entries clip at +-127 via the table clip below
    v8 = jnp.round(v32 / col_scale[None, :])                 # exact ints

    q_folded = jnp.abs(queries.astype(jnp.float32)) * col_scale[None, :]
    if clip_quantile is not None:
        q_folded_max = jnp.quantile(q_folded, clip_quantile)
    else:
        q_folded_max = jnp.max(q_folded)
    q_scale = jnp.maximum(q_folded_max / 127.0, 1e-30)

    b32 = (bias.astype(jnp.float32) if bias is not None
           else jnp.zeros((I,), jnp.float32))
    b_int = jnp.clip(jnp.round(b32 / q_scale),
                     -_BIAS_INT_LIM, _BIAS_INT_LIM)
    digits = _bias_digits(b_int)                              # [I, 3]

    table = jnp.concatenate([v8, digits], axis=1)
    # padded rows: zero vector + most-negative bias digits (the kernel
    # also masks them by global row id — belt and braces)
    table = jnp.pad(table, ((0, ipad - I), (0, 0)))
    if ipad > I:
        table = table.at[I:, D:].set(-127.0)
    table = jnp.clip(table, -127.0, 127.0).astype(jnp.int8)
    return PreparedItemsInt8(table, col_scale, q_scale, I, D,
                             block_items, seg_width, user_tile)


def _streaming_kernel_int8(block_items, seg_width, k, seg_top,
                           t_ref, q_ref, vout, iout, vals_c, idx_c):
    """Int8 variant of ``_streaming_kernel``: int8 x int8 -> int32 MXU
    matmul (bias pre-folded as weighted digit columns), per-segment
    top-``seg_top`` in the integer domain, then the same f32 running
    merge (|acc| < 2^24 enforced at prepare time, exact in f32).

    Integer accumulators buy a trick f32 scores cannot have: the
    (score, within-segment offset) pair packs LOSSLESSLY into one int32
    key ``acc * seg_width + (seg_width-1 - offset)``, so the
    per-segment max and its argmax are ONE reduction pass instead of
    max + equality + min (measured ~0.5-0.8 ms of the call).  Ties
    resolve to the lowest offset via the complemented offset bits,
    matching the bf16 kernel.

    Padded rows are never masked here (an element mask costs 3 VPU
    passes over the full tile, measured ~0.5 ms): prepare_items_int8
    gives them a zero vector + the bias digit floor (acc = -32385
    exactly), and the caller maps any returned winner at or below the
    floor to an empty slot — see ``topk_scores_streaming_int8``."""
    i = pl.program_id(1)
    ni = pl.num_programs(1)
    TU = q_ref.shape[0]
    nseg = block_items // seg_width

    @pl.when(i == 0)
    def _():
        vals_c[:] = jnp.full((k, TU), NEG_INF, jnp.float32)
        idx_c[:] = jnp.zeros((k, TU), jnp.int32)

    acc = jax.lax.dot_general(
        t_ref[:], q_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)                     # [TI, TU]

    s3 = acc.reshape(nseg, seg_width, TU)
    seg_base = (jax.lax.broadcasted_iota(jnp.int32, (nseg, TU), 0) * seg_width
                + i * block_items)
    off_iota = jax.lax.broadcasted_iota(jnp.int32, s3.shape, 1)
    k3 = s3 * seg_width + (seg_width - 1 - off_iota)          # packed keys
    key1 = jnp.max(k3, axis=1)                                # [nseg, TU]
    m1 = jnp.right_shift(key1, seg_width.bit_length() - 1)              # arith shift
    off1 = (seg_width - 1) - (key1 & (seg_width - 1))
    g1 = seg_base + off1
    if seg_top == 2:
        k3b = jnp.where(k3 == key1[:, None, :], _INT_NEG, k3)
        key2 = jnp.max(k3b, axis=1)
        m2 = jnp.right_shift(key2, seg_width.bit_length() - 1)
        off2 = (seg_width - 1) - (key2 & (seg_width - 1))
        g2 = seg_base + off2
        segvals = jnp.concatenate(
            [m1.astype(jnp.float32), m2.astype(jnp.float32)], axis=0)
        segids = jnp.concatenate([g1, g2], axis=0)
    else:
        segvals, segids = m1.astype(jnp.float32), g1

    cat_v = jnp.concatenate([vals_c[:], segvals], axis=0)
    cat_i = jnp.concatenate([idx_c[:], segids], axis=0)
    mv, mi = _extract_topk_rows(cat_v, cat_i, k)
    vals_c[:] = mv
    idx_c[:] = mi

    @pl.when(i == ni - 1)
    def _():
        vout[:] = mv
        iout[:] = mi


@functools.partial(jax.jit, static_argnames=(
    "k", "user_tile", "seg_top", "interpret"))
def topk_scores_streaming_int8(
    queries: jax.Array,            # [B, D] float
    items: PreparedItemsInt8,
    k: int = 10,
    user_tile: int = 256,
    seg_top: int = 1,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Approximate streaming top-k over an int8-quantized catalog
    (:func:`prepare_items_int8`) — the speed tier above 'fast'.

    Returned scores are the dequantized int8 scores (LSB = q_scale);
    pass the winners through :func:`rescore_exact` for exact f32 scores
    (the serving 'int8' preset does).  Recall loss has two sources: the
    per-segment surfacing bound shared with the bf16 kernel (see
    ``topk_scores_streaming``) and score quantization flipping
    near-ties at the top-k boundary — both measured on the recall
    ladder in BENCH_NOTES.

    Padded-row guarantee: padded rows score exactly ``_PAD_FLOOR``
    (-32385 int units — reachable by real items, whose accumulators
    extend ~32x further down at D=64), and any winner at or below the
    floor is returned as an EMPTY SLOT (value NEG_INF).  So results
    never contain a plausible-looking id backed by a padded row; slots
    go empty only when fewer than k catalog scores clear the floor,
    i.e. ~32000 quantization LSBs below zero — far outside anything a
    recommender would serve.
    """
    if seg_top not in (1, 2):
        raise ValueError("seg_top must be 1 or 2")
    B = queries.shape[0]
    D, I = items.dim, items.num_items
    TU = min(user_tile, max(8, -(-B // 8) * 8))
    if TU > items.user_tile:
        raise ValueError(
            f"user tile {TU} exceeds the prepare_items_int8 sizing "
            f"assumption ({items.user_tile})")
    k = min(k, I)
    block_items = items.block_items
    seg_width = items.seg_width
    Bpad = -(-B // TU) * TU
    nblocks = items.table.shape[0] // block_items
    Ipad = nblocks * block_items

    q32 = queries.astype(jnp.float32) * items.col_scale[None, :]
    q8 = jnp.clip(jnp.round(q32 / items.q_scale), -127.0, 127.0)
    q8 = jnp.pad(q8, ((0, Bpad - B), (0, 0)))
    w = jnp.broadcast_to(jnp.asarray([[127.0, 127.0, 1.0]]), (Bpad, 3))
    q8 = jnp.concatenate([q8, w], axis=1).astype(jnp.int8)
    Dk = D + 3

    kernel = functools.partial(
        _streaming_kernel_int8, block_items, seg_width, k, seg_top)
    vals, idxs = pl.pallas_call(
        kernel,
        grid=(Bpad // TU, nblocks),
        in_specs=[
            pl.BlockSpec((block_items, Dk), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TU, Dk), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((k, TU), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, TU), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((k, Bpad), jnp.float32),
            jax.ShapeDtypeStruct((k, Bpad), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((k, TU), jnp.float32),
            pltpu.VMEM((k, TU), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Bpad * Ipad * Dk,
            bytes_accessed=(Bpad * Dk + Ipad * Dk * (Bpad // TU))
            + Bpad * k * 8,
            transcendentals=0),
        interpret=interpret,
    )(items.table, q8)
    # padded rows carry acc == _PAD_FLOOR exactly (zero vector + bias
    # digit floor); a real row CAN dip that low (|q8.v8| extends ~32x
    # further), so any winner at or below the floor — padded or a real
    # item indistinguishable from one — reports as an EMPTY SLOT
    # (NEG_INF value), never as a plausible-looking clamped id
    vals = vals.T[:B]
    valid = vals > _PAD_FLOOR + 0.5
    vals = jnp.where(valid, vals * items.q_scale, NEG_INF)
    return vals, jnp.minimum(idxs.T[:B], I - 1)


@functools.partial(jax.jit, static_argnames=())
def rescore_exact(
    queries: jax.Array,            # [B, D] float
    items: jax.Array,              # [I, D] float
    bias: Optional[jax.Array],     # [I] or None
    idxs: jax.Array,               # [B, k] candidate ids
) -> Tuple[jax.Array, jax.Array]:
    """Exact f32 re-score + re-sort of retrieved candidates: returns
    (values [B, k], ids [B, k]) sorted by exact score.  The int8 tier's
    second phase — a [B*k]-row gather + per-pair dot, cheap at serving
    k (measured in BENCH_NOTES)."""
    win = jnp.take(items, idxs, axis=0)                       # [B, k, D]
    vals = jnp.einsum("bd,bkd->bk", queries.astype(jnp.float32),
                      win.astype(jnp.float32))
    if bias is not None:
        vals = vals + jnp.take(bias.astype(jnp.float32), idxs)
    order = jnp.argsort(-vals, axis=1)
    return (jnp.take_along_axis(vals, order, axis=1),
            jnp.take_along_axis(idxs, order, axis=1))


# --------------------------------------------- segmented-max (superseded)

def _monotone_i32(x: jax.Array) -> jax.Array:
    """Order-preserving f32 -> SIGNED int32 (IEEE trick: for negative
    floats flip the magnitude bits).  Signed, because Mosaic has no
    unsigned reductions."""
    i = jax.lax.bitcast_convert_type(x, jnp.int32)
    return i ^ ((i >> 31) & jnp.int32(0x7FFFFFFF))


def _segmax_kernel(num_items, block_items, seg_width, offset_bits,
                   q_ref, t_ref, bias_ref, keys_out):
    """Per (user tile, item block): matmul then segmented max of packed
    (quantized-score | within-segment-offset) keys — one reduction pass
    instead of k extraction rounds.  Output [TU, nseg] candidate keys per
    block; the candidate's global column is reconstructed from its output
    position (block, segment) plus the packed offset."""
    j = pl.program_id(1)
    scores = jax.lax.dot_general(
        q_ref[:], t_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                   # [TU, TI]
    scores = scores + bias_ref[0, :].reshape(1, -1)
    base = j * block_items
    gcol = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) + base
    scores = jnp.where(gcol < num_items, scores, NEG_INF)

    TU, TI = scores.shape
    lcol = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    offset = lcol & jnp.int32(seg_width - 1)
    keys = (_monotone_i32(scores) & jnp.int32(-seg_width)) | offset
    nseg = TI // seg_width
    seg = jnp.max(keys.reshape(TU, nseg, seg_width), axis=2)  # [TU, nseg]
    keys_out[:] = seg


@functools.partial(jax.jit, static_argnames=(
    "k", "block_items", "user_tile", "seg_width", "interpret"))
def topk_scores_segmented(
    queries: jax.Array,            # [B, D]
    items: jax.Array,              # [I, D]
    k: int = 10,
    bias: Optional[jax.Array] = None,
    block_items: int = 2048,
    user_tile: int = 256,
    seg_width: int = 128,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Approximate streaming top-k for huge catalogs (the ScaNN-on-TPU /
    PartialReduce design): each 128-item segment surfaces only its best
    candidate (quantized to 21 score bits), candidates are exact-top-k'd
    in XLA, and winners are re-scored exactly.  Recall loss occurs only
    when two true top-k items share a segment (probability ~C(k,2) *
    seg_width / I — e.g. 0.6% for k=10 over 1M shuffled items).  Unlike
    the one-shot XLA path, the [B, I] score matrix never exists in HBM, so
    this scales to catalogs where B*I*4 bytes is impossible."""
    if seg_width & (seg_width - 1):
        raise ValueError("seg_width must be a power of two")
    B, D = queries.shape
    I = items.shape[0]
    TU = min(user_tile, max(8, B))
    Bpad = -(-B // TU) * TU
    n_utiles = Bpad // TU
    nblocks = -(-I // block_items)
    Ipad = nblocks * block_items
    nseg = block_items // seg_width
    offset_bits = int(seg_width - 1).bit_length()

    q = jnp.pad(queries, ((0, Bpad - B), (0, 0)))
    t = jnp.pad(items, ((0, Ipad - I), (0, 0)))
    b2 = jnp.zeros((1, Ipad), jnp.float32)
    if bias is not None:
        b2 = b2.at[0, :I].set(bias.astype(jnp.float32))

    kernel = functools.partial(
        _segmax_kernel, I, block_items, seg_width, offset_bits)
    # output blocks stacked along rows (grid step (i, j) writes row-block
    # i*nblocks+j) so the trailing dim equals nseg — satisfies the Mosaic
    # lane-divisibility rule for any nseg
    keys = pl.pallas_call(
        kernel,
        grid=(n_utiles, nblocks),
        in_specs=[
            pl.BlockSpec((TU, D), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_items, D), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_items), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TU, nseg), lambda i, j: (i * nblocks + j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (n_utiles * nblocks * TU, nseg), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bpad * Ipad * D,
            bytes_accessed=(Bpad * D + Ipad * D) * 2
            + Bpad * nblocks * nseg * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q, t, b2)

    # [n_utiles, nblocks, TU, nseg] -> [Bpad, nblocks * nseg]
    keys = keys.reshape(n_utiles, nblocks, TU, nseg).transpose(0, 2, 1, 3)
    keys = keys.reshape(Bpad, nblocks * nseg)[:B]

    # top-k over the candidate keys (quantized order).  Wide candidate
    # sets use the TPU-optimized approx_max_k (full sort over >32k keys
    # per row is seconds-slow); ranking keys as f32 costs at most one
    # quantized-score LSB and winners are exact re-scored below anyway.
    if keys.shape[1] > 32768 and jax.default_backend() == "tpu":
        _, flat_pos = jax.lax.approx_max_k(
            keys.astype(jnp.float32), k, recall_target=0.99)
        top_keys = jnp.take_along_axis(keys, flat_pos, axis=1)
    else:
        top_keys, flat_pos = jax.lax.top_k(keys, k)
    # candidate at flat position p: block = p // nseg, segment = p % nseg,
    # within-segment offset from the packed low bits
    offset = top_keys & jnp.int32(seg_width - 1)
    idxs = ((flat_pos // nseg) * block_items
            + (flat_pos % nseg) * seg_width + offset)         # [B, k]
    idxs = jnp.minimum(idxs, I - 1)

    # exact re-score + re-sort of winners (shared with the int8 tier)
    return rescore_exact(queries, items, bias, idxs)


def topk_scores(
    queries: jax.Array,
    items: jax.Array,
    k: int = 10,
    bias: Optional[jax.Array] = None,
    impl: str = "auto",
    seg_top: Optional[int] = None,   # None: 2 for bf16/f32, 1 for int8
) -> Tuple[jax.Array, jax.Array]:
    """Dispatch.  'auto' (measured on TPU v5e, B=1024, I=1M, chained
    timing): the streaming segmax kernel (3.2 ms prepared, exact scores,
    recall 1.0 measured) beats the superseded key-packing segmented
    kernel (34 ms) and one-shot matmul+approx_max_k (9.4 ms but OOMs
    past ~0.5 GB score matrices) while never materializing [B, I]; small
    catalogs use the exact dense path (cheap and exact).  The streaming
    kernel unrolls k extraction rounds, so very large k routes to the
    blocked XLA path instead.

    ``items`` may be a :class:`PreparedItems` (bias baked in) — routed
    to the streaming kernel, except very large k (the kernel unrolls k
    extraction rounds and its recall bound degrades with k), which
    unfolds the table and takes the exact blocked XLA path.  A
    :class:`PreparedItemsInt8` routes to the int8 tier the same way
    (large k unfolds to the DEQUANTIZED table — approximate).
    ``seg_top`` applies to the streaming kernels only (see the recall
    ladders)."""
    if isinstance(items, PreparedItemsInt8):
        k = min(k, items.num_items)
        if bias is not None:
            raise ValueError(
                "bias must be None with PreparedItemsInt8 (it is baked in)")
        if k > 64:
            raw, b = items.unfold()
            return topk_scores_xla(queries, raw, k, b)
        return topk_scores_streaming_int8(queries, items, k,
                                          seg_top=seg_top or 1)
    if seg_top is None:
        seg_top = 2
    if isinstance(items, PreparedItems):
        k = min(k, items.num_items)
        if k > 64:
            raw, b = items.unfold()
            return topk_scores_xla(queries, raw, k, b)
        return topk_scores_streaming(queries, items, k, seg_top=seg_top)
    k = min(k, items.shape[0])
    if impl == "auto":
        small = queries.shape[0] * items.shape[0] * 4 <= 64 * 2**20
        if small:
            impl = "dense"
        elif jax.default_backend() == "tpu" and k <= 64:
            impl = "streaming"
        else:
            impl = "xla"
    if impl == "dense":
        return topk_scores_dense(queries, items, k, bias)
    if impl == "pallas":
        return topk_scores_pallas(queries, items, k, bias)
    if impl == "streaming":
        return topk_scores_streaming(queries, items, k, bias,
                                     seg_top=seg_top)
    if impl == "segmented":
        return topk_scores_segmented(queries, items, k, bias)
    return topk_scores_xla(queries, items, k, bias)
