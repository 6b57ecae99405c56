"""Vectorized negative sampling — device-side (jittable) and host-side.

TPU-native replacement for the reference's per-item Python rejection
sampling (reference: src/model/data_prep.py:134-161 ``_sample_negative``:
<=10 rejection attempts from an inverse-popularity distribution avoiding
the user's positives, then exact fallback) and the batch-level uniform
``NegativeSampler`` (src/data/negative_sampler.py:6-38).

On TPU the sampler runs *inside the jitted train step*: a fixed number of
categorical re-draw rounds with masked acceptance, entirely static-shape.
The exact-exclusion guarantee against the user's full history is provided
by the host-side sampler (used for eval candidate sets, where exactness
matters for metric comparability — SURVEY.md §2.9.9).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def make_sampling_cdf(weights) -> jax.Array:
    """Precompute the cumulative distribution for inverse-CDF sampling.
    ``weights`` need not be normalized."""
    w = jnp.asarray(weights, jnp.float32)
    cdf = jnp.cumsum(w)
    return cdf / cdf[-1]


# Flat compare-and-count up to this size; hierarchical above.
_FLAT_MAX_ITEMS = 512
_FANOUT = 128


def _inverse_cdf(cdf: jax.Array, u: jax.Array) -> jax.Array:
    """index = #{i : cdf[i] <= u}, the inverse-CDF transform — exact.

    TPU design notes: scalar gathers from a 1-D table are pathologically
    slow (a 12-step binary search measured ~30 ms for 262k draws on v5e)
    and flat compare-and-count is O(draws * items) VPU work (4 ms of a
    9 ms train step at batch 16k).  This implementation descends a
    128-ary tree of CDF levels: each level is one compare-count over a
    row of 128 boundaries, and moving between levels is a *row* gather
    (TPU-fast, unlike scalar gathers).  Work per draw is
    128 * ceil(log128(items)) instead of `items`."""
    num_items = cdf.shape[0]
    if num_items <= _FLAT_MAX_ITEMS:
        counts = (cdf[(None,) * u.ndim] <= u[..., None]).sum(-1)
        return jnp.clip(counts, 0, num_items - 1).astype(jnp.int32)

    # build levels bottom-up: leaves padded to a multiple of 128, each
    # upper level holds the last element of each 128-block below
    levels = []
    level = cdf
    while level.shape[0] > _FANOUT:
        n = -(-level.shape[0] // _FANOUT) * _FANOUT
        level = jnp.pad(level, (0, n - level.shape[0]),
                        constant_values=np.float32(np.inf))
        levels.append(level.reshape(-1, _FANOUT))   # [rows, 128]
        level = level.reshape(-1, _FANOUT)[:, -1]   # block maxima
    # root: <=128 entries
    root = jnp.pad(level, (0, _FANOUT - level.shape[0]),
                   constant_values=np.float32(np.inf))
    shape = u.shape
    uf = u.reshape(-1)                              # [n]
    idx = (root[None, :] <= uf[:, None]).sum(-1).astype(jnp.int32)
    for lv in reversed(levels):
        rows = jnp.take(lv, jnp.minimum(idx, lv.shape[0] - 1), axis=0)
        within = (rows <= uf[:, None]).sum(-1).astype(jnp.int32)
        idx = idx * _FANOUT + within
    return jnp.clip(idx, 0, num_items - 1).reshape(shape)


@partial(jax.jit,
         static_argnames=("num_negatives", "num_rounds", "num_items"))
def sample_negatives_stratified(
    rng: jax.Array,
    pos_items: jax.Array,          # int32 [B]
    num_items: int,
    num_negatives: int,
    cdf: Optional[jax.Array] = None,
    num_rounds: int = 2,
) -> jax.Array:
    """Stratified sorted negative sampling: ``[B, num_negatives]`` draws
    whose pooled multiset is exactly an i.i.d. sample of size
    ``B * num_negatives`` from the target distribution, generated in
    SORTED id order and assigned to (row, slot) cells by a strided
    random rotation.

    Why: sorted draws give every 1024-id chunk of the embedding-gradient
    scatter a narrow accumulator row band, so the one-hot scatter kernel
    (ops/pallas_scatter.py) skips ~85% of its MXU work — the scatter is
    the largest component of the train step at ML-1M scale.

    How:
      1. sorted uniforms WITHOUT a sort: normalized cumulative sums of
         exponential spacings (s_k / s_N for e ~ Exp(1)) are exactly the
         order statistics of N i.i.d. uniforms.
      2. inverse-CDF tree descent maps them to nondecreasing item ids.
      3. cell (b, slot s) takes pooled[(rot + s*B + b) mod N]: each
         row's negatives come from ``num_negatives`` well-separated
         strata of the pooled sample (never intra-row duplicates), and
         the random rotation varies strata across steps.  Statistically
         this is systematic (stratified) sampling: the batch-level
         negative distribution is exact, per-row sets are
         variance-REDUCED; only the pairing of rows to quantile strata
         is non-random within a single batch, and it re-randomizes
         every step via ``rot`` and the epoch shuffle.
      4. positive collisions advance to the next sorted neighbor
         (distribution-preserving to O(collision^2), keeps sortedness);
         ``num_rounds - 1`` advances.

    Validated against the i.i.d. sampler on the convergence benchmark —
    see BENCH_NOTES.md.  For dense per-user ``history`` exclusion use
    ``sample_negatives`` (the exclusion test needs arbitrary redraws).
    """
    B = pos_items.shape[0]
    N = B * num_negatives
    # 1. sorted uniforms via exponential spacings
    u = jax.random.uniform(rng, (N + 1,), jnp.float32,
                           minval=1e-7, maxval=1.0)
    e = -jnp.log(u)
    s = jnp.cumsum(e)
    sorted_u = s[:N] / s[N]
    # 2. nondecreasing ids (tree descent is order-agnostic)
    if cdf is None:
        pooled = jnp.clip((sorted_u * num_items).astype(jnp.int32),
                          0, num_items - 1)
    else:
        from ncf_tpu.ops.pallas_sampler import (
            tree_sample_negatives, tree_sampler_fits)

        if jax.default_backend() == "tpu" and tree_sampler_fits(num_items):
            pooled = tree_sample_negatives(
                sorted_u[None, :], jnp.zeros((N,), jnp.int32) - 1,
                cdf, num_items).reshape(-1)
        else:
            pooled = _inverse_cdf(cdf, sorted_u)
    # 3. strided assignment under a random rotation
    rot = jax.random.randint(rng, (), 0, N, dtype=jnp.int32)
    rolled = jnp.roll(pooled, -rot)                     # [N] column-major
    negs = rolled.reshape(num_negatives, B).T           # [B, NEG]
    # 4. neighbor-advance collision resolution: step 32*k positions
    # forward in the pooled sorted sample.  Mean id multiplicity in the
    # pool is N/num_items (~18-31 at ML-1M scale), so +1 would mostly
    # land on the same id again; +32 moves ~1-2 ids over while staying
    # inside the scatter chunk's narrow row window.
    for k in range(1, num_rounds):
        nxt = jnp.roll(pooled, -(rot + 32 * k)).reshape(num_negatives, B).T
        negs = jnp.where(negs == pos_items[:, None], nxt, negs)
    return negs


@partial(jax.jit, static_argnames=("num_negatives", "num_rounds", "num_items"))
def sample_negatives(
    rng: jax.Array,
    pos_items: jax.Array,          # int32 [B] — the positive item per row
    num_items: int,
    num_negatives: int,
    cdf: Optional[jax.Array] = None,  # f32 [num_items] from make_sampling_cdf
    history: Optional[jax.Array] = None,      # int32 [B, H] padded with -1
    num_rounds: int = 2,
) -> jax.Array:
    """Draw ``[B, num_negatives]`` negatives on device.

    Each slot draws ``num_rounds`` candidates from the (inverse-popularity)
    distribution and keeps the first that collides with neither the row's
    positive nor (optionally) the padded user history — the static-shape
    analogue of the reference's rejection loop (data_prep.py:134-161).  If
    all rounds collide, the last draw is kept: after 2 weighted redraw
    rounds the residual collision probability with the row's positive is
    p(item)^2, vanishing under inverse-popularity weights, and a residual
    collision merely relabels one duplicate pair — standard NCF noise.
    Raise ``num_rounds`` when passing a dense ``history``.

    Weighted draws use inverse-CDF ``searchsorted`` (O(log I) gathers per
    draw) rather than ``jax.random.categorical``, whose Gumbel-max
    broadcast would materialize a [rounds, B, N, num_items] noise tensor —
    gigabytes of HBM traffic at production batch sizes.
    """
    B = pos_items.shape[0]
    shape = (num_rounds, B, num_negatives)
    if cdf is None:
        cands = jax.random.randint(rng, shape, 0, num_items, dtype=jnp.int32)
    else:
        from ncf_tpu.ops.pallas_sampler import (
            tree_sample_negatives, tree_sampler_fits)

        if (history is None and jax.default_backend() == "tpu"
                and tree_sampler_fits(num_items)):
            # fused Pallas draw+reject: tree descent + one-hot row
            # matmul + rejection in VMEM (~0.48 ms/step of XLA HBM
            # traffic collapses to ~tens of us; bit-identical output).
            # Uniforms drawn pre-flattened to skip a relayout.
            u = jax.random.uniform(
                rng, (num_rounds, B * num_negatives), jnp.float32)
            return tree_sample_negatives(u, pos_items, cdf, num_items)
        u = jax.random.uniform(rng, shape, jnp.float32)
        cands = _inverse_cdf(cdf, u)

    ok = cands != pos_items[None, :, None]
    if history is not None:
        # [R, B, N, H] membership test against the padded history.
        hit = (cands[..., None] == history[None, :, None, :]).any(-1)
        ok = ok & ~hit

    # First acceptable round per slot; fall back to the last round.
    # Selected with an elementwise where-chain: take_along_axis over the
    # round axis lowers to 65k scalar gathers (~0.67 ms/step measured on
    # v5e at batch 16k x 4 negatives); the unrolled select is free.
    pick = cands[num_rounds - 1]
    for r in range(num_rounds - 2, -1, -1):
        pick = jnp.where(ok[r], cands[r], pick)
    return pick


def sample_eval_negatives(
    rng: np.random.Generator,
    eval_users: np.ndarray,        # int32 [U']
    history_offsets: np.ndarray,   # int64 [num_users + 1] CSR offsets
    history_items: np.ndarray,     # int32 [N] sorted-within-user
    num_items: int,
    num_negatives: int = 100,
) -> np.ndarray:
    """Host-side exact negative sampling for leave-one-out eval.

    For each eval user, uniformly sample ``num_negatives`` items not in the
    user's full history (the protocol the reference intended, fixing
    SURVEY.md §2.9.9).  Uses the native C++ sampler when built (exact,
    deterministic per seed); otherwise vectorized NumPy rejection: draw,
    test membership via sorted-history binary search, re-draw only the
    colliding entries.
    """
    from ncf_tpu import native

    if native.available():
        seed = int(rng.integers(0, 2**62))
        return native.sample_negatives_exact(
            eval_users, eval_users * 0 - 1,  # no extra positive exclusion
            np.ones(num_items, np.float64),
            history_offsets, history_items, num_negatives, seed=seed)

    U = len(eval_users)
    out = np.empty((U, num_negatives), np.int32)
    rows = np.repeat(np.arange(U), num_negatives)
    draw = rng.integers(0, num_items, size=U * num_negatives).astype(np.int32)

    def collides(rows_flat: np.ndarray, items_flat: np.ndarray) -> np.ndarray:
        res = np.zeros(len(rows_flat), bool)
        for k in range(len(rows_flat)):
            u = eval_users[rows_flat[k]]
            lo, hi = history_offsets[u], history_offsets[u + 1]
            seg = history_items[lo:hi]
            j = np.searchsorted(seg, items_flat[k])
            res[k] = j < len(seg) and seg[j] == items_flat[k]
        return res

    # Faster vectorized membership: searchsorted per row segment is the
    # Python loop above; for large U' do it chunk-wise on the sorted pairs.
    bad = _membership(eval_users[rows], draw, history_offsets, history_items)
    attempts = 0
    while bad.any() and attempts < 100:
        n_bad = int(bad.sum())
        draw[bad] = rng.integers(0, num_items, size=n_bad).astype(np.int32)
        bad_idx = np.nonzero(bad)[0]
        still = _membership(
            eval_users[rows[bad_idx]], draw[bad_idx], history_offsets, history_items)
        bad = np.zeros_like(bad)
        bad[bad_idx[still]] = True
        attempts += 1
    out[:] = draw.reshape(U, num_negatives)
    return out


def _membership(
    users: np.ndarray, items: np.ndarray,
    offsets: np.ndarray, sorted_items: np.ndarray,
) -> np.ndarray:
    """Vectorized 'is item in user's sorted history segment' test."""
    lo = offsets[users]
    hi = offsets[users + 1]
    # binary search within each [lo, hi) segment, vectorized over queries
    res = np.zeros(len(users), bool)
    left = lo.copy()
    right = hi.copy()
    while True:
        active = left < right
        if not active.any():
            break
        mid = (left + right) // 2
        vals = np.where(active, sorted_items[np.minimum(mid, len(sorted_items) - 1)], 0)
        go_right = active & (vals < items)
        found = active & (vals == items)
        res |= found
        left = np.where(go_right, mid + 1, left)
        right = np.where(active & ~go_right & ~found, mid, right)
        left = np.where(found, right, left)  # terminate found lanes
    return res


def padded_histories(
    offsets: np.ndarray, items: np.ndarray, users: np.ndarray, max_len: int
) -> np.ndarray:
    """Gather per-user histories into a dense [len(users), max_len] array
    padded with -1 (for the device-side exclusion test)."""
    out = np.full((len(users), max_len), -1, np.int32)
    for r, u in enumerate(users):
        lo, hi = offsets[u], offsets[u + 1]
        seg = items[lo:hi][:max_len]
        out[r, : len(seg)] = seg
    return out
