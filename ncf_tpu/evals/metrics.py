"""Vectorized ranking metrics: HR@k, NDCG@k, MRR@k, MAP@k, AUC, accuracy.

Functional parity with the reference metrics library
(reference: src/utils/metrics.py:9-275) — same definitions, but fully
vectorized jnp over ``[batch, candidates]`` score matrices instead of
per-row Python loops, so evaluation runs on device in one fused pass.

Two entry points:
- ``rank_metrics``:   the leave-one-out protocol (positive at column 0 vs
  sampled negatives — the *intended* protocol the reference got wrong,
  SURVEY.md §2.9.9);
- ``calculate_metrics``: general multi-positive targets matrix, mirroring
  ``calculate_metrics``'s per-k dict output (metrics.py:9-108).

All functions take *logits or probabilities* interchangeably for the
ranking metrics (rank-invariant); accuracy/AUC thresholds assume logits
(threshold 0) to match the rest of the framework's logit convention.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp


# ----------------------------------------------------- leave-one-out (fast)

def positive_ranks(scores: jax.Array) -> jax.Array:
    """Rank (0-based) of column-0's score within each row.

    Ties are broken pessimistically against the positive (a negative with
    an equal score outranks it) so an untrained constant-output model
    scores HR@k ~ k/C rather than 1.0.
    """
    pos = scores[:, :1]
    greater = (scores[:, 1:] > pos).sum(axis=1)
    equal = (scores[:, 1:] >= pos).sum(axis=1)
    # place the positive after all >=-scoring negatives: pessimistic ties
    return jnp.maximum(greater, equal).astype(jnp.int32)


def rank_metrics(
    scores: jax.Array, ks: Sequence[int] = (1, 5, 10)
) -> Dict[str, jax.Array]:
    """Leave-one-out metrics from ``[B, 1+num_negatives]`` scores with the
    positive in column 0.  With a single positive, AP@k == RR@k, so
    ``map@k`` equals ``mrr@k`` by definition (metrics.py:207-244 reduces to
    this for one relevant item)."""
    ranks = positive_ranks(scores)                    # [B]
    out: Dict[str, jax.Array] = {}
    for k in ks:
        hit = (ranks < k)
        out[f"hr@{k}"] = hit.mean()
        out[f"ndcg@{k}"] = jnp.where(
            hit, 1.0 / jnp.log2(ranks.astype(jnp.float32) + 2.0), 0.0).mean()
        rr = jnp.where(hit, 1.0 / (ranks.astype(jnp.float32) + 1.0), 0.0)
        out[f"mrr@{k}"] = rr.mean()
        out[f"map@{k}"] = rr.mean()
    out["mean_rank"] = ranks.astype(jnp.float32).mean()
    return out


# --------------------------------------------------- general multi-positive

def _topk_relevance(scores: jax.Array, targets: jax.Array, k: int) -> jax.Array:
    """Relevance (0/1) of the top-k scored items per row: [B, k]."""
    _, idx = jax.lax.top_k(scores, k)
    return jnp.take_along_axis(targets, idx, axis=1)


def hit_rate_at_k(scores: jax.Array, targets: jax.Array, k: int) -> jax.Array:
    """Any positive in the top-k (metrics.py:110-136)."""
    rel = _topk_relevance(scores, targets, k)
    return (rel.sum(axis=1) > 0).astype(jnp.float32).mean()


def ndcg_at_k(scores: jax.Array, targets: jax.Array, k: int) -> jax.Array:
    """Binary-relevance DCG / ideal DCG (metrics.py:138-177)."""
    rel = _topk_relevance(scores, targets, k).astype(jnp.float32)
    discounts = 1.0 / jnp.log2(jnp.arange(k, dtype=jnp.float32) + 2.0)
    dcg = (rel * discounts).sum(axis=1)
    ideal_rel = -jnp.sort(-targets.astype(jnp.float32), axis=1)[:, :k]
    idcg = (ideal_rel * discounts).sum(axis=1)
    return jnp.where(idcg > 0, dcg / jnp.maximum(idcg, 1e-12), 0.0).mean()


def mrr_at_k(scores: jax.Array, targets: jax.Array, k: int) -> jax.Array:
    """1 / rank of the first positive within top-k (metrics.py:179-205)."""
    rel = _topk_relevance(scores, targets, k)
    pos_ranks = jnp.arange(1, k + 1, dtype=jnp.float32)
    first = jnp.argmax(rel, axis=1)
    any_hit = rel.sum(axis=1) > 0
    return jnp.where(any_hit, 1.0 / pos_ranks[first], 0.0).mean()


def map_at_k(scores: jax.Array, targets: jax.Array, k: int) -> jax.Array:
    """Mean average precision within top-k (metrics.py:207-244)."""
    rel = _topk_relevance(scores, targets, k).astype(jnp.float32)
    cum = jnp.cumsum(rel, axis=1)
    prec = cum / jnp.arange(1, k + 1, dtype=jnp.float32)
    num_rel = rel.sum(axis=1)
    ap = jnp.where(num_rel > 0,
                   (prec * rel).sum(axis=1) / jnp.maximum(num_rel, 1.0), 0.0)
    return ap.mean()


def auc(scores: jax.Array, targets: jax.Array) -> jax.Array:
    """Pairwise AUC over the flattened batch (the manual fallback of
    metrics.py:246-265), computed O(n log n) via the rank-sum identity."""
    s = scores.reshape(-1)
    t = targets.reshape(-1).astype(jnp.float32)
    order = jnp.argsort(s)
    ranks = jnp.empty_like(s).at[order].set(
        jnp.arange(1, s.shape[0] + 1, dtype=s.dtype))
    n_pos = t.sum()
    n_neg = t.shape[0] - n_pos
    rank_sum = (ranks * t).sum()
    return jnp.where(
        (n_pos > 0) & (n_neg > 0),
        (rank_sum - n_pos * (n_pos + 1) / 2) / jnp.maximum(n_pos * n_neg, 1.0),
        0.5,
    )


def accuracy_stats(logits: jax.Array, targets: jax.Array) -> Dict[str, jax.Array]:
    """Threshold accuracy + per-class accuracy (metrics.py:267-275 and the
    pos/neg accuracies the trainer displays, trainer.py:304-312).
    ``logits`` threshold at 0 == probability threshold at 0.5."""
    pred = (logits > 0).astype(jnp.float32)
    t = targets.astype(jnp.float32)
    correct = (pred == t).astype(jnp.float32)
    pos_mask, neg_mask = t, 1.0 - t
    return {
        "accuracy": correct.mean(),
        "pos_accuracy": (correct * pos_mask).sum() / jnp.maximum(pos_mask.sum(), 1.0),
        "neg_accuracy": (correct * neg_mask).sum() / jnp.maximum(neg_mask.sum(), 1.0),
    }


def calculate_metrics(
    scores: jax.Array,
    targets: jax.Array,
    ks: Sequence[int] = (1, 5, 10),
) -> Dict[str, jax.Array]:
    """General metrics dict over ``[B, C]`` scores and 0/1 targets —
    the ``calculate_metrics`` surface (metrics.py:9-108)."""
    out: Dict[str, jax.Array] = {}
    C = scores.shape[1]
    for k in ks:
        kk = min(k, C)
        out[f"hit_rate@{k}"] = hit_rate_at_k(scores, targets, kk)
        out[f"ndcg@{k}"] = ndcg_at_k(scores, targets, kk)
        out[f"mrr@{k}"] = mrr_at_k(scores, targets, kk)
        out[f"map@{k}"] = map_at_k(scores, targets, kk)
    out["auc"] = auc(scores, targets)
    out.update(accuracy_stats(scores, targets))
    return out
