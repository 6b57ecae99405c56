"""Model-intelligence introspection: attention heads, confidence,
component importance.

Capability-parity with the reference's "Model Intelligence Dashboard"
(reference: src/inference/demo/app.py:79-248): normalized score charts,
per-head attention-importance (recompute Q.K^T softmax and take the
std-dev over the pattern, app.py:140-205), prediction-confidence
histograms, and MF-vs-MLP component importance from the fusion layer's
weights (app.py:224-248).  Library functions here; the terminal demo in
cli_demo uses them in place of the Streamlit UI.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ncf_tpu.models.layers import dense, layer_norm
from ncf_tpu.ops.embedding import embedding_lookup
from ncf_tpu.utils.config import ModelConfig


def attention_head_importance(
    params,
    cfg: ModelConfig,
    user_ids: jax.Array,     # [B]
    item_ids: jax.Array,     # [B, S] candidate set per user
) -> np.ndarray:
    """Per-head importance [num_heads]: std of each head's attention
    pattern over the candidate axis, averaged over the batch — a flat
    (uninformative) head scores ~0 (app.py:140-205 computation)."""
    H = cfg.num_heads
    D = cfg.mlp_dim
    hd = D // H
    dmf = cfg.mf_dim
    user_mlp = layer_norm(
        params["mlp_norm"],
        embedding_lookup(params["user_emb"], user_ids)[:, dmf:])
    item_mlp = layer_norm(
        params["mlp_norm"],
        embedding_lookup(params["item_emb"], item_ids)[..., dmf:])
    p = params["attn"]
    q = dense(p["q"], user_mlp)                     # [B, D]
    k = dense(p["k"], item_mlp)                     # [B, S, D]
    B, S, _ = k.shape
    scores = (q[:, None, :] * k).reshape(B, S, H, hd).sum(-1) / math.sqrt(hd)
    weights = jax.nn.softmax(scores, axis=1)        # [B, S, H]
    # head importance = mean over batch of std over candidate axis
    return np.asarray(jnp.std(weights, axis=1).mean(axis=0))


def history_attention_weights(
    params,
    cfg: ModelConfig,
    user_ids: jax.Array,     # [B]
    history: jax.Array,      # [B, H] recent item ids, padded -1
) -> np.ndarray:
    """Head-averaged attention weights [B, H] the sequence path places
    on each of the user's recent items — grounding for "because you
    bought X" explanations (the reference's explanation strings,
    features.py:161-308, are templated; these come from the trained
    model).  Padded slots get exactly 0.  Requires
    ``cfg.use_sequence``."""
    if "sequence_attn" not in params:
        raise ValueError("model has no sequence_attn (use_sequence off)")
    NH = cfg.num_heads
    D = cfg.mlp_dim
    hd = D // NH
    dmf = cfg.mf_dim
    mask = history >= 0
    hsafe = jnp.maximum(history, 0)
    user_mlp = layer_norm(
        params["mlp_norm"],
        embedding_lookup(params["user_emb"], user_ids)[:, dmf:])
    seq_emb = layer_norm(
        params["mlp_norm"],
        embedding_lookup(params["item_emb"], hsafe)[..., dmf:])
    p = params["sequence_attn"]
    q = dense(p["q"], user_mlp)                     # [B, D]
    k = dense(p["k"], seq_emb)                      # [B, H, D]
    B, H, _ = k.shape
    scores = (q[:, None, :] * k).reshape(B, H, NH, hd).sum(-1) / math.sqrt(hd)
    scores = jnp.where(mask[:, :, None], scores, -1e9)
    weights = jax.nn.softmax(scores, axis=1)        # [B, H, NH]
    weights = jnp.where(mask[:, :, None], weights, 0.0)
    return np.asarray(weights.mean(axis=-1))        # head-averaged


def confidence_histogram(scores: np.ndarray, bins: int = 10) -> Dict:
    """Prediction-confidence histogram over sigmoid scores
    (app.py confidence panel)."""
    scores = np.asarray(scores).reshape(-1)
    hist, edges = np.histogram(scores, bins=bins, range=(0.0, 1.0))
    return {
        "counts": hist.tolist(),
        "edges": [round(float(e), 3) for e in edges],
        "mean": float(scores.mean()) if len(scores) else 0.0,
        "std": float(scores.std()) if len(scores) else 0.0,
    }


def component_importance(params) -> Dict[str, float]:
    """|weight| share of the MF vs MLP paths in the fusion layer
    (app.py:224-248: importance from the `final` Linear(2,1) weights)."""
    w = np.abs(np.asarray(params["final"]["w"][:, 0]))
    total = max(w.sum(), 1e-12)
    return {"mf": float(w[0] / total), "mlp": float(w[1] / total)}


def normalized_scores(scores: np.ndarray) -> np.ndarray:
    """Min-max normalized score chart data (app.py normalized chart)."""
    s = np.asarray(scores, np.float64)
    lo, hi = s.min(), s.max()
    if hi - lo < 1e-12:
        return np.full_like(s, 0.5)
    return (s - lo) / (hi - lo)


def intelligence_report(
    params,
    cfg: ModelConfig,
    user_id: int,
    scores: np.ndarray,          # [k] top-k sigmoid scores
    item_ids: np.ndarray,        # [k]
    sample_users: Optional[np.ndarray] = None,
    history: Optional[np.ndarray] = None,   # [H] this user's recent items
) -> Dict:
    """The full dashboard payload for one recommendation set."""
    users = (np.asarray(sample_users)
             if sample_users is not None else np.asarray([user_id]))
    cand = np.tile(np.asarray(item_ids)[None, :], (len(users), 1))
    heads = attention_head_importance(
        params, cfg, jnp.asarray(users, jnp.int32),
        jnp.asarray(cand, jnp.int32))
    out = {
        "user_id": int(user_id),
        "normalized_scores": [round(float(v), 4)
                              for v in normalized_scores(scores)],
        "attention_head_importance": [round(float(h), 5) for h in heads],
        "confidence": confidence_histogram(scores),
        "component_importance": component_importance(params),
    }
    if (history is not None and getattr(cfg, "use_sequence", False)
            and "sequence_attn" in params):
        h = np.asarray(history, np.int32).reshape(1, -1)
        w = history_attention_weights(
            params, cfg, jnp.asarray([user_id], jnp.int32),
            jnp.asarray(h))[0]
        out["history_attention"] = [
            {"item_id": int(i), "weight": round(float(wt), 5)}
            for i, wt in zip(h[0], w) if i >= 0]
    return out
