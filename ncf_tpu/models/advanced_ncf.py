"""AdvancedNCF — the flagship model, re-designed TPU-first.

Capability-parity with the reference ``AdvancedNCF``
(reference: src/model/architecture.py:121-485): dual MF+MLP embedding
tables with post-lookup LayerNorm, an MF path (elementwise product ->
Linear(d,1)), an MLP path (multi-head attention over the (1+negatives)
candidate slots -> concat temporal encoding -> MLP [256,128,64] ->
Linear(64,1)), and a final Linear(2,1) fusion.  Scores are returned as
*logits*; the sigmoid lives in the loss (optax BCE-with-logits) and the
serving path — numerically stabler than the reference's Sigmoid+BCELoss
(architecture.py:249-252, trainer.py:78).

Differences from the reference, by design (SURVEY.md §2.9):
- temporal encoding is actually wired into training (the reference feeds
  zeros, architecture.py:329-334);
- the category-hierarchy block feeds the item tower (the reference never
  calls it in ``forward``);
- ``score_items_with_hour`` (the ``forward_simple`` analogue,
  architecture.py:409-485) uses a *trained* temporal projection instead of
  constructing a fresh untrained Linear per call (architecture.py:437-441).

Layout notes for TPU: the model consumes ``user_ids [B]`` and
``item_ids [B, S]`` (the reference flattens users repeated (1+neg)x into a
KeyedJaggedTensor, architecture.py:274-276 — a torchrec artifact with no
TPU value).  All shapes are static; the candidate axis S is a compile-time
constant (1+negatives in training, eval candidates at eval).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ncf_tpu.models import temporal as temporal_mod
from ncf_tpu.models.layers import (
    dense,
    dense_init,
    dropout,
    embedding_init,
    layer_norm,
    layer_norm_init,
    mha,
    mha_init,
    mlp_tower,
    mlp_tower_init,
)
from ncf_tpu.ops.embedding import embedding_lookup
from ncf_tpu.utils.config import ModelConfig

Params = Dict[str, Any]


def init(key: jax.Array, cfg: ModelConfig) -> Params:
    """Build the parameter pytree (architecture.py:121-256)."""
    keys = jax.random.split(key, 12)
    combined_dim = cfg.mlp_dim + cfg.temporal_dim
    params: Params = {
        "mf_user": embedding_init(keys[0], cfg.num_users, cfg.mf_dim),
        "mf_item": embedding_init(keys[1], cfg.num_items, cfg.mf_dim),
        "mlp_user": embedding_init(keys[2], cfg.num_users, cfg.mlp_dim),
        "mlp_item": embedding_init(keys[3], cfg.num_items, cfg.mlp_dim),
        "mf_norm": layer_norm_init(cfg.mf_dim),
        "mlp_norm": layer_norm_init(cfg.mlp_dim),
        "attn": mha_init(keys[4], cfg.mlp_dim),
        "mlp": mlp_tower_init(keys[5], combined_dim, list(cfg.mlp_hidden_dims)),
        "mf_out": dense_init(keys[6], cfg.mf_dim, 1),
        "mlp_out": dense_init(keys[7], cfg.mlp_hidden_dims[-1], 1),
        "final": dense_init(keys[8], 2, 1),
        "temporal": temporal_mod.init(keys[9], cfg.temporal_dim),
        # trained analogue of the per-call Linear in forward_simple
        # (fixes architecture.py:437-441)
        "temporal_proj": dense_init(keys[10], cfg.temporal_dim, cfg.mf_dim),
    }
    if cfg.use_category:
        kd, kc, ka = jax.random.split(keys[11], 3)
        params["category"] = {
            "dept": embedding_init(kd, cfg.num_departments, cfg.mlp_dim),
            "cat": embedding_init(kc, cfg.num_categories, cfg.mlp_dim),
            "attn": mha_init(ka, cfg.mlp_dim),
            "norm": layer_norm_init(cfg.mlp_dim),
        }
    return params


def _category_hierarchy(
    p: Params,
    dept_ids: jax.Array,   # int32 [...]
    cat_ids: jax.Array,    # int32 [...]
    num_heads: int,
    dropout_rate: float,
    rng: Optional[jax.Array],
    deterministic: bool,
    dtype,
) -> jax.Array:
    """Department/category fusion: MHA(cat as query, dept as key/value) +
    dropout + residual + LayerNorm (architecture.py:96-119).  Operates
    per-element: the leading shape is flattened to a singleton attention."""
    shape = dept_ids.shape
    d = p["cat"].shape[-1]
    dept_e = embedding_lookup(p["dept"], dept_ids.reshape(-1)).reshape(-1, 1, d)
    cat_e = embedding_lookup(p["cat"], cat_ids.reshape(-1)).reshape(-1, 1, d)
    fused = mha(p["attn"], cat_e, dept_e, dept_e, num_heads,
                dropout_rate=dropout_rate, rng=rng,
                deterministic=deterministic, dtype=dtype)
    fused = dropout(rng, fused, dropout_rate, deterministic)
    out = layer_norm(p["norm"], fused + cat_e)
    return out.reshape(*shape, d)


def apply(
    params: Params,
    cfg: ModelConfig,
    user_ids: jax.Array,               # int32 [B]
    item_ids: jax.Array,               # int32 [B, S]
    temporal: Optional[Dict[str, jax.Array]] = None,  # each int32 [B]
    item_dept: Optional[jax.Array] = None,  # int32 [num_items] metadata table
    item_cat: Optional[jax.Array] = None,   # int32 [num_items]
    candidate_attention: bool = True,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Forward pass -> logits [B, S].

    ``candidate_attention=True`` reproduces the reference training quirk:
    attention mixes across the (1+neg) candidate slots of each interaction
    (architecture.py:315-323).  ``False`` scores each slot independently
    (singleton attention — the reference's eval / forward_simple semantics,
    architecture.py:275, 459-463).
    """
    B, S = item_ids.shape
    dtype = jnp.dtype(cfg.compute_dtype)
    rngs = {}
    if rng is not None:
        for i, name in enumerate(["attn", "mlp", "cat"]):
            rngs[name] = jax.random.fold_in(rng, i)

    # ---- embedding lookups (the fbgemm/TorchRec-equivalent hot path)
    user_mf = embedding_lookup(params["mf_user"], user_ids)          # [B, dmf]
    item_mf = embedding_lookup(params["mf_item"], item_ids)          # [B, S, dmf]
    user_mlp = embedding_lookup(params["mlp_user"], user_ids)        # [B, dm]
    item_mlp = embedding_lookup(params["mlp_item"], item_ids)        # [B, S, dm]

    # shared LayerNorm on both sides of each path (architecture.py:305-312)
    user_mf = layer_norm(params["mf_norm"], user_mf)
    item_mf = layer_norm(params["mf_norm"], item_mf)
    user_mlp = layer_norm(params["mlp_norm"], user_mlp)
    item_mlp = layer_norm(params["mlp_norm"], item_mlp)

    # ---- MF path: elementwise product -> Linear(d,1)  (architecture.py:304-308)
    mf_vector = user_mf[:, None, :] * item_mf                        # [B, S, dmf]
    mf_pred = dense(params["mf_out"], mf_vector.astype(dtype))       # [B, S, 1] f32

    # ---- category hierarchy into the item tower (first-class; §2.9.6 fix)
    if cfg.use_category and item_dept is not None and item_cat is not None:
        hier = _category_hierarchy(
            params["category"], item_dept[item_ids], item_cat[item_ids],
            cfg.num_heads, cfg.dropout, rngs.get("cat"), deterministic, dtype)
        item_mlp = item_mlp + hier

    # ---- attention over candidate slots (architecture.py:315-326)
    user_q = jnp.broadcast_to(user_mlp[:, None, :], item_mlp.shape)
    if candidate_attention:
        attn = mha(params["attn"], user_q, item_mlp, item_mlp, cfg.num_heads,
                   dropout_rate=cfg.dropout, rng=rngs.get("attn"),
                   deterministic=deterministic, dtype=dtype)          # [B, S, dm]
    else:
        d = item_mlp.shape[-1]
        attn = mha(params["attn"],
                   user_q.reshape(B * S, 1, d),
                   item_mlp.reshape(B * S, 1, d),
                   item_mlp.reshape(B * S, 1, d),
                   cfg.num_heads, dropout_rate=cfg.dropout,
                   rng=rngs.get("attn"), deterministic=deterministic,
                   dtype=dtype).reshape(B, S, d)

    # ---- temporal features (real, trained — fixes architecture.py:329-334)
    if cfg.use_temporal and temporal is not None:
        t_vec = temporal_mod.apply(
            params["temporal"], temporal["hour"], temporal["day"],
            temporal["month"], temporal["day_of_year"])              # [B, dt]
    else:
        t_vec = jnp.zeros((B, cfg.temporal_dim), jnp.float32)
    t_vec = jnp.broadcast_to(t_vec[:, None, :], (B, S, cfg.temporal_dim))

    combined = jnp.concatenate(
        [attn.astype(dtype), t_vec.astype(dtype)], axis=-1)          # [B, S, dm+dt]

    # ---- MLP tower -> Linear(h[-1],1)  (architecture.py:343-345)
    mlp_vec = mlp_tower(params["mlp"], combined, cfg.dropout,
                        rngs.get("mlp"), deterministic, dtype)
    mlp_pred = dense(params["mlp_out"], mlp_vec)                     # [B, S, 1]

    # ---- fusion: Linear(2,1)  (architecture.py:352-354; sigmoid deferred)
    both = jnp.concatenate(
        [mf_pred.astype(jnp.float32), mlp_pred.astype(jnp.float32)], axis=-1)
    logits = dense(params["final"], both)                            # [B, S, 1]
    return logits[..., 0]


def score_candidates(
    params: Params,
    cfg: ModelConfig,
    user_ids: jax.Array,      # [B]
    cand_items: jax.Array,    # [B, C]
    temporal: Optional[Dict[str, jax.Array]] = None,
    item_dept: Optional[jax.Array] = None,
    item_cat: Optional[jax.Array] = None,
) -> jax.Array:
    """Eval/serving scoring: each candidate scored independently
    (reference eval semantics: samples_per_interaction=1,
    architecture.py:275).  Returns logits [B, C]."""
    return apply(params, cfg, user_ids, cand_items, temporal,
                 item_dept, item_cat,
                 candidate_attention=False, deterministic=True)


def score_items_with_hour(
    params: Params,
    cfg: ModelConfig,
    user_ids: jax.Array,      # [B]
    item_ids: jax.Array,      # [B]
    hour: Optional[jax.Array] = None,  # int32 [B]
) -> jax.Array:
    """``forward_simple`` analogue (architecture.py:409-485): hour-of-day
    modulates product embeddings multiplicatively by
    ``(1 + 0.3 * proj(hour_emb))`` and feeds the MLP concat.  Returns
    *probabilities* [B] (the demo consumes sigmoid scores,
    demo/app.py:65-75)."""
    dtype = jnp.dtype(cfg.compute_dtype)
    B = user_ids.shape[0]

    user_mf = layer_norm(params["mf_norm"], embedding_lookup(params["mf_user"], user_ids))
    item_mf = layer_norm(params["mf_norm"], embedding_lookup(params["mf_item"], item_ids))
    user_mlp = layer_norm(params["mlp_norm"], embedding_lookup(params["mlp_user"], user_ids))
    item_mlp = layer_norm(params["mlp_norm"], embedding_lookup(params["mlp_item"], item_ids))

    if hour is not None:
        hour_e = embedding_lookup(params["temporal"]["hour"], hour)  # [B, dt]
        mod = 1.0 + 0.3 * dense(params["temporal_proj"], hour_e)     # [B, dmf]
        item_mf = item_mf * mod
        item_mlp = item_mlp * mod  # dims match when mlp_dim == mf_dim (default)

    mf_pred = dense(params["mf_out"], (user_mf * item_mf).astype(dtype))

    attn = mha(params["attn"], user_mlp[:, None, :], item_mlp[:, None, :],
               item_mlp[:, None, :], cfg.num_heads, dtype=dtype)[:, 0, :]

    if hour is not None:
        t_vec = embedding_lookup(params["temporal"]["hour"], hour)
    else:
        t_vec = jnp.zeros((B, cfg.temporal_dim), jnp.float32)
    combined = jnp.concatenate([attn.astype(dtype), t_vec.astype(dtype)], axis=-1)
    mlp_vec = mlp_tower(params["mlp"], combined, dtype=dtype)
    mlp_pred = dense(params["mlp_out"], mlp_vec)

    both = jnp.concatenate(
        [mf_pred.astype(jnp.float32), mlp_pred.astype(jnp.float32)], axis=-1)
    return jax.nn.sigmoid(dense(params["final"], both)[..., 0])


def get_user_embeddings(params: Params, user_ids: jax.Array) -> Dict[str, jax.Array]:
    """Normalized user embedding export for ANN serving
    (architecture.py:383-391)."""
    return {
        "mf": layer_norm(params["mf_norm"],
                         embedding_lookup(params["mf_user"], user_ids)),
        "mlp": layer_norm(params["mlp_norm"],
                          embedding_lookup(params["mlp_user"], user_ids)),
    }


def get_product_embeddings(
    params: Params,
    cfg: ModelConfig,
    item_ids: jax.Array,
    item_dept: Optional[jax.Array] = None,
    item_cat: Optional[jax.Array] = None,
) -> Dict[str, jax.Array]:
    """Normalized item embedding export, with the category-hierarchy vector
    (architecture.py:393-407)."""
    out = {
        "mf": layer_norm(params["mf_norm"],
                         embedding_lookup(params["mf_item"], item_ids)),
        "mlp": layer_norm(params["mlp_norm"],
                          embedding_lookup(params["mlp_item"], item_ids)),
    }
    if cfg.use_category and "category" in params and item_dept is not None:
        out["category"] = _category_hierarchy(
            params["category"], item_dept[item_ids], item_cat[item_ids],
            cfg.num_heads, 0.0, None, True, jnp.dtype(cfg.compute_dtype))
    return out
