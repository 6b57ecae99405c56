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

TPU-first algebraic optimizations (verified exact-equivalent in
tests/test_models.py::TestAttentionEquivalence):

1. **Single-query candidate attention.**  The reference builds its
   attention query by repeating the user embedding across all S candidate
   slots (architecture.py:315-323), so every query position is identical
   and the attention output is the same vector for every slot.  We
   therefore compute it once with Sq=1 — no [B, H, S, S] score tensor, no
   head transposes, and the MLP tower runs on [B, d+dt] instead of
   [B*S, d+dt] (its output is broadcast back over S, exactly as the
   reference's identical-per-slot outputs are).

2. **Singleton attention is a linear map.**  Softmax over a single key is
   constant 1, so MHA(q, x, x) with one key reduces to Wo(Wv x + bv) + bo.
   The eval-mode per-candidate attention (architecture.py:275) and the
   category-hierarchy fusion (architecture.py:111-119) are computed in
   that closed form.  (The q/k projections of those blocks are retained in
   the param tree for structural parity but are mathematically inert —
   exactly as they are in the reference.)

3. **Vocabulary-level precompute.**  Post-lookup LayerNorm and the
   category-hierarchy vector are pure per-id functions; when the
   vocabulary is smaller than the batch x slots workload they are computed
   once over the [num_items, d] / [num_users, d] tables and row-gathered,
   instead of recomputed per occurrence.  (Training dropout on the
   hierarchy vector is then shared across same-id occurrences within a
   step — same expectation, fewer random bits.)

Differences from the reference, by design (SURVEY.md §2.9):
- temporal encoding is actually wired into training (the reference feeds
  zeros, architecture.py:329-334);
- the category-hierarchy block feeds the item tower (the reference never
  calls it in ``forward``);
- ``score_items_with_hour`` (the ``forward_simple`` analogue,
  architecture.py:409-485) uses a *trained* temporal projection instead of
  constructing a fresh untrained Linear per call (architecture.py:437-441).

Layout notes: the model consumes ``user_ids [B]`` and ``item_ids [B, S]``
(the reference flattens users repeated (1+neg)x into a KeyedJaggedTensor,
architecture.py:274-276 — a torchrec artifact with no TPU value).  All
shapes are static; S is a compile-time constant.
"""

from __future__ import annotations

import math
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
    mha_init,
    mlp_tower,
    mlp_tower_init,
)
from ncf_tpu.ops.embedding import embedding_lookup
from ncf_tpu.utils.config import ModelConfig

Params = Dict[str, Any]


def init(key: jax.Array, cfg: ModelConfig) -> Params:
    """Build the parameter pytree (architecture.py:121-256)."""
    keys = jax.random.split(key, 13)
    combined_dim = cfg.mlp_dim + cfg.temporal_dim
    if cfg.use_sequence:
        combined_dim += cfg.mlp_dim
    # MF and MLP tables are stored FUSED along the feature axis
    # ([*, mf_dim + mlp_dim], 128 lanes at the default dims): one gather
    # and one scatter-add serve both paths, and rows are lane-aligned.
    params: Params = {
        "user_emb": embedding_init(keys[0], cfg.num_users,
                                   cfg.mf_dim + cfg.mlp_dim),
        "item_emb": embedding_init(keys[1], cfg.num_items,
                                   cfg.mf_dim + cfg.mlp_dim),
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
    if cfg.use_sequence:
        # the reference's sequence_attention block, actually wired
        # (architecture.py:210-214 instantiates it and never calls it)
        params["sequence_attn"] = mha_init(keys[12], cfg.mlp_dim)
    if cfg.use_category:
        kd, kc, ka = jax.random.split(keys[11], 3)
        params["category"] = {
            "dept": embedding_init(kd, cfg.num_departments, cfg.mlp_dim),
            "cat": embedding_init(kc, cfg.num_categories, cfg.mlp_dim),
            "attn": mha_init(ka, cfg.mlp_dim),
            "norm": layer_norm_init(cfg.mlp_dim),
        }
    return params


# -------------------------------------------------------------- internals

def _singleton_attention(p: Params, x: jax.Array, dtype) -> jax.Array:
    """MHA(q, x, x) with a single key == Wo(Wv x + bv) + bo (softmax over
    one key is 1; q/k are inert).  Closed form of architecture.py:459-463
    eval attention and :111-119 hierarchy fusion."""
    return dense(p["o"], dense(p["v"], x, dtype), dtype)


def _single_query_attention(
    p: Params,
    user_mlp: jax.Array,   # [B, D]
    item_mlp: jax.Array,   # [B, S, D]
    num_heads: int,
    dropout_rate: float,
    rng: Optional[jax.Array],
    deterministic: bool,
    dtype,
    key_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Candidate-slot attention with the reference's repeated-user query,
    computed once (Sq=1): softmax_j(q.k_j/sqrt(hd)) pooled over candidate
    values, per head.  Returns [B, D] — identical for every slot, exactly
    as architecture.py:315-326 produces."""
    q = dense(p["q"], user_mlp, dtype)                       # [B, D]
    k = dense(p["k"], item_mlp, dtype)                       # [B, S, D]
    v = dense(p["v"], item_mlp, dtype)                       # [B, S, D]
    return _sqa_core(p, q, k, v, num_heads, dropout_rate, rng,
                     deterministic, dtype, key_mask)


def _sqa_core(
    p: Params,
    q: jax.Array,          # [B, D] projected query
    k: jax.Array,          # [B, S, D] projected keys
    v: jax.Array,          # [B, S, D] projected values
    num_heads: int,
    dropout_rate: float,
    rng: Optional[jax.Array],
    deterministic: bool,
    dtype,
    key_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Post-projection half of ``_single_query_attention`` — split out so
    the sequence path can gather PRE-PROJECTED K/V rows from per-table
    projections (K/V are pointwise in the key row, so projecting the
    vocabulary table once and gathering beats projecting every one of
    the B*H history occurrences; see the sequence branch of ``apply``)."""
    B, S, D = k.shape
    H = num_heads
    hd = D // H
    # per-head scores without transposes: [B, S, H]
    scores = (q[:, None, :] * k).reshape(B, S, H, hd).sum(-1) / math.sqrt(hd)
    scores = scores.astype(jnp.float32)
    if key_mask is not None:                                 # [B, S] bool
        # large-finite mask, NOT -inf: an all-masked row would make the
        # softmax NaN in the forward, and even a forward-side where()
        # cannot stop NaN cotangents flowing back through exp (the
        # classic double-where pitfall) — one single-interaction user
        # would poison every shared parameter with NaN gradients
        scores = jnp.where(key_mask[:, :, None], scores, -1e9)
    weights = jax.nn.softmax(scores, axis=1)                 # over S
    if key_mask is not None:
        # fully-masked rows get uniform weights from the finite mask;
        # zero them so padding never contributes
        weights = jnp.where(key_mask[:, :, None], weights, 0.0)
    weights = dropout(rng, weights, dropout_rate, deterministic)
    pooled = (weights.astype(v.dtype)[..., None]
              * v.reshape(B, S, H, hd)).sum(axis=1)          # [B, H, hd]
    out = dense(p["o"], pooled.reshape(B, D), dtype)
    if key_mask is not None:
        # rows with no valid key contribute nothing (otherwise the out
        # projection's bias would leak through an empty attention)
        out = jnp.where(key_mask.any(axis=1)[:, None], out, 0.0)
    return out


def _hierarchy_table(
    p: Params,
    item_dept: jax.Array,   # int32 [num_items]
    item_cat: jax.Array,    # int32 [num_items]
    dropout_rate: float,
    rng: Optional[jax.Array],
    deterministic: bool,
    dtype,
) -> jax.Array:
    """Per-item category-hierarchy vectors [num_items, D]:
    LN(dropout(Wo Wv dept_e) + cat_e) — the closed form of the reference
    CategoryHierarchy (architecture.py:111-119; its attention is singleton,
    see _singleton_attention).  A pure function of item id, so computed
    once over the vocabulary."""
    dept_e = embedding_lookup(p["dept"], item_dept)          # [I, D]
    cat_e = embedding_lookup(p["cat"], item_cat)             # [I, D]
    fused = _singleton_attention(p["attn"], dept_e.astype(dtype), dtype)
    fused = dropout(rng, fused, dropout_rate, deterministic)
    return layer_norm(p["norm"], fused.astype(jnp.float32) + cat_e)


def _use_vocab_precompute(cfg: ModelConfig, batch_rows: int) -> bool:
    """Static heuristic: precompute per-vocabulary tables when the
    vocabulary is smaller than the per-batch occurrence workload."""
    return cfg.num_items + cfg.num_users <= 4 * batch_rows


def _tower(layers, x, cfg: ModelConfig, rng, deterministic: bool, dtype):
    """MLP tower call with the round-4 roofline knobs:

    ``cfg.fused_tower`` ("auto"/"on") routes through the single fused
    Pallas kernel per direction (ops/pallas_tower.py — activations stay
    in VMEM, recompute backward); ``cfg.remat_tower`` wraps the XLA
    layers in jax.checkpoint (measured and rejected, BENCH_NOTES
    round 4).  Default: plain XLA layers."""
    mode = getattr(cfg, "fused_tower", "off")
    if mode in ("auto", "on", "interpret"):
        from ncf_tpu.ops.pallas_tower import fused_tower, tower_fits

        fits = tower_fits(layers, x.shape[-1])
        # auto: TPU backend, bf16 activations (the kernel's matmul
        # dtype — f32 compute_dtype keeps the XLA stack), shape fits.
        # Under a mesh the Trainer sets ``cfg._tower_mesh`` and the
        # kernel runs inside shard_map over the batch axes (a bare
        # pallas_call does not partition under pjit).
        auto_ok = (fits and jax.default_backend() == "tpu"
                   and x.dtype == jnp.bfloat16)
        if mode in ("on", "interpret") or auto_ok:
            if not fits:
                raise ValueError(
                    f"fused_tower=on but tower shape does not fit "
                    f"(in_dim={x.shape[-1]})")
            # "interpret": CI-only — run the kernel in Pallas interpret
            # mode so the CPU-mesh tests cover the full composed path
            return fused_tower(layers, x, cfg.dropout, rng, deterministic,
                               interpret=(mode == "interpret"),
                               mesh=getattr(cfg, "_tower_mesh", None))
    if getattr(cfg, "remat_tower", False) and not deterministic:
        fn = jax.checkpoint(
            lambda p, xx, r: mlp_tower(p, xx, cfg.dropout, r,
                                       deterministic, dtype))
        return fn(layers, x, rng)
    return mlp_tower(layers, x, cfg.dropout, rng, deterministic, dtype)


# ---------------------------------------------------------------- forward

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
    history: Optional[jax.Array] = None,    # int32 [B, H] padded with -1
    user_rows: Optional[jax.Array] = None,  # [B, 2d] pre-gathered user rows
    item_rows: Optional[jax.Array] = None,  # [B, S, 2d] pre-gathered items
    history_rows: Optional[jax.Array] = None,  # [B, H, 2d] pre-gathered
) -> jax.Array:
    """Forward pass -> logits [B, S].

    ``history``: when ``cfg.use_sequence``, the user's recent item ids
    (padded with -1); attended by the user query through the
    sequence_attention block and concatenated into the MLP input.

    ``user_rows``/``item_rows``: pre-gathered fused-table rows.  The
    sparse-table-update training path (train/sparse.py — the fbgemm
    fused-sparse-optimizer equivalent) gathers rows OUTSIDE the loss and
    injects them here so gradients flow to the [B(,S), 2d] rows, never
    materializing a dense [V, 2d] table gradient.  Only meaningful in
    the big-vocab (precompute-OFF) regime.

    ``candidate_attention=True`` reproduces the reference training quirk:
    attention pools over the (1+neg) candidate slots of each interaction
    with the user as (repeated) query (architecture.py:315-323), making
    every candidate's score depend on its co-candidates.  ``False`` scores
    each slot independently (singleton attention — the reference's eval /
    forward_simple semantics, architecture.py:275, 459-463).
    """
    B, S = item_ids.shape
    dtype = jnp.dtype(cfg.compute_dtype)
    rngs: Dict[str, jax.Array] = {}
    if rng is not None:
        for i, name in enumerate(["attn", "mlp", "cat", "seq"]):
            rngs[name] = jax.random.fold_in(rng, i)

    use_cat = cfg.use_category and item_dept is not None and item_cat is not None
    vocab = _use_vocab_precompute(cfg, B * S)

    # ---- embedding lookups + LayerNorm (the fbgemm/TorchRec-equivalent
    # hot path; shared norms per architecture.py:305-312).  When the
    # vocabulary is small, normalize the whole table once and gather
    # normalized rows; otherwise gather then normalize per occurrence.
    dmf = cfg.mf_dim
    if (user_rows is not None or item_rows is not None
            or history_rows is not None):
        # row injection is the big-vocab training path; the precompute
        # branch would silently ignore it
        assert not vocab, (
            "user_rows/item_rows/history_rows require the precompute-OFF "
            "regime (num_items + num_users > 4*B*S)")
    if vocab:
        # normalize both halves of the fused tables once over the
        # vocabulary, fold in the hierarchy, then ONE gather per entity
        user_t = jnp.concatenate([
            layer_norm(params["mf_norm"], params["user_emb"][:, :dmf]),
            layer_norm(params["mlp_norm"], params["user_emb"][:, dmf:]),
        ], axis=-1)
        item_mlp_t = layer_norm(params["mlp_norm"], params["item_emb"][:, dmf:])
        if use_cat:
            item_mlp_t = item_mlp_t + _hierarchy_table(
                params["category"], item_dept, item_cat,
                cfg.dropout, rngs.get("cat"), deterministic, dtype)
        item_t = jnp.concatenate([
            layer_norm(params["mf_norm"], params["item_emb"][:, :dmf]),
            item_mlp_t,
        ], axis=-1)
        # gather in compute dtype: the LN'd tables are tiny, the gathered
        # activations are the biggest tensors in the step — bf16 halves
        # their HBM traffic (and the table grads are bf16-rounded anyway
        # under the validated fast scatter path)
        user_t = user_t.astype(dtype)
        item_t = item_t.astype(dtype)
        user_full = embedding_lookup(user_t, user_ids)       # [B, 2d]
        item_full = embedding_lookup(item_t, item_ids)       # [B, S, 2d]
        user_mf, user_mlp = user_full[:, :dmf], user_full[:, dmf:]
        item_mf, item_mlp = item_full[..., :dmf], item_full[..., dmf:]
    else:
        user_full = (user_rows if user_rows is not None
                     else embedding_lookup(params["user_emb"], user_ids))
        item_full = (item_rows if item_rows is not None
                     else embedding_lookup(params["item_emb"], item_ids))
        user_mf = layer_norm(params["mf_norm"], user_full[:, :dmf])
        user_mlp = layer_norm(params["mlp_norm"], user_full[:, dmf:])
        item_mf = layer_norm(params["mf_norm"], item_full[..., :dmf])
        item_mlp = layer_norm(params["mlp_norm"], item_full[..., dmf:])
        if use_cat:
            hier = _hierarchy_table(
                params["category"], item_dept[item_ids].reshape(-1),
                item_cat[item_ids].reshape(-1),
                cfg.dropout, rngs.get("cat"), deterministic, dtype)
            item_mlp = item_mlp + hier.reshape(B, S, -1)

    # ---- sequence path (reference's sequence_attention, actually wired)
    seq_vec = None
    if cfg.use_sequence:
        if history is not None:
            hmask = history >= 0
            hsafe = jnp.maximum(history, 0)
            if vocab:
                # K/V are pointwise per key row: project the (LN'd +
                # hierarchy) item table ONCE [V, dm] per matrix and
                # gather projected rows, instead of projecting all B*H
                # gathered occurrences — drops the 2*B*H*dm^2 projection
                # FLOPs (which exceed the whole rest of the step at
                # H=50) for a 2*V*dm^2 table pass.  K and V concat into
                # ONE [V, 2dm] table so the occurrence gather issues a
                # single row per (example, history slot): TPU gathers
                # are row-issue-rate bound (~30 ns/row measured at 62k
                # items — see BENCH_NOTES round 4), so one 2dm-wide
                # gather strictly beats two dm-wide ones.
                sa = params["sequence_attn"]
                item_seq_t = item_t[:, dmf:]
                kv_t = jnp.concatenate([
                    dense(sa["k"], item_seq_t, dtype),
                    dense(sa["v"], item_seq_t, dtype)],
                    axis=-1).astype(dtype)                   # [V, 2dm]
                kv = embedding_lookup(kv_t, hsafe)           # [B, H, 2dm]
                seq_k = kv[..., :cfg.mlp_dim]
                seq_v = kv[..., cfg.mlp_dim:]
                seq_q = dense(sa["q"], user_mlp, dtype)
                seq_vec = _sqa_core(
                    sa, seq_q, seq_k, seq_v, cfg.num_heads, cfg.dropout,
                    rngs.get("seq"), deterministic, dtype, key_mask=hmask)
            else:
                # big-vocab: per-occurrence rows, either injected by the
                # sparse-update path (grads flow to the [B, H, 2d] rows)
                # or gathered here
                seq_src = (history_rows if history_rows is not None
                           else embedding_lookup(params["item_emb"], hsafe))
                seq_emb = layer_norm(params["mlp_norm"], seq_src[..., dmf:])
                if use_cat:
                    # keep history embeddings consistent with the item
                    # tower across vocab/non-vocab paths (both include
                    # the hierarchy vector)
                    seq_hier = _hierarchy_table(
                        params["category"],
                        item_dept[hsafe].reshape(-1),
                        item_cat[hsafe].reshape(-1),
                        cfg.dropout, rngs.get("cat"), deterministic, dtype)
                    seq_emb = seq_emb + seq_hier.reshape(seq_emb.shape)
                seq_vec = _single_query_attention(
                    params["sequence_attn"], user_mlp, seq_emb,
                    cfg.num_heads, cfg.dropout, rngs.get("seq"),
                    deterministic, dtype, key_mask=hmask)    # [B, dm]
        else:
            seq_vec = jnp.zeros((B, cfg.mlp_dim), jnp.float32)

    # ---- MF path: elementwise product -> Linear(d,1)  (architecture.py:304-308)
    mf_vector = user_mf[:, None, :] * item_mf                # [B, S, dmf]
    mf_pred = dense(params["mf_out"], mf_vector.astype(dtype))  # [B, S, 1] f32

    # ---- temporal features (real, trained — fixes architecture.py:329-334)
    if cfg.use_temporal and temporal is not None:
        t_vec = temporal_mod.apply(
            params["temporal"], temporal["hour"], temporal["day"],
            temporal["month"], temporal["day_of_year"])      # [B, dt]
    else:
        t_vec = jnp.zeros((B, cfg.temporal_dim), jnp.float32)

    # ---- MLP path (attention -> concat temporal -> tower -> Linear(h,1))
    if candidate_attention:
        # one attention + one tower pass per interaction; output identical
        # across slots (see module docstring, point 1)
        attn = _single_query_attention(
            params["attn"], user_mlp, item_mlp, cfg.num_heads,
            cfg.dropout, rngs.get("attn"), deterministic, dtype)  # [B, dm]
        parts = [attn.astype(dtype)]
        if seq_vec is not None:
            parts.append(seq_vec.astype(dtype))
        parts.append(t_vec.astype(dtype))
        combined = jnp.concatenate(parts, axis=-1)
        mlp_vec = _tower(params["mlp"], combined, cfg, rngs.get("mlp"),
                         deterministic, dtype)
        mlp_pred = dense(params["mlp_out"], mlp_vec)              # [B, 1]
        mlp_pred = jnp.broadcast_to(mlp_pred[:, None, :], (B, S, 1))
    else:
        # per-candidate singleton attention == Wo(Wv item) (point 2)
        attn = _singleton_attention(
            params["attn"], item_mlp.astype(dtype), dtype)        # [B, S, dm]
        t_b = jnp.broadcast_to(t_vec[:, None, :], (B, S, cfg.temporal_dim))
        parts = [attn.astype(dtype)]
        if seq_vec is not None:
            parts.append(jnp.broadcast_to(
                seq_vec[:, None, :], (B, S, cfg.mlp_dim)).astype(dtype))
        parts.append(t_b.astype(dtype))
        combined = jnp.concatenate(parts, axis=-1)
        mlp_vec = _tower(params["mlp"], combined, cfg, rngs.get("mlp"),
                         deterministic, dtype)
        mlp_pred = dense(params["mlp_out"], mlp_vec)              # [B, S, 1]

    # ---- fusion: Linear(2,1)  (architecture.py:352-354; sigmoid deferred)
    both = jnp.concatenate(
        [mf_pred.astype(jnp.float32), mlp_pred.astype(jnp.float32)], axis=-1)
    logits = dense(params["final"], both)                         # [B, S, 1]
    return logits[..., 0]


def score_candidates(
    params: Params,
    cfg: ModelConfig,
    user_ids: jax.Array,      # [B]
    cand_items: jax.Array,    # [B, C]
    temporal: Optional[Dict[str, jax.Array]] = None,
    item_dept: Optional[jax.Array] = None,
    item_cat: Optional[jax.Array] = None,
    history: Optional[jax.Array] = None,
) -> jax.Array:
    """Eval/serving scoring: each candidate scored independently
    (reference eval semantics: samples_per_interaction=1,
    architecture.py:275).  Returns logits [B, C]."""
    return apply(params, cfg, user_ids, cand_items, temporal,
                 item_dept, item_cat,
                 candidate_attention=False, deterministic=True,
                 history=history)


def score_items_with_hour(
    params: Params,
    cfg: ModelConfig,
    user_ids: jax.Array,      # [B]
    item_ids: jax.Array,      # [B]
    hour: Optional[jax.Array] = None,  # int32 [B]
    history: Optional[jax.Array] = None,  # int32 [B, H] padded -1
) -> jax.Array:
    """``forward_simple`` analogue (architecture.py:409-485): hour-of-day
    modulates product embeddings multiplicatively by
    ``(1 + 0.3 * proj(hour_emb))`` and feeds the MLP concat.  Returns
    *probabilities* [B] (the demo consumes sigmoid scores,
    demo/app.py:65-75)."""
    dtype = jnp.dtype(cfg.compute_dtype)
    B = user_ids.shape[0]

    dmf = cfg.mf_dim
    user_full = embedding_lookup(params["user_emb"], user_ids)
    item_full = embedding_lookup(params["item_emb"], item_ids)
    user_mf = layer_norm(params["mf_norm"], user_full[:, :dmf])
    item_mf = layer_norm(params["mf_norm"], item_full[:, :dmf])
    item_mlp = layer_norm(params["mlp_norm"], item_full[:, dmf:])

    if hour is not None:
        hour_e = embedding_lookup(params["temporal"]["hour"], hour)  # [B, dt]
        mod = 1.0 + 0.3 * dense(params["temporal_proj"], hour_e)     # [B, dmf]
        item_mf = item_mf * mod
        item_mlp = item_mlp * mod  # dims match when mlp_dim == mf_dim (default)

    mf_pred = dense(params["mf_out"], (user_mf * item_mf).astype(dtype))

    # singleton attention (architecture.py:459-463) in closed form
    attn = _singleton_attention(params["attn"], item_mlp.astype(dtype), dtype)

    if hour is not None:
        t_vec = embedding_lookup(params["temporal"]["hour"], hour)
    else:
        t_vec = jnp.zeros((B, cfg.temporal_dim), jnp.float32)
    parts = [attn.astype(dtype)]
    if cfg.use_sequence:
        # sequence models' tower expects the history slot; attend the
        # user's recent items like apply does (zeros when no history is
        # supplied — a well-formed, if uninformed, context)
        if history is not None:
            hmask = history >= 0
            hsafe = jnp.maximum(history, 0)
            user_mlp = layer_norm(params["mlp_norm"], user_full[:, dmf:])
            seq_emb = layer_norm(
                params["mlp_norm"],
                embedding_lookup(params["item_emb"], hsafe)[..., dmf:])
            seq_vec = _single_query_attention(
                params["sequence_attn"], user_mlp, seq_emb, cfg.num_heads,
                0.0, None, True, dtype, key_mask=hmask)
        else:
            seq_vec = jnp.zeros((B, cfg.mlp_dim), jnp.float32)
        parts.append(seq_vec.astype(dtype))
    parts.append(t_vec.astype(dtype))
    combined = jnp.concatenate(parts, axis=-1)
    mlp_vec = mlp_tower(params["mlp"], combined, dtype=dtype)
    mlp_pred = dense(params["mlp_out"], mlp_vec)

    both = jnp.concatenate(
        [mf_pred.astype(jnp.float32), mlp_pred.astype(jnp.float32)], axis=-1)
    return jax.nn.sigmoid(dense(params["final"], both)[..., 0])


# ----------------------------------------------------------------- export

def get_user_embeddings(params: Params, user_ids: jax.Array) -> Dict[str, jax.Array]:
    """Normalized user embedding export for ANN serving
    (architecture.py:383-391)."""
    dmf = params["mf_norm"]["scale"].shape[0]
    full = embedding_lookup(params["user_emb"], user_ids)
    return {
        "mf": layer_norm(params["mf_norm"], full[:, :dmf]),
        "mlp": layer_norm(params["mlp_norm"], full[:, dmf:]),
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
    dmf = cfg.mf_dim
    full = embedding_lookup(params["item_emb"], item_ids)
    out = {
        "mf": layer_norm(params["mf_norm"], full[:, :dmf]),
        "mlp": layer_norm(params["mlp_norm"], full[:, dmf:]),
    }
    if cfg.use_category and "category" in params and item_dept is not None:
        table = _hierarchy_table(
            params["category"], item_dept, item_cat, 0.0, None, True,
            jnp.dtype(cfg.compute_dtype))
        out["category"] = embedding_lookup(table, item_ids)
    return out
