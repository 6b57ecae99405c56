"""Top-k scorers: exact AdvancedNCF decomposition + model-agnostic fallback.

Replaces the reference's retrieve-then-rescore serving pipeline (cache ->
features -> user embedding -> Vertex Vector Search ANN -> full-model
rescoring, reference: src/api/routes.py:46-73, src/inference/api.py:27-113,
setup_tree_ah_endpoint.py) with exact on-chip brute-force retrieval
(SURVEY.md §3.4 "intended online flow").

The TPU-native key idea: in eval mode the AdvancedNCF logit *decomposes
exactly* into a dot product plus a per-item bias:

    logit(u, i, t) = q_u . v_i + b_i(t)

      q_u    = wf1 * (LN(u_mf) o w_mf)        [user query vector, d_mf]
      v_i    = LN(i_mf)                        [item vector, d_mf]
      b_i(t) = wf1*b_mf + wf2*mlp_pred(i,t) + b_final

because the MF path is a weighted dot product (architecture.py:304-308)
and the eval-mode MLP path (singleton attention, architecture.py:275)
depends only on the item and the temporal context — never the user.  So
full-model exact top-k retrieval runs at dot-product speed through the
streaming top-k kernels (ncf_tpu.ops.topk); no ANN approximation, no
separate rescoring stage.  Parity with model.score_candidates is locked
by tests/test_serving.py.
"""

from __future__ import annotations

import functools

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ncf_tpu.models import advanced_ncf, temporal as temporal_mod
from ncf_tpu.models.layers import dense, layer_norm, mlp_tower
from ncf_tpu.ops.topk import (PreparedItems, PreparedItemsInt8,
                              prepare_items, prepare_items_int8,
                              rescore_exact, topk_scores)
from ncf_tpu.utils.config import ModelConfig

# prepare_items is only worth it when retrieval routes to the streaming
# kernel (large catalogs on TPU): below this, the dense path wins anyway
_PREPARE_MIN_ITEMS = 1 << 16
# each prepared table is a full augmented catalog copy (~270 MB at
# 1M x 64 f32) — cap the cache far below the bias cache's 32 so hourly
# context churn cannot exhaust HBM (4 entries ~ 1 GB worst case)
_PREPARED_CACHE_SIZE = 4
# 'int8' preset: extra candidates fetched before the exact rescore —
# recall@10 saturates at +6 on the 1M-item benchmark (0.99336 at +6
# and +10 alike; 0.96572 at +0)
_INT8_OVERFETCH = 6


def _context_key(temporal: Optional[Dict[str, int]]) -> Tuple:
    if temporal is None:
        return ()
    return tuple(sorted((k, int(v)) for k, v in temporal.items()))


@functools.partial(jax.jit, static_argnames=("k", "impl", "seg_top"))
def _take_topk(user_queries, user_ids, mod, items, bias, *, k, impl,
               seg_top):
    """Query-row gather fused into the retrieval dispatch: the
    in-process latency budget (BENCH_NOTES round 5) showed the base
    scorer paying TWO device dispatches per request — query build, then
    retrieval — and under a remote runtime each dispatch costs a full
    round-trip (~22 ms on the axon tunnel, 92% of single-request p50).
    One jitted program halves that.  ``mod`` is the optional rank-1
    hour modulation folded into the query side (None for the plain
    path)."""
    q = jnp.take(user_queries, user_ids, axis=0)
    if mod is not None:
        q = q * mod[None, :]
    return topk_scores(q, items, k, bias, impl=impl, seg_top=seg_top)


class AdvancedNCFScorer:
    """Exact full-model top-k retrieval for AdvancedNCF via the
    dot-product + item-bias decomposition."""

    def __init__(
        self,
        params,
        cfg: ModelConfig,
        item_dept: Optional[jax.Array] = None,
        item_cat: Optional[jax.Array] = None,
        impl: str = "auto",
        bias_cache_size: int = 32,
        retrieval: str = "exact",
    ):
        """``retrieval`` picks the streaming kernel's recall/speed point
        (measured at B=1024 x I=1M on v5e — see ops.topk recall ladders):

        'exact'     bf16, seg 128/2   recall 1.0      ~319k users/s
        'fast'      bf16, seg 64/1    recall ~0.9998  ~542k users/s
        'int8'      int8, seg 128/1, over-fetch k+6 + exact f32 rescore
                    of the winners: recall ~0.993, EXACT scores,
                    ~461k users/s (1.45x 'exact')
        'int8-fast' int8, seg 128/1, no rescore: recall ~0.966,
                    dequantized scores (~2% rel err), ~856k users/s
                    (2.7x 'exact')

        The int8 tiers quantize against the user-query table at refresh
        time (ops.topk.prepare_items_int8); fair parity — the
        reference's own retrieval is approximate ANN (Tree-AH,
        setup_tree_ah_endpoint.py:25-33).  Small catalogs use the exact
        dense path under every preset."""
        if retrieval not in ("exact", "fast", "int8", "int8-fast"):
            raise ValueError(f"unknown retrieval preset: {retrieval!r}")
        self._retrieval = retrieval
        self._int8 = retrieval.startswith("int8")
        self._rescore = retrieval == "int8"
        self._seg_width, self._seg_top = {
            "exact": (128, 2), "fast": (64, 1),
            "int8": (128, 1), "int8-fast": (128, 1)}[retrieval]
        self.cfg = cfg
        self.impl = impl
        self.item_dept = item_dept
        self.item_cat = item_cat
        self._bias_cache: Dict[Tuple, jax.Array] = {}
        self._prepared_cache: Dict[Tuple, PreparedItems] = {}
        self._bias_cache_size = bias_cache_size
        # sequence-context vector [dm] concatenated into the eval tower
        # input when set (SequenceRescoreScorer's stage-1 centering);
        # None for the base scorer (non-sequence models)
        self._seq_ctx: Optional[jax.Array] = None
        self.refresh(params)

    # ------------------------------------------------------------ tables

    def refresh(self, params) -> None:
        """(Re)build the static item/user tables from model params — the
        framework's answer to the reference's POST /index/refresh
        (routes.py:197-212)."""
        self.params = params
        cfg = self.cfg
        wf = params["final"]["w"][:, 0]            # [2]: (mf, mlp) fusion
        self._wf1 = wf[0]
        self._wf2 = wf[1]
        self._bf = params["final"]["b"][0]
        self._bmf = params["mf_out"]["b"][0]

        dmf = cfg.mf_dim
        # item vectors: LN(mf half of the fused item table)  [I, dmf]
        self.item_vecs = layer_norm(params["mf_norm"],
                                    params["item_emb"][:, :dmf])
        # user query table: wf1 * (LN(mf_user) o w_mf)  [U, dmf]
        w_mf = params["mf_out"]["w"][:, 0]         # [dmf]
        self.user_queries = (
            layer_norm(params["mf_norm"], params["user_emb"][:, :dmf])
            * w_mf[None, :] * self._wf1)
        # per-dimension |q| bound over the static user-query table —
        # fixes the int8 tiers' query/bias quantization scale
        self._q_maxabs = jnp.max(jnp.abs(self.user_queries), axis=0)
        self._bias_cache.clear()
        self._prepared_cache.clear()

    def _prepared(self, key: Tuple, bias: jax.Array,
                  q_maxabs: Optional[jax.Array] = None):
        """Cached pre-augmented item table for the streaming kernel (one
        per bias/temporal context).  Building the kernel operand inline
        costs a full table copy per CALL (~3 ms of a 6.4 ms retrieval at
        1M items — see ops.topk.PreparedItems); the table is static per
        (params, bias context), so serving amortizes it here.  For the
        int8 tiers, ``q_maxabs`` [D] bounds the (possibly modulated)
        query magnitudes for that context."""
        if (self.cfg.num_items < _PREPARE_MIN_ITEMS
                or self.impl not in ("auto", "streaming")
                or jax.default_backend() != "tpu"):
            return None
        if key not in self._prepared_cache:
            if len(self._prepared_cache) >= _PREPARED_CACHE_SIZE:
                self._prepared_cache.pop(next(iter(self._prepared_cache)))
            if self._int8:
                qrow = (q_maxabs if q_maxabs is not None
                        else self._q_maxabs)[None, :]
                self._prepared_cache[key] = prepare_items_int8(
                    self.item_vecs, bias, qrow, seg_width=self._seg_width)
            else:
                self._prepared_cache[key] = prepare_items(
                    self.item_vecs, bias, seg_width=self._seg_width)
        return self._prepared_cache[key]

    def _mlp_pred_all_items(self, temporal: Optional[Dict[str, int]]) -> jax.Array:
        """Eval-mode MLP-path logit for every item, [I] — pure function of
        (item, temporal context)."""
        cfg, params = self.cfg, self.params
        dtype = jnp.dtype(cfg.compute_dtype)
        I = cfg.num_items

        item_mlp = layer_norm(params["mlp_norm"],
                              params["item_emb"][:, cfg.mf_dim:])
        if cfg.use_category and self.item_dept is not None and "category" in params:
            item_mlp = item_mlp + advanced_ncf._hierarchy_table(
                params["category"], self.item_dept, self.item_cat,
                0.0, None, True, dtype)
        attn = advanced_ncf._singleton_attention(
            params["attn"], item_mlp.astype(dtype), dtype)    # [I, dm]

        if cfg.use_temporal and temporal is not None:
            t_ids = {k: jnp.full((1,), int(temporal.get(k, 0)), jnp.int32)
                     for k in ("hour", "day", "month", "day_of_year")}
            t_vec = temporal_mod.apply(
                params["temporal"], t_ids["hour"], t_ids["day"],
                t_ids["month"], t_ids["day_of_year"])          # [1, dt]
            t_vec = jnp.broadcast_to(t_vec, (I, self.cfg.temporal_dim))
        else:
            t_vec = jnp.zeros((I, cfg.temporal_dim), jnp.float32)

        parts = [attn.astype(dtype)]
        if self._seq_ctx is not None:
            parts.append(jnp.broadcast_to(
                self._seq_ctx[None, :], (I, self.cfg.mlp_dim)).astype(dtype))
        parts.append(t_vec.astype(dtype))
        combined = jnp.concatenate(parts, axis=-1)
        mlp_vec = mlp_tower(params["mlp"], combined, dtype=dtype)
        return dense(params["mlp_out"], mlp_vec)[:, 0]         # [I] f32

    def item_bias(self, temporal: Optional[Dict[str, int]] = None) -> jax.Array:
        """b_i(t) [I], cached per temporal context (a few dozen distinct
        contexts cover hourly serving)."""
        key = _context_key(temporal)
        if key not in self._bias_cache:
            if len(self._bias_cache) >= self._bias_cache_size:
                self._bias_cache.pop(next(iter(self._bias_cache)))
            mlp_pred = self._mlp_pred_all_items(temporal)
            self._bias_cache[key] = (
                self._wf1 * self._bmf + self._wf2 * mlp_pred + self._bf)
        return self._bias_cache[key]

    # ----------------------------------------------------------- queries

    def user_query(self, user_ids: jax.Array) -> jax.Array:
        """Query vectors [B, dmf] for registered user ids."""
        return jnp.take(self.user_queries, user_ids, axis=0)

    # ------------------------------------------------- hourly (demo) path

    def _hour_mod(self, hour: int) -> jax.Array:
        """forward_simple's multiplicative hour modulation
        ``1 + 0.3 * proj(hour_emb)`` [dmf] (reference
        architecture.py:433-456).  The modulation is rank-1 over items
        (items share the per-hour vector), so scoring folds it into the
        QUERY side — q . (v o m) == (q o m) . v — and no per-hour item
        tables are needed (roadmap #8 done one better)."""
        key = ("hour_mod", hour)
        if key not in self._bias_cache:
            p = self.params
            hour_e = p["temporal"]["hour"][hour][None, :]
            self._bias_cache[key] = (
                1.0 + 0.3 * dense(p["temporal_proj"], hour_e))[0]
        return self._bias_cache[key]

    def _hourly_item_bias(self, hour: int) -> jax.Array:
        """Per-item MLP-path logit under score_items_with_hour semantics:
        item_mlp modulated by the hour vector, t_vec = raw hour embedding
        (NOT the summed temporal encoding) — mirrors
        models.advanced_ncf.score_items_with_hour exactly."""
        key = ("hour_bias", hour)
        if key in self._bias_cache:
            return self._bias_cache[key]
        cfg, params = self.cfg, self.params
        dtype = jnp.dtype(cfg.compute_dtype)
        I = cfg.num_items
        item_mlp = layer_norm(params["mlp_norm"],
                              params["item_emb"][:, cfg.mf_dim:])
        item_mlp = item_mlp * self._hour_mod(hour)[None, :]
        attn = advanced_ncf._singleton_attention(
            params["attn"], item_mlp.astype(dtype), dtype)
        t_vec = jnp.broadcast_to(
            params["temporal"]["hour"][hour][None, :],
            (I, cfg.temporal_dim))
        parts = [attn.astype(dtype)]
        if self._seq_ctx is not None:
            parts.append(jnp.broadcast_to(
                self._seq_ctx[None, :], (I, cfg.mlp_dim)).astype(dtype))
        parts.append(t_vec.astype(dtype))
        combined = jnp.concatenate(parts, axis=-1)
        mlp_vec = mlp_tower(params["mlp"], combined, dtype=dtype)
        mlp_pred = dense(params["mlp_out"], mlp_vec)[:, 0]
        if len(self._bias_cache) >= self._bias_cache_size:
            self._bias_cache.pop(next(iter(self._bias_cache)))
        self._bias_cache[key] = (
            self._wf1 * self._bmf + self._wf2 * mlp_pred + self._bf)
        return self._bias_cache[key]

    def topk_for_users_hourly(
        self,
        user_ids,
        hour: int,
        k: int = 10,
        exclude: Optional[np.ndarray] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Exact top-k under the demo's hour-of-day scoring
        (score_items_with_hour / reference forward_simple +
        demo/app.py:43-77) as a retrieval-class query: hour folds into
        the query vector + a cached per-hour item bias."""
        user_ids = jnp.asarray(user_ids, jnp.int32)
        mod = self._hour_mod(hour)
        bias = self._hourly_item_bias(hour)
        return self._retrieve(("ids", user_ids, mod), ("hour_bias", hour),
                              bias, k, exclude,
                              q_maxabs=self._q_maxabs * jnp.abs(mod))

    def topk_for_users(
        self,
        user_ids,
        k: int = 10,
        temporal: Optional[Dict[str, int]] = None,
        exclude: Optional[np.ndarray] = None,   # [B, H] item ids or -1
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Exact top-k items per user: (scores sigmoid [B, k], ids [B, k]).

        ``exclude``: optional per-user already-seen items; retrieval
        over-fetches and filters so k results survive."""
        user_ids = jnp.asarray(user_ids, jnp.int32)
        bias = self.item_bias(temporal)
        return self._retrieve(("ids", user_ids, None), _context_key(temporal),
                              bias, k, exclude)

    def _retrieve(self, q, key, bias, k, exclude, q_maxabs=None):
        """Shared retrieval tail: prepared-table streaming top-k (with
        the int8 tiers' over-fetch + exact rescore), exclusion
        filtering, sigmoid.

        ``q`` is either materialized query vectors [B, dmf] or a lazy
        ``("ids", user_ids, mod_or_None)`` spec — lazy specs fuse the
        query-row gather into the retrieval dispatch (``_take_topk``),
        one device round-trip per request instead of two."""
        lazy = isinstance(q, tuple) and len(q) == 3 and q[0] == "ids"
        if lazy:
            _, _ids, _mod = q

        def run_topk(items_, n_, bias_, impl_, seg_top_):
            if lazy:
                return _take_topk(self.user_queries, _ids, _mod, items_,
                                  bias_, k=n_, impl=impl_, seg_top=seg_top_)
            return topk_scores(q, items_, n_, bias_,
                               impl=impl_, seg_top=seg_top_)

        def materialize_q():
            if not lazy:
                return q
            qq = self.user_query(_ids)
            return qq * _mod[None, :] if _mod is not None else qq
        fetch = k if exclude is None else min(
            self.cfg.num_items, k + exclude.shape[1])
        int8_cap = fetch + (_INT8_OVERFETCH if self._rescore else 0)
        if self._int8 and int8_cap > 64:
            # the int8 kernel unrolls its merge (capped at k<=64 in the
            # dispatch; past it topk_scores would DEQUANTIZE the whole
            # table per call — a full-catalog copy).  Exclusion-heavy
            # requests (e.g. 50-item histories) land here routinely:
            # serve them from the cached bf16 prepared table at 'exact'
            # settings when fetch still fits the streaming kernel, else
            # the raw blocked-XLA path (no fold, no unfold) — exact
            # results either way.
            prep = None
            if (fetch <= 64
                    and self.cfg.num_items >= _PREPARE_MIN_ITEMS
                    and self.impl in ("auto", "streaming")
                    and jax.default_backend() == "tpu"):
                bkey = ("bf16_fallback", key)
                if bkey not in self._prepared_cache:
                    if len(self._prepared_cache) >= _PREPARED_CACHE_SIZE:
                        self._prepared_cache.pop(
                            next(iter(self._prepared_cache)))
                    self._prepared_cache[bkey] = prepare_items(
                        self.item_vecs, bias, seg_width=128)
                prep = self._prepared_cache[bkey]
            if prep is not None:
                vals, idxs = run_topk(prep, fetch, None, "auto", 2)
            else:
                vals, idxs = run_topk(self.item_vecs, fetch, bias,
                                      self.impl, 2)
            vals, idxs = jax.device_get((vals, idxs))
            if exclude is not None:
                vals, idxs = _filter_excluded(vals, idxs, exclude, k)
            return _sigmoid(vals), idxs
        # fetch > 64 exceeds the streaming kernel's merge: a prepared
        # table would be UNFOLDED per call by the dispatch (full-catalog
        # copy) — the raw blocked-XLA path reads the table in place
        prep = (self._prepared(key, bias, q_maxabs)
                if fetch <= 64 else None)
        if prep is not None:
            kern_fetch = fetch
            if self._rescore:
                # int8 ordering misplaces near-ties: fetch extra
                # candidates, exact-rescore, keep the true best
                # (recall 0.966 -> 0.993 measured at +6, BENCH_NOTES)
                kern_fetch = min(fetch + _INT8_OVERFETCH,
                                 self.cfg.num_items)
            vals, idxs = run_topk(prep, kern_fetch, None, "auto",
                                  self._seg_top)
            if self._rescore and isinstance(prep, PreparedItemsInt8):
                vals, idxs = rescore_exact(materialize_q(), self.item_vecs,
                                           bias, idxs)
                vals, idxs = vals[:, :fetch], idxs[:, :fetch]
        else:
            vals, idxs = run_topk(self.item_vecs, fetch, bias,
                                  self.impl, self._seg_top)
        vals, idxs = jax.device_get((vals, idxs))
        if exclude is not None:
            vals, idxs = _filter_excluded(vals, idxs, exclude, k)
        return _sigmoid(vals), idxs

    def score_pairs(self, user_ids, item_ids,
                    temporal: Optional[Dict[str, int]] = None) -> np.ndarray:
        """Probability scores for explicit (user, item) pairs — the
        reference ModelServer.get_predictions surface (routes.py:67)."""
        q = self.user_query(jnp.asarray(user_ids, jnp.int32))
        v = jnp.take(self.item_vecs, jnp.asarray(item_ids, jnp.int32), axis=0)
        bias = jnp.take(self.item_bias(temporal),
                        jnp.asarray(item_ids, jnp.int32))
        logits = jnp.einsum("bd,bd->b", q, v) + bias
        return np.asarray(jax.nn.sigmoid(logits))


class SequenceRescoreScorer(AdvancedNCFScorer):
    """Two-stage retrieval for ``use_sequence`` AdvancedNCF models.

    The sequence path makes the eval MLP logit user-dependent (the
    user's history vector feeds the tower), which breaks the exact
    ``q_u . v_i + b_i(t)`` decomposition — exact retrieval would be a
    full-model scan over the catalog (BruteForceScorer).  This scorer
    mirrors the reference's own retrieve-then-rescore serving shape
    (ANN candidates + full-model rescore, routes.py:59-67) on-chip:

    - **stage 1**: streaming-kernel candidate generation with the item
      bias table evaluated at a *population-mean sequence context*
      (sampled at refresh; the tower was trained on real sequence
      inputs, so centering keeps it on-manifold, unlike zeroing), at
      the base scorer's full speed;
    - **stage 2**: EXACT full-model rescoring of the fetched
      candidates with each user's real history
      (``score_candidates(..., history=...)``); top-k of exact logits,
      so returned scores are always true model scores.

    Recall vs the exact scan is set by the stage-1 over-fetch width
    ``candidates`` (default fills the streaming kernel's merge budget);
    the measured ladder lives in results/seq_rescore_recall.jsonl.
    ``topk_for_users_hourly`` inherits stage 1 only (the hour-demo
    scoring path has no sequence term to rescore with).
    """

    def __init__(self, params, cfg: ModelConfig,
                 item_dept=None, item_cat=None, user_history=None,
                 candidates: int = 54, sample_users: int = 8192, **kw):
        self.user_history = (jnp.asarray(user_history, jnp.int32)
                             if user_history is not None else None)
        self._seq_candidates = candidates
        self._seq_sample = sample_users
        self._rescore_jit = None
        super().__init__(params, cfg, item_dept, item_cat, **kw)

    # ------------------------------------------------------------ context

    def _mean_seq_context(self, params) -> jax.Array:
        cfg = self.cfg
        hist = self.user_history
        if hist is None or "sequence_attn" not in params:
            return jnp.zeros((cfg.mlp_dim,), jnp.float32)
        dtype = jnp.dtype(cfg.compute_dtype)
        U = hist.shape[0]
        n = min(self._seq_sample, U)
        idx = jnp.asarray(np.random.default_rng(0).choice(
            U, size=n, replace=False), jnp.int32)
        user_mlp = layer_norm(
            params["mlp_norm"],
            jnp.take(params["user_emb"], idx, axis=0)[:, cfg.mf_dim:])
        h = jnp.take(hist, idx, axis=0)
        mask = h >= 0
        hsafe = jnp.maximum(h, 0)
        item_mlp = layer_norm(params["mlp_norm"],
                              params["item_emb"][:, cfg.mf_dim:])
        if (cfg.use_category and self.item_dept is not None
                and "category" in params):
            item_mlp = item_mlp + advanced_ncf._hierarchy_table(
                params["category"], self.item_dept, self.item_cat,
                0.0, None, True, dtype)
        seq_emb = jnp.take(item_mlp.astype(dtype), hsafe, axis=0)
        seq_vec = advanced_ncf._single_query_attention(
            params["sequence_attn"], user_mlp, seq_emb, cfg.num_heads,
            0.0, None, True, dtype, key_mask=mask)
        return jnp.mean(seq_vec.astype(jnp.float32), axis=0)

    def refresh(self, params) -> None:
        super().refresh(params)
        # caches are empty after super(); biases built lazily will see
        # the new context
        self._seq_ctx = self._mean_seq_context(params)
        self._rescore_jit = None
        self._fused = self._build_fused()

    def _build_fused(self):
        """ONE device dispatch for the whole two-stage query: stage-1
        top-``fetch`` against the (prepared) table, exact full-model
        rescoring of the candidates with real histories, on-device
        exclusion masking, final top-k.  The previous two-dispatch +
        host-argsort shape paid an extra device round trip per call —
        under the serving harness that is a full tunnel RTT."""
        cfg = self.cfg

        @functools.partial(jax.jit,
                           static_argnames=("k", "fetch", "seg_top"))
        def fused(params, user_queries, items, bias, user_ids, t, dept,
                  cat, hist, exclude, *, k, fetch, seg_top):
            q = jnp.take(user_queries, user_ids, axis=0)
            _, cand = topk_scores(q, items, fetch, bias, seg_top=seg_top)
            kwargs = {}
            if hist is not None:
                kwargs["history"] = jnp.take(hist, user_ids, axis=0)
            logits = advanced_ncf.score_candidates(
                params, cfg, user_ids, cand, t, dept, cat, **kwargs)
            if exclude is not None:
                hit = (cand[:, :, None] == exclude[:, None, :]).any(-1)
                logits = jnp.where(hit, -jnp.inf, logits)
            v, sel = jax.lax.top_k(logits, min(k, fetch))
            return v, jnp.take_along_axis(cand, sel, axis=1)

        return fused

    # ------------------------------------------------------------ rescore

    def _seq_rescore(self, user_ids: jax.Array, cand: jax.Array,
                     temporal: Optional[Dict[str, int]]) -> jax.Array:
        """Exact logits [B, C] for fetched candidates, real history."""
        if self._rescore_jit is None:
            cfg = self.cfg

            def fn(params, user_ids, cand, temporal, dept, cat, hist):
                kwargs = {}
                if hist is not None:
                    kwargs["history"] = jnp.take(hist, user_ids, axis=0)
                return advanced_ncf.score_candidates(
                    params, cfg, user_ids, cand, temporal, dept, cat,
                    **kwargs)

            self._rescore_jit = jax.jit(fn)
        t = None
        if temporal is not None:
            B = user_ids.shape[0]
            t = {key: jnp.full((B,), int(temporal.get(key, 0)), jnp.int32)
                 for key in ("hour", "day", "month", "day_of_year")}
        return self._rescore_jit(self.params, user_ids, cand, t,
                                 self.item_dept, self.item_cat,
                                 self.user_history)

    def topk_for_users(
        self,
        user_ids,
        k: int = 10,
        temporal: Optional[Dict[str, int]] = None,
        exclude: Optional[np.ndarray] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        user_ids = jnp.asarray(user_ids, jnp.int32)
        I = self.cfg.num_items
        if exclude is not None:
            # pad the exclusion width to a power-of-two bucket: request
            # exclusion lists vary per call, and a fresh trace per
            # distinct width means multi-second jit stalls under load
            # (the coalescer-bucket lesson).  -1 never matches a
            # candidate id.
            w = max(1, int(exclude.shape[1]))
            wpad = 1 << (w - 1).bit_length()
            if wpad != w:
                exclude = np.concatenate(
                    [exclude, np.full((exclude.shape[0], wpad - w), -1,
                                      exclude.dtype)], axis=1)
        fetch = int(min(I, max(k + self._seq_candidates,
                               k + (exclude.shape[1]
                                    if exclude is not None else 0))))
        key = _context_key(temporal)
        bias = self.item_bias(temporal)
        prep = self._prepared(key, bias)
        if prep is not None:
            items, bias_arg = prep, None      # bias baked into the table
        else:
            items, bias_arg = self.item_vecs, bias
        t = None
        if temporal is not None:
            B = user_ids.shape[0]
            t = {kk: jnp.full((B,), int(temporal.get(kk, 0)), jnp.int32)
                 for kk in ("hour", "day", "month", "day_of_year")}
        excl = (jnp.asarray(exclude, jnp.int32)
                if exclude is not None else None)
        vals, idxs = self._fused(
            self.params, self.user_queries, items, bias_arg, user_ids, t,
            self.item_dept, self.item_cat, self.user_history, excl,
            k=k, fetch=fetch, seg_top=self._seg_top)
        vals, idxs = jax.device_get((vals, idxs))
        return _sigmoid(vals), idxs

    def score_pairs(self, user_ids, item_ids,
                    temporal: Optional[Dict[str, int]] = None) -> np.ndarray:
        """Exact pair scores including the sequence term."""
        user_ids = jnp.asarray(np.atleast_1d(user_ids), jnp.int32)
        item_ids = jnp.asarray(np.atleast_1d(item_ids), jnp.int32)
        logits = self._seq_rescore(user_ids, item_ids[:, None], temporal)
        return np.asarray(jax.nn.sigmoid(logits[:, 0]))


def _filter_excluded(vals: np.ndarray, idxs: np.ndarray,
                     exclude: np.ndarray, k: int):
    """Drop per-row excluded item ids from over-fetched top-k results,
    keeping the first k survivors (host-side; result rows already
    sorted).  ``exclude``: [B, H] item ids padded with -1.  Vectorized —
    the previous per-row Python loop cost ~B*fetch interpreter
    iterations per serving request."""
    B, fetch = idxs.shape
    kk = min(k, fetch)          # fetch < k when the catalog is small
    hit = (idxs[:, :, None] == exclude[:, None, :]).any(-1)   # [B, fetch]
    # stable order of survivors: rank candidates by (excluded, column)
    order = np.argsort(hit, axis=1, kind="stable")[:, :kk]    # [B, kk]
    keep_v = np.take_along_axis(vals, order, axis=1)
    keep_i = np.take_along_axis(idxs, order, axis=1)
    # slots that ran out of survivors keep the pad convention
    n_keep = (~hit).sum(axis=1, keepdims=True)                # [B, 1]
    slot = np.arange(kk)[None, :]
    out_v = np.full((B, k), -np.inf, vals.dtype)
    out_i = np.zeros((B, k), np.int32)
    out_v[:, :kk] = np.where(slot < n_keep, keep_v,
                             np.array(-np.inf, vals.dtype))
    out_i[:, :kk] = np.where(slot < n_keep, keep_i, 0)
    return out_v, out_i


def _sigmoid(x: np.ndarray) -> np.ndarray:
    out = np.empty_like(x, np.float32)
    np.negative(np.abs(x), out)
    np.exp(out, out)
    pos = x >= 0
    out = np.where(pos, 1.0 / (1.0 + out), out / (1.0 + out))
    return np.where(np.isfinite(x), out, 0.0).astype(np.float32)


class BruteForceScorer:
    """Model-agnostic top-k: runs ``score_candidates`` over item chunks
    with a running merge.  Works for any registered model (NCF/NeuMF have
    no dot-product decomposition); slower than AdvancedNCFScorer but
    exact for everything."""

    def __init__(self, model, params, cfg: ModelConfig,
                 item_dept=None, item_cat=None, chunk: int = 4096,
                 user_history=None):
        self.model, self.params, self.cfg = model, params, cfg
        self.item_dept, self.item_cat = item_dept, item_cat
        self.chunk = chunk
        self.user_history = user_history

        import functools

        # item_dept/item_cat/user_history ride as call-time jit args, not
        # closure constants (graph-constant operands re-stage per kernel
        # launch on TPU — see train/step.py::_const_args)
        consts = {k: v for k, v in (
            ("dept", item_dept), ("cat", item_cat),
            ("hist", user_history)) if v is not None}

        @functools.partial(jax.jit, static_argnames=("k",))
        def _scan_topk_impl(params, user_ids, temporal, consts, k):
            I = cfg.num_items
            C = min(self.chunk, I)
            nchunks = -(-I // C)
            B = user_ids.shape[0]

            def body(carry, c):
                vals, idxs = carry
                start = c * C
                cand = start + jnp.arange(C, dtype=jnp.int32)[None, :]
                cand = jnp.broadcast_to(cand, (B, C))
                kwargs = {}
                if "hist" in consts:
                    kwargs["history"] = jnp.take(
                        consts["hist"], user_ids, axis=0)
                logits = self.model.score_candidates(
                    params, cfg, user_ids, jnp.minimum(cand, I - 1),
                    temporal, consts.get("dept"), consts.get("cat"),
                    **kwargs)
                logits = jnp.where(cand < I, logits, -jnp.inf)
                cat_v = jnp.concatenate([vals, logits], axis=1)
                cat_i = jnp.concatenate([idxs, cand], axis=1)
                mv, sel = jax.lax.top_k(cat_v, k)
                return (mv, jnp.take_along_axis(cat_i, sel, axis=1)), None

            init = (jnp.full((B, k), -jnp.inf), jnp.zeros((B, k), jnp.int32))
            (vals, idxs), _ = jax.lax.scan(
                body, init, jnp.arange(nchunks))
            return vals, idxs

        def _scan_topk(params, user_ids, temporal, k):
            return _scan_topk_impl(params, user_ids, temporal, consts, k)

        self._scan_topk = _scan_topk

    def refresh(self, params) -> None:
        """Swap params in place (POST /index/refresh surface)."""
        self.params = params

    def topk_for_users(self, user_ids, k: int = 10, temporal=None,
                       exclude=None) -> Tuple[np.ndarray, np.ndarray]:
        user_ids = jnp.asarray(user_ids, jnp.int32)
        t = None
        if temporal is not None:
            B = user_ids.shape[0]
            t = {key: jnp.full((B,), int(temporal.get(key, 0)), jnp.int32)
                 for key in ("hour", "day", "month", "day_of_year")}
        fetch = k if exclude is None else min(
            self.cfg.num_items, k + exclude.shape[1])
        vals, idxs = self._scan_topk(self.params, user_ids, t, fetch)
        vals, idxs = jax.device_get((vals, idxs))
        vals = _sigmoid(vals)
        if exclude is not None:
            vals, idxs = _filter_excluded(vals, idxs, exclude, k)
        return vals, idxs
