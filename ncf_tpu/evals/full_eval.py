"""Exact full-catalog leave-one-out evaluation (``eval_protocol: full``).

The sampled protocol (evals/evaluate.py — the reference's intended
protocol, BASELINE.json / reference trainer.py:350-410) ranks the
held-out positive against ``num_eval_negatives`` sampled items.  Sampled
leave-one-out is a biased estimator that can re-order models
(Krichene & Rendle, KDD'20); this module ranks the positive against the
ENTIRE catalog minus the user's interacted items, exactly:

    rank(u) = #{ i in catalog \\ history(u) : s(u,i) > s(u,p) }

with the same pessimistic tie rule as ``metrics.positive_ranks`` (an
item scoring EQUAL to the positive outranks it).

TPU-native shape: never materialize [U, V] scores.  For AdvancedNCF the
eval-mode score decomposes per pair into

    s(u, i, t) = wf0 * (user_mf_u . (item_mf_i * w_mf) + b_mf)
               + wf1 * mlp_out(tower(LN(relu( A1_i + U1_u )))) + b_f

because in eval mode (``candidate_attention=False``,
advanced_ncf.apply) the attention vector is item-only (singleton
attention) and the sequence/temporal vectors are user-only, so the
FIRST tower layer's pre-activation splits into an item part
``A1_i = attn_i @ W1[:dm]`` (computed per item block from the
vocabulary tables) and a user part
``U1_u = concat(seq_u, t_u) @ W1[dm:] + b1`` (computed once per eval
user).  Only the cheap tail of the tower (ReLU+LN then
h1->h2->...->1, ~5x fewer FLOPs than the full forward, zero gathers)
runs per pair, as one jitted scan over (user block x item block).

History exclusion runs as a separate flat pass: the per-user interacted
item sets (deduplicated CSR over the FULL interaction log, so the
positive itself is excluded exactly like the sampled protocol's
negative sampling excludes it) are scored pair-by-pair in fixed chunks
and their counts subtracted from the catalog counts.

Reference anchor: the metrics contract src/utils/metrics.py:9-108; this
protocol completes the §2.9.9 fix (the reference never ranked against
the catalog at all).
"""

from __future__ import annotations

import logging
import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ncf_tpu.data.interactions import Interactions
from ncf_tpu.data.synthetic import temporal_features
from ncf_tpu.evals.evaluate import metrics_from_ranks
from ncf_tpu.models import advanced_ncf
from ncf_tpu.models import temporal as temporal_mod
from ncf_tpu.models.layers import dense, layer_norm

log = logging.getLogger("ncf_tpu.full_eval")


def exclusion_pairs(
    full: Interactions, eval_users: np.ndarray,
    eval_items: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Deduplicated (local_user_idx, item) pairs covering every item each
    eval user has interacted with.  When ``eval_items`` is given, each
    user's held-out positive is dropped from their pairs: the evaluator
    masks the positive's own catalog column explicitly instead, so its
    score never compares against itself (a 1-ulp difference between the
    blocked and gathered scoring paths would otherwise off-by-one the
    rank)."""
    offsets, items = full.user_histories()      # items sorted per user
    pos = None if eval_items is None else np.asarray(eval_items)
    u_idx = []
    it = []
    for local, u in enumerate(np.asarray(eval_users)):
        row = items[offsets[u]:offsets[u + 1]]
        if len(row) == 0:
            continue
        keep = np.empty(len(row), bool)
        keep[0] = True
        np.not_equal(row[1:], row[:-1], out=keep[1:])   # sorted -> dedupe
        row = row[keep]
        if pos is not None:
            row = row[row != pos[local]]
        if len(row) == 0:
            continue
        u_idx.append(np.full(len(row), local, np.int32))
        it.append(row)
    if not u_idx:
        return (np.zeros(0, np.int32), np.zeros(0, np.int32))
    return np.concatenate(u_idx), np.concatenate(it).astype(np.int32)


def _eval_temporal(full: Interactions, eval_users: np.ndarray) -> Dict[str, np.ndarray]:
    """Held-out-interaction temporal context per eval user (same rule as
    EvalSet.build: the user's LAST timestamp)."""
    last_ts = np.zeros(full.num_users, np.int64)
    np.maximum.at(last_ts, full.user_ids, full.timestamps)
    hour, day, month, doy = temporal_features(last_ts[eval_users])
    return {"hour": hour, "day": day, "month": month, "day_of_year": doy}


def _pad_to(x: np.ndarray, n: int, fill) -> np.ndarray:
    if len(x) >= n:
        return x[:n]
    pad = np.full((n - len(x),) + x.shape[1:], fill, x.dtype)
    return np.concatenate([x, pad])


class FullCatalogEvaluator:
    """Exact full-catalog leave-one-out ranks for AdvancedNCF.

    ``ranks(params)`` returns the 0-based pessimistic rank of each eval
    user's held-out positive within catalog-minus-history.  Parity with
    naive ``score_candidates`` over the whole catalog is locked by
    tests/test_full_eval.py.
    """

    def __init__(
        self,
        cfg,                        # ModelConfig
        full: Interactions,
        eval_users: np.ndarray,
        eval_items: np.ndarray,
        user_history=None,          # [num_users, H] int32 (-1 pad), sequence ctx
        item_dept=None,
        item_cat=None,
        user_block: int = 512,
        item_block: int = 2048,
        pair_chunk: int = 1 << 16,  # exclusion-pass pairs per scan step
        sharding=None,
    ):
        self.cfg = cfg
        self.U = len(eval_users)
        self.V = cfg.num_items
        Bu, C = int(user_block), int(item_block)
        Bu = min(Bu, max(1, self.U))
        self._Bu, self._C = Bu, C

        def _put(x):
            arr = jnp.asarray(x)
            return jax.device_put(arr, sharding) if sharding is not None else arr

        # ---- stacked eval users [nb, Bu] (+ per-user context)
        nbu = -(-self.U // Bu)
        users_p = _pad_to(np.asarray(eval_users, np.int32), nbu * Bu, 0)
        pos_p = _pad_to(np.asarray(eval_items, np.int32), nbu * Bu, 0)
        self._users = _put(users_p.reshape(nbu, Bu))
        self._pos = _put(pos_p.reshape(nbu, Bu))
        temporal = _eval_temporal(full, np.asarray(eval_users))
        self._temporal = {
            k: _put(_pad_to(v.astype(np.int32), nbu * Bu, 0).reshape(nbu, Bu))
            for k, v in temporal.items()}
        self._hist = None
        if cfg.use_sequence and user_history is not None:
            h = np.asarray(user_history)[np.asarray(eval_users)]
            self._hist = _put(
                _pad_to(h.astype(np.int32), nbu * Bu, -1).reshape(
                    nbu, Bu, h.shape[1]))

        # ---- flat exclusion pairs [nch, chunk] (+ validity); positives
        # dropped — their catalog columns are masked in the block pass
        u_idx, ex_items = exclusion_pairs(
            full, np.asarray(eval_users), np.asarray(eval_items))
        ch = int(pair_chunk)
        nch = max(1, -(-len(u_idx) // ch))
        valid = _pad_to(np.ones(len(u_idx), bool), nch * ch, False)
        self._ex_u = _put(_pad_to(u_idx, nch * ch, 0).reshape(nch, ch))
        self._ex_i = _put(_pad_to(ex_items, nch * ch, 0).reshape(nch, ch))
        self._ex_valid = _put(valid.reshape(nch, ch))

        self._consts = {k: _put(np.asarray(v)) for k, v in (
            ("dept", item_dept), ("cat", item_cat)) if v is not None}

        self._ranks_fn = jax.jit(self._build())

    # ------------------------------------------------------------ math

    def _build(self):
        cfg = self.cfg
        dmf, dm, dt_dim = cfg.mf_dim, cfg.mlp_dim, cfg.temporal_dim
        dtype = jnp.dtype(cfg.compute_dtype)
        C = self._C
        V = self.V
        nblk = -(-V // C)
        use_cat = cfg.use_category and "dept" in self._consts

        def item_tables(params, consts):
            """Per-vocabulary item-side tables (vocab-branch math of
            advanced_ncf.apply: LN over the table, hierarchy folded in,
            cast to compute dtype)."""
            item_mf = layer_norm(params["mf_norm"], params["item_emb"][:, :dmf])
            item_mlp = layer_norm(params["mlp_norm"], params["item_emb"][:, dmf:])
            if use_cat:
                item_mlp = item_mlp + advanced_ncf._hierarchy_table(
                    params["category"], consts["dept"], consts["cat"],
                    cfg.dropout, None, True, dtype)
            # NOT folding mf_out's weight in: the model rounds the
            # elementwise u*i product to bf16 BEFORE the dot with w
            # (apply: mf_vector.astype(dtype) -> dense), so the exact
            # replication keeps iv as the bf16 LN rows and forms the
            # rounded product per pair (pair_scores)
            iv = item_mf.astype(dtype)                          # [V, dmf]
            imlp = item_mlp.astype(dtype)                       # [V, dm]
            # pad to a whole number of blocks so dynamic_slice never
            # clamps (clamped starts would misalign the validity mask);
            # padding rows are masked out of the counts
            pad = nblk * C - V
            if pad:
                iv = jnp.pad(iv, ((0, pad), (0, 0)))
                imlp = jnp.pad(imlp, ((0, pad), (0, 0)))
            return iv, imlp

        def item_block_parts(params, iv, imlp, blk_idx):
            """attn + first-layer item partial for one contiguous block."""
            start = blk_idx * C
            iv_b = jax.lax.dynamic_slice_in_dim(iv, start, C, 0)
            imlp_b = jax.lax.dynamic_slice_in_dim(imlp, start, C, 0)
            attn_b = advanced_ncf._singleton_attention(
                params["attn"], imlp_b, dtype)                  # [C, dm]
            W1 = params["mlp"][0]["dense"]["w"]
            a1 = jax.lax.dot_general(
                attn_b.astype(dtype), W1[:dm].astype(dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)             # [C, h1] f32
            return iv_b, a1

        def user_parts(params, users, temporal, hist, kv_t):
            """Per-user side: MF vector + first-layer user partial."""
            u_full = jnp.take(params["user_emb"], users, axis=0)
            user_mf = layer_norm(params["mf_norm"], u_full[:, :dmf]).astype(dtype)
            user_mlp = layer_norm(params["mlp_norm"], u_full[:, dmf:]).astype(dtype)

            parts = []
            if cfg.use_sequence:
                if hist is not None:
                    seq_vec = self._seq_vec(params, user_mlp, hist, dtype, kv_t)
                else:
                    seq_vec = jnp.zeros((users.shape[0], dm), jnp.float32)
                parts.append(seq_vec.astype(dtype))
            if cfg.use_temporal:
                t_vec = temporal_mod.apply(
                    params["temporal"], temporal["hour"], temporal["day"],
                    temporal["month"], temporal["day_of_year"])
            else:
                t_vec = jnp.zeros((users.shape[0], dt_dim), jnp.float32)
            parts.append(t_vec.astype(dtype))

            W1 = params["mlp"][0]["dense"]
            u_in = jnp.concatenate(parts, axis=-1)
            u1 = jax.lax.dot_general(
                u_in.astype(dtype), W1["w"][dm:].astype(dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) + W1["b"]   # [B, h1] f32
            return user_mf, u1

        def pair_scores(params, user_mf, u1, iv_b, a1_b):
            """Exact logits [B, C] from the split parts (tower tail +
            MF dot + final fusion)."""
            pre1 = u1[:, None, :] + a1_b[None, :, :]            # [B, C, h1]
            x = layer_norm(params["mlp"][0]["norm"], jax.nn.relu(pre1))
            for layer in params["mlp"][1:]:
                x = layer_norm(layer["norm"],
                               jax.nn.relu(dense(layer["dense"], x, dtype)))
            mlp_pred = dense(params["mlp_out"], x)[..., 0]      # [B, C] f32
            # exact MF path: bf16-rounded elementwise product, then the
            # f32-accumulated dot with mf_out's weight — bit-matching
            # apply's mf_vector -> dense chain
            prod = user_mf[:, None, :] * iv_b[None, :, :]       # [B, C, dmf] bf16
            # w stays f32: apply calls dense(mf_out, .) with NO dtype
            mf_pred = jax.lax.dot_general(
                prod, params["mf_out"]["w"][:, 0],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            mf_pred = mf_pred + params["mf_out"]["b"][0]
            wf = params["final"]["w"][:, 0]
            return wf[0] * mf_pred + wf[1] * mlp_pred + params["final"]["b"][0]

        def pair_scores_gathered(params, iv, imlp, user_mf, u1, items):
            """Same logits for explicit (user_row, item_id) pairs [N]
            (exclusion pass + positive scoring): item side gathered by
            id instead of sliced by block."""
            iv_g = jnp.take(iv, items, axis=0)                  # [N, dmf]
            imlp_g = jnp.take(imlp, items, axis=0)
            attn_g = advanced_ncf._singleton_attention(
                params["attn"], imlp_g, dtype)
            W1 = params["mlp"][0]["dense"]["w"]
            a1 = jax.lax.dot_general(
                attn_g.astype(dtype), W1[:dm].astype(dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            x = layer_norm(params["mlp"][0]["norm"], jax.nn.relu(u1 + a1))
            for layer in params["mlp"][1:]:
                x = layer_norm(layer["norm"],
                               jax.nn.relu(dense(layer["dense"], x, dtype)))
            mlp_pred = dense(params["mlp_out"], x)[..., 0]      # [N] f32
            prod = user_mf * iv_g                               # [N, dmf] bf16
            mf_pred = jax.lax.dot_general(
                prod, params["mf_out"]["w"][:, 0],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            mf_pred = mf_pred + params["mf_out"]["b"][0]
            wf = params["final"]["w"][:, 0]
            return wf[0] * mf_pred + wf[1] * mlp_pred + params["final"]["b"][0]

        Bu = self._Bu
        U = self.U

        def run(params, users, pos, temporal, hist, ex_u, ex_i, ex_valid,
                consts):
            iv, imlp = item_tables(params, consts)
            # sequence K/V table: projected once over the vocabulary,
            # gathered per history slot inside every user block
            kv_t = (self._seq_kv_table(params, consts, dtype)
                    if cfg.use_sequence and hist is not None else None)

            # ---- per-user-block: user parts + positive score, then scan
            # the catalog in item blocks accumulating > / >= counts
            def user_blk(_, xs):
                if hist is not None:
                    u, p, t, h = xs
                else:
                    u, p, t = xs
                    h = None
                user_mf, u1 = user_parts(params, u, t, h, kv_t)
                s_pos = pair_scores_gathered(params, iv, imlp, user_mf, u1, p)

                def item_blk(carry, blk_idx):
                    g, ge = carry
                    iv_b, a1_b = item_block_parts(params, iv, imlp, blk_idx)
                    s = pair_scores(params, user_mf, u1, iv_b, a1_b)
                    # mask catalog-padding columns (V % C != 0) AND each
                    # user's own positive (it must never compare against
                    # itself; see exclusion_pairs)
                    col = blk_idx * C + jnp.arange(C)
                    ok = (col < V)[None, :] & (col[None, :] != p[:, None])
                    g = g + jnp.sum((s > s_pos[:, None]) & ok, axis=1)
                    ge = ge + jnp.sum((s >= s_pos[:, None]) & ok, axis=1)
                    return (g, ge), None

                (g, ge), _ = jax.lax.scan(
                    item_blk,
                    (jnp.zeros(Bu, jnp.int32), jnp.zeros(Bu, jnp.int32)),
                    jnp.arange(nblk))
                return None, (g, ge, s_pos, user_mf, u1)

            xs = (users, pos, temporal) + ((hist,) if hist is not None else ())
            _, (g, ge, s_pos, user_mf_all, u1_all) = jax.lax.scan(
                user_blk, None, xs)
            g = g.reshape(-1)[:U]
            ge = ge.reshape(-1)[:U]
            s_pos = s_pos.reshape(-1)[:U]
            user_mf_all = user_mf_all.reshape(-1, dmf)[:U]
            u1_all = u1_all.reshape(-1, u1_all.shape[-1])[:U]

            # ---- exclusion pass: score every (eval user, history item)
            # pair and subtract its > / >= contributions
            def ex_chunk(carry, xs):
                gh, geh = carry
                uu, ii, ok = xs
                s = pair_scores_gathered(
                    params, iv, imlp,
                    jnp.take(user_mf_all, uu, axis=0),
                    jnp.take(u1_all, uu, axis=0), ii)
                sp = jnp.take(s_pos, uu)
                gh = gh.at[uu].add(((s > sp) & ok).astype(jnp.int32))
                geh = geh.at[uu].add(((s >= sp) & ok).astype(jnp.int32))
                return (gh, geh), None

            (gh, geh), _ = jax.lax.scan(
                ex_chunk,
                (jnp.zeros(U, jnp.int32), jnp.zeros(U, jnp.int32)),
                (ex_u, ex_i, ex_valid))

            # pessimistic tie rule over catalog-minus-history; the
            # positive's own >= contribution cancels via the exclusion
            # pass (it is in the user's history)
            return jnp.maximum(g - gh, ge - geh)

        return run

    def _seq_kv_table(self, params, consts, dtype):
        """Projected K/V item table [V, 2*dm] for the sequence path
        (vocab-branch math of advanced_ncf.apply — hierarchy folded in,
        projected once over the vocabulary)."""
        cfg = self.cfg
        sa = params["sequence_attn"]
        dmf = cfg.mf_dim
        item_mlp = layer_norm(params["mlp_norm"], params["item_emb"][:, dmf:])
        if cfg.use_category and "dept" in consts:
            item_mlp = item_mlp + advanced_ncf._hierarchy_table(
                params["category"], consts["dept"], consts["cat"],
                cfg.dropout, None, True, dtype)
        item_seq_t = item_mlp.astype(dtype)
        return jnp.concatenate([
            dense(sa["k"], item_seq_t, dtype),
            dense(sa["v"], item_seq_t, dtype)], axis=-1).astype(dtype)

    def _seq_vec(self, params, user_mlp, hist, dtype, kv_t):
        """Sequence-attention context per eval user from the precomputed
        K/V table."""
        cfg = self.cfg
        sa = params["sequence_attn"]
        hmask = hist >= 0
        hsafe = jnp.maximum(hist, 0)
        kv = jnp.take(kv_t, hsafe, axis=0)
        seq_k, seq_v = kv[..., :cfg.mlp_dim], kv[..., cfg.mlp_dim:]
        seq_q = dense(sa["q"], user_mlp, dtype)
        return advanced_ncf._sqa_core(
            sa, seq_q, seq_k, seq_v, cfg.num_heads, cfg.dropout,
            None, True, dtype, key_mask=hmask)

    # ------------------------------------------------------------- API

    def ranks(self, params) -> np.ndarray:
        hist = self._hist if self._hist is not None else None
        args = (params, self._users, self._pos, self._temporal, hist,
                self._ex_u, self._ex_i, self._ex_valid, self._consts)
        return np.asarray(self._ranks_fn(*args))

    def __call__(self, params, ks=(1, 5, 10)) -> Dict[str, float]:
        out = metrics_from_ranks(self.ranks(params), ks)
        out["eval_protocol_full"] = 1.0
        return out


def full_ranks_naive(model, params, cfg, full: Interactions,
                     eval_users, eval_items, user_history=None,
                     item_dept=None, item_cat=None,
                     user_block: int = 256) -> np.ndarray:
    """Model-agnostic reference implementation: score the WHOLE catalog
    for each user block via ``model.score_candidates`` and rank with the
    same exclusion + tie rules.  O(U x V) full forward passes — used for
    small vocabularies (ncf/neumf models) and as the parity oracle for
    FullCatalogEvaluator."""
    eval_users = np.asarray(eval_users)
    eval_items = np.asarray(eval_items)
    U, V = len(eval_users), cfg.num_items
    temporal = _eval_temporal(full, eval_users)
    u_idx, ex_items = exclusion_pairs(full, eval_users)
    dept = jnp.asarray(item_dept) if item_dept is not None else None
    cat = jnp.asarray(item_cat) if item_cat is not None else None

    @jax.jit
    def score_block(params, users, temporal, hist):
        cand = jnp.broadcast_to(jnp.arange(V, dtype=jnp.int32)[None, :],
                                (users.shape[0], V))
        kwargs = {}
        if hist is not None:
            kwargs["history"] = hist
        return model.score_candidates(params, cfg, users, cand, temporal,
                                      dept, cat, **kwargs)

    ranks = np.zeros(U, np.int64)
    B = user_block
    for start in range(0, U, B):
        sl = slice(start, min(start + B, U))
        users = eval_users[sl]
        t = {k: jnp.asarray(v[sl]) for k, v in temporal.items()}
        hist = None
        if user_history is not None and cfg.use_sequence:
            hist = jnp.asarray(np.asarray(user_history)[users])
        s = np.asarray(score_block(params, jnp.asarray(users), t, hist))
        pos = s[np.arange(len(users)), eval_items[sl]]
        g = (s > pos[:, None]).sum(1)
        ge = (s >= pos[:, None]).sum(1)
        # subtract history contributions
        m = (u_idx >= start) & (u_idx < sl.stop)
        uu, ii = u_idx[m] - start, ex_items[m]
        sh = s[uu, ii]
        gh = np.zeros(len(users), np.int64)
        geh = np.zeros(len(users), np.int64)
        np.add.at(gh, uu, (sh > pos[uu]))
        np.add.at(geh, uu, (sh >= pos[uu]))
        ranks[sl] = np.maximum(g - gh, ge - geh)
    return ranks
