"""Leave-one-out evaluation driver.

Implements the eval protocol the reference *intended* (BASELINE.json;
the reference's own validation is degenerate — val batches are all
positives yet scored as if ranked, SURVEY.md §2.9.9 / trainer.py:387-400):
for each eval user, the held-out positive is ranked against N sampled
negatives drawn outside the user's full history, and HR@k / NDCG@k /
MRR@k / MAP@k are averaged over users.

The candidate sets are built once (host, exact exclusion) and scored in
fixed-size user batches by one jitted scoring function — single compiled
executable, MXU-friendly [B, 1+N] blocks.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ncf_tpu.data.interactions import Interactions
from ncf_tpu.data.sampler import sample_eval_negatives
from ncf_tpu.data.synthetic import temporal_features
from ncf_tpu.evals.metrics import positive_ranks


@dataclass
class EvalSet:
    """Static eval candidate sets: one positive + N negatives per user."""

    users: np.ndarray          # int32 [U]
    candidates: np.ndarray     # int32 [U, 1+N] — column 0 is the positive
    temporal: Optional[Dict[str, np.ndarray]] = None  # per-user, each [U]

    @classmethod
    def build(
        cls,
        full: Interactions,
        eval_users: np.ndarray,
        eval_items: np.ndarray,
        num_negatives: int = 100,
        seed: int = 0,
    ) -> "EvalSet":
        offsets, hist = full.user_histories()
        rng = np.random.default_rng(seed)
        negs = sample_eval_negatives(
            rng, eval_users, offsets, hist, full.num_items, num_negatives)
        cands = np.concatenate([eval_items[:, None], negs], axis=1).astype(np.int32)

        # eval-time temporal context: the held-out interaction's timestamp
        last_ts = np.zeros(full.num_users, np.int64)
        np.maximum.at(last_ts, full.user_ids, full.timestamps)
        hour, day, month, doy = temporal_features(last_ts[eval_users])
        temporal = {"hour": hour, "day": day, "month": month, "day_of_year": doy}
        return cls(users=eval_users.astype(np.int32), candidates=cands,
                   temporal=temporal)


def evaluate(
    score_fn: Callable,        # (user_ids[B], cand[B,C], temporal) -> scores [B,C]
    eval_set: EvalSet,
    batch_size: int = 512,
    ks=(1, 5, 10),
) -> Dict[str, float]:
    """Run the protocol; returns scalar metrics averaged over eval users.

    ``score_fn`` should already be jitted; this driver only pads the final
    batch (static shapes) and masks the padding out of the averages.
    """
    U = len(eval_set.users)
    B = min(batch_size, U)
    all_ranks = []
    for start in range(0, U, B):
        sl = slice(start, min(start + B, U))
        users = eval_set.users[sl]
        cands = eval_set.candidates[sl]
        temporal = (
            {k: v[sl] for k, v in eval_set.temporal.items()}
            if eval_set.temporal else None)
        n = len(users)
        if n < B:  # pad to the compiled batch size
            pad = B - n
            users = np.concatenate([users, users[:1].repeat(pad)])
            cands = np.concatenate([cands, cands[:1].repeat(pad, axis=0)])
            if temporal:
                temporal = {k: np.concatenate([v, v[:1].repeat(pad)])
                            for k, v in temporal.items()}
        scores = score_fn(jnp.asarray(users), jnp.asarray(cands),
                          {k: jnp.asarray(v) for k, v in temporal.items()}
                          if temporal else None)
        ranks = np.asarray(positive_ranks(scores))[:n]
        all_ranks.append(ranks)

    ranks = np.concatenate(all_ranks)
    out: Dict[str, float] = {}
    for k in ks:
        hit = ranks < k
        out[f"hr@{k}"] = float(hit.mean())
        out[f"ndcg@{k}"] = float(np.where(hit, 1.0 / np.log2(ranks + 2.0), 0.0).mean())
        rr = np.where(hit, 1.0 / (ranks + 1.0), 0.0)
        out[f"mrr@{k}"] = float(rr.mean())
        out[f"map@{k}"] = float(rr.mean())
    out["mean_rank"] = float(ranks.mean())
    out["num_eval_users"] = float(len(ranks))
    return out


def make_score_fn(model, params, cfg, item_dept=None, item_cat=None,
                  user_history=None):
    """Build the jitted candidate scorer for ``evaluate``.
    ``user_history``: optional [num_users, H] context table (sequence
    models); rows are gathered per eval batch."""
    # read-only arrays ride as call-time jit arguments, not closure
    # constants — graph-constant operands re-stage per kernel launch on
    # TPU (see train/step.py::_const_args; ~0.2-0.45 ms per constant)
    consts = {k: jnp.asarray(v) for k, v in (
        ("dept", item_dept), ("cat", item_cat), ("hist", user_history))
        if v is not None}

    @jax.jit
    def _score(params, users, cands, temporal, consts):
        kwargs = {}
        if "hist" in consts:
            kwargs["history"] = jnp.take(consts["hist"], users, axis=0)
        return model.score_candidates(
            params, cfg, users, cands, temporal,
            consts.get("dept"), consts.get("cat"), **kwargs)

    def score(users, cands, temporal):
        return _score(params, users, cands, temporal, consts)

    return score
