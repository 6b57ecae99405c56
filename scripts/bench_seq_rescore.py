"""Recall + throughput for the two-stage sequence serving scorer.

The sequence path breaks the exact ``q_u . v_i + b_i(t)`` serving
decomposition, so use_sequence models serve through
``SequenceRescoreScorer`` (serving/scorer.py): stage-1 candidates from
the decomposition with a population-mean sequence context folded into
the item bias, stage-2 exact full-model rescoring.  Two measurements:

1. **Recall ladder** vs the exact full-model scan (BruteForceScorer) on
   the TRAINED independent+sequence flagship checkpoint (the hr@10
   0.7507 record run, results/indep_seq_metrics.jsonl) — realistic
   score distributions, not random params.  Over-fetch widths C in
   {6, 22, 54, 118}; recall@10 on a 2048-user sample.
2. **Throughput** at the serving benchmark shape (B=1024 users, 1M-item
   catalog, random params): users/s for the two-stage scorer vs the
   base decomposition scorer — the price of sequence-aware serving.

Appends rows to results/seq_rescore_recall.jsonl.

Usage: python scripts/bench_seq_rescore.py [--ckpt DIR] [--skip-recall]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_default_prng_impl", "rbg")
jax.config.update("jax_compilation_cache_dir", ".jax_cache")

import jax.numpy as jnp
import numpy as np

from ncf_tpu.data.synthetic import generate_interactions
from ncf_tpu.models import advanced_ncf
from ncf_tpu.serving.scorer import (AdvancedNCFScorer, BruteForceScorer,
                                    SequenceRescoreScorer)
from ncf_tpu.train import checkpoint as ckpt_lib
from ncf_tpu.utils.config import Config

OUT = "results/seq_rescore_recall.jsonl"


def recall_ladder(ckpt_dir: str):
    cfg = Config.from_yaml("configs/advanced_ncf_sequence.yaml")
    cfg.model.candidate_mode = "independent"
    inter = generate_interactions(
        num_users=6040, num_items=3706, num_days=180,
        avg_txns_per_user=165, seed=0)
    cfg.model.num_users = inter.num_users
    cfg.model.num_items = inter.num_items
    cfg.model.num_departments = inter.num_departments
    cfg.model.num_categories = inter.num_categories
    cfg.validate()

    template = advanced_ncf.init(jax.random.PRNGKey(0), cfg.model)
    path = ckpt_lib.find_best(ckpt_dir) or ckpt_lib.find_latest(ckpt_dir)
    state, manifest = ckpt_lib.restore(path, {"params": template})
    params = state["params"]
    print(f"checkpoint: {path} (step {manifest.get('step')})", flush=True)

    hist = inter.recent_history(cfg.model.history_len)
    dept = jnp.asarray(inter.item_dept)
    cat = jnp.asarray(inter.item_cat)

    rng = np.random.default_rng(0)
    users = rng.choice(inter.num_users, 2048, replace=False).astype(np.int32)
    t = {"hour": 18, "day": 4, "month": 6, "day_of_year": 170}

    bf = BruteForceScorer(advanced_ncf, params, cfg.model, dept, cat,
                          user_history=jnp.asarray(hist))
    _, exact_ids = bf.topk_for_users(users, k=10, temporal=t)

    rows = []
    for C in (6, 22, 54, 118):
        scorer = SequenceRescoreScorer(params, cfg.model, dept, cat,
                                       user_history=hist, candidates=C)
        _, got_ids = scorer.topk_for_users(users, k=10, temporal=t)
        hit = np.mean([
            len(set(got_ids[i]).intersection(exact_ids[i])) / 10.0
            for i in range(len(users))])
        row = {"kind": "recall", "candidates": C, "k": 10,
               "recall@10": round(float(hit), 5),
               "users": len(users), "catalog": inter.num_items}
        print(json.dumps(row), flush=True)
        rows.append(row)
    return rows


def throughput_1m():
    """Serving-shape cost of the two-stage path (random params)."""
    U, I, B, H = 162_541, 1_000_000, 1024, 50
    cfg = Config()
    cfg.model.num_users = U
    cfg.model.num_items = I
    cfg.model.use_sequence = True
    cfg.model.history_len = H
    cfg.model.compute_dtype = "bfloat16"
    cfg.validate()
    params = advanced_ncf.init(jax.random.PRNGKey(0), cfg.model)
    rng = np.random.default_rng(0)
    dept = jnp.asarray(rng.integers(0, 9, I), jnp.int32)
    cat = jnp.asarray(rng.integers(0, 30, I), jnp.int32)
    hist = rng.integers(0, I, (U, H)).astype(np.int32)
    lens = rng.integers(1, H + 1, U)
    hist[np.arange(H)[None, :] >= lens[:, None]] = -1

    users = rng.integers(0, U, B).astype(np.int32)
    t = {"hour": 18, "day": 4, "month": 6, "day_of_year": 170}

    rows = []
    base_cfg = Config()
    base_cfg.model.num_users = U
    base_cfg.model.num_items = I
    base_cfg.model.compute_dtype = "bfloat16"
    base_cfg.validate()
    base_params = advanced_ncf.init(jax.random.PRNGKey(0), base_cfg.model)
    for name, scorer in (
        ("base_exact", AdvancedNCFScorer(base_params, base_cfg.model,
                                         dept, cat)),
        ("seq_rescore", SequenceRescoreScorer(params, cfg.model, dept, cat,
                                              user_history=hist)),
    ):
        scorer.topk_for_users(users, k=10, temporal=t)      # warm
        n = 8
        t0 = time.perf_counter()
        for _ in range(n):
            scorer.topk_for_users(users, k=10, temporal=t)
        dt = (time.perf_counter() - t0) / n
        row = {"kind": "throughput", "scorer": name,
               "users_per_s": round(B / dt, 1),
               "ms_per_1024_users": round(dt * 1e3, 3),
               "catalog": I}
        print(json.dumps(row), flush=True)
        rows.append(row)
    return rows


def main():
    ckpt = "/tmp/indep_seq_ckpt"
    skip_recall = "--skip-recall" in sys.argv
    for a in sys.argv[1:]:
        if a.startswith("--ckpt="):
            ckpt = a.split("=", 1)[1]
    rows = []
    if not skip_recall and os.path.isdir(ckpt):
        rows += recall_ladder(ckpt)
    rows += throughput_1m()
    os.makedirs("results", exist_ok=True)
    with open(OUT, "a") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
