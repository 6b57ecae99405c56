"""Convergence run: AdvancedNCF at ML-25M scale, candidate_mode=independent.

VERDICT r1 #10: the r1 record at this scale used candidate_mode=joint
(HR@10 0.5917); independent mode (+~0.07 HR at ML-1M scale, the
framework's eval-consistent training option) was untested at scale.
BASELINE.json config 4 at the ML-25M shape (162 541 users x 62 423
items, ~25M interactions, d=64) on the synthetic retail generator (no
dataset egress in this environment; the generator's
Dirichlet-preference x Zipf structure gives a learnable signal with the
same sparsity).  Single chip: the row-sharded table path is exercised
by tests and dryrun_multichip; this run records convergence + wall
time at the 25M-interaction scale.  Per-epoch metrics go to
results/ml25m_indep_metrics.jsonl, the best checkpoint to
results/ml25m_indep_ckpt/.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_default_prng_impl", "rbg")
# persistent compile cache: a tunnel stall on a fresh compile burst
# killed the first attempt of this run 30 min in — on restart, finished
# compiles are reused (same protection bench.py carries)
jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ncf_tpu.data.synthetic import generate_interactions
from ncf_tpu.train.trainer import Trainer
from ncf_tpu.utils.config import Config, setup_logging


def main():
    setup_logging("INFO")
    use_sequence = "--use-sequence" in sys.argv
    cfg = Config()
    cfg.model.name = "advanced_ncf"
    cfg.model.mf_dim = 64
    cfg.model.mlp_dim = 64
    cfg.model.temporal_dim = 32
    cfg.model.mlp_hidden_dims = [256, 128, 64]
    cfg.model.negative_samples = 4
    cfg.model.compute_dtype = "bfloat16"
    cfg.model.candidate_mode = "independent"
    cfg.data.validation_days = 10
    cfg.data.num_eval_negatives = 100
    cfg.train.batch_size = 32768
    cfg.train.learning_rate = 1e-3
    cfg.train.weight_decay = 1e-5
    cfg.train.num_epochs = 30
    cfg.train.early_stopping_patience = 5
    cfg.train.early_stopping_metric = "hr@10"
    cfg.train.lr_schedule = "cosine"
    # 8 optimizer steps per device dispatch: the per-dispatch tunnel
    # round-trip otherwise dominates wall time (measured 2M vs 11M
    # examples/s at the 61M-example scale)
    cfg.train.steps_per_dispatch = 8
    cfg.train.checkpoint_dir = "results/ml25m_indep_ckpt"
    cfg.train.metrics_file = "results/ml25m_indep_metrics.jsonl"
    cfg.train.log_every_steps = 100
    if use_sequence:
        # the sequence path at REAL vocabulary scale (62k items): the
        # 50-item history features on the big catalog, where the
        # per-step cost is the B*H occurrence gather/scatter
        # (BENCH_NOTES round-4 "table-projected K/V")
        cfg.model.use_sequence = True
        cfg.model.history_len = 50
        cfg.train.checkpoint_dir = "results/ml25m_indep_seq_ckpt"
        cfg.train.metrics_file = "results/ml25m_indep_seq_metrics.jsonl"

    t0 = time.time()
    cache = "/tmp/ml25m_inter_seed0.npz"
    import os

    import numpy as np
    if os.path.exists(cache):
        z = np.load(cache)
        from ncf_tpu.data.interactions import Interactions
        inter = Interactions(
            user_ids=z["user_ids"], item_ids=z["item_ids"],
            timestamps=z["timestamps"], amounts=z["amounts"],
            num_users=int(z["num_users"]), num_items=int(z["num_items"]),
            item_dept=z["item_dept"], item_cat=z["item_cat"],
            num_departments=int(z["num_departments"]),
            num_categories=int(z["num_categories"]))
        print(f"data: {len(inter):,} interactions (cached, "
              f"{time.time() - t0:.0f}s to load)", flush=True)
    else:
        inter = generate_interactions(
            num_users=162_541, num_items=62_423, num_days=180,
            avg_txns_per_user=154, seed=0)
        np.savez(cache, user_ids=inter.user_ids, item_ids=inter.item_ids,
                 timestamps=inter.timestamps, amounts=inter.amounts,
                 num_users=inter.num_users, num_items=inter.num_items,
                 item_dept=inter.item_dept, item_cat=inter.item_cat,
                 num_departments=inter.num_departments,
                 num_categories=inter.num_categories)
        print(f"data: {len(inter):,} interactions "
              f"({time.time() - t0:.0f}s to generate)", flush=True)

    trainer = Trainer(cfg, inter)
    if "--resume" in sys.argv:
        # tunnel stalls kill long runs occasionally (see the round-2
        # note above); restart with --resume to continue from the
        # latest checkpoint instead of epoch 0
        print("resumed:", trainer.resume(), flush=True)
    t1 = time.time()
    best = trainer.train()
    print(f"train wall: {time.time() - t1:.0f}s", flush=True)
    print("BEST:", {k: round(v, 4) for k, v in best.items()
                    if isinstance(v, (int, float))}, flush=True)

    # ---- re-score the best checkpoint under the EXACT full-catalog
    # protocol (round-4 verdict item 1: both protocols side-by-side at
    # the ML-25M scale, not only ML-1M)
    import json

    from ncf_tpu.evals.full_eval import FullCatalogEvaluator
    from ncf_tpu.train import checkpoint as ckpt_lib

    best_ckpt = (ckpt_lib.find_best(cfg.train.checkpoint_dir)
                 or ckpt_lib.find_latest(cfg.train.checkpoint_dir))
    params = trainer.params
    if best_ckpt:
        state, _ = ckpt_lib.restore(best_ckpt, {"params": trainer.params})
        params = state["params"]
    t2 = time.time()
    ev = FullCatalogEvaluator(
        cfg.model, trainer.full,
        np.asarray(trainer.eval_set.users),
        np.asarray(trainer.eval_set.candidates[:, 0]),
        user_history=trainer.eval_history,
        item_dept=trainer.item_dept, item_cat=trainer.item_cat)
    full_m = ev(params)
    keys = ("hr@10", "ndcg@10", "mrr@10", "map@10", "hr@5", "hr@1",
            "mean_rank")
    row = {
        "scale": "ml25m", "use_sequence": use_sequence,
        "sampled": {k: round(float(best[k]), 5) for k in keys if k in best},
        "full": {k: round(float(full_m[k]), 5) for k in keys if k in full_m},
        "full_eval_wall_s": round(time.time() - t2, 1),
    }
    print("PROTOCOLS:", json.dumps(row), flush=True)
    with open("results/ml25m_protocols.jsonl", "a") as f:
        f.write(json.dumps(row) + "\n")
    with open(cfg.train.metrics_file, "a") as f:
        f.write(json.dumps({
            "kind": "val", "epoch": int(best.get("epoch", -1)),
            "eval_protocol_full": 1.0,
            **{k: float(full_m[k]) for k in keys if k in full_m}}) + "\n")


if __name__ == "__main__":
    main()
