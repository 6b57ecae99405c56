"""Multi-seed variance study for the headline quality configs
(round-4 verdict item 2: every quality claim needs a variance band).

Re-runs the recorded flagship recipes (scripts/validate_convergence.py
shapes: ML-1M-scale synthetic, B=16384, cosine LR) at N seeds each,
then re-scores every run's best checkpoint under BOTH leave-one-out
protocols (sampled-100 negatives and the exact full-catalog protocol,
evals/full_eval.py) so the bias of sampled evaluation is measured, not
assumed.

Appends one JSON row per run to results/variance.jsonl:
    {"config": ..., "seed": ..., "best_epoch": ...,
     "sampled": {hr@10, ndcg@10, ...}, "full": {...}, "wall_s": ...}
and writes per-run metric streams to results/variance_<cfg>_s<seed>_metrics.jsonl
(bench.py's quality readout takes the best recorded run automatically).

Usage:
    python scripts/seed_study.py --config indep_seq --seeds 0 1 2
    python scripts/seed_study.py --config indep --seeds 0 1 2 --epochs 12
"""

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_default_prng_impl", "rbg")

import numpy as np

from ncf_tpu.data.synthetic import generate_interactions
from ncf_tpu.evals.full_eval import FullCatalogEvaluator
from ncf_tpu.train import checkpoint as ckpt_lib
from ncf_tpu.train.trainer import Trainer
from ncf_tpu.utils.config import Config, setup_logging

CONFIGS = {
    # flagship quality record (hr@10 0.7507, BENCH_NOTES round 4)
    "indep_seq": dict(candidate_mode="independent", use_sequence=True,
                      epochs=40, early_stopping_metric="hr@10"),
    # non-sequence independent record (hr@10 0.7377, round 2)
    "indep": dict(candidate_mode="independent", use_sequence=False,
                  epochs=12, early_stopping_metric="val_loss"),
    # budget-matched control for the sequence-gain claim: same 40-epoch
    # hr@10-selected recipe as indep_seq, sequence OFF
    "indep40": dict(candidate_mode="independent", use_sequence=False,
                    epochs=40, early_stopping_metric="hr@10"),
    # reference-semantics joint mode
    "joint": dict(candidate_mode="joint", use_sequence=False,
                  epochs=18, early_stopping_metric="val_loss"),
}


def build_cfg(spec, seed: int, metrics_file: str, ckpt_dir: str) -> Config:
    cfg = Config()
    cfg.model.name = "advanced_ncf"
    cfg.model.mf_dim = 64
    cfg.model.mlp_dim = 64
    cfg.model.temporal_dim = 32
    cfg.model.mlp_hidden_dims = [256, 128, 64]
    cfg.model.negative_samples = 4
    cfg.model.compute_dtype = "bfloat16"
    cfg.model.candidate_mode = spec["candidate_mode"]
    if spec["use_sequence"]:
        cfg.model.use_sequence = True
        cfg.model.history_len = 50
    cfg.data.validation_days = 10
    cfg.data.num_eval_negatives = 100
    cfg.train.seed = seed
    cfg.train.batch_size = 16384
    cfg.train.learning_rate = 1e-3
    cfg.train.weight_decay = 1e-5
    cfg.train.num_epochs = spec["epochs"]
    cfg.train.early_stopping_patience = 8
    cfg.train.early_stopping_metric = spec["early_stopping_metric"]
    cfg.train.lr_schedule = "cosine"
    cfg.train.checkpoint_dir = ckpt_dir
    cfg.train.metrics_file = metrics_file
    cfg.train.log_every_steps = 200
    return cfg


def full_protocol_metrics(trainer: Trainer, params) -> dict:
    ev = FullCatalogEvaluator(
        trainer.cfg.model, trainer.full,
        np.asarray(trainer.eval_set.users),
        np.asarray(trainer.eval_set.candidates[:, 0]),
        user_history=trainer.eval_history,
        item_dept=trainer.item_dept, item_cat=trainer.item_cat)
    return ev(params)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True, choices=sorted(CONFIGS))
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    ap.add_argument("--epochs", type=int, default=0,
                    help="override the config's epoch budget")
    ap.add_argument("--out", default="results/variance.jsonl")
    ap.add_argument("--keep-checkpoints", action="store_true")
    args = ap.parse_args()

    setup_logging("INFO")
    spec = dict(CONFIGS[args.config])
    if args.epochs:
        spec["epochs"] = args.epochs

    t0 = time.time()
    inter = generate_interactions(
        num_users=6040, num_items=3706, num_days=180,
        avg_txns_per_user=165, seed=0)
    print(f"data: {len(inter):,} interactions "
          f"({time.time() - t0:.0f}s)", flush=True)

    for seed in args.seeds:
        tag = f"{args.config}_s{seed}"
        metrics_file = f"results/variance_{tag}_metrics.jsonl"
        ckpt_dir = f"/tmp/seed_study_{tag}"
        shutil.rmtree(ckpt_dir, ignore_errors=True)
        cfg = build_cfg(spec, seed, metrics_file, ckpt_dir)

        t_run = time.time()
        trainer = Trainer(cfg, inter)
        best = trainer.train()
        wall = time.time() - t_run

        # re-score the BEST checkpoint under both protocols
        best_ckpt = (ckpt_lib.find_best(ckpt_dir)
                     or ckpt_lib.find_latest(ckpt_dir))
        params = trainer.params
        if best_ckpt:
            state, _ = ckpt_lib.restore(best_ckpt, {"params": trainer.params})
            params = state["params"]
        full_m = full_protocol_metrics(trainer, params)

        keys = ("hr@10", "ndcg@10", "mrr@10", "map@10", "hr@5", "hr@1",
                "mean_rank")
        row = {
            "config": args.config,
            "seed": seed,
            "epochs_budget": spec["epochs"],
            "best_epoch": int(best.get("epoch", -1)),
            "sampled": {k: round(float(best[k]), 5) for k in keys
                        if k in best},
            "full": {k: round(float(full_m[k]), 5) for k in keys
                     if k in full_m},
            "wall_s": round(wall, 1),
        }
        with open(args.out, "a") as f:
            f.write(json.dumps(row) + "\n")
        # the full-protocol row also joins the run's metric stream so
        # bench.py's full-protocol readout finds it (kind=val +
        # eval_protocol_full marker, same contract as Trainer.validate)
        with open(metrics_file, "a") as f:
            f.write(json.dumps({
                "kind": "val", "epoch": row["best_epoch"],
                "eval_protocol_full": 1.0,
                **{k: float(full_m[k]) for k in keys if k in full_m}})
                + "\n")
        print("ROW:", json.dumps(row), flush=True)
        if not args.keep_checkpoints:
            shutil.rmtree(ckpt_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
