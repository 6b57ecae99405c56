"""Sequence-path convergence run at ML-1M scale on real TPU (round-4
verdict item 3: the sequence capability had unit tests but zero measured
evidence).

Runs configs/advanced_ncf_sequence.yaml — the flagship config with
``use_sequence: true`` (the reference's 50-item purchase-history
features, src/data/training_data.py:72-81, actually wired through
sequence_attention) — on the SAME synthetic data/seed as
scripts/train_ml1m_scale.py, so the quality delta and step-time cost vs
results/ml1m_scale_metrics.jsonl isolate the sequence path.

Usage: python scripts/train_ml1m_sequence.py [--epochs=N] [--causal]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_default_prng_impl", "rbg")
jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ncf_tpu.data.synthetic import generate_interactions
from ncf_tpu.train.trainer import Trainer
from ncf_tpu.utils.config import Config, setup_logging


def main():
    setup_logging("INFO")
    cfg = Config.from_yaml(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "configs",
            "advanced_ncf_sequence.yaml")).validate()
    for a in sys.argv[1:]:
        if a.startswith("--epochs="):
            cfg.train.num_epochs = int(a.split("=", 1)[1])
        elif a == "--causal":
            # strictly-causal per-example prefix contexts (exact variant)
            cfg.model.causal_history = True
            cfg.train.checkpoint_dir += "_causal"
            cfg.train.metrics_file = cfg.train.metrics_file.replace(
                ".jsonl", "_causal.jsonl")

    t0 = time.time()
    inter = generate_interactions(
        num_users=cfg.data.synthetic_users,
        num_items=cfg.data.synthetic_items,
        num_days=cfg.data.synthetic_days,
        avg_txns_per_user=cfg.data.synthetic_avg_txns_per_user,
        seed=cfg.data.synthetic_seed)
    print(f"data: {len(inter):,} interactions "
          f"({time.time() - t0:.0f}s to generate)", flush=True)

    trainer = Trainer(cfg, inter)
    t0 = time.time()
    best = trainer.train()
    wall = time.time() - t0
    row = {
        "config": "advanced_ncf_sequence",
        "causal_history": cfg.model.causal_history,
        "history_len": cfg.model.history_len,
        "hr@10": round(best["hr@10"], 4),
        "ndcg@10": round(best["ndcg@10"], 4),
        "mrr@10": round(best["mrr@10"], 4),
        "map@10": round(best.get("map@10", best["mrr@10"]), 4),
        "val_loss": round(best["val_loss"], 5),
        "epoch": best.get("epoch"),
        "wall_s": round(wall, 1),
    }
    print("SEQUENCE", json.dumps(row), flush=True)
    os.makedirs("results", exist_ok=True)
    with open("results/sequence_summary.jsonl", "a") as f:
        f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
