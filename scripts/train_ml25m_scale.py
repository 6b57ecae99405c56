"""Convergence run: AdvancedNCF at MovieLens-25M scale on real TPU.

BASELINE.json config 4 at the ML-25M shape (162 541 users x 62 423
items, ~25M interactions, d=64) on the synthetic retail generator (no
dataset egress in this environment; the generator's
Dirichlet-preference x Zipf structure gives a learnable signal with the
same sparsity).  Single chip: the row-sharded table path is exercised
by tests and dryrun_multichip; this run records convergence + wall
time at the 25M-interaction scale.  Per-epoch metrics go to
results/ml25m_scale_metrics.jsonl, the best checkpoint to
results/ml25m_scale_ckpt/.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_default_prng_impl", "rbg")

from ncf_tpu.data.synthetic import generate_interactions
from ncf_tpu.train.trainer import Trainer
from ncf_tpu.utils.config import Config, setup_logging


def main():
    setup_logging("INFO")
    cfg = Config()
    cfg.model.name = "advanced_ncf"
    cfg.model.mf_dim = 64
    cfg.model.mlp_dim = 64
    cfg.model.temporal_dim = 32
    cfg.model.mlp_hidden_dims = [256, 128, 64]
    cfg.model.negative_samples = 4
    cfg.model.compute_dtype = "bfloat16"
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
    cfg.train.checkpoint_dir = "results/ml25m_scale_ckpt"
    cfg.train.metrics_file = "results/ml25m_scale_metrics.jsonl"
    cfg.train.log_every_steps = 100

    t0 = time.time()
    inter = generate_interactions(
        num_users=162_541, num_items=62_423, num_days=180,
        avg_txns_per_user=154, seed=0)
    print(f"data: {len(inter):,} interactions "
          f"({time.time() - t0:.0f}s to generate)", flush=True)

    trainer = Trainer(cfg, inter)
    t1 = time.time()
    best = trainer.train()
    print(f"train wall: {time.time() - t1:.0f}s", flush=True)
    print("BEST:", {k: round(v, 4) for k, v in best.items()
                    if isinstance(v, (int, float))}, flush=True)


if __name__ == "__main__":
    main()
