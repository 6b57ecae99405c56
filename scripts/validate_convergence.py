"""Convergence A/B harness: AdvancedNCF at ML-1M scale with switchable
kernel/precision options, for validating that a perf optimization does
not move quality.

Reproduces the recorded runs in results/ (same generator seed, shapes,
schedule — see scripts/train_ml1m_scale.py) with CLI overrides:

    python scripts/validate_convergence.py \
        --candidate-mode independent --scatter-mode bf16 \
        --metrics-file results/bf16_scatter_metrics.jsonl --epochs 10

Reference numbers (scatter=xla equivalents, results/):
    candidate_mode=independent: hr@10 0.7377 / ndcg@10 0.5406 (epoch 7)
    candidate_mode=joint:       hr@10 0.668  / ndcg@10 0.4646 (epoch 18)
"""

import argparse
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--candidate-mode", default="independent",
                    choices=["joint", "independent"])
    ap.add_argument("--scatter-mode", default="split",
                    choices=["split", "bf16", "f32"])
    ap.add_argument("--scatter-impl", default="auto",
                    choices=["auto", "xla", "pallas"])
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--steps-per-dispatch", type=int, default=1)
    ap.add_argument("--loss", default="bce", choices=["bce", "bpr"])
    ap.add_argument("--negative-sampling", default="iid",
                    choices=["iid", "stratified"])
    ap.add_argument("--early-stopping-metric", default="val_loss")
    ap.add_argument("--use-sequence", action="store_true",
                    help="wire the 50-item history sequence path "
                         "(configs/advanced_ncf_sequence.yaml semantics)")
    ap.add_argument("--patience", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0,
                    help="train seed (init + negative sampling + eval "
                         "negatives); the dataset seed stays fixed so "
                         "multi-seed runs measure training variance")
    ap.add_argument("--eval-protocol", default="sampled",
                    choices=["sampled", "full"])
    ap.add_argument("--metrics-file", required=True)
    ap.add_argument("--checkpoint-dir", default="")
    args = ap.parse_args()

    setup_logging("INFO")
    from ncf_tpu.ops import embedding
    embedding.set_scatter_impl(args.scatter_impl, args.scatter_mode)

    cfg = Config()
    cfg.model.name = "advanced_ncf"
    cfg.model.mf_dim = 64
    cfg.model.mlp_dim = 64
    cfg.model.temporal_dim = 32
    cfg.model.mlp_hidden_dims = [256, 128, 64]
    cfg.model.negative_samples = 4
    cfg.model.compute_dtype = "bfloat16"
    cfg.model.candidate_mode = args.candidate_mode
    if args.use_sequence:
        cfg.model.use_sequence = True
        cfg.model.history_len = 50
    cfg.data.validation_days = 10
    cfg.data.num_eval_negatives = 100
    cfg.data.eval_protocol = args.eval_protocol
    cfg.train.seed = args.seed
    cfg.train.batch_size = 16384
    cfg.train.steps_per_dispatch = args.steps_per_dispatch
    cfg.train.learning_rate = 1e-3
    cfg.train.weight_decay = 1e-5
    cfg.train.num_epochs = args.epochs
    cfg.train.loss = args.loss
    cfg.train.negative_sampling = args.negative_sampling
    cfg.train.early_stopping_patience = args.patience
    cfg.train.early_stopping_metric = args.early_stopping_metric
    cfg.train.lr_schedule = "cosine"
    cfg.train.checkpoint_dir = (args.checkpoint_dir
                                or "/tmp/validate_convergence_ckpt")
    cfg.train.metrics_file = args.metrics_file
    cfg.train.log_every_steps = 50

    t0 = time.time()
    inter = generate_interactions(
        num_users=6040, num_items=3706, num_days=180,
        avg_txns_per_user=165, seed=0)
    print(f"data: {len(inter):,} interactions "
          f"({time.time() - t0:.0f}s to generate)", flush=True)

    trainer = Trainer(cfg, inter)
    best = trainer.train()
    print("BEST:", {k: round(v, 4) for k, v in best.items()
                    if isinstance(v, (int, float))}, flush=True)


if __name__ == "__main__":
    main()
