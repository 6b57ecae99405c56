"""Quality-parity A/B: embedding optimizers at ML-1M scale on real TPU.

Round-2 verdict item 2's done-criterion: rowwise Adagrad / bf16-moment
Adam table optimizers (train.embedding_optimizer) must match full-Adam
quality within noise at ML-1M scale before they unlock the big-vocab
regime.  Same data, same seed, same schedule; only the table optimizer
(and its LR, for the Adagrad family) differs.  Appends one JSON line per
arm to results/embopt_parity.jsonl.
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

ARMS = [
    ("adam", 0.0, 0.0),
    ("bf16_adam", 0.0, 0.0),
    ("rowwise_adagrad", 0.01, 0.0),
    ("rowwise_adagrad", 0.03, 0.0),
]

# round-3 second pass (results/embopt_parity.jsonl first four rows): the
# rowwise arms' hr@10 spikes at epoch 0 (empty accumulator => first step
# moves every row by exactly the embedding LR), dips, and was still
# recovering when patience-8 fired at epochs 0/2.  This grid damps the
# first updates (embedding_adagrad_init) and/or lowers the table LR,
# with patience 14 so the recovery can play out.
ARMS2 = [
    ("rowwise_adagrad", 0.003, 0.0),
    ("rowwise_adagrad", 0.01, 0.1),
    ("rowwise_adagrad", 0.03, 1.0),
]

# third pass: grid2 ruled out low LR (spike-then-decay, never recovers)
# and init damping (kills learning).  The CPU mid-scale control
# (f32 grads) has rowwise within 0.03 HR of adam, so A/B the bf16
# scatter-grad path against exact XLA f32 grads, and run the
# Adam-momentum partial_rowwise variant — all at patience 20.
ARMS3 = [
    ("partial_rowwise_adam", 0.0, 0.0, "fast"),
    ("rowwise_adagrad", 0.01, 0.0, "xla"),
    ("rowwise_adagrad", 0.01, 0.0, "fast"),
]

# fourth pass: the memory-efficient arms ran with NO table L2 (fbgemm
# default) while the adam baseline decays tables — match the
# regularization (embedding_weight_decay=weight_decay) and give the
# momentum variant a higher table LR option.
ARMS4 = [
    ("partial_rowwise_adam", 0.0, 0.0, "fast", 1e-5),
    ("partial_rowwise_adam", 0.003, 0.0, "fast", 1e-5),
    ("rowwise_adagrad", 0.01, 0.0, "fast", 1e-5),
    # large-eps form: update ~ g/eps (SGD-like) until the accumulator
    # grows past eps^2 — avoids the normalized full-LR first step whose
    # spike-then-decay poisoned every rowwise arm so far
    ("rowwise_adagrad:eps0.01", 0.1, 0.0, "fast", 1e-5),
]


def run_arm(emb_opt: str, emb_lr: float, inter, init_acc: float = 0.0,
            patience: int = 8, scatter: str = "fast", ewd: float = 0.0):
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
    cfg.train.batch_size = 16384
    cfg.train.learning_rate = 1e-3
    cfg.train.weight_decay = 1e-5
    cfg.train.num_epochs = 40
    cfg.train.early_stopping_patience = patience
    cfg.train.early_stopping_metric = "hr@10"
    cfg.train.lr_schedule = "cosine"
    cfg.train.steps_per_dispatch = 8
    eps_tag = ""
    if ":eps" in emb_opt:
        emb_opt, eps_s = emb_opt.split(":eps")
        cfg.train.embedding_adagrad_eps = float(eps_s)
        eps_tag = f"_eps{eps_s}"
    cfg.train.embedding_optimizer = emb_opt
    cfg.train.embedding_learning_rate = emb_lr
    cfg.train.embedding_adagrad_init = init_acc
    cfg.train.embedding_scatter = scatter
    cfg.train.embedding_weight_decay = ewd
    tag = emb_opt + (f"_lr{emb_lr}" if emb_lr else "") + (
        f"_init{init_acc}" if init_acc else "") + (
        f"_{scatter}" if scatter != "fast" else "") + (
        f"_ewd{ewd}" if ewd else "") + eps_tag
    cfg.train.checkpoint_dir = f"results/embopt_{tag}_ckpt"
    cfg.train.log_every_steps = 50

    t0 = time.time()
    trainer = Trainer(cfg, inter)
    best = trainer.train()
    wall = time.time() - t0
    row = {
        "arm": tag,
        "embedding_optimizer": emb_opt,
        "embedding_learning_rate": emb_lr,
        "embedding_adagrad_init": init_acc,
        "patience": patience,
        "embedding_scatter": scatter,
        "hr@10": round(best["hr@10"], 4),
        "ndcg@10": round(best["ndcg@10"], 4),
        "mrr@10": round(best["mrr@10"], 4),
        "val_loss": round(best["val_loss"], 5),
        "epoch": best.get("epoch"),
        "wall_s": round(wall, 1),
    }
    print("ARM", json.dumps(row), flush=True)
    with open("results/embopt_parity.jsonl", "a") as f:
        f.write(json.dumps(row) + "\n")
    return row


def main():
    setup_logging("INFO")
    os.makedirs("results", exist_ok=True)
    t0 = time.time()
    inter = generate_interactions(
        num_users=6040, num_items=3706, num_days=180,
        avg_txns_per_user=165, seed=0)
    print(f"data: {len(inter):,} interactions "
          f"({time.time() - t0:.0f}s)", flush=True)
    if "--grid4" in sys.argv:
        for emb_opt, emb_lr, init_acc, scatter, ewd in ARMS4:
            run_arm(emb_opt, emb_lr, inter, init_acc, 20, scatter, ewd)
        return
    if "--grid3" in sys.argv:
        for emb_opt, emb_lr, init_acc, scatter in ARMS3:
            run_arm(emb_opt, emb_lr, inter, init_acc, 20, scatter)
        return
    arms = ARMS2 if "--grid2" in sys.argv else ARMS
    patience = 14 if "--grid2" in sys.argv else 8
    for emb_opt, emb_lr, init_acc in arms:
        run_arm(emb_opt, emb_lr, inter, init_acc, patience)


if __name__ == "__main__":
    main()
