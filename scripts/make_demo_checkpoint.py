"""Build the SHIPPED demo checkpoint (demo/checkpoint/).

The reference ships a trained model + predictions so its demo runs on
clone (reference: src/inference/demo/train_20241225_002713_model/,
demo/data/predictions.csv).  This script reproduces our equivalent: a
small-but-real training run on the DEFAULT synthetic dataset with the
DEFAULT model config (so `ncf-tpu demo` / `GET /demo` restore it with a
plain `Config()`), consolidated into demo/checkpoint/.

Run from the repo root:  python scripts/make_demo_checkpoint.py
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_default_prng_impl", "rbg")

from ncf_tpu.data.synthetic import generate_interactions
from ncf_tpu.train import checkpoint as ckpt_lib
from ncf_tpu.train.trainer import Trainer
from ncf_tpu.utils.config import Config, setup_logging

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "demo", "checkpoint")


def main():
    setup_logging("INFO")
    cfg = Config()                      # DEFAULT config == demo-time config
    d = cfg.data
    inter = generate_interactions(
        num_users=d.synthetic_users, num_items=d.synthetic_items,
        num_days=d.synthetic_days, avg_txns_per_user=d.synthetic_avg_txns_per_user,
        seed=d.synthetic_seed)
    cfg.train.num_epochs = 8
    cfg.train.batch_size = 4096
    cfg.train.early_stopping_patience = 4
    tmp = tempfile.mkdtemp(prefix="demo_ckpt_")
    cfg.train.checkpoint_dir = tmp
    cfg.train.metrics_file = os.path.join(tmp, "metrics.jsonl")

    trainer = Trainer(cfg, inter)
    best = trainer.train()
    print("BEST:", {k: round(v, 4) for k, v in best.items()
                    if isinstance(v, (int, float))})
    assert best["hr@10"] > 0.3, "demo model failed to train"

    # re-save PARAMS ONLY from the best checkpoint (the full checkpoint
    # carries Adam state — 3x the bytes; serving never reads it)
    src = ckpt_lib.find_best(tmp) or ckpt_lib.find_latest(tmp)
    state, manifest = ckpt_lib.restore(src, {"params": trainer.params})
    shutil.rmtree(OUT, ignore_errors=True)
    stage = tempfile.mkdtemp(prefix="demo_stage_")
    ckpt = ckpt_lib.save(
        stage, {"params": state["params"]},
        step=int(manifest.get("step", 0)),
        epoch=int(manifest.get("epoch", 0)),
        metrics={k: float(v) for k, v in best.items()
                 if isinstance(v, (int, float))})
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    shutil.copytree(ckpt, OUT)
    shutil.rmtree(stage, ignore_errors=True)
    size = sum(os.path.getsize(os.path.join(r, f))
               for r, _, fs in os.walk(OUT) for f in fs)
    print(f"shipped demo checkpoint: {OUT} ({size/1e6:.1f} MB)")
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
