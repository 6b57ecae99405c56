"""End-to-end run of the vocab-precompute-OFF (big-table) regime on TPU.

Round-2 verdict item 1: every prior measured run lived in the
vocab-precompute fast path (entities <= 4*B*S = 327,680); the
per-occurrence gather->LN->hierarchy->scatter hot path — the regime the
100M config, row-sharded tables and scatter cost model exist for — had
zero end-to-end evidence.  This script runs configs/advanced_ncf_bigvocab.yaml
(12M users x 4M items, rowwise-Adagrad tables) for real epochs on the
real chip and records examples/s/chip + convergence + the scatter route
the cost model picks for each table shape.

Usage: python scripts/train_bigvocab.py [users items avg_txns]
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
            "advanced_ncf_bigvocab.yaml")).validate()
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if len(args) >= 2:
        cfg.data.synthetic_users = int(args[0])
        cfg.data.synthetic_items = int(args[1])
    if len(args) >= 3:
        cfg.data.synthetic_avg_txns_per_user = int(args[2])
    # dotted config overrides (e.g. mesh.enable=on train.batch_size=8192)
    cfg.apply_overrides([a for a in sys.argv[1:]
                         if "=" in a and "." in a.split("=", 1)[0]
                         and not a.startswith("--")])
    for a in sys.argv[1:]:
        if a.startswith("--tag="):
            tag = a.split("=", 1)[1]
            cfg.train.checkpoint_dir += f"_{tag}"
            cfg.train.metrics_file = (
                cfg.train.metrics_file.replace(".jsonl", f"_{tag}.jsonl"))
        elif a.startswith("--epochs="):
            cfg.train.num_epochs = int(a.split("=", 1)[1])
        elif a.startswith("--eval-every="):
            cfg.train.eval_every_epochs = int(a.split("=", 1)[1])

    t0 = time.time()
    inter = generate_interactions(
        num_users=cfg.data.synthetic_users,
        num_items=cfg.data.synthetic_items,
        num_days=cfg.data.synthetic_days,
        avg_txns_per_user=cfg.data.synthetic_avg_txns_per_user,
        seed=cfg.data.synthetic_seed)
    print(f"data: {len(inter):,} interactions over "
          f"{inter.num_users:,} users x {inter.num_items:,} items "
          f"({time.time() - t0:.0f}s to generate)", flush=True)

    # which scatter route the measured cost model picks per table
    from ncf_tpu.ops.pallas_scatter import scatter_preferred
    B = cfg.train.batch_size
    S = 1 + cfg.model.negative_samples
    d_fused = cfg.model.mf_dim + cfg.model.mlp_dim
    for name, rows, d, n in (
        ("user_emb", inter.num_users, d_fused, B),
        ("item_emb", inter.num_items, d_fused, B * S),
        ("temporal.hour", 24, cfg.model.temporal_dim, B),
    ):
        route = ("pallas-onehot" if scatter_preferred(rows, d, n, "bf16")
                 else "xla-scatter")
        print(f"scatter route [{name}] rows={rows:,} d={d} n={n}: {route}",
              flush=True)

    entities = inter.num_users + inter.num_items
    thresh = 4 * B * S
    assert entities > thresh, (
        f"not the big-vocab regime: {entities} <= {thresh}")
    print(f"vocab precompute OFF: {entities:,} entities > 4*B*S={thresh:,}",
          flush=True)

    # mesh.enable=auto|on in the config (or a mesh.enable=on override)
    # composes the sparse path with row-sharded tables — the
    # fused-sparse-under-DMP equivalent (train/sparse_sharded.py)
    mesh = cfg.build_mesh()
    if mesh is not None:
        print(f"mesh: {dict(mesh.shape)}", flush=True)
    trainer = Trainer(cfg, inter, mesh=mesh)
    print(f"sparse_table_update: {trainer.sparse_tables} "
          f"(mode={cfg.train.sparse_table_update})", flush=True)
    t0 = time.time()
    best = trainer.train()
    wall = time.time() - t0
    row = {
        "users": inter.num_users, "items": inter.num_items,
        "interactions": len(inter),
        "embedding_optimizer": cfg.train.embedding_optimizer,
        "sparse_table_update": trainer.sparse_tables,
        "hr@10": round(best["hr@10"], 4),
        "ndcg@10": round(best["ndcg@10"], 4),
        "val_loss": round(best["val_loss"], 5),
        "epoch": best.get("epoch"),
        "wall_s": round(wall, 1),
    }
    print("BIGVOCAB", json.dumps(row), flush=True)
    with open("results/bigvocab_summary.jsonl", "a") as f:
        f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
