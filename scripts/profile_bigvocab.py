"""Profile the big-vocab sparse train step (9M x 3M) the way
dispatch_wall profiles the flagship: xplane capture -> per-op exclusive
durations + occupancy — to find where the 16.9 ms step exceeds its
~8 ms primitive floor (bigtable_rows.json: 8.5 ns/row gather,
74 ns/row scatter).

Usage: python scripts/profile_bigvocab.py [--top 30]
"""

import argparse
import glob
import gzip
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_default_prng_impl", "rbg")
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from dispatch_wall import parse_xplane_intervals, union_ps  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--users", type=int, default=9_000_000)
    ap.add_argument("--items", type=int, default=3_000_000)
    args = ap.parse_args()

    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    import bench
    from ncf_tpu.models import get_model
    from ncf_tpu.train.optim import make_optimizer, make_schedule
    from ncf_tpu.train.step import (init_sparse_opt_state,
                                    make_sparse_train_step)
    from ncf_tpu.utils.config import Config

    cfg = Config()
    cfg.model.num_users = args.users
    cfg.model.num_items = args.items
    cfg.model.compute_dtype = "bfloat16"
    cfg.train.batch_size = bench.BATCH
    cfg.train.embedding_optimizer = "rowwise_adagrad"
    cfg.train.sparse_table_update = "on"
    model = get_model("advanced_ncf")
    params = model.init(jax.random.PRNGKey(0), cfg.model)
    dense_cfg = dataclasses.replace(cfg.train, gradient_clip_norm=0.0)
    optimizer = make_optimizer(dense_cfg, steps_per_epoch=100)
    schedule = make_schedule(cfg.train, steps_per_epoch=100)
    opt_state = init_sparse_opt_state(optimizer, params)
    rng_np = np.random.default_rng(0)
    dept = jnp.asarray(rng_np.integers(0, 9, args.items), jnp.int32)
    cat = jnp.asarray(rng_np.integers(0, 30, args.items), jnp.int32)
    step = make_sparse_train_step(model, cfg, optimizer, schedule,
                                  None, dept, cat)
    B = bench.BATCH
    batch = {k: jnp.asarray(v, jnp.int32) for k, v in {
        "user_ids": rng_np.integers(0, args.users, B),
        "item_ids": rng_np.integers(0, args.items, B),
        "hour": rng_np.integers(0, 24, B),
        "day": rng_np.integers(0, 7, B),
        "month": rng_np.integers(0, 12, B),
        "day_of_year": rng_np.integers(0, 365, B)}.items()}
    rng = jax.random.PRNGKey(1)

    for _ in range(3):
        params, opt_state, rng, m = step(params, opt_state, rng, batch)
    _ = float(m["loss"])

    n_steps = 8
    tmp = tempfile.mkdtemp(prefix="nc_bigvocab_prof_")
    with jax.profiler.trace(tmp):
        for _ in range(n_steps):
            params, opt_state, rng, m = step(params, opt_state, rng, batch)
        _ = float(m["loss"])

    paths = glob.glob(os.path.join(tmp, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        for g in glob.glob(os.path.join(tmp, "**", "*.xplane.pb.gz"),
                           recursive=True):
            out = g[:-3]
            with gzip.open(g, "rb") as fin, open(out, "wb") as fout:
                fout.write(fin.read())
            paths.append(out)
    events, counts, intervals = parse_xplane_intervals(paths[0])
    busy_ms = union_ps(intervals) / 1e9 / n_steps
    print(f"device busy (union): {busy_ms:.3f} ms/step over "
          f"{sum(counts.values())/n_steps:.0f} ops")
    print(f"\n== top {args.top} ops by total time ==")
    for name, ps in events.most_common(args.top):
        print(f"{ps/1e9/n_steps:8.4f} ms/step x{counts[name]//n_steps:<3d} "
              f"{name[:110]}")


if __name__ == "__main__":
    main()
