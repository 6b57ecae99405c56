"""A/B: marginal step cost of the sequence path (50-item history).

Round-4 measured the sequence path at ~1.4x joint / ~1.6x independent
step cost from full-training logs.  The table-projected-K/V rework
(models/advanced_ncf.py sequence branch: project the item table once
per step, gather projected rows) removes the per-occurrence K/V
projections — 2*B*H*dm^2 MACs, which at H=50 exceeded the whole rest of
the step's FLOPs.  This script times the flagship bench step with and
without the sequence path (both candidate modes), bench marginal-cost
methodology, appending to results/ab_sequence_kv.jsonl.

Usage: python scripts/ab_sequence_kv.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

import bench


def time_variant(**model_overrides):
    train_step, params, opt_state, batch = bench.build(**model_overrides)
    rng = jax.random.PRNGKey(0)
    for _ in range(bench.WARMUP):
        params, opt_state, rng, metrics = train_step(
            params, opt_state, rng, batch)
    _ = float(metrics["loss"])

    def timed(n, params, opt_state, rng):
        t0 = time.perf_counter()
        for _ in range(n):
            params, opt_state, rng, metrics = train_step(
                params, opt_state, rng, batch)
        _ = float(metrics["loss"])      # real host fetch
        return time.perf_counter() - t0, params, opt_state, rng

    best = float("inf")
    for _ in range(3):
        t_s, params, opt_state, rng = timed(bench.STEPS_SHORT, params,
                                            opt_state, rng)
        t_l, params, opt_state, rng = timed(bench.STEPS_LONG, params,
                                            opt_state, rng)
        dt = (t_l - t_s) / ((bench.STEPS_LONG - bench.STEPS_SHORT)
                            * bench.STEPS_PER_DISPATCH)
        best = min(best, dt)
    return best, float(metrics["loss"])


def main():
    rows = []
    for name, kw in (
        ("joint", {}),
        ("joint+seq", {"use_sequence": True}),
        ("indep", {"candidate_mode": "independent"}),
        ("indep+seq", {"candidate_mode": "independent",
                       "use_sequence": True}),
    ):
        dt, loss = time_variant(**kw)
        row = {"variant": name, "step_ms": round(dt * 1e3, 4),
               "examples_per_s": round(bench.BATCH / dt, 1),
               "loss": round(loss, 6)}
        print(json.dumps(row), flush=True)
        rows.append(row)
    by = {r["variant"]: r["step_ms"] for r in rows}
    verdict = {
        "seq_overhead_joint_pct": round(
            (by["joint+seq"] - by["joint"]) / by["joint"] * 100, 2),
        "seq_overhead_indep_pct": round(
            (by["indep+seq"] - by["indep"]) / by["indep"] * 100, 2),
    }
    print(json.dumps(verdict), flush=True)
    os.makedirs("results", exist_ok=True)
    with open("results/ab_sequence_kv.jsonl", "a") as f:
        for row in rows + [verdict]:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
