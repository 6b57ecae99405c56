"""A/B: MLP-tower rematerialization vs as-shipped (round-4 verdict
item 2 follow-through).

bench.py's analytic roofline says the 1.44 ms step sits ~4.8x above the
as-shipped minimum-bytes bound (train_hbm_util ~0.21) with MXU at ~6% —
suggesting activation HBM round-trips or scheduling, not compute, bound
the step.  `model.remat_tower` (jax.checkpoint on the [B, 96->256->128->
64] tower) removes the tower's hidden-activation round-trip at the cost
of a second tower forward.  This script times both variants with the
bench marginal-cost methodology and appends the verdict to
results/ab_tower_remat.jsonl.

Usage: python scripts/ab_tower_remat.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
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
    for name, kw in (("baseline", {}), ("remat_tower", {"remat_tower": True})):
        dt, loss = time_variant(**kw)
        row = {"variant": name, "step_ms": round(dt * 1e3, 4),
               "examples_per_s": round(bench.BATCH / dt, 1),
               "loss": round(loss, 6)}
        print(json.dumps(row), flush=True)
        rows.append(row)
    base, remat = rows[0]["step_ms"], rows[1]["step_ms"]
    verdict = {
        "delta_ms": round(remat - base, 4),
        "delta_pct": round((remat - base) / base * 100, 2),
        "verdict": "remat wins" if remat < base * 0.98 else (
            "wash" if remat < base * 1.02 else "remat loses"),
    }
    print(json.dumps(verdict), flush=True)
    os.makedirs("results", exist_ok=True)
    with open("results/ab_tower_remat.jsonl", "a") as f:
        for row in rows + [verdict]:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
