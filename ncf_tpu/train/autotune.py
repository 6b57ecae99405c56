"""Dispatch-granularity autotuning: choose steps_per_dispatch from
measured per-dispatch overhead.

``cfg.train.steps_per_dispatch = 0`` asks the Trainer to measure, at
startup, how much a device dispatch costs relative to one optimizer step
and to pick the smallest K (1, 8, 16, 32) such that the amortized
dispatch overhead stays under ~5 % of step time.  Motivation: under a
remote-tunnel runtime the per-call dispatch latency can dominate short
steps (a 61M-example epoch measured 2M examples/s with K=1 vs 11.3M/s
for the step body — BENCH_NOTES.md), but hard-coding K=8 in configs
(round-1 commit f2f3ea0) mis-tunes every other deployment.

Measurement discipline (BENCH_NOTES.md): every timed region ends in a
real host fetch, and per-step costs are taken from the DIFFERENCE of a
short and a long chained run, which cancels the fixed round-trip+fetch
cost.  All probe steps run on copies of params/opt_state and a repeated
real-shaped batch; training state is untouched.
"""

from __future__ import annotations

import logging
import math
import time
from typing import Dict, Optional

import jax
import numpy as np

log = logging.getLogger(__name__)

PROBE_K = 8                 # the multi-step probe's scan length
CANDIDATE_KS = (8, 16, 32)  # Ks we are willing to compile
TARGET_FRAC = 0.05          # dispatch overhead budget as fraction of step


def _copy_state(tree):
    return jax.tree_util.tree_map(
        lambda x: x.copy() if isinstance(x, jax.Array) else x, tree)


def _chained(step_fn, state, batches, m: int) -> float:
    """Time m chained dispatches ending in a real host fetch."""
    params, opt_state, rng = state
    t0 = time.perf_counter()
    metrics = None
    for i in range(m):
        params, opt_state, rng, metrics = step_fn(
            params, opt_state, rng, batches[i % len(batches)])
    float(np.asarray(metrics["loss"]))
    dt = time.perf_counter() - t0
    state[:] = [params, opt_state, rng]
    return dt


def choose_steps_per_dispatch(
    make_single,                 # () -> train_step(params, opt, rng, batch)
    make_multi,                  # () -> multi_step(params, opt, rng, [K,B] batches)
    params,
    opt_state,
    rng,
    probe_batch: Dict[str, jax.Array],
    stack_batch,                 # (batch, K) -> stacked device batch [K, B]
) -> int:
    """Measure single-dispatch vs scanned per-step cost and pick K."""
    p, o = _copy_state(params), _copy_state(opt_state)

    single = make_single()
    state = [p, o, rng]
    _chained(single, state, [probe_batch], 2)            # warmup/compile
    t_short = _chained(single, state, [probe_batch], 4)
    t_long = _chained(single, state, [probe_batch], 16)
    per_single = max(1e-9, (t_long - t_short) / 12)

    multi = make_multi()
    stacked = stack_batch(probe_batch, PROBE_K)
    state = [_copy_state(params), _copy_state(opt_state), rng]
    _chained(multi, state, [stacked], 1)                 # warmup/compile
    t_short = _chained(multi, state, [stacked], 1)
    t_long = _chained(multi, state, [stacked], 3)
    per_scan = max(1e-9, (t_long - t_short) / (2 * PROBE_K))

    overhead = per_single - per_scan
    if overhead <= TARGET_FRAC * per_scan:
        k = 1
    else:
        want = math.ceil(overhead / (TARGET_FRAC * per_scan))
        k = next((c for c in CANDIDATE_KS if c >= want), CANDIDATE_KS[-1])
    log.info(
        "autotune steps_per_dispatch: single=%.3f ms/step scan=%.3f ms/step "
        "dispatch_overhead=%.3f ms -> K=%d",
        per_single * 1e3, per_scan * 1e3, overhead * 1e3, k)
    return k
