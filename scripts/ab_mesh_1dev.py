"""1-device-mesh A/B: pjit-auto vs explicit-exchange vs unsharded
(round-4 verdict weak item 4 / task 3).

Real multi-chip ICI is unavailable here, so the exchange paths cannot be
perf-compared at N>1 — but the DEPLOYMENT layout's fixed costs can be
bounded on the one real chip: build the flagship train step (a) with no
mesh, (b) under a (1,1) ('dcn','ici') mesh with pjit-auto sharding
(tables P('ici', None) — degenerate on 1 device, but the partitioner
still runs), and (c) the same mesh with the explicit capacity-bucketed
all-to-all exchange (parallel/embedding_sharding.exchange_lookup inside
shard_map) routing every sharded-table gather.  (b)-(a) bounds the
pjit/NamedSharding overhead; (c)-(b) bounds the shard_map + bucketing
schedule overhead the explicit path pays per step BEFORE any collective
is needed — the fixed tax the deployment layout carries onto real pods.

Marginal-cost timing (BENCH_NOTES "Measurement discipline"): chained
dispatches ending in a real host fetch, short/long differencing.

Appends one JSON row per variant to results/ab_mesh_1dev.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

import bench  # noqa: E402  (configures PRNG + compilation cache)
import jax.numpy as jnp

STEPS_PER_DISPATCH = bench.STEPS_PER_DISPATCH


def place_for_mesh(mesh, params, opt_state, batch):
    """Shard params/opt-state/batch exactly as the Trainer does for the
    flagship under a mesh (trainer.py:148-225): tables P('ici', None),
    dense replicated, batch P(('dcn','ici')) with the [K, B] stacked
    layout of the multi-step dispatch."""
    from ncf_tpu.parallel import (param_shardings, replicated, shard_pytree,
                                  stacked_batch_sharding, state_shardings)

    p_sh = param_shardings(params, mesh, True)
    params = shard_pytree(params, p_sh)
    opt_state = shard_pytree(
        opt_state, state_shardings(opt_state, mesh, True))
    bs = stacked_batch_sharding(mesh)
    batch = {k: jax.device_put(v, bs) for k, v in batch.items()}
    rng = jax.device_put(jax.random.PRNGKey(0), replicated(mesh))
    return params, opt_state, batch, rng, p_sh


def timed_step_ms(train_step, params, opt_state, rng, batch,
                  short=4, long=32) -> float:
    for _ in range(2):
        params, opt_state, rng, metrics = train_step(
            params, opt_state, rng, batch)
    _ = float(metrics["loss"])

    def chain(n, params, opt_state, rng):
        t0 = time.perf_counter()
        for _ in range(n):
            params, opt_state, rng, metrics = train_step(
                params, opt_state, rng, batch)
        _ = float(metrics["loss"])
        return time.perf_counter() - t0, params, opt_state, rng

    t_s, params, opt_state, rng = chain(short, params, opt_state, rng)
    t_l, params, opt_state, rng = chain(long, params, opt_state, rng)
    return 1e3 * (t_l - t_s) / ((long - short) * STEPS_PER_DISPATCH)


def main():
    from ncf_tpu.ops import embedding as embedding_ops
    from ncf_tpu.parallel.mesh import make_mesh

    rows = []

    # ---- (a) unsharded (the bench headline wiring)
    embedding_ops.clear_exchange()
    train_step, params, opt_state, batch = bench.build()
    rng = jax.random.PRNGKey(0)
    ms = timed_step_ms(train_step, params, opt_state, rng, batch)
    rows.append({"variant": "unsharded", "step_ms": round(ms, 4)})
    print(json.dumps(rows[-1]), flush=True)

    # ---- (b) (1,1) mesh, pjit-auto collectives
    mesh = make_mesh(dcn=1, ici=1)
    train_step, params, opt_state, batch = bench.build()
    params, opt_state, batch, rng, p_sh = place_for_mesh(
        mesh, params, opt_state, batch)
    ms = timed_step_ms(train_step, params, opt_state, rng, batch)
    rows.append({"variant": "mesh_pjit", "step_ms": round(ms, 4)})
    print(json.dumps(rows[-1]), flush=True)

    # ---- (c) (1,1) mesh, explicit all-to-all exchange on every
    # row-sharded table (and its vocab-precomputed derived tables —
    # same row counts, exactly how the Trainer registers it)
    train_step, params, opt_state, batch = bench.build()
    params, opt_state, batch, rng, p_sh = place_for_mesh(
        mesh, params, opt_state, batch)
    # param_spec replicates tables when ici == 1 (nothing to shard), so
    # force-register the raw table row counts: every gather of the
    # tables AND their vocab-precomputed derived tables (same row
    # counts) then runs the full shard_map bucketing/all-to-all schedule
    # degenerately on one device — the fixed per-step tax the explicit
    # path would pay on a pod, minus the actual collectives
    sharded_rows = {params["user_emb"].shape[0],
                    params["item_emb"].shape[0]}
    embedding_ops.set_exchange(mesh, sharded_rows, 0.0)
    try:
        ms = timed_step_ms(train_step, params, opt_state, rng, batch)
    finally:
        embedding_ops.clear_exchange()
    rows.append({"variant": "mesh_explicit_exchange",
                 "step_ms": round(ms, 4),
                 "exchange_rows": sorted(sharded_rows)})
    print(json.dumps(rows[-1]), flush=True)

    base = rows[0]["step_ms"]
    summary = {
        "batch": bench.BATCH,
        "steps_per_dispatch": STEPS_PER_DISPATCH,
        "device": str(jax.devices()[0]),
        "unsharded_ms": base,
        "mesh_pjit_ms": rows[1]["step_ms"],
        "mesh_explicit_ms": rows[2]["step_ms"],
        "pjit_overhead_ms": round(rows[1]["step_ms"] - base, 4),
        "explicit_overhead_ms": round(rows[2]["step_ms"] - base, 4),
    }
    print(json.dumps(summary), flush=True)
    os.makedirs("results", exist_ok=True)
    with open("results/ab_mesh_1dev.jsonl", "a") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")
        f.write(json.dumps(summary) + "\n")


if __name__ == "__main__":
    main()
