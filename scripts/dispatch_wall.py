"""Dispatch-wall accounting for the flagship train step (round-4 verdict
task 3): prove — or break — the claim that the remaining gap between the
~1.35 ms measured step and its ~0.3 ms as-shipped roofline is
small-kernel scheduling overhead, with arithmetic, not hand-waving.

Three measurements, one identity:

1. **Marginal step time** (chained dispatches, real host fetch — the
   bench.py methodology).
2. **Device-busy time and kernel count per step** from a jax.profiler
   xplane capture: sum of XLA-op durations / steps, ops / step.  The
   difference ``step - busy`` is inter-kernel gap the device spends idle.
3. **Per-kernel fixed cost** measured directly on this chip: a jitted
   chain of N dependent, fusion-barred trivial kernels (128-lane bf16
   add + optimization_barrier), timed at two lengths — the marginal cost
   per kernel is the launch/scheduling floor nothing in the step can go
   below.

The wall is PROVEN if
    step_ms  ~=  busy_ms + kernels_per_step * gap_per_kernel_ms
with ``gap_per_kernel`` in the same range as the synthetic per-kernel
floor — then fewer/larger kernels is the only road left, and the
headroom equals kernels_saved * gap_per_kernel.  It is BROKEN if the
residual gap far exceeds kernels * floor (a scheduling bug, not a law).

Writes results/dispatch_wall.json and prints the table.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

import bench  # noqa: E402  (PRNG + compilation cache config)
import jax.numpy as jnp


def parse_xplane_intervals(path: str):
    """Leaf-op intervals from an .xplane.pb capture, device planes only.

    Returns (events_ps, counts, intervals) where ``intervals`` is a list
    of (start_ps, end_ps, name) for LEAF ops — the jit-module and
    while-loop wrapper events (which nest everything and would
    triple-count) are excluded.  Async DMA spans (copy-start/slice-start
    etc.) overlap compute, so busy time must be computed as the UNION of
    intervals, never the sum of durations.
    """
    import collections

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    with open(path, "rb") as f:
        space = xplane_pb2.XSpace()
        space.ParseFromString(f.read())

    events = collections.Counter()
    counts = collections.Counter()
    intervals = []
    for plane in space.planes:
        if "TPU" not in plane.name and "/device:" not in plane.name:
            continue
        meta = plane.event_metadata
        for line in plane.lines:
            if "XLA Ops" not in line.name and "xla" not in line.name.lower():
                continue
            for ev in line.events:
                name = meta[ev.metadata_id].name
                base = name.lstrip("%")
                if base.startswith(("jit_", "while", "body", "condition")):
                    continue  # wrapper events nest the real ops
                events[name] += ev.duration_ps
                counts[name] += 1
                intervals.append(
                    (ev.offset_ps, ev.offset_ps + ev.duration_ps, name))
    return events, counts, intervals


def union_ps(intervals) -> int:
    """Total length of the union of (start, end) intervals."""
    total = 0
    end_last = -1
    for s, e, _ in sorted(intervals):
        if s > end_last:
            total += e - s
            end_last = e
        elif e > end_last:
            total += e - end_last
            end_last = e
    return total


def marginal_step_ms(train_step, params, opt_state, rng, batch,
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

    best = float("inf")
    t_s, params, opt_state, rng = chain(short, params, opt_state, rng)
    t_l, params, opt_state, rng = chain(long, params, opt_state, rng)
    best = (t_l - t_s) / ((long - short) * bench.STEPS_PER_DISPATCH)
    return 1e3 * best


def capture_busy(train_step, params, opt_state, rng, batch, dispatches=2):
    """(busy_ms_per_step, kernels_per_step, histogram) from an xplane
    trace of ``dispatches`` chained dispatches."""
    import glob
    import gzip
    import tempfile

    for _ in range(2):
        params, opt_state, rng, metrics = train_step(
            params, opt_state, rng, batch)
    _ = float(metrics["loss"])

    tmp = tempfile.mkdtemp(prefix="nc_wall_")
    with jax.profiler.trace(tmp):
        for _ in range(dispatches):
            params, opt_state, rng, metrics = train_step(
                params, opt_state, rng, batch)
        _ = float(metrics["loss"])

    paths = glob.glob(os.path.join(tmp, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        for g in glob.glob(os.path.join(tmp, "**", "*.xplane.pb.gz"),
                           recursive=True):
            out = g[:-3]
            with gzip.open(g, "rb") as fin, open(out, "wb") as fout:
                fout.write(fin.read())
            paths.append(out)
    assert paths, f"no xplane capture under {tmp}"
    events, counts, intervals = parse_xplane_intervals(paths[0])
    n_steps = dispatches * bench.STEPS_PER_DISPATCH
    busy_ms = union_ps(intervals) / 1e9 / n_steps
    sum_ms = sum(events.values()) / 1e9 / n_steps
    kernels = sum(counts.values()) / n_steps
    # duration histogram (per-op-occurrence mean duration, us)
    per_occ_us = sorted(
        (events[name] / counts[name] / 1e6, counts[name] / n_steps, name)
        for name in events)
    return busy_ms, sum_ms, kernels, per_occ_us


def synthetic_kernel_floor_ms(n_short=256, n_long=2048, calls=4,
                              reps=4) -> float:
    """Marginal cost of one trivial, fusion-barred op in a straight-line
    program: the per-op fixed scheduling cost on this chip.  (TPU
    programs are statically scheduled — there is no per-kernel *launch*;
    this measures the per-op sequencing/sync floor that many small ops
    pay inside one executable.)  Chained ``calls`` amortize the tunnel
    round-trip; short/long differencing removes it entirely."""
    x0 = jnp.ones((8, 128), jnp.bfloat16)

    def make(n):
        @jax.jit
        def run(x):
            for _ in range(n):
                x = jax.lax.optimization_barrier(x + 1.0)
            return x
        return run

    import numpy as np

    def t_of(n):
        run = make(n)
        _ = np.asarray(run(x0))          # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            x = x0
            for _ in range(calls):
                x = run(x)
            _ = np.asarray(x)
            best = min(best, time.perf_counter() - t0)
        return best

    return 1e3 * (t_of(n_long) - t_of(n_short)) / (calls * (n_long - n_short))


def main():
    # the step donates params/opt_state: rebuild fresh state per phase
    train_step, params, opt_state, batch = bench.build()
    rng = jax.random.PRNGKey(0)
    step_ms = marginal_step_ms(train_step, params, opt_state, rng, batch)

    train_step, params, opt_state, batch = bench.build()
    busy_ms, sum_ms, kernels, per_occ = capture_busy(
        train_step, params, opt_state, rng, batch)
    floor_ms = synthetic_kernel_floor_ms()

    gap_ms = step_ms - busy_ms
    gap_per_kernel_us = 1e3 * gap_ms / kernels if kernels else 0.0

    # how much of the SUMMED op time is sub-3us ops (launch-bound work)
    small_busy = sum(us * cnt for us, cnt, _ in per_occ if us < 3.0) / 1e3
    out = {
        "device": str(jax.devices()[0]),
        "batch": bench.BATCH,
        "steps_per_dispatch": bench.STEPS_PER_DISPATCH,
        "step_ms": round(step_ms, 4),
        "device_busy_union_ms": round(busy_ms, 4),
        "op_time_sum_ms": round(sum_ms, 4),
        "overlap_ratio": round(sum_ms / busy_ms, 3) if busy_ms else None,
        "kernels_per_step": round(kernels, 1),
        "idle_gap_ms": round(gap_ms, 4),
        "gap_per_kernel_us": round(gap_per_kernel_us, 3),
        "synthetic_kernel_floor_us": round(1e3 * floor_ms, 3),
        "sum_in_sub3us_ops_ms": round(small_busy, 4),
    }
    print(json.dumps(out, indent=2))
    print("\n== slowest 20 ops (mean us/occurrence, occ/step) ==")
    for us, cnt, name in per_occ[-20:][::-1]:
        print(f"{us:9.3f} us  x{cnt:6.1f}  {name[:100]}")
    print("\n== arithmetic ==")
    print(f"measured step        {step_ms:8.4f} ms")
    print(f"device busy (union)  {busy_ms:8.4f} ms "
          f"({100*busy_ms/step_ms:.1f}% occupancy)")
    print(f"summed op time       {sum_ms:8.4f} ms "
          f"(overlap x{sum_ms/max(busy_ms,1e-9):.2f})")
    print(f"idle gap             {gap_ms:8.4f} ms over {kernels:.0f} kernels "
          f"= {gap_per_kernel_us:.2f} us/kernel")
    print(f"synthetic floor      {1e3*floor_ms:8.3f} us/kernel")
    os.makedirs("results", exist_ok=True)
    with open("results/dispatch_wall.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
