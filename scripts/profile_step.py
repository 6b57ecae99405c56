"""Capture a jax.profiler trace of the headline train step and print
per-op device time, aggregated by op category — the measurement behind
BENCH_NOTES.md's optimization history.

Usage: python scripts/profile_step.py [--steps-per-dispatch K]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_default_prng_impl", "rbg")
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def parse_xplane(path: str):
    """Extract (name, total_duration_ps, occurrences) per XLA op from an
    .xplane.pb capture, device planes only."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    with open(path, "rb") as f:
        space = xplane_pb2.XSpace()
        space.ParseFromString(f.read())

    events = collections.Counter()
    counts = collections.Counter()
    for plane in space.planes:
        if "TPU" not in plane.name and "/device:" not in plane.name:
            continue
        # XLA op lines only (skip steps/scopes)
        meta = plane.event_metadata
        for line in plane.lines:
            if "XLA Ops" not in line.name and "xla" not in line.name.lower():
                continue
            for ev in line.events:
                name = meta[ev.metadata_id].name
                events[name] += ev.duration_ps
                counts[name] += 1
    return events, counts


def categorize(name: str) -> str:
    n = name.lower()
    if "pallas" in n or "custom-call" in n:
        return "pallas/custom-call"
    if n.startswith("fusion") or ".fusion" in n:
        return "fusion (misc)"
    for k in ("convolution", "dot", "cumsum", "scatter", "gather", "sort",
              "reduce", "copy", "transpose", "rng", "all-reduce",
              "all-to-all", "dynamic-slice", "dynamic-update"):
        if k in n:
            return k
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps-per-dispatch", type=int, default=8)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--use-sequence", action="store_true")
    ap.add_argument("--candidate-mode", default="joint",
                    choices=["joint", "independent"])
    args = ap.parse_args()

    import bench

    overrides = {"candidate_mode": args.candidate_mode}
    if args.use_sequence:
        overrides["use_sequence"] = True
    train_step, params, opt_state, batch = bench.build(
        args.steps_per_dispatch, **overrides)
    rng = jax.random.PRNGKey(0)

    for _ in range(3):
        params, opt_state, rng, metrics = train_step(
            params, opt_state, rng, batch)
    jax.block_until_ready(metrics["loss"])

    tmp = tempfile.mkdtemp(prefix="nc_prof_")
    with jax.profiler.trace(tmp):
        for _ in range(2):
            params, opt_state, rng, metrics = train_step(
                params, opt_state, rng, batch)
        jax.block_until_ready(metrics["loss"])

    # find the xplane file
    paths = glob.glob(os.path.join(tmp, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        gz = glob.glob(os.path.join(tmp, "**", "*.xplane.pb.gz"),
                       recursive=True)
        for g in gz:
            out = g[:-3]
            with gzip.open(g, "rb") as fin, open(out, "wb") as fout:
                fout.write(fin.read())
            paths.append(out)
    assert paths, f"no xplane capture under {tmp}"

    events, counts = parse_xplane(paths[0])
    total_ps = sum(events.values())
    n_steps = 2 * args.steps_per_dispatch
    print(f"capture: {paths[0]}")
    print(f"total device time: {total_ps/1e9:.3f} ms over {n_steps} steps "
          f"=> {total_ps/1e9/n_steps:.3f} ms/step\n")

    cats = collections.Counter()
    for name, ps in events.items():
        cats[categorize(name)] += ps
    print("== by category ==")
    for cat, ps in cats.most_common():
        print(f"{ps/1e9/n_steps:8.4f} ms/step  {100*ps/total_ps:5.1f}%  {cat}")

    print(f"\n== top {args.top} ops ==")
    for name, ps in events.most_common(args.top):
        print(f"{ps/1e9/n_steps:8.4f} ms/step  {100*ps/total_ps:5.1f}%  "
              f"x{counts[name]//n_steps:<4d} {name[:110]}")


if __name__ == "__main__":
    main()
