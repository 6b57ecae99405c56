"""Row-issue-rate probe for big tables (round-5 follow-up to the
sparse-step roofline): the 9M x 3M sparse step measures ~172 ns per
touched row where the same kernels on ML-1M tables run at ~1.7 ns/row.
This isolates the pure gather and scatter rates vs table size, so the
"row-issue bound, not bytes bound" claim in BENCH_NOTES is a measured
curve, not an inference.

Method: jnp.take of N step-realistic random rows from a [R, 128] f32
table (and the XLA .at[].add scatter used by the sparse path's
segment-summed update), scan-marginal timing (see bench_step_floors).

Writes results/bigtable_rows.json.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_default_prng_impl", "rbg")
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import time

import jax.numpy as jnp
import numpy as np

D = 128
N = 98_304          # touched rows/step of the 16384-batch sparse step


def _marginal_us(make, args, n_short=4, n_long=24, reps=4):
    """Big operands must be jit ARGUMENTS (closed-over arrays embed as
    HLO constants and blow the remote-compile tunnel's request limit)."""
    def t_of(nn):
        run = make(nn)
        _ = np.asarray(run(*args))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            _ = np.asarray(run(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    return 1e6 * (t_of(n_long) - t_of(n_short)) / (n_long - n_short)


def main():
    rng = np.random.default_rng(0)
    out = {"rows_per_call": N, "row_dim": D}
    for R in (3_706, 100_000, 1_000_000, 3_000_000, 9_000_000):
        table = jnp.asarray(rng.normal(size=(R, D)), jnp.float32)
        ids = jnp.asarray(rng.integers(0, R, N), jnp.int32)
        g = jnp.asarray(rng.normal(size=(N, D)), jnp.float32)

        def make_gather(nn):
            @jax.jit
            def run(table, ids):
                def step(c, _):
                    rows = jnp.take(table, ids + c, axis=0)
                    c2 = (rows[0, 0] * 1e-30).astype(jnp.int32)
                    return c2, ()
                c, _ = jax.lax.scan(
                    step, jnp.zeros((), jnp.int32), None, length=nn)
                return c
            return run

        us = _marginal_us(make_gather, (table, ids))
        key = f"R{R}"
        out[key] = {"gather_us": round(us, 1),
                    "gather_ns_per_row": round(1e3 * us / N, 2)}

        # scatter: the TABLE is the scan carry so XLA updates in place
        def make_scatter(nn):
            @jax.jit
            def run(tab, ids, g):
                def step(tab, _):
                    return tab.at[ids].add(g), ()
                tab, _ = jax.lax.scan(step, tab, None, length=nn)
                return tab[0, 0]
            return run

        us_s = _marginal_us(make_scatter, (table, ids, g))
        out[key]["xla_scatter_us"] = round(us_s, 1)
        out[key]["xla_scatter_ns_per_row"] = round(1e3 * us_s / N, 2)
        # free the 4.6 GB table before the next size
        del table
        print(key, json.dumps(out[key]), flush=True)

    res_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "results")
    os.makedirs(res_dir, exist_ok=True)
    with open(os.path.join(res_dir, "bigtable_rows.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
