"""10M-item retrieval proof (round-2 verdict item 5).

BENCH_NOTES' headline claims the streaming kernel "scales to 10M items
where [B, I] scores cannot exist" — this runs the full tier ladder at
I=10M on the real chip and records ms/1024-users, users/s, recall vs the
exact blocked-XLA reference, and per-tier HBM table bytes.  Appends JSON
rows to results/topk_10m.jsonl.

Usage: python scripts/bench_topk_10m.py [num_items]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_default_prng_impl", "rbg")
jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ncf_tpu.ops.topk import (
    prepare_items,
    prepare_items_int8,
    rescore_exact,
    topk_scores,
    topk_scores_xla,
)

B, D, K = 1024, 64, 10


def chained_time(make_call, q0, *operands, n=5):
    """Marginal per-iteration cost of a chained lax.scan ended by a REAL
    host fetch.  Host-loop chaining with block_until_ready is NOT valid
    under the axon tunnel (early ACK before the device drains — it
    measured the seg_top=2 tier 8.8x slower than reality here); this is
    the bench.py methodology.  ``operands`` ride as jit arguments so
    multi-GB tables do not become graph constants."""
    def make(nn):
        @jax.jit
        def run(q0, *ops):
            def body(q, _):
                out = make_call(q, *ops)
                lead = jax.tree_util.tree_leaves(out)[0]
                bump = (lead.reshape(-1)[0].astype(jnp.float32)
                        * 1e-30).astype(q0.dtype)
                return q0 + bump, ()
            q, _ = jax.lax.scan(body, q0, None, length=nn)
            return q
        return run

    def timed(nn):
        run = make(nn)
        np.asarray(run(q0, *operands))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            np.asarray(run(q0, *operands))
            best = min(best, time.perf_counter() - t0)
        return best

    t_s, t_l = timed(n), timed(4 * n)
    return (t_l - t_s) / (3 * n)


def recall_vs(idx_exact, idx_got):
    a, b = np.asarray(idx_exact), np.asarray(idx_got)
    return float(np.mean([np.isin(b[r], a[r]).mean()
                          for r in range(a.shape[0])]))


def main():
    num_items = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    os.makedirs("results", exist_ok=True)
    rng = np.random.default_rng(0)
    q0 = jnp.asarray(rng.normal(size=(B, D)), jnp.bfloat16)
    items = jnp.asarray(rng.normal(size=(num_items, D)), jnp.bfloat16)
    bias = jnp.asarray(rng.normal(size=(num_items,)) * 0.1, jnp.float32)

    # exact reference ranking (blocked XLA — never materializes [B, I])
    v_ex, i_ex = topk_scores_xla(q0, items, K, bias)
    i_ex = np.asarray(i_ex)

    rows = []

    def record(tier, t_s, idxs, table_bytes):
        row = {
            "tier": tier, "num_items": num_items, "B": B, "k": K,
            "ms_per_1024_users": round(t_s * 1e3, 3),
            "users_per_s": round(B / t_s, 1),
            "recall@10": round(recall_vs(i_ex, idxs), 5),
            "table_gb": round(table_bytes / 2**30, 3),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    # bf16 exact streaming (prepared)
    prep = prepare_items(items, bias)
    print(f"prepared: block_items={prep.block_items} "
          f"seg_width={prep.seg_width}", flush=True)
    t = chained_time(lambda q, p: topk_scores(q, p, K), q0, prep)
    _, idxs = topk_scores(q0, prep, K)
    record("bf16_exact", t, idxs, num_items * D * 2 + num_items * 4)

    # bf16 fast ('fast' preset shape: seg 64, seg_top=1)
    prep64 = prepare_items(items, bias, seg_width=64)
    t = chained_time(lambda q, p: topk_scores(q, p, K, seg_top=1),
                     q0, prep64)
    _, idxs = topk_scores(q0, prep64, K, seg_top=1)
    record("bf16_fast", t, idxs, num_items * D * 2 + num_items * 4)
    del prep, prep64

    # int8 with exact rescore (the 'int8' preset: over-fetch +6, rescore)
    prep8 = prepare_items_int8(items, bias, q0, seg_width=128)
    fetch = K + 6

    def int8_rescore(q, p8, it, bi):
        _, ii = topk_scores(q, p8, fetch)
        vv, ii = rescore_exact(q, it, bi, ii)
        return vv[:, :K], ii[:, :K]

    t = chained_time(int8_rescore, q0, prep8, items, bias)
    _, idxs = int8_rescore(q0, prep8, items, bias)
    record("int8_rescored", t, idxs, num_items * D + num_items * 8)

    # int8-fast (dequantized scores, no rescore)
    t = chained_time(lambda q, p8: topk_scores(q, p8, K), q0, prep8)
    _, idxs = topk_scores(q0, prep8, K)
    record("int8_fast", t, idxs, num_items * D + num_items * 8)

    with open("results/topk_10m.jsonl", "a") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
