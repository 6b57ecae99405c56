"""Int8 recall: quantile-clipped scales A/B (follow-up to
diag_int8_recall.py, which attributed 60/67 lost items to outlier-driven
max-based scales).  Runs the recall ladder across clip quantiles.
Appends JSON rows to results/int8_recall_diag.jsonl.
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
    prepare_items_int8,
    rescore_exact,
    topk_scores_streaming_int8,
    topk_scores_xla,
)

B, I, D, K = 1024, 1_000_000, 64, 10
SEG = 128


def recall(i_ex, i_got):
    a, b = np.asarray(i_ex), np.asarray(i_got)
    return float(np.mean([np.isin(a[r], b[r]).mean()
                          for r in range(a.shape[0])]))


def main():
    os.makedirs("results", exist_ok=True)
    t0 = time.time()
    rng = np.random.default_rng(0)
    q0 = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
    items = jnp.asarray(rng.normal(size=(I, D)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(I,)) * 0.1, jnp.float32)
    v_ex, i_ex = topk_scores_xla(q0, items, K, bias)
    i_ex = np.asarray(i_ex)
    print(f"exact reference {time.time()-t0:.0f}s", flush=True)

    rows = []
    for clip_q in (None, 0.999, 0.9999, 0.99):
        prep = prepare_items_int8(items, bias, q0, seg_width=SEG,
                                  clip_quantile=clip_q)
        jax.block_until_ready(prep.table)
        for extra in (0, 6, 12):
            fetch = min(K + extra, 64)
            _, ii = topk_scores_streaming_int8(q0, prep, fetch, seg_top=1)
            _, ii = rescore_exact(q0, items, bias, ii)
            r = recall(i_ex, np.asarray(ii)[:, :K])
            row = {"clip_quantile": clip_q, "overfetch": extra,
                   "recall@10": round(r, 5),
                   "q_scale": round(float(prep.q_scale), 6)}
            rows.append(row)
            print(json.dumps(row), flush=True)
    with open("results/int8_recall_diag.jsonl", "a") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
