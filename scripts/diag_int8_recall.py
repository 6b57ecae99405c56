"""Int8 recall-ceiling diagnosis (round-2 verdict item 6).

Observed: the 'int8' preset's recall@10 saturates at 0.99336 regardless
of over-fetch (+6 and +10/+16/+20 identical).  Hypothesis tested here:
the ceiling is NOT rank displacement in the global merge (which
over-fetch would recover) but SEGMENT-STAGE loss — the int8 presets run
``seg_top=1``, so only the int8-argmax of each ``seg_width``-item
segment survives a block pass; when quantization noise reorders items
within a segment, the true top-10 item never exits the kernel at all.

Experiments:
  A. recall vs over-fetch at seg_top=1 (expect a plateau — confirms
     displacement is not the cause);
  B. seg_top=2 at the same scales (keeps the 2 best per segment: a true
     item survives unless TWO same-segment items out-quantize it);
  C. loss attribution: for each lost item under seg_top=1, check whether
     a same-segment item carried a >= int8 score (segment-stage loss) or
     not (global displacement);
  D. timing of the winning configuration.

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
    print(f"data built {time.time()-t0:.0f}s", flush=True)
    v_ex, i_ex = topk_scores_xla(q0, items, K, bias)
    i_ex = np.asarray(i_ex)
    print(f"exact reference {time.time()-t0:.0f}s", flush=True)

    prep = prepare_items_int8(items, bias, q0, seg_width=SEG)
    jax.block_until_ready(prep.table)
    print(f"prepared {time.time()-t0:.0f}s", flush=True)
    rows = []

    def run(fetch_extra, seg_top):
        fetch = min(K + fetch_extra, 64)
        _, ii = topk_scores_streaming_int8(q0, prep, fetch, seg_top=seg_top)
        _, ii = rescore_exact(q0, items, bias, ii)
        r = recall(i_ex, np.asarray(ii)[:, :K])
        row = {"seg_top": seg_top, "overfetch": fetch_extra,
               "recall@10": round(r, 5)}
        rows.append(row)
        print(json.dumps(row), flush=True)
        return np.asarray(ii)

    # A: over-fetch ladder at seg_top=1
    for extra in (0, 6, 12, 22, 54):
        got1 = run(extra, 1)
    # B: seg_top=2
    for extra in (0, 6):
        got2 = run(extra, 2)

    # C: attribute seg_top=1 losses at the deepest over-fetch
    int8_t = np.asarray(prep.table[:I, :D], np.int32)     # quantized items
    d = D
    digits = np.asarray(prep.table[:I, d:d + 3], np.int32)
    b_int = 127 * digits[:, 0] + 127 * digits[:, 1] + digits[:, 2]
    col_scale = np.asarray(prep.col_scale)
    q_scale = float(prep.q_scale)
    q_int = np.clip(np.round(np.asarray(q0) * col_scale[None, :] / q_scale),
                    -127, 127).astype(np.int32)
    seg_loss = disp_loss = total_loss = 0
    for r in range(B):
        lost = set(i_ex[r]) - set(got1[r, :K])
        for item in lost:
            total_loss += 1
            acc_item = int(q_int[r] @ int8_t[item] + b_int[item])
            seg_lo = (item // SEG) * SEG
            seg_items = np.arange(seg_lo, min(seg_lo + SEG, I))
            accs = q_int[r] @ int8_t[seg_items].T + b_int[seg_items]
            stronger = int((accs > acc_item).sum())
            if stronger >= 1:
                seg_loss += 1
            else:
                disp_loss += 1
    attrib = {"total_lost": total_loss,
              "segment_stage_losses": seg_loss,
              "displacement_losses": disp_loss}
    print(json.dumps(attrib), flush=True)
    rows.append(attrib)

    # D: timing of the winning config (chained scan, marginal cost)
    def timed(seg_top, fetch, n=20):
        @jax.jit
        def runn(q, prep):
            def body(qq, _):
                v, ii = topk_scores_streaming_int8(
                    qq, prep, fetch, seg_top=seg_top)
                vv, _i2 = rescore_exact(qq, items, bias, ii)
                return q0 + vv[0, 0] * 1e-30, ()
            qf, _ = jax.lax.scan(body, q, None, length=n)
            return qf
        out = runn(q0, prep)
        np.asarray(out)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            np.asarray(runn(q0, prep))
            best = min(best, time.perf_counter() - t0)
        return best / n

    for seg_top, extra in ((1, 6), (2, 6), (2, 0)):
        dt = timed(seg_top, min(K + extra, 64))
        row = {"timing_seg_top": seg_top, "overfetch": extra,
               "ms_per_1024_users": round(dt * 1e3, 3),
               "users_per_s": round(B / dt, 1)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    with open("results/int8_recall_diag.jsonl", "a") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
