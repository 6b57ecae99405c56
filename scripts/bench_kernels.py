"""Kernel microbenchmarks with HBM/MXU roofline comparison
(SURVEY.md §7 PR3: each kernel ships with a roofline microbenchmark).

Run on real TPU:  python scripts/bench_kernels.py

TIMING METHODOLOGY: the axon TPU tunnel overlaps *independent* dispatches,
so naive loop-and-block timing under-reports massively (a 131-GFLOP matmul
"measured" 0.08 ms).  Every benchmark here chains a scalar from each
call's output into the next call's input to force sequential execution.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# TPU v5e (lite): ~197 bf16 TFLOP/s, ~819 GB/s HBM
PEAK_FLOPS = 197e12
PEAK_HBM = 819e9


def chained_time(make_call, q0, n=10, warmup=3):
    """Time f while forcing call k+1 to depend on call k's output."""
    q = q0
    out = None
    for _ in range(warmup):
        out = make_call(q)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = make_call(q)
        lead = jax.tree_util.tree_leaves(out)[0]
        q = q0 + (lead.reshape(-1)[0].astype(jnp.float32) * 1e-30).astype(q0.dtype)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def bench_topk():
    from ncf_tpu.ops.topk import (
        topk_scores_dense, topk_scores_segmented, topk_scores_streaming,
        topk_scores_xla)

    print("== streaming top-k (Q @ T^T + bias -> top-10), chained timing ==")
    for B, I, D in [(256, 100_000, 64), (1024, 1_000_000, 64),
                    (1024, 10_000_000, 64)]:
        rng = np.random.default_rng(0)
        q0 = jnp.asarray(rng.normal(size=(B, D)), jnp.bfloat16)
        t = jnp.asarray(rng.normal(size=(I, D)), jnp.bfloat16)
        bias = jnp.asarray(rng.normal(size=(I,)), jnp.float32)

        flops = 2 * B * I * D
        stream_bytes = I * D * 2 + B * D * 2 + I * 4
        roofline = max(flops / PEAK_FLOPS, stream_bytes / PEAK_HBM)

        t_seg = chained_time(
            lambda q: topk_scores_streaming(q, t, 10, bias), q0)

        if B * I * 4 <= 2**30:
            t_dense = chained_time(
                lambda q: topk_scores_dense(q, t, 10, bias), q0)
            dense_s = f"{t_dense*1e3:8.3f}ms"
            vx, ix = topk_scores_dense(q0, t, 10, bias)
            vs, iseg = topk_scores_streaming(q0, t, 10, bias)
            recall = float(np.mean([
                np.isin(np.asarray(iseg)[r], np.asarray(ix)[r]).mean()
                for r in range(min(64, B))]))
        else:
            dense_s = "     OOM"
            recall = float("nan")

        qps = B / t_seg
        print(f"B={B:5d} I={I:8d}: dense_exact={dense_s} "
              f"streaming={t_seg*1e3:8.3f}ms "
              f"(eff={roofline/t_seg*100:5.1f}% of roofline, "
              f"recall={recall:.4f}, {qps:,.0f} users/s/chip)")


def bench_embedding():
    print("== embedding gather / scatter-add (I=1M, D=64, N=81920), chained ==")
    rng = np.random.default_rng(0)
    I, D, N = 1_000_000, 64, 81920
    table0 = jnp.asarray(rng.normal(size=(I, D)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, I, N), jnp.int32)
    g = jnp.ones((N, D), jnp.float32)

    fwd = jax.jit(lambda t: jnp.take(t, ids, axis=0))
    t_fwd = chained_time(lambda t: fwd(t), table0)
    bytes_fwd = N * D * 4 * 2
    print(f"xla gather:   {t_fwd*1e3:7.3f}ms "
          f"({bytes_fwd/t_fwd/1e9:6.1f} GB/s effective)")

    bwd = jax.jit(jax.grad(lambda t: (jnp.take(t, ids, axis=0) * g).sum()))
    t_bwd = chained_time(lambda t: bwd(t), table0)
    print(f"xla scatter:  {t_bwd*1e3:7.3f}ms")

    try:
        from ncf_tpu.ops.pallas_embedding import pallas_embedding_lookup
        f2 = jax.jit(lambda t: pallas_embedding_lookup(t, ids))
        t_p = chained_time(lambda t: f2(t), table0)
        print(f"pallas gather:{t_p*1e3:7.3f}ms "
              f"({bytes_fwd/t_p/1e9:6.1f} GB/s effective)")
    except ImportError:
        pass


if __name__ == "__main__":
    print("device:", jax.devices()[0])
    bench_topk()
    bench_embedding()
