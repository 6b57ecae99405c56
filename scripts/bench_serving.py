"""End-to-end HTTP serving load test (round-2 verdict item 4).

Measures the REAL serving path — HTTP socket -> json -> pydantic ->
ModelServer -> retrieval kernel -> response — under concurrent clients,
with request coalescing on and off: QPS, p50/p99 latency, error rate at
1/8/64 clients.  The reference only *declares* capacity
(config/config.yaml:161-187, Cloud Run 1-10 instances); this measures
ours.  Appends JSON rows to results/serving_load.jsonl.

Usage: python scripts/bench_serving.py [num_items] [requests_per_client]
"""

import json
import os
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_default_prng_impl", "rbg")
jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ncf_tpu.api.app import RecommendationAPI, serve
from ncf_tpu.models import get_model
from ncf_tpu.serving.server import ModelServer
from ncf_tpu.utils.config import Config, setup_logging

PORT = 18423


def build_server(num_items: int, coalesce: bool,
                 sequence: bool = False) -> ModelServer:
    cfg = Config()
    cfg.model.num_users = 162_541
    cfg.model.num_items = num_items
    cfg.serving.coalesce_requests = coalesce
    model = get_model("advanced_ncf")
    user_history = None
    if sequence:
        # the quality flagship's serving shape: two-stage
        # retrieve+rescore through SequenceRescoreScorer with a
        # realistic 50-item history table
        cfg.model.use_sequence = True
        cfg.model.history_len = 50
        rng = np.random.default_rng(0)
        H, U = 50, cfg.model.num_users
        user_history = rng.integers(0, num_items, (U, H)).astype(np.int32)
        lens = rng.integers(1, H + 1, U)
        user_history[np.arange(H)[None, :] >= lens[:, None]] = -1
    params = model.init(jax.random.PRNGKey(0), cfg.model)
    return ModelServer(cfg, params, user_history=user_history)


def run_load(port: int, clients: int, reqs_per_client: int, num_users: int):
    lat = []
    errs = [0]
    lock = threading.Lock()
    barrier = threading.Barrier(clients + 1)

    def client(seed):
        rng = np.random.default_rng(seed)
        url = f"http://127.0.0.1:{port}/api/v1/recommendations"
        my_lat = []
        barrier.wait()
        for _ in range(reqs_per_client):
            body = json.dumps({
                "customer_id": str(int(rng.integers(0, num_users))),
                "num_recommendations": 10}).encode()
            req = urllib.request.Request(
                url, data=body, headers={"Content-Type": "application/json"})
            t0 = time.perf_counter()
            try:
                with urllib.request.urlopen(req, timeout=60) as r:
                    r.read()
                    ok = r.status == 200
            except Exception:
                ok = False
            my_lat.append((time.perf_counter() - t0) * 1000)
            if not ok:
                with lock:
                    errs[0] += 1
        with lock:
            lat.extend(my_lat)

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(clients)]
    for t in threads:
        t.start()
    barrier.wait()
    t0 = time.perf_counter()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    lat.sort()
    n = len(lat)
    return {
        "clients": clients,
        "requests": n,
        "qps": round(n / wall, 1),
        "p50_ms": round(lat[n // 2], 2),
        "p99_ms": round(lat[min(n - 1, int(n * 0.99))], 2),
        "mean_ms": round(sum(lat) / n, 2),
        "errors": errs[0],
    }


def inprocess_budget(num_items: int, sequence: bool = False,
                     reps: int = 300) -> dict:
    """Single-request latency budget WITHOUT HTTP (round-4 verdict item
    5): how much of the ~50 ms observed single-client HTTP p50 is
    device compute vs dispatch round-trip (the axon device tunnel pays
    one RTT per dispatch on this host) vs scorer host tail vs server
    layer vs API layer vs HTTP itself.

    Stages (each the median of ``reps`` single-user requests):
      device_compute_ms   marginal cost of the retrieval kernel when
                          dispatches pipeline (t_chain(N2)-t_chain(N1))
                          / (N2-N1) — pure device time, fixed per-call
                          overhead cancelled
      kernel_call_ms      one synchronous kernel dispatch+fetch; minus
                          device_compute = per-dispatch overhead (host
                          dispatch + device tunnel RTT)
      scorer_ms           AdvancedNCFScorer.topk_for_users (adds host
                          asarray/sigmoid/bias-cache)
      server_ms           ModelServer.recommend_batch (adds locking +
                          timing wrapper)
      api_ms              RecommendationAPI.dispatch (adds pydantic
                          validation + feature enrichment + JSON-able
                          response assembly)
    The HTTP layer on top is measured by run_load (1 client) in main().
    """
    import jax.numpy as jnp

    from ncf_tpu.ops.topk import topk_scores

    server = build_server(num_items, coalesce=False, sequence=sequence)
    api = RecommendationAPI(server)
    scorer = server.scorer
    uid = np.array([7], np.int32)
    body = {"customer_id": "7", "num_recommendations": 10}

    # warm every path (compile + caches)
    st, payload = api.dispatch("POST", "/api/v1/recommendations", body)
    assert st == 200, payload
    server.recommend_batch(uid, k=10)
    scorer.topk_for_users(uid, k=10)

    def med(fn, n=reps):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return 1e3 * ts[len(ts) // 2]

    row = {"num_items": num_items, "sequence": sequence, "batch": 1,
           "k": 10, "reps": reps}
    if not sequence:
        # raw kernel handles (the scorer's own exact-path dispatch)
        q = scorer.user_query(jnp.asarray(uid))
        bias = scorer.item_bias(None)
        jax.block_until_ready((q, bias))

        def kernel_once():
            return topk_scores(q, scorer.item_vecs, 10, bias,
                               impl=scorer.impl, seg_top=scorer._seg_top)

        def chain(n):
            out = None
            for _ in range(n):
                out = kernel_once()
            jax.block_until_ready(out)

        chain(10)   # warm
        def t_of(n):
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                chain(n)
                best = min(best, time.perf_counter() - t0)
            return best

        t_short, t_long = t_of(20), t_of(120)
        row["device_compute_ms"] = round(1e3 * (t_long - t_short) / 100, 4)
        row["kernel_call_ms"] = round(
            med(lambda: jax.block_until_ready(kernel_once())), 3)
        row["dispatch_overhead_ms"] = round(
            row["kernel_call_ms"] - row["device_compute_ms"], 3)
    row["scorer_ms"] = round(med(lambda: scorer.topk_for_users(uid, k=10)), 3)
    row["server_ms"] = round(med(lambda: server.recommend_batch(uid, k=10)), 3)
    row["api_ms"] = round(med(
        lambda: api.dispatch("POST", "/api/v1/recommendations", body)), 3)
    server.close()
    return row


def main():
    setup_logging("WARNING")
    sequence = "--sequence" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    num_items = int(args[0]) if args else 62_423
    reqs = int(args[1]) if len(args) > 1 else 200
    os.makedirs("results", exist_ok=True)
    if "--inprocess" in sys.argv:
        # latency budget (no HTTP) + a 1-client HTTP row for the final
        # http-layer delta
        row = inprocess_budget(num_items, sequence=sequence)
        server = build_server(num_items, coalesce=False, sequence=sequence)
        api = RecommendationAPI(server)
        httpd = serve(api, "127.0.0.1", PORT + 7, background=True)
        try:
            run_load(PORT + 7, 1, 5, server.cfg.model.num_users)  # warm
            http = run_load(PORT + 7, 1, 100, server.cfg.model.num_users)
        finally:
            httpd.shutdown()
            server.close()
        row["http_1client_p50_ms"] = http["p50_ms"]
        row["http_layer_ms"] = round(http["p50_ms"] - row["api_ms"], 3)
        print(json.dumps(row), flush=True)
        with open("results/serving_budget.jsonl", "a") as f:
            f.write(json.dumps(row) + "\n")
        return
    rows = []
    for coalesce in (False, True):
        server = build_server(num_items, coalesce, sequence=sequence)
        api = RecommendationAPI(server)
        port = PORT + int(coalesce)
        httpd = serve(api, "127.0.0.1", port, background=True)
        try:
            # warm: compile all retrieval buckets before measuring
            run_load(port, 1, 3, server.cfg.model.num_users)
            if coalesce:
                run_load(port, 64, 2, server.cfg.model.num_users)
            for clients in (1, 8, 64):
                row = run_load(port, clients, reqs,
                               server.cfg.model.num_users)
                row.update(coalesce=coalesce, num_items=num_items,
                           sequence=sequence)
                if coalesce:
                    c = server._coalescer
                    row["avg_coalesced_batch"] = round(
                        c.batched_requests / max(1, c.batched_calls), 2)
                    row["direct_calls"] = c.direct_calls
                print(json.dumps(row), flush=True)
                rows.append(row)
        finally:
            httpd.shutdown()
            server.close()
    with open("results/serving_load.jsonl", "a") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
