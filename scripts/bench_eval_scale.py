"""Eval-path scaling benchmark: host loop vs DeviceEvaluator on TPU.

Round-2 verdict item 3 done-criterion.  Measured on TPU v5e (2026-08-21):
  host loop (warm):  0.07 ms/user  -> 11 s @ 162k users, 66 s @ 1M
  device scan warm:  0.35 s @ 162k (31x), 2.23 s @ 1M users (30x)
  metrics match exactly on the shared slice (hr@10 0.09924 both paths).
Usage: python scripts/bench_eval_scale.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax
jax.config.update("jax_default_prng_impl", "rbg")
jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ncf_tpu.evals.evaluate import DeviceEvaluator, EvalSet, evaluate, make_score_fn
from ncf_tpu.models import get_model
from ncf_tpu.utils.config import Config

ITEMS = 62423
model = get_model("advanced_ncf")

def build(nusers):
    cfg = Config()
    cfg.model.num_users = nusers
    cfg.model.num_items = ITEMS
    params = model.init(jax.random.PRNGKey(0), cfg.model)
    rng = np.random.default_rng(0)
    users = np.arange(nusers, dtype=np.int32)
    cands = rng.integers(0, ITEMS, size=(nusers, 101), dtype=np.int32)
    return cfg, params, EvalSet(users=users, candidates=cands, temporal=None)

# ---- host loop on an 8192-user slice (extrapolate)
cfg, params, es = build(162_541)
es_slice = EvalSet(users=es.users[:8192], candidates=es.candidates[:8192],
                   temporal=None)
score_fn = make_score_fn(model, params, cfg.model)
evaluate(score_fn, EvalSet(users=es.users[:512], candidates=es.candidates[:512], temporal=None), batch_size=512)  # warm compile
t0 = time.time()
h = evaluate(score_fn, es_slice, batch_size=512)
t_host_slice = time.time() - t0
per_user = t_host_slice / 8192
print(f"host loop: {t_host_slice:.1f}s for 8192 users "
      f"({per_user*1e3:.2f} ms/user) -> est {per_user*162_541:.0f}s @162k, "
      f"{per_user*1e6:.0f}s @1M", flush=True)

# ---- device scan at 162k and 1M
for nusers in (162_541, 1_000_000):
    cfg, params, es = build(nusers)
    dev = DeviceEvaluator(model, cfg.model, es, batch_size=2048)
    t0 = time.time(); r1 = dev(params); t_cold = time.time() - t0
    t0 = time.time(); r2 = dev(params); t_warm = time.time() - t0
    est_host = per_user * nusers
    print(f"device scan @{nusers:,}: cold={t_cold:.1f}s warm={t_warm:.2f}s "
          f"(est host {est_host:.0f}s -> {est_host/t_warm:.0f}x) "
          f"hr@10={r2['hr@10']:.4f}", flush=True)
    if nusers == 162_541:
        # equivalence vs host on the slice
        dslice = DeviceEvaluator(model, cfg.model, es_slice, batch_size=512)
        d = dslice(params)
        print(f"  slice hr@10 host={h['hr@10']:.5f} device={d['hr@10']:.5f}",
              flush=True)
