"""Serving request coalescing (serving/server.py::_Coalescer).

Round-2 verdict item 4: single-user requests each paid a full device
dispatch.  The coalescer micro-batches concurrent retrievals into shared
bucketed dispatches; these tests pin result-equivalence with direct
scorer calls, context grouping, error fan-out, and the off switch.
"""

import threading

import jax
import numpy as np
import pytest

from ncf_tpu.data import generate_interactions
from ncf_tpu.models import advanced_ncf
from ncf_tpu.serving.server import ModelServer, _Coalescer
from ncf_tpu.utils.config import Config


@pytest.fixture(scope="module")
def setup():
    inter = generate_interactions(num_users=120, num_items=60, num_days=30,
                                  avg_txns_per_user=12, seed=3)
    cfg = Config()
    cfg.model.num_users = inter.num_users
    cfg.model.num_items = inter.num_items
    cfg.model.num_departments = inter.num_departments
    cfg.model.num_categories = inter.num_categories
    cfg.model.mf_dim = 16
    cfg.model.mlp_dim = 16
    cfg.model.temporal_dim = 8
    cfg.model.mlp_hidden_dims = [32, 16]
    cfg.model.compute_dtype = "float32"
    params = advanced_ncf.init(jax.random.PRNGKey(0), cfg.model)
    return inter, cfg, params


def _server(inter, cfg, params, coalesce: bool) -> ModelServer:
    cfg.serving.coalesce_requests = coalesce
    return ModelServer(cfg, params, inter.item_dept, inter.item_cat)


def test_coalesced_matches_direct(setup):
    inter, cfg, params = setup
    on = _server(inter, cfg, params, True)
    off = _server(inter, cfg, params, False)
    assert on._coalescer is not None
    assert off._coalescer is None
    try:
        for uid in (0, 7, 55):
            s1, i1, _ = on.recommend(uid, k=5)
            s2, i2, _ = off.recommend(uid, k=5)
            np.testing.assert_array_equal(i1, i2)
            np.testing.assert_allclose(s1, s2, rtol=1e-6)
        # hourly path too
        s1, i1, _ = on.recommend_hourly(3, hour=8, k=5)
        s2, i2, _ = off.recommend_hourly(3, hour=8, k=5)
        np.testing.assert_array_equal(i1, i2)
    finally:
        on.close()


def test_concurrent_submits_batch_and_match(setup):
    inter, cfg, params = setup
    srv = _server(inter, cfg, params, True)
    direct = _server(inter, cfg, params, False)
    try:
        uids = list(range(32))
        results = [None] * len(uids)

        def worker(i):
            s, items, _ = srv.recommend(uids[i], k=5)
            results[i] = (s, items)

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(len(uids))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        c = srv._coalescer
        # every request was served exactly once, by the queue or by the
        # low-concurrency direct shortcut
        assert c.batched_requests + c.direct_calls == len(uids)
        # at least SOME coalescing happened (scheduling-dependent, but 32
        # threads against the dispatchers can't all arrive alone)
        assert c.batched_requests > 0
        assert c.batched_calls < c.batched_requests
        for i, uid in enumerate(uids):
            s2, i2, _ = direct.recommend(uid, k=5)
            np.testing.assert_array_equal(results[i][1], i2)
            np.testing.assert_allclose(results[i][0], s2, rtol=1e-6)
    finally:
        srv.close()


def test_groups_by_context(setup):
    """Different temporal contexts never share a scoring call."""
    inter, cfg, params = setup
    srv = _server(inter, cfg, params, True)
    direct = _server(inter, cfg, params, False)
    try:
        t1 = {"hour": 9, "day": 1, "month": 2, "day_of_year": 33}
        t2 = {"hour": 21, "day": 5, "month": 7, "day_of_year": 200}
        out = {}

        def worker(tag, ctx):
            out[tag] = srv.recommend(5, k=5, temporal=ctx)

        ths = [threading.Thread(target=worker, args=("a", t1)),
               threading.Thread(target=worker, args=("b", t2))]
        for t in ths:
            t.start()
        for t in ths:
            t.join(timeout=60)
        for tag, ctx in (("a", t1), ("b", t2)):
            s2, i2, _ = direct.recommend(5, k=5, temporal=ctx)
            np.testing.assert_array_equal(out[tag][1], i2)
    finally:
        srv.close()


def test_error_fans_out(setup):
    inter, cfg, params = setup
    srv = _server(inter, cfg, params, True)
    try:
        class Boom(Exception):
            pass

        class _BadScorer:
            def topk_for_users(self, *a, **k):
                raise Boom("scorer failure")

        srv.scorer = _BadScorer()
        with pytest.raises(Boom):
            srv.recommend(0, k=5)
    finally:
        srv.close()


def test_exclusions_bypass_coalescer(setup):
    """Exclusion requests take the direct path (per-user exclude shapes
    don't batch) and still work with the coalescer on."""
    inter, cfg, params = setup
    srv = _server(inter, cfg, params, True)
    try:
        s, items, _ = srv.recommend(0, k=5, exclude_items=[1, 2, 3])
        assert len(items) == 5
        assert not set(items.tolist()) & {1, 2, 3}
    finally:
        srv.close()


def test_bucket_padding():
    assert _Coalescer.BUCKETS == (1, 8, 64)


def test_bucket_ladder_covers_max_batch(setup):
    """coalesce_max_batch above 64 must extend the bucket ladder (round-3
    advisor low: groups with n > top bucket dispatched at raw arrival
    count, recompiling per distinct size)."""
    inter, cfg, params = setup
    srv = _server(inter, cfg, params, False)
    try:
        co = _Coalescer(srv, max_batch=300, dispatchers=1)
        try:
            assert co.buckets == (1, 8, 64, 128, 256, 300)
            assert co._bucket(70) == 128       # padded, not raw
            assert co._bucket(300) == 300
            assert co._bucket(64) == 64
        finally:
            co.close()
        co2 = _Coalescer(srv, max_batch=64, dispatchers=1)
        try:
            assert co2.buckets == (1, 8, 64)   # default unchanged
        finally:
            co2.close()
    finally:
        srv.close()
