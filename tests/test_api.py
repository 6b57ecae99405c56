"""API tests — with actual assertions, over a live socket.

The reference's API tests post to TestClient and merely log the response
with zero assertions (reference: src/api/tests/test_routes.py:8-26) and
cannot even import (phantom modules, §2.9.1).  These run the real stdlib
server on an ephemeral port and assert the full JSON contract.
"""

import json
import urllib.error
import urllib.request

import jax
import pytest

from ncf_tpu.api import RecommendationAPI, serve
from ncf_tpu.data.synthetic import generate_interactions
from ncf_tpu.models import advanced_ncf
from ncf_tpu.serving import FeatureProcessor, FeatureStore, ModelServer
from ncf_tpu.utils.config import Config


@pytest.fixture(scope="module")
def live_api():
    inter = generate_interactions(num_users=80, num_items=40, num_days=20,
                                  avg_txns_per_user=10, seed=5)
    cfg = Config()
    cfg.model.num_users = inter.num_users
    cfg.model.num_items = inter.num_items
    cfg.model.num_departments = inter.num_departments
    cfg.model.num_categories = inter.num_categories
    cfg.model.mf_dim = 8
    cfg.model.mlp_dim = 8
    cfg.model.temporal_dim = 4
    cfg.model.mlp_hidden_dims = [16, 8]
    cfg.model.compute_dtype = "float32"
    params = advanced_ncf.init(jax.random.PRNGKey(0), cfg.model)
    server = ModelServer(cfg, params, inter.item_dept, inter.item_cat)
    processor = FeatureProcessor(FeatureStore(inter))
    api = RecommendationAPI(server, processor)
    httpd = serve(api, host="127.0.0.1", port=0, background=True)
    port = httpd.server_address[1]
    yield f"http://127.0.0.1:{port}", api
    httpd.shutdown()


def _request(url, method="GET", body=None):
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(
        url, data=data, method=method,
        headers={"Content-Type": "application/json"} if data else {})
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:
            return resp.status, json.loads(resp.read()), dict(resp.headers)
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read()), dict(e.headers)


class TestRoutes:
    def test_health(self, live_api):
        base, _ = live_api
        status, body, headers = _request(f"{base}/health")
        assert status == 200
        assert body["status"] == "healthy"
        assert "model_version" in body
        # CacheControlMiddleware behavior
        assert "no-store" in headers.get("Cache-Control", "")

    def test_recommendations(self, live_api):
        base, _ = live_api
        status, body, _ = _request(
            f"{base}/api/v1/recommendations", "POST",
            {"customer_id": "7", "num_recommendations": 5})
        assert status == 200
        assert body["customer_id"] == "7"
        recs = body["recommendations"]
        assert len(recs) == 5
        assert [r["rank"] for r in recs] == [1, 2, 3, 4, 5]
        assert all(0.0 <= r["score"] <= 1.0 for r in recs)
        # descending scores
        scores = [r["score"] for r in recs]
        assert scores == sorted(scores, reverse=True)
        assert recs[0]["metadata"]["department"] is not None
        assert recs[0]["explanation"]
        assert body["inference_time_ms"] > 0

    def test_recommendations_with_context_and_exclusion(self, live_api):
        base, _ = live_api
        status, body, _ = _request(
            f"{base}/api/v1/recommendations", "POST",
            {"customer_id": "3", "num_recommendations": 4,
             "context": {"hour": 8, "day": 1, "month": 3, "day_of_year": 70},
             "exclude_purchased": True})
        assert status == 200
        assert len(body["recommendations"]) == 4

    def test_batch(self, live_api):
        base, _ = live_api
        status, body, _ = _request(
            f"{base}/api/v1/recommendations/batch", "POST",
            {"customer_ids": ["1", "2", "3"], "num_recommendations": 3})
        assert status == 200
        assert len(body["results"]) == 3
        assert body["total_time_ms"] > 0
        for res in body["results"]:
            assert len(res["recommendations"]) == 3

    def test_metrics_endpoint(self, live_api):
        base, _ = live_api
        _request(f"{base}/health")
        status, body, _ = _request(f"{base}/metrics")
        assert status == 200
        assert body["count"] >= 1
        assert "cache_hit_rate" in body
        assert "latency_ms_p50" in body

    def test_index_refresh(self, live_api):
        base, _ = live_api
        status, body, _ = _request(
            f"{base}/api/v1/index/refresh", "POST", {})
        assert status == 200
        assert body["status"] in ("refreshed", "reloaded")


class TestErrorHandling:
    def test_unknown_route_404(self, live_api):
        base, _ = live_api
        status, body, _ = _request(f"{base}/nope")
        assert status == 404

    def test_validation_error_422(self, live_api):
        base, _ = live_api
        status, body, _ = _request(
            f"{base}/api/v1/recommendations", "POST",
            {"num_recommendations": 5})  # missing customer_id
        assert status == 422
        assert body["error"] == "validation error"

    def test_unknown_customer_404(self, live_api):
        base, _ = live_api
        status, body, _ = _request(
            f"{base}/api/v1/recommendations", "POST",
            {"customer_id": "99999"})
        assert status == 404

    def test_bad_json_400(self, live_api):
        base, _ = live_api
        req = urllib.request.Request(
            f"{base}/api/v1/recommendations", data=b"{not json",
            method="POST", headers={"Content-Type": "application/json"})
        try:
            with urllib.request.urlopen(req, timeout=30) as resp:
                status = resp.status
        except urllib.error.HTTPError as e:
            status = e.code
        assert status == 400

    def test_batch_limit_101(self, live_api):
        base, _ = live_api
        status, _, _ = _request(
            f"{base}/api/v1/recommendations/batch", "POST",
            {"customer_ids": [str(i) for i in range(101)]})
        assert status == 422  # max 100 (models.py DTO)


class TestDemoSurface:
    def test_intelligence_endpoint(self, live_api):
        base, _ = live_api
        status, body, _ = _request(
            f"{base}/api/v1/intelligence", "POST",
            {"customer_id": "3", "num_recommendations": 5})
        assert status == 200
        assert len(body["recommendations"]) == 5
        assert body["recommendations"][0]["rank"] == 1
        intel = body["intelligence"]
        assert len(intel["attention_head_importance"]) == 4
        assert len(intel["confidence"]["counts"]) == 10
        ci = intel["component_importance"]
        assert abs(ci["mf"] + ci["mlp"] - 1.0) < 1e-6
        assert len(intel["normalized_scores"]) == 5

    def test_intelligence_hourly(self, live_api):
        base, _ = live_api
        s9, b9, _ = _request(
            f"{base}/api/v1/intelligence", "POST",
            {"customer_id": "3", "num_recommendations": 5, "hour": 9})
        s17, b17, _ = _request(
            f"{base}/api/v1/intelligence", "POST",
            {"customer_id": "3", "num_recommendations": 5, "hour": 17})
        assert s9 == 200 and s17 == 200
        assert b9["hour"] == 9 and b17["hour"] == 17
        # the hour modulation must actually change the scoring
        assert (b9["recommendations"] != b17["recommendations"]
                or b9["intelligence"]["normalized_scores"]
                != b17["intelligence"]["normalized_scores"])

    def test_intelligence_validation(self, live_api):
        base, _ = live_api
        status, body, _ = _request(
            f"{base}/api/v1/intelligence", "POST",
            {"customer_id": "3", "hour": 99})
        assert status == 422

    def test_demo_page_served(self, live_api):
        base, _ = live_api
        req = urllib.request.Request(f"{base}/demo")
        with urllib.request.urlopen(req, timeout=30) as resp:
            assert resp.status == 200
            assert resp.headers["Content-Type"].startswith("text/html")
            html = resp.read().decode()
        assert "Model Intelligence" in html
        assert "/api/v1/intelligence" in html
        # self-contained: no external asset loads (zero-egress image)
        assert "http://" not in html.replace("http://www.w3.org", "")
        assert "https://" not in html
