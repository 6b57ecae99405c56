"""Tests: profiling timers, dashboards, alert policies, intelligence."""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ncf_tpu.models import advanced_ncf
from ncf_tpu.serving.intelligence import (
    attention_head_importance,
    component_importance,
    confidence_histogram,
    intelligence_report,
    normalized_scores,
)
from ncf_tpu.utils.config import ModelConfig
from ncf_tpu.utils.logging import MetricsLogger
from ncf_tpu.utils.monitoring import (
    AlertManager,
    AlertPolicy,
    build_dashboard,
    render_dashboard_text,
)
from ncf_tpu.utils.profiling import StepTimer


class TestStepTimer:
    def test_stats(self):
        timer = StepTimer(batch_size=100)
        timer.tick()
        for _ in range(5):
            time.sleep(0.002)
            timer.tick()
        s = timer.stats()
        assert s["steps"] == 5
        assert s["step_ms_mean"] >= 2.0
        assert s["examples_per_s"] > 0


class TestDashboard:
    def _metrics(self):
        m = MetricsLogger()
        for i in range(20):
            m.write(kind="request", latency_ms=10.0 + i, endpoint="x")
        m.write(kind="error", latency_ms=500.0)
        m.write(kind="cache", hit_rate=0.8)
        return m

    def test_build_and_render(self):
        spec = build_dashboard(self._metrics())
        titles = [p["title"] for p in spec["panels"]]
        assert "Request latency (ms)" in titles
        lat = next(p for p in spec["panels"]
                   if p["metric"] == "latency_ms")["values"]
        assert 10 <= lat["p50"] <= 530
        err = next(p for p in spec["panels"]
                   if p["metric"] == "_errors")["values"]
        assert err["count"] == 1
        text = render_dashboard_text(spec)
        assert "Recommendation Serving" in text


class TestAlerts:
    def test_latency_alert_fires(self):
        m = MetricsLogger()
        for _ in range(10):
            m.write(kind="request", latency_ms=900.0)
        fired = []
        mgr = AlertManager(
            m, [AlertPolicy("hi-lat", "latency_ms", 500.0, "above")],
            notifier=fired.append)
        alerts = mgr.check()
        assert len(alerts) == 1 and fired[0]["policy"] == "hi-lat"

    def test_below_comparison(self):
        m = MetricsLogger()
        m.write(kind="val", **{"hr@10": 0.1})
        mgr = AlertManager(
            m, [AlertPolicy("low-hr", "hr@10", 0.3, "below",
                            kind_filter="val")],
            notifier=lambda a: None)
        assert len(mgr.check()) == 1

    def test_no_alert_when_healthy(self):
        m = MetricsLogger()
        for _ in range(10):
            m.write(kind="request", latency_ms=5.0)
        mgr = AlertManager(
            m, [AlertPolicy("hi-lat", "latency_ms", 500.0, "above"),
                AlertPolicy("err", "_error_rate", 0.05, "above")],
            notifier=lambda a: None)
        assert mgr.check() == []


@pytest.fixture(scope="module")
def model_setup():
    cfg = ModelConfig(num_users=30, num_items=20, num_departments=3,
                      num_categories=5, mf_dim=16, mlp_dim=16,
                      temporal_dim=8, mlp_hidden_dims=[16],
                      compute_dtype="float32")
    params = advanced_ncf.init(jax.random.PRNGKey(0), cfg)
    return cfg, params


class TestIntelligence:
    def test_head_importance_shape(self, model_setup):
        cfg, params = model_setup
        imp = attention_head_importance(
            params, cfg, jnp.arange(4),
            jnp.tile(jnp.arange(6)[None], (4, 1)))
        assert imp.shape == (cfg.num_heads,)
        assert (imp >= 0).all()

    def test_component_importance_sums_to_one(self, model_setup):
        cfg, params = model_setup
        imp = component_importance(params)
        assert imp["mf"] + imp["mlp"] == pytest.approx(1.0)

    def test_confidence_histogram(self):
        h = confidence_histogram(np.asarray([0.1, 0.5, 0.55, 0.9]), bins=10)
        assert sum(h["counts"]) == 4
        assert len(h["edges"]) == 11

    def test_normalized_scores(self):
        out = normalized_scores(np.asarray([1.0, 2.0, 3.0]))
        np.testing.assert_allclose(out, [0, 0.5, 1.0])
        flat = normalized_scores(np.asarray([2.0, 2.0]))
        np.testing.assert_allclose(flat, [0.5, 0.5])

    def test_full_report(self, model_setup):
        cfg, params = model_setup
        report = intelligence_report(
            params, cfg, user_id=3,
            scores=np.asarray([0.9, 0.7, 0.5]),
            item_ids=np.asarray([1, 2, 3]))
        assert set(report) == {"user_id", "normalized_scores",
                               "attention_head_importance", "confidence",
                               "component_importance"}


class TestHistoryAttention:
    """Sequence-path explanations: attention weights over the user's
    recent items (serving/intelligence.py::history_attention_weights)."""

    @pytest.fixture(scope="class")
    def seq_model(self):
        cfg = ModelConfig()
        cfg.num_users = 30
        cfg.num_items = 25
        cfg.mf_dim = 16
        cfg.mlp_dim = 16
        cfg.temporal_dim = 8
        cfg.mlp_hidden_dims = [32, 16]
        cfg.compute_dtype = "float32"
        cfg.use_sequence = True
        cfg.history_len = 6
        params = advanced_ncf.init(jax.random.PRNGKey(0), cfg)
        return cfg, params

    def test_weights_normalized_and_padding_zero(self, seq_model):
        from ncf_tpu.serving.intelligence import history_attention_weights

        cfg, params = seq_model
        hist = np.asarray([[3, 7, 11, -1, -1, -1],
                           [1, 2, 3, 4, 5, 6]], np.int32)
        w = history_attention_weights(
            params, cfg, jnp.asarray([0, 1], jnp.int32), jnp.asarray(hist))
        assert w.shape == (2, 6)
        assert (w[0, 3:] == 0).all()            # padded slots exactly 0
        np.testing.assert_allclose(w.sum(axis=1), 1.0, rtol=1e-5)
        assert (w >= 0).all()

    def test_report_includes_history_attention(self, seq_model):
        cfg, params = seq_model
        report = intelligence_report(
            params, cfg, user_id=2,
            scores=np.asarray([0.9, 0.4, 0.2]),
            item_ids=np.asarray([5, 9, 3]),
            history=np.asarray([4, 8, -1, -1, -1, -1], np.int32))
        ha = report["history_attention"]
        assert [e["item_id"] for e in ha] == [4, 8]
        assert abs(sum(e["weight"] for e in ha) - 1.0) < 1e-4

    def test_requires_sequence_params(self):
        from ncf_tpu.serving.intelligence import history_attention_weights

        cfg = ModelConfig()
        cfg.num_users = 10
        cfg.num_items = 10
        cfg.mf_dim = 8
        cfg.mlp_dim = 8
        cfg.temporal_dim = 4
        cfg.mlp_hidden_dims = [16]
        params = advanced_ncf.init(jax.random.PRNGKey(0), cfg)
        with pytest.raises(ValueError):
            history_attention_weights(
                params, cfg, jnp.asarray([0], jnp.int32),
                jnp.asarray([[1, -1]], jnp.int32))
