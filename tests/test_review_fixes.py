"""Regression tests for the round-1 code-review findings."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ncf_tpu.data.synthetic import generate_interactions
from ncf_tpu.models import advanced_ncf, get_model
from ncf_tpu.serving import BruteForceScorer, ModelServer
from ncf_tpu.utils.config import Config, ModelConfig


@pytest.fixture(scope="module")
def setup():
    inter = generate_interactions(num_users=60, num_items=40, num_days=20,
                                  avg_txns_per_user=10, seed=7)
    cfg = Config()
    cfg.model.name = "neumf"   # routes ModelServer to BruteForceScorer
    cfg.model.num_users = inter.num_users
    cfg.model.num_items = inter.num_items
    cfg.model.mf_dim = 8
    cfg.model.mlp_dim = 8
    cfg.model.temporal_dim = 4
    cfg.model.mlp_hidden_dims = [16, 8]
    cfg.model.compute_dtype = "float32"
    model = get_model("neumf")
    params = model.init(jax.random.PRNGKey(0), cfg.model)
    return inter, cfg, model, params


class TestMaskedSoftmaxGradients:
    def test_fully_masked_history_has_finite_grads(self):
        """Review finding 1: a user whose entire history is masked (e.g.
        single-interaction user) must NOT produce NaN gradients."""
        cfg = ModelConfig(
            num_users=20, num_items=15, num_departments=3, num_categories=4,
            mf_dim=8, mlp_dim=8, temporal_dim=4, mlp_hidden_dims=[16],
            compute_dtype="float32", use_sequence=True, history_len=4)
        params = advanced_ncf.init(jax.random.PRNGKey(0), cfg)
        u = jnp.arange(4)
        items = jnp.asarray(np.arange(16).reshape(4, 4) % 15, jnp.int32)
        # row 0: all-masked history; others: partial
        hist = jnp.asarray([[-1, -1, -1, -1],
                            [3, -1, -1, -1],
                            [5, 7, -1, -1],
                            [1, 2, 3, 4]], jnp.int32)

        def loss(p):
            return jnp.mean(advanced_ncf.apply(
                p, cfg, u, items, history=hist) ** 2)

        grads = jax.grad(loss)(params)
        for path, g in jax.tree_util.tree_flatten_with_path(grads)[0]:
            assert np.isfinite(np.asarray(g)).all(), path


class TestGetPredictionsFallback:
    def test_scores_indexed_by_item_id(self, setup):
        """Review finding 2: the brute-force fallback must return the
        score OF each item, not the score AT rank position item_id."""
        inter, cfg, model, params = setup
        server = ModelServer(cfg, params)
        assert isinstance(server.scorer, BruteForceScorer)
        # ground truth: direct model scoring
        items = np.asarray([3, 17, 33])
        want = np.asarray(jax.nn.sigmoid(model.score_candidates(
            params, cfg.model, jnp.asarray([5]),
            jnp.asarray(items)[None, :])))[0]
        got = server.get_predictions(5, items)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


class TestBruteForceExclude:
    def test_exclude_filters_items(self, setup):
        inter, cfg, model, params = setup
        scorer = BruteForceScorer(model, params, cfg.model)
        _, base = scorer.topk_for_users(np.asarray([2]), k=5)
        exclude = np.asarray([[int(base[0, 0]), -1]])
        _, filt = scorer.topk_for_users(np.asarray([2]), k=5,
                                        exclude=exclude)
        assert int(base[0, 0]) not in filt[0]

    def test_refresh_exists(self, setup):
        inter, cfg, model, params = setup
        scorer = BruteForceScorer(model, params, cfg.model)
        scorer.refresh(params)  # must not raise (index/refresh route)


class TestPartialContext:
    def test_partial_context_is_defaulted_not_500(self, setup):
        inter, cfg, model, params = setup
        from ncf_tpu.api import RecommendationAPI

        api = RecommendationAPI(ModelServer(cfg, params))
        status, payload = api.dispatch(
            "POST", "/api/v1/recommendations",
            {"customer_id": "3", "num_recommendations": 3,
             "context": {"hour": 9}})
        assert status == 200, payload

    def test_partial_context_advanced_scorer(self):
        inter = generate_interactions(50, 30, 10, 8, seed=1)
        cfg = Config()
        cfg.model.num_users = inter.num_users
        cfg.model.num_items = inter.num_items
        cfg.model.num_departments = inter.num_departments
        cfg.model.num_categories = inter.num_categories
        cfg.model.mf_dim = 8
        cfg.model.mlp_dim = 8
        cfg.model.temporal_dim = 4
        cfg.model.mlp_hidden_dims = [16]
        cfg.model.compute_dtype = "float32"
        params = advanced_ncf.init(jax.random.PRNGKey(0), cfg.model)
        from ncf_tpu.serving import AdvancedNCFScorer

        scorer = AdvancedNCFScorer(
            params, cfg.model, jnp.asarray(inter.item_dept),
            jnp.asarray(inter.item_cat))
        bias = scorer.item_bias({"hour": 9})  # partial: must not KeyError
        assert np.isfinite(np.asarray(bias)).all()


class TestNcfEmbeddings:
    def test_export_surface_for_ncf(self, setup, tmp_path):
        inter, cfg, model, params = setup
        server = ModelServer(cfg, params)
        ue = server.get_user_embedding([0, 1])
        assert ue["mf"].shape == (2, cfg.model.mf_dim)
        pe = server.get_product_embedding([2])
        assert pe["mlp"].shape == (1, cfg.model.mlp_dim)

        from ncf_tpu.serving import export_product_embeddings

        path = export_product_embeddings(params, cfg,
                                         str(tmp_path / "e.jsonl"))
        assert path


class TestShardingOverflow:
    def test_overflow_returns_zeros_not_aliased_vectors(self):
        """Review finding 6: over-capacity ids degrade to zero vectors,
        never to another id's vector."""
        from ncf_tpu.parallel import make_mesh
        from ncf_tpu.parallel.embedding_sharding import ShardedEmbedding

        mesh = make_mesh(dcn=1, ici=8)
        N, D = 64, 8
        rng = np.random.default_rng(0)
        table = jnp.asarray(rng.normal(size=(N, D)) + 5.0, jnp.float32)
        # tiny capacity: 32 ids all owned by shard 0 with capacity ~2
        emb = ShardedEmbedding(mesh, N, D, capacity_factor=0.5)
        ids = jnp.zeros(32, jnp.int32)  # all id 0 -> shard 0, overflow
        out = np.asarray(emb.lookup(
            emb.shard(table),
            jax.device_put(ids, emb.batch_sharding)))
        want = np.asarray(table[0])
        for row in out:
            ok_real = np.allclose(row, want, rtol=1e-5)
            ok_zero = np.allclose(row, 0.0)
            assert ok_real or ok_zero  # never some OTHER row's vector
        # at least the in-capacity ones are real
        assert any(np.allclose(r, want, rtol=1e-5) for r in out)
