"""Sequence-path tests: the reference's sequence_attention + 50-item
history features, actually functional (off by default)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ncf_tpu.data.interactions import Interactions
from ncf_tpu.data.synthetic import generate_interactions
from ncf_tpu.models import advanced_ncf
from ncf_tpu.train.trainer import Trainer
from ncf_tpu.utils.config import Config, ModelConfig


def seq_cfg(**kw):
    cfg = ModelConfig(
        num_users=40, num_items=30, num_departments=4, num_categories=6,
        mf_dim=16, mlp_dim=16, temporal_dim=8, mlp_hidden_dims=[32, 16],
        num_heads=4, compute_dtype="float32", use_sequence=True,
        history_len=6)
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


class TestRecentHistory:
    def test_newest_first_padded(self):
        inter = Interactions(
            user_ids=np.array([0, 1, 0, 0, 1]),
            item_ids=np.array([5, 6, 7, 8, 9]),
            timestamps=np.array([1, 2, 3, 4, 5]),
            amounts=np.ones(5), num_users=2, num_items=10)
        h = inter.recent_history(max_len=3)
        np.testing.assert_array_equal(h[0], [8, 7, 5])   # newest first
        np.testing.assert_array_equal(h[1], [9, 6, -1])  # padded

    def test_truncates_to_max_len(self, tiny_interactions):
        h = tiny_interactions.recent_history(max_len=4)
        assert h.shape == (tiny_interactions.num_users, 4)
        counts = np.bincount(tiny_interactions.user_ids,
                             minlength=tiny_interactions.num_users)
        filled = (h >= 0).sum(axis=1)
        np.testing.assert_array_equal(filled, np.minimum(counts, 4))


class TestSequenceModel:
    def test_shapes_and_finite(self):
        cfg = seq_cfg()
        params = advanced_ncf.init(jax.random.PRNGKey(0), cfg)
        assert "sequence_attn" in params
        rng = np.random.default_rng(0)
        u = jnp.arange(5)
        items = jnp.asarray(rng.integers(0, 30, (5, 4)), jnp.int32)
        hist = jnp.asarray(rng.integers(-1, 30, (5, 6)), jnp.int32)
        out = advanced_ncf.apply(params, cfg, u, items, None, None, None,
                                 history=hist)
        assert out.shape == (5, 4)
        assert np.isfinite(np.asarray(out)).all()

    def test_history_changes_scores(self):
        cfg = seq_cfg()
        params = advanced_ncf.init(jax.random.PRNGKey(0), cfg)
        u = jnp.arange(5)
        items = jnp.asarray(np.arange(20).reshape(5, 4) % 30, jnp.int32)
        h1 = jnp.full((5, 6), 3, jnp.int32)
        h2 = jnp.full((5, 6), 9, jnp.int32)
        a = advanced_ncf.apply(params, cfg, u, items, history=h1)
        b = advanced_ncf.apply(params, cfg, u, items, history=h2)
        assert not np.allclose(np.asarray(a), np.asarray(b))

    def test_all_padding_equals_no_history(self):
        """A fully-masked history must produce the same output as the
        zero sequence vector (history=None)."""
        cfg = seq_cfg()
        params = advanced_ncf.init(jax.random.PRNGKey(0), cfg)
        u = jnp.arange(5)
        items = jnp.asarray(np.arange(20).reshape(5, 4) % 30, jnp.int32)
        empty = jnp.full((5, 6), -1, jnp.int32)
        a = advanced_ncf.apply(params, cfg, u, items, history=empty)
        b = advanced_ncf.apply(params, cfg, u, items, history=None)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)

    def test_padding_rows_are_ignored(self):
        """Adding padding next to real entries must not change scores."""
        cfg = seq_cfg(history_len=4)
        params = advanced_ncf.init(jax.random.PRNGKey(1), cfg)
        u = jnp.arange(3)
        items = jnp.asarray(np.arange(12).reshape(3, 4) % 30, jnp.int32)
        h_short = jnp.asarray([[7, 2, -1, -1]] * 3, jnp.int32)
        # same real entries, different padding amount cannot be expressed
        # with static H; instead verify -1 slots don't contribute:
        h_with_pad = jnp.asarray([[7, 2, -1, -1]] * 3, jnp.int32)
        a = advanced_ncf.apply(params, cfg, u, items, history=h_short)
        b = advanced_ncf.apply(params, cfg, u, items, history=h_with_pad)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        # and that changing a PAD slot's id (still -1) vs making it real differs
        h_real = jnp.asarray([[7, 2, 11, -1]] * 3, jnp.int32)
        c = advanced_ncf.apply(params, cfg, u, items, history=h_real)
        assert not np.allclose(np.asarray(a), np.asarray(c))

    def test_sequence_attn_gets_gradients(self):
        cfg = seq_cfg()
        params = advanced_ncf.init(jax.random.PRNGKey(0), cfg)
        u = jnp.arange(8)
        items = jnp.asarray(np.arange(32).reshape(8, 4) % 30, jnp.int32)
        hist = jnp.asarray(np.arange(48).reshape(8, 6) % 30, jnp.int32)

        def loss(p):
            return jnp.mean(advanced_ncf.apply(
                p, cfg, u, items, history=hist) ** 2)

        g = jax.grad(loss)(params)
        total = sum(float(jnp.abs(x).sum())
                    for x in jax.tree_util.tree_leaves(g["sequence_attn"]))
        assert total > 0


class TestSequenceTraining:
    def test_trains_end_to_end(self, tmp_path):
        inter = generate_interactions(num_users=200, num_items=60,
                                      num_days=30, avg_txns_per_user=12,
                                      seed=21)
        cfg = Config()
        cfg.model.use_sequence = True
        cfg.model.history_len = 10
        cfg.model.mf_dim = 16
        cfg.model.mlp_dim = 16
        cfg.model.temporal_dim = 8
        cfg.model.mlp_hidden_dims = [32, 16]
        cfg.model.compute_dtype = "float32"
        cfg.data.num_eval_negatives = 30
        cfg.train.batch_size = 128
        cfg.train.num_epochs = 2
        cfg.train.checkpoint_dir = str(tmp_path / "ck")
        t = Trainer(cfg, inter)
        assert t.user_history is not None
        before = t.validate(-1)
        t.train()
        after = t.validate(99)
        assert after["val_loss"] < before["val_loss"]
        assert np.isfinite(after["hr@10"])


class TestCausalHistory:
    def test_strictly_causal_contexts(self):
        """causal_history row j holds exactly the user's prior items,
        newest first, with NO post-example leakage (roadmap #5)."""
        from ncf_tpu.data.interactions import Interactions

        # user 0: items 1,2,3 at t=10,20,30 ; user 1: items 7,8 at t=15,5
        inter = Interactions(
            user_ids=np.array([0, 1, 0, 0, 1], np.int32),
            item_ids=np.array([1, 7, 2, 3, 8], np.int32),
            timestamps=np.array([10, 15, 20, 30, 5], np.int64),
            amounts=np.ones(5, np.float32),
            num_users=2, num_items=10)
        h = inter.causal_history(max_len=3)
        np.testing.assert_array_equal(h[0], [-1, -1, -1])      # u0 first
        np.testing.assert_array_equal(h[2], [1, -1, -1])       # after item 1
        np.testing.assert_array_equal(h[3], [2, 1, -1])        # newest first
        np.testing.assert_array_equal(h[4], [-1, -1, -1])      # u1 t=5 first
        np.testing.assert_array_equal(h[1], [8, -1, -1])       # u1 t=15

    def test_no_future_leakage_vs_recent_history(self, tiny_interactions):
        """Every context item must predate its row; the static
        recent_history table does NOT satisfy this."""
        inter = tiny_interactions
        h = inter.causal_history(max_len=10)
        # spot-check 200 random rows exhaustively
        rng = np.random.default_rng(0)
        for j in rng.integers(0, len(inter), 200):
            u, t = inter.user_ids[j], inter.timestamps[j]
            prior = inter.item_ids[(inter.user_ids == u)
                                   & (inter.timestamps < t)]
            ctx = h[j][h[j] >= 0]
            assert set(ctx) <= set(prior) | set(
                inter.item_ids[(inter.user_ids == u)
                               & (inter.timestamps == t)])  # ties allowed

    def test_trainer_causal_sequence_smoke(self, tiny_interactions, tmp_path):
        from ncf_tpu.train import Trainer
        from ncf_tpu.utils import Config

        cfg = Config()
        cfg.model.mf_dim = 8
        cfg.model.mlp_dim = 8
        cfg.model.temporal_dim = 4
        cfg.model.mlp_hidden_dims = [16]
        cfg.model.compute_dtype = "float32"
        cfg.model.use_sequence = True
        cfg.model.causal_history = True
        cfg.model.history_len = 8
        cfg.train.batch_size = 64
        cfg.train.num_epochs = 1
        cfg.train.checkpoint_dir = str(tmp_path / "ck")
        t = Trainer(cfg, tiny_interactions)
        assert "history" in next(t.train_iter.epoch(0))
        m = t.train()
        assert np.isfinite(m["val_loss"])


class TestTableProjectedKV:
    """The vocab-regime sequence path gathers PRE-PROJECTED K/V rows
    from per-table projections; must equal the per-occurrence
    projection formulation (K/V are pointwise in the key row)."""

    def test_matches_per_occurrence_projection(self):
        import jax
        import jax.numpy as jnp

        from ncf_tpu.models.advanced_ncf import (_single_query_attention,
                                                 _sqa_core)
        from ncf_tpu.models.layers import dense, mha_init

        rng = np.random.default_rng(3)
        D, V, B, H = 16, 30, 12, 7
        p = mha_init(jax.random.PRNGKey(0), D)
        table = jnp.asarray(rng.normal(size=(V, D)), jnp.float32)
        user = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
        hist = rng.integers(0, V, (B, H)).astype(np.int32)
        hist[rng.random((B, H)) < 0.3] = -1
        hist[3, :] = -1                       # one fully-padded row
        hist = jnp.asarray(hist)
        mask = hist >= 0
        hsafe = jnp.maximum(hist, 0)

        ref = _single_query_attention(
            p, user, table[hsafe], 4, 0.0, None, True, jnp.float32,
            key_mask=mask)
        new = _sqa_core(
            p, dense(p["q"], user, jnp.float32),
            dense(p["k"], table, jnp.float32)[hsafe],
            dense(p["v"], table, jnp.float32)[hsafe],
            4, 0.0, None, True, jnp.float32, key_mask=mask)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(new),
                                   rtol=1e-5, atol=1e-6)


class TestHourlyWithSequence:
    def test_score_items_with_hour_handles_sequence_models(self):
        """forward_simple analogue must stay well-formed for
        use_sequence models (the tower expects the history slot)."""
        import jax
        import jax.numpy as jnp

        from ncf_tpu.models import advanced_ncf
        from ncf_tpu.utils.config import Config

        cfg = Config()
        cfg.model.num_users = 40
        cfg.model.num_items = 30
        cfg.model.mf_dim = 16
        cfg.model.mlp_dim = 16
        cfg.model.temporal_dim = 16
        cfg.model.mlp_hidden_dims = [32, 16]
        cfg.model.compute_dtype = "float32"
        cfg.model.use_sequence = True
        cfg.model.history_len = 5
        params = advanced_ncf.init(jax.random.PRNGKey(0), cfg.model)
        users = jnp.arange(6, dtype=jnp.int32)
        items = (jnp.arange(6, dtype=jnp.int32) * 3) % 30
        hour = jnp.full((6,), 13, jnp.int32)
        hist = jnp.asarray(
            np.r_[np.random.default_rng(0).integers(0, 30, (6, 3)),
                  ].astype(np.int32))
        hist = jnp.concatenate(
            [hist, jnp.full((6, 2), -1, jnp.int32)], axis=1)

        no_hist = advanced_ncf.score_items_with_hour(
            params, cfg.model, users, items, hour)
        with_hist = advanced_ncf.score_items_with_hour(
            params, cfg.model, users, items, hour, history=hist)
        assert np.isfinite(np.asarray(no_hist)).all()
        assert np.isfinite(np.asarray(with_hist)).all()
        assert not np.allclose(np.asarray(no_hist), np.asarray(with_hist))
