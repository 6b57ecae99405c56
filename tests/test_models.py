"""Model tests: shapes, determinism, gradient flow, semantics.

SURVEY.md §4 test plan (b): shapes/determinism/grad-flow on the CPU
backend, plus checks of the reference-defining semantics (candidate-slot
attention quirk, singleton eval attention, hour modulation).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ncf_tpu.models import advanced_ncf, get_model, ncf
from ncf_tpu.utils.config import ModelConfig


def tiny_cfg(**kw) -> ModelConfig:
    cfg = ModelConfig(
        num_users=40, num_items=30, num_departments=4, num_categories=6,
        mf_dim=16, mlp_dim=16, temporal_dim=8, mlp_hidden_dims=[32, 16],
        num_heads=4, dropout=0.2, negative_samples=3,
        compute_dtype="float32")
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


def batch(B=6, S=4, cfg=None, seed=0):
    rng = np.random.default_rng(seed)
    cfg = cfg or tiny_cfg()
    users = jnp.asarray(rng.integers(0, cfg.num_users, B), jnp.int32)
    items = jnp.asarray(rng.integers(0, cfg.num_items, (B, S)), jnp.int32)
    temporal = {
        "hour": jnp.asarray(rng.integers(0, 24, B), jnp.int32),
        "day": jnp.asarray(rng.integers(0, 7, B), jnp.int32),
        "month": jnp.asarray(rng.integers(0, 12, B), jnp.int32),
        "day_of_year": jnp.asarray(rng.integers(0, 365, B), jnp.int32),
    }
    dept = jnp.asarray(rng.integers(0, cfg.num_departments, cfg.num_items), jnp.int32)
    cat = jnp.asarray(rng.integers(0, cfg.num_categories, cfg.num_items), jnp.int32)
    return users, items, temporal, dept, cat


class TestAdvancedNCF:
    def test_output_shape(self):
        cfg = tiny_cfg()
        params = advanced_ncf.init(jax.random.PRNGKey(0), cfg)
        u, i, t, d, c = batch(cfg=cfg)
        logits = advanced_ncf.apply(params, cfg, u, i, t, d, c)
        assert logits.shape == (6, 4)
        assert logits.dtype == jnp.float32
        assert np.isfinite(np.asarray(logits)).all()

    def test_deterministic_eval(self):
        cfg = tiny_cfg()
        params = advanced_ncf.init(jax.random.PRNGKey(0), cfg)
        u, i, t, d, c = batch(cfg=cfg)
        a = advanced_ncf.apply(params, cfg, u, i, t, d, c, deterministic=True)
        b = advanced_ncf.apply(params, cfg, u, i, t, d, c, deterministic=True)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_dropout_changes_train_output(self):
        cfg = tiny_cfg()
        params = advanced_ncf.init(jax.random.PRNGKey(0), cfg)
        u, i, t, d, c = batch(cfg=cfg)
        r1, r2 = jax.random.PRNGKey(1), jax.random.PRNGKey(2)
        a = advanced_ncf.apply(params, cfg, u, i, t, d, c,
                               deterministic=False, rng=r1)
        b = advanced_ncf.apply(params, cfg, u, i, t, d, c,
                               deterministic=False, rng=r2)
        assert not np.allclose(np.asarray(a), np.asarray(b))

    def test_gradients_flow_everywhere(self):
        """Every parameter — including temporal and category, which the
        reference never trains (§2.9.6) — receives nonzero gradient."""
        cfg = tiny_cfg()
        params = advanced_ncf.init(jax.random.PRNGKey(0), cfg)
        u, i, t, d, c = batch(B=16, cfg=cfg, seed=3)

        def loss(p):
            logits = advanced_ncf.apply(p, cfg, u, i, t, d, c)
            return jnp.mean(logits**2)

        grads = jax.grad(loss)(params)
        # Legitimate zero-grad params: the category hierarchy's singleton
        # attention has softmax over ONE key (constant weight 1), so its
        # q/k projections receive no gradient — a property inherited from
        # the reference design (architecture.py:111-119); temporal_proj is
        # only on the score_items_with_hour path.
        allowed_zero = ("category.attn.q", "category.attn.k", "temporal_proj")
        zero_paths = []
        for path, g in jax.tree_util.tree_flatten_with_path(grads)[0]:
            name = ".".join(str(getattr(k, "key", getattr(k, "idx", k)))
                            for k in path)
            if name.startswith(allowed_zero):
                continue
            if float(jnp.abs(g).sum()) == 0.0:
                zero_paths.append(name)
        assert not zero_paths, f"no gradient reached: {zero_paths}"

    def test_candidate_attention_mixes_slots(self):
        """The defining quirk (architecture.py:315-323): in training mode a
        candidate's score depends on the OTHER candidates in its slot
        group; in eval (singleton) mode it does not."""
        cfg = tiny_cfg()
        params = advanced_ncf.init(jax.random.PRNGKey(0), cfg)
        u, i, t, d, c = batch(cfg=cfg)
        i2 = np.asarray(i).copy()
        i2[:, 1] = (i2[:, 1] + 1) % cfg.num_items  # perturb slot 1 only
        i2 = jnp.asarray(i2)

        joint_a = advanced_ncf.apply(params, cfg, u, i, t, d, c,
                                     candidate_attention=True)
        joint_b = advanced_ncf.apply(params, cfg, u, i2, t, d, c,
                                     candidate_attention=True)
        # slot 0's score changes when slot 1's item changes
        assert not np.allclose(np.asarray(joint_a[:, 0]), np.asarray(joint_b[:, 0]))

        solo_a = advanced_ncf.apply(params, cfg, u, i, t, d, c,
                                    candidate_attention=False)
        solo_b = advanced_ncf.apply(params, cfg, u, i2, t, d, c,
                                    candidate_attention=False)
        np.testing.assert_allclose(np.asarray(solo_a[:, 0]),
                                   np.asarray(solo_b[:, 0]), atol=1e-6)

    def test_score_candidates_matches_singleton_apply(self):
        cfg = tiny_cfg()
        params = advanced_ncf.init(jax.random.PRNGKey(0), cfg)
        u, i, t, d, c = batch(cfg=cfg)
        a = advanced_ncf.score_candidates(params, cfg, u, i, t, d, c)
        b = advanced_ncf.apply(params, cfg, u, i, t, d, c,
                               candidate_attention=False, deterministic=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_temporal_affects_scores(self):
        cfg = tiny_cfg()
        params = advanced_ncf.init(jax.random.PRNGKey(0), cfg)
        u, i, t, d, c = batch(cfg=cfg)
        t2 = dict(t, hour=(t["hour"] + 5) % 24)
        a = advanced_ncf.apply(params, cfg, u, i, t, d, c)
        b = advanced_ncf.apply(params, cfg, u, i, t2, d, c)
        assert not np.allclose(np.asarray(a), np.asarray(b))

    def test_no_temporal_is_zero_vector_path(self):
        cfg = tiny_cfg()
        params = advanced_ncf.init(jax.random.PRNGKey(0), cfg)
        u, i, _, d, c = batch(cfg=cfg)
        a = advanced_ncf.apply(params, cfg, u, i, None, d, c)
        assert np.isfinite(np.asarray(a)).all()

    def test_hour_modulation(self):
        """forward_simple analogue: hour shifts scores via the trained
        projection (architecture.py:433-456, with §2.9.5 fixed)."""
        cfg = tiny_cfg()
        params = advanced_ncf.init(jax.random.PRNGKey(0), cfg)
        u = jnp.arange(8) % cfg.num_users
        items = jnp.arange(8) % cfg.num_items
        s_none = advanced_ncf.score_items_with_hour(params, cfg, u, items, None)
        s_7 = advanced_ncf.score_items_with_hour(
            params, cfg, u, items, jnp.full((8,), 7, jnp.int32))
        s_19 = advanced_ncf.score_items_with_hour(
            params, cfg, u, items, jnp.full((8,), 19, jnp.int32))
        assert ((np.asarray(s_none) >= 0) & (np.asarray(s_none) <= 1)).all()
        assert not np.allclose(np.asarray(s_7), np.asarray(s_19))

    def test_embedding_export(self):
        cfg = tiny_cfg()
        params = advanced_ncf.init(jax.random.PRNGKey(0), cfg)
        _, _, _, d, c = batch(cfg=cfg)
        ue = advanced_ncf.get_user_embeddings(params, jnp.arange(5))
        assert ue["mf"].shape == (5, cfg.mf_dim)
        pe = advanced_ncf.get_product_embeddings(
            params, cfg, jnp.arange(7), d, c)
        assert pe["mlp"].shape == (7, cfg.mlp_dim)
        assert pe["category"].shape == (7, cfg.mlp_dim)


def naive_apply(params, cfg, user_ids, item_ids, temporal, item_dept, item_cat,
                candidate_attention=True):
    """Direct transcription of the reference forward math
    (architecture.py:258-381) using the generic MHA: repeated-user query
    over candidate slots, per-occurrence category hierarchy, per-slot MLP
    tower.  The optimized ncf_tpu.models.advanced_ncf.apply must match
    this exactly (deterministic mode)."""
    from ncf_tpu.models.layers import dense, layer_norm, mha, mlp_tower
    from ncf_tpu.models import temporal as T
    import jax.numpy as jnp

    B, S = item_ids.shape
    D = cfg.mlp_dim
    take = lambda t, i: jnp.take(t, i, axis=0)
    dmf = cfg.mf_dim
    user_full = take(params["user_emb"], user_ids)
    item_full = take(params["item_emb"], item_ids)
    user_mf = layer_norm(params["mf_norm"], user_full[:, :dmf])
    item_mf = layer_norm(params["mf_norm"], item_full[..., :dmf])
    user_mlp = layer_norm(params["mlp_norm"], user_full[:, dmf:])
    item_mlp = layer_norm(params["mlp_norm"], item_full[..., dmf:])

    # category hierarchy via full MHA (singleton key)
    cp = params["category"]
    dept_e = take(cp["dept"], item_dept[item_ids]).reshape(B * S, 1, D)
    cat_e = take(cp["cat"], item_cat[item_ids]).reshape(B * S, 1, D)
    fused = mha(cp["attn"], cat_e, dept_e, dept_e, cfg.num_heads)
    hier = layer_norm(cp["norm"], fused + cat_e).reshape(B, S, D)
    item_mlp = item_mlp + hier

    mf_pred = dense(params["mf_out"], user_mf[:, None, :] * item_mf)

    if candidate_attention:
        q = jnp.broadcast_to(user_mlp[:, None, :], item_mlp.shape)
        attn = mha(params["attn"], q, item_mlp, item_mlp, cfg.num_heads)
    else:
        q = jnp.broadcast_to(user_mlp[:, None, :], item_mlp.shape)
        attn = mha(params["attn"],
                   q.reshape(B * S, 1, D),
                   item_mlp.reshape(B * S, 1, D),
                   item_mlp.reshape(B * S, 1, D),
                   cfg.num_heads).reshape(B, S, D)

    t_vec = T.apply(params["temporal"], temporal["hour"], temporal["day"],
                    temporal["month"], temporal["day_of_year"])
    t_b = jnp.broadcast_to(t_vec[:, None, :], (B, S, cfg.temporal_dim))
    combined = jnp.concatenate([attn, t_b], axis=-1)
    mlp_vec = mlp_tower(params["mlp"], combined)
    mlp_pred = dense(params["mlp_out"], mlp_vec)
    both = jnp.concatenate([mf_pred, mlp_pred], axis=-1)
    return dense(params["final"], both)[..., 0]


class TestAttentionEquivalence:
    """The TPU-optimized apply (single-query attention, closed-form
    singleton attention, vocab precompute) must be numerically identical
    to the naive reference-math transcription."""

    @pytest.mark.parametrize("B,S", [(6, 4), (3, 4), (2, 7)])
    def test_train_mode_matches_naive(self, B, S):
        cfg = tiny_cfg()
        params = advanced_ncf.init(jax.random.PRNGKey(0), cfg)
        u, i, t, d, c = batch(B=B, S=S, cfg=cfg, seed=B * 10 + S)
        fast = advanced_ncf.apply(params, cfg, u, i, t, d, c,
                                  candidate_attention=True)
        ref = naive_apply(params, cfg, u, i, t, d, c, candidate_attention=True)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("B,S", [(6, 4), (2, 9)])
    def test_eval_mode_matches_naive(self, B, S):
        cfg = tiny_cfg()
        params = advanced_ncf.init(jax.random.PRNGKey(1), cfg)
        u, i, t, d, c = batch(B=B, S=S, cfg=cfg, seed=B + S)
        fast = advanced_ncf.apply(params, cfg, u, i, t, d, c,
                                  candidate_attention=False)
        ref = naive_apply(params, cfg, u, i, t, d, c, candidate_attention=False)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_vocab_and_occurrence_paths_match(self):
        """B=6 triggers the vocabulary-precompute path, B=3 the
        per-occurrence path; scoring the same rows must agree."""
        cfg = tiny_cfg()
        params = advanced_ncf.init(jax.random.PRNGKey(2), cfg)
        u, i, t, d, c = batch(B=6, S=4, cfg=cfg, seed=5)
        full = advanced_ncf.apply(params, cfg, u, i, t, d, c)
        half = advanced_ncf.apply(
            params, cfg, u[:3], i[:3],
            {k: v[:3] for k, v in t.items()}, d, c)
        np.testing.assert_allclose(np.asarray(full[:3]), np.asarray(half),
                                   rtol=1e-5, atol=1e-5)


class TestVanillaNCF:
    def test_shapes_and_grads(self):
        cfg = tiny_cfg(name="ncf")
        params = ncf.init(jax.random.PRNGKey(0), cfg)
        u, i, t, d, c = batch(cfg=cfg)
        logits = ncf.apply(params, cfg, u, i)
        assert logits.shape == (6, 4)

        def loss(p):
            return jnp.mean(ncf.apply(p, cfg, u, i) ** 2)

        grads = jax.grad(loss)(params)
        total = sum(float(jnp.abs(g).sum())
                    for g in jax.tree_util.tree_leaves(grads))
        assert total > 0

    def test_registry(self):
        for name in ("ncf", "neumf", "advanced_ncf"):
            m = get_model(name)
            assert callable(m.init) and callable(m.apply)
        with pytest.raises(ValueError):
            get_model("nope")
