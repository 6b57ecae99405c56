"""Negative sampler property tests (reference: data_prep.py:134-161,
negative_sampler.py:6-38)."""

import jax
import jax.numpy as jnp
import numpy as np

from ncf_tpu.data.sampler import (
    _membership,
    make_sampling_cdf,
    padded_histories,
    sample_eval_negatives,
    sample_negatives,
)


class TestDeviceSampler:
    def test_shape_and_range(self):
        key = jax.random.PRNGKey(0)
        pos = jnp.arange(32) % 10
        negs = sample_negatives(key, pos, num_items=50, num_negatives=4)
        assert negs.shape == (32, 4)
        assert (np.asarray(negs) >= 0).all() and (np.asarray(negs) < 50).all()

    def test_avoids_positive(self):
        key = jax.random.PRNGKey(1)
        pos = jnp.full((256,), 3, jnp.int32)
        negs = np.asarray(sample_negatives(key, pos, num_items=20,
                                           num_negatives=4, num_rounds=10))
        # with 10 weighted redraw rounds over 20 items, collisions with the
        # positive should be essentially absent
        assert (negs == 3).mean() < 0.01

    def test_respects_weights(self):
        key = jax.random.PRNGKey(2)
        # weight mass concentrated on item 7
        w = np.full(10, 1e-6); w[7] = 1.0
        cdf = make_sampling_cdf(w)
        pos = jnp.zeros(512, jnp.int32)
        negs = np.asarray(sample_negatives(key, pos, 10, 4, cdf=cdf))
        assert (negs == 7).mean() > 0.95

    def test_cdf_sampling_matches_distribution(self):
        key = jax.random.PRNGKey(5)
        w = np.array([1.0, 2.0, 4.0, 8.0])
        cdf = make_sampling_cdf(w)
        pos = jnp.full((4096,), 99, jnp.int32)  # positive outside range: no rejection
        negs = np.asarray(sample_negatives(key, pos, 4, 2, cdf=cdf,
                                           num_rounds=1))
        freq = np.bincount(negs.reshape(-1), minlength=4) / negs.size
        np.testing.assert_allclose(freq, w / w.sum(), atol=0.03)

    def test_history_exclusion(self):
        key = jax.random.PRNGKey(3)
        pos = jnp.zeros(128, jnp.int32)
        history = jnp.tile(jnp.array([[1, 2, 3, -1]]), (128, 1))
        negs = np.asarray(sample_negatives(
            key, pos, num_items=8, num_negatives=4,
            history=history, num_rounds=16))
        hit_rate = np.isin(negs, [0, 1, 2, 3]).mean()
        assert hit_rate < 0.02

    def test_deterministic_under_same_key(self):
        key = jax.random.PRNGKey(4)
        pos = jnp.arange(16)
        a = sample_negatives(key, pos, 100, 4)
        b = sample_negatives(key, pos, 100, 4)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestHostEvalSampler:
    def test_exact_exclusion(self, tiny_interactions):
        inter = tiny_interactions
        offsets, items = inter.user_histories()
        users = np.arange(inter.num_users, dtype=np.int32)
        rng = np.random.default_rng(0)
        negs = sample_eval_negatives(rng, users, offsets, items,
                                     inter.num_items, num_negatives=20)
        assert negs.shape == (inter.num_users, 20)
        # exhaustive check: no sampled negative is in the user's history
        for u in range(inter.num_users):
            hist = set(items[offsets[u]:offsets[u + 1]].tolist())
            assert not hist & set(negs[u].tolist())

    def test_membership_helper(self):
        offsets = np.array([0, 3, 5])
        items = np.array([2, 5, 9, 1, 4])
        users = np.array([0, 0, 1, 1, 0])
        query = np.array([5, 3, 4, 5, 9])
        got = _membership(users, query, offsets, items)
        np.testing.assert_array_equal(got, [True, False, True, False, True])

    def test_padded_histories(self):
        offsets = np.array([0, 2, 3])
        items = np.array([4, 7, 1])
        out = padded_histories(offsets, items, np.array([0, 1]), max_len=4)
        np.testing.assert_array_equal(out[0], [4, 7, -1, -1])
        np.testing.assert_array_equal(out[1], [1, -1, -1, -1])


class TestPallasTreeSampler:
    """The fused Pallas sampler must be bit-identical to the XLA tree
    descent + where-chain rejection given the same uniforms."""

    def _xla_reference(self, u, pos, cdf):
        import jax.numpy as jnp

        from ncf_tpu.data.sampler import _inverse_cdf

        R = u.shape[0]
        cands = _inverse_cdf(cdf, u)
        ok = cands != pos[None, :, None]
        pick = cands[R - 1]
        for r in range(R - 2, -1, -1):
            pick = jnp.where(ok[r], cands[r], pick)
        return pick

    def test_bit_identical_to_xla_path(self):
        import jax.numpy as jnp

        from ncf_tpu.data.sampler import make_sampling_cdf
        from ncf_tpu.ops.pallas_sampler import (
            tree_sample_negatives, tree_sampler_fits)

        rng = np.random.default_rng(0)
        for num_items, R in [(3706, 2), (16384, 3), (600, 2)]:
            assert tree_sampler_fits(num_items)
            B, NEG = 512, 4
            w = 1.0 / rng.zipf(1.3, num_items).astype(np.float64)
            cdf = make_sampling_cdf(w)
            u = jnp.asarray(rng.random((R, B, NEG)), jnp.float32)
            pos = jnp.asarray(rng.integers(0, num_items, B), jnp.int32)
            ref = self._xla_reference(u, pos, cdf)
            out = tree_sample_negatives(u, pos, cdf, num_items,
                                        interpret=True)
            np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_fits_gate(self):
        from ncf_tpu.ops.pallas_sampler import tree_sampler_fits

        assert not tree_sampler_fits(100)          # flat XLA path is free
        assert tree_sampler_fits(3706)
        assert tree_sampler_fits(32768)
        assert not tree_sampler_fits(100_000)      # one-hot too wide

    def test_flattened_uniforms_accepted(self):
        import jax.numpy as jnp

        from ncf_tpu.data.sampler import make_sampling_cdf
        from ncf_tpu.ops.pallas_sampler import tree_sample_negatives

        rng = np.random.default_rng(1)
        num_items, B, NEG, R = 3000, 64, 4, 2
        cdf = make_sampling_cdf(np.ones(num_items))
        u = jnp.asarray(rng.random((R, B, NEG)), jnp.float32)
        pos = jnp.asarray(rng.integers(0, num_items, B), jnp.int32)
        a = tree_sample_negatives(u, pos, cdf, num_items, interpret=True)
        b = tree_sample_negatives(u.reshape(R, B * NEG), pos, cdf,
                                  num_items, interpret=True)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestStratifiedSampler:
    """sample_negatives_stratified: pooled order statistics + strided
    assignment (the scatter-kernel-friendly sampler)."""

    def _setup(self, seed=0, num_items=500, B=2048, NEG=4):
        import jax
        import jax.numpy as jnp

        from ncf_tpu.data.sampler import make_sampling_cdf

        rng = np.random.default_rng(seed)
        w = 1.0 / rng.zipf(1.3, num_items).astype(np.float64)
        cdf = make_sampling_cdf(w)
        p = w / w.sum()
        pos = jnp.asarray(rng.integers(0, num_items, B), jnp.int32)
        return jax, jnp, cdf, p, pos, num_items, B, NEG

    def test_distribution_matches_target(self):
        from ncf_tpu.data.sampler import sample_negatives_stratified

        jax, jnp, cdf, p, pos, I, B, NEG = self._setup()
        tot = np.zeros(I)
        for k in jax.random.split(jax.random.PRNGKey(3), 12):
            negs = np.asarray(
                sample_negatives_stratified(k, pos, I, NEG, cdf=cdf))
            assert negs.shape == (B, NEG)
            tot += np.bincount(negs.reshape(-1), minlength=I)
        emp = tot / tot.sum()
        l1 = np.abs(emp - p).sum()
        # iid sampling at this draw count gives L1 ~ 0.09; allow 2x
        assert l1 < 0.2, f"stratified sample L1={l1:.3f} off target"

    def test_no_intra_row_duplicates(self):
        from ncf_tpu.data.sampler import sample_negatives_stratified

        jax, jnp, cdf, p, pos, I, B, NEG = self._setup(num_items=5000)
        negs = np.asarray(sample_negatives_stratified(
            jax.random.PRNGKey(0), pos, I, NEG, cdf=cdf))
        dup_rows = sum(len(set(r)) < NEG for r in negs)
        # strata are B positions apart in the pooled sorted sample;
        # duplicates require a >B-long run of one id — impossible here
        assert dup_rows == 0

    def test_positive_collisions_resolved(self):
        from ncf_tpu.data.sampler import sample_negatives_stratified

        jax, jnp, cdf, p, pos, I, B, NEG = self._setup()
        negs = np.asarray(sample_negatives_stratified(
            jax.random.PRNGKey(1), pos, I, NEG, cdf=cdf, num_rounds=3))
        coll = (negs == np.asarray(pos)[:, None]).sum()
        assert coll <= B * NEG * 0.002, f"{coll} unresolved collisions"

    def test_columns_near_sorted(self):
        """Each slot column must be a rotation of a sorted run (<=1 wrap
        break; collision fixes may add a handful) — the property the
        scatter kernel's narrow-span path relies on."""
        from ncf_tpu.data.sampler import sample_negatives_stratified

        jax, jnp, cdf, p, pos, I, B, NEG = self._setup()
        negs = np.asarray(sample_negatives_stratified(
            jax.random.PRNGKey(2), pos, I, NEG, cdf=cdf))
        for s in range(NEG):
            breaks = int((np.diff(negs[:, s].astype(np.int64)) < 0).sum())
            # <=1 wrap break + one local break per collision fix; must
            # stay rare relative to the column length
            assert breaks <= B // 100, f"column {s}: {breaks} sort breaks"

    def test_uniform_mode_no_cdf(self):
        from ncf_tpu.data.sampler import sample_negatives_stratified

        jax, jnp, cdf, p, pos, I, B, NEG = self._setup()
        negs = np.asarray(sample_negatives_stratified(
            jax.random.PRNGKey(4), pos, I, NEG, cdf=None))
        emp = np.bincount(negs.reshape(-1), minlength=I) / negs.size
        assert np.abs(emp - 1.0 / I).sum() < 0.25

    def test_train_step_integration(self):
        """negative_sampling=stratified trains end-to-end (CPU path)."""
        import jax
        import jax.numpy as jnp

        from ncf_tpu.models import get_model
        from ncf_tpu.train.optim import make_optimizer
        from ncf_tpu.train.step import make_train_step
        from ncf_tpu.utils.config import Config

        cfg = Config()
        cfg.model.num_users, cfg.model.num_items = 50, 40
        cfg.model.mf_dim = cfg.model.mlp_dim = 8
        cfg.model.temporal_dim = 8
        cfg.model.mlp_hidden_dims = [16, 8]
        cfg.model.num_departments, cfg.model.num_categories = 3, 5
        cfg.model.compute_dtype = "float32"
        cfg.train.batch_size = 32
        cfg.train.negative_sampling = "stratified"
        model = get_model("advanced_ncf")
        params = model.init(jax.random.PRNGKey(0), cfg.model)
        opt = make_optimizer(cfg.train, steps_per_epoch=10)
        opt_state = opt.init(params)
        rng_np = np.random.default_rng(0)
        step = make_train_step(
            model, cfg, opt,
            None,
            jnp.asarray(rng_np.integers(0, 3, 40), jnp.int32),
            jnp.asarray(rng_np.integers(0, 5, 40), jnp.int32))
        batch = {
            "user_ids": jnp.asarray(np.sort(rng_np.integers(0, 50, 32)),
                                    jnp.int32),
            "item_ids": jnp.asarray(rng_np.integers(0, 40, 32), jnp.int32),
            "hour": jnp.zeros(32, jnp.int32),
            "day": jnp.zeros(32, jnp.int32),
            "month": jnp.zeros(32, jnp.int32),
            "day_of_year": jnp.zeros(32, jnp.int32),
        }
        rng = jax.random.PRNGKey(0)
        losses = []
        for _ in range(6):
            params, opt_state, rng, m = step(params, opt_state, rng, batch)
            losses.append(float(m["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]
