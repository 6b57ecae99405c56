"""Native (C++) data-loader tests: build, correctness, exclusion
properties, and parity with the NumPy fallbacks."""

import numpy as np
import pytest

from ncf_tpu import native


@pytest.fixture(scope="module")
def lib_available():
    return native.available()


class TestBuildHistories:
    def test_csr_correct(self):
        users = np.asarray([2, 0, 2, 1, 0], np.int32)
        items = np.asarray([9, 3, 4, 7, 1], np.int32)
        offsets, hist = native.build_histories(users, items, num_users=3)
        assert list(offsets) == [0, 2, 3, 5]
        assert list(hist[0:2]) == [1, 3]     # user 0 sorted
        assert list(hist[2:3]) == [7]
        assert list(hist[3:5]) == [4, 9]

    def test_matches_interactions_histories(self, tiny_interactions):
        inter = tiny_interactions
        o1, h1 = native.build_histories(
            inter.user_ids, inter.item_ids, inter.num_users)
        o2, h2 = inter.user_histories()
        np.testing.assert_array_equal(o1, o2)
        np.testing.assert_array_equal(h1, h2)


class TestSampleNegatives:
    def _setup(self, num_users=50, num_items=40, n=200, seed=0):
        rng = np.random.default_rng(seed)
        users = rng.integers(0, num_users, n).astype(np.int32)
        pos = rng.integers(0, num_items, n).astype(np.int32)
        hist_u = rng.integers(0, num_users, 300).astype(np.int32)
        hist_i = rng.integers(0, num_items, 300).astype(np.int32)
        offsets, hist = native.build_histories(hist_u, hist_i, num_users)
        w = 1.0 / (1.0 + rng.random(num_items))
        return users, pos, w, offsets, hist

    def test_excludes_positive_and_history(self):
        users, pos, w, offsets, hist = self._setup()
        negs = native.sample_negatives_exact(
            users, pos, w, offsets, hist, num_negatives=4, seed=7)
        assert negs.shape == (200, 4)
        for i in range(200):
            seen = set(hist[offsets[users[i]]:offsets[users[i] + 1]].tolist())
            seen.add(int(pos[i]))
            assert not seen & set(negs[i].tolist())

    def test_deterministic_per_seed(self):
        users, pos, w, offsets, hist = self._setup()
        a = native.sample_negatives_exact(users, pos, w, offsets, hist, 4,
                                          seed=3)
        b = native.sample_negatives_exact(users, pos, w, offsets, hist, 4,
                                          seed=3)
        np.testing.assert_array_equal(a, b)
        c = native.sample_negatives_exact(users, pos, w, offsets, hist, 4,
                                          seed=4)
        assert not np.array_equal(a, c)

    def test_respects_weights(self, lib_available):
        if not lib_available:
            pytest.skip("native lib not built; NumPy fallback too slow here")
        num_items = 50
        w = np.full(num_items, 1e-9)
        w[17] = 1.0
        users = np.zeros(2000, np.int32)
        pos = np.zeros(2000, np.int32)
        offsets = np.zeros(2, np.int64)
        hist = np.zeros(0, np.int32)
        negs = native.sample_negatives_exact(
            users, pos, w, offsets, hist, num_negatives=1, seed=1)
        assert (negs == 17).mean() > 0.95

    def test_exact_fallback_dense_history(self, lib_available):
        """User has seen every item but two: sampler must find them."""
        num_items = 20
        hist_items = np.asarray(sorted(set(range(num_items)) - {4, 9}),
                                np.int32)
        offsets = np.asarray([0, len(hist_items)], np.int64)
        users = np.zeros(50, np.int32)
        pos = np.full(50, 4, np.int32)   # positive is 4 -> only 9 allowed
        w = np.ones(num_items)
        negs = native.sample_negatives_exact(
            users, pos, w, offsets, hist_items, num_negatives=1, seed=2,
            max_rounds=3)
        assert (negs == 9).all()


class TestShuffle:
    def test_permutation(self):
        idx = native.shuffled_indices(1000, seed=5)
        assert sorted(idx.tolist()) == list(range(1000))
        idx2 = native.shuffled_indices(1000, seed=6)
        assert not np.array_equal(idx, idx2)
