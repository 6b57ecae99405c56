"""Golden-value tests for the ranking metrics library.

Hand-computed expectations per the definitions in the reference metrics
module (reference: src/utils/metrics.py:9-275); SURVEY.md §4 test plan (a).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ncf_tpu.evals import metrics as M


class TestPositiveRanks:
    def test_basic(self):
        # row 0: positive highest -> rank 0; row 1: two negatives above -> 2
        scores = jnp.array([
            [5.0, 1.0, 2.0, 3.0],
            [2.0, 9.0, 4.0, 0.0],
        ])
        ranks = M.positive_ranks(scores)
        np.testing.assert_array_equal(np.asarray(ranks), [0, 2])

    def test_ties_are_pessimistic(self):
        # all-equal scores: the positive must NOT get rank 0 (guards the
        # degenerate all-ones HR the reference's validate produced, §2.9.9)
        scores = jnp.ones((3, 11))
        ranks = M.positive_ranks(scores)
        np.testing.assert_array_equal(np.asarray(ranks), [10, 10, 10])


class TestRankMetrics:
    def test_golden(self):
        # ranks: 0, 2, 11 (out of top-10)
        scores = jnp.array([
            [5.0, 1.0, 2.0, 3.0] + [0.0] * 20,
            [2.0, 9.0, 4.0, 0.0] + [0.0] * 20,
            [0.0] + list(np.linspace(10, 1, 23)),
        ])
        m = M.rank_metrics(scores, ks=(1, 5, 10))
        assert m["hr@1"] == pytest.approx(1 / 3)
        assert m["hr@5"] == pytest.approx(2 / 3)
        assert m["hr@10"] == pytest.approx(2 / 3)
        # ndcg@5 = (1/log2(2) + 1/log2(4) + 0) / 3
        assert m["ndcg@5"] == pytest.approx((1.0 + 1.0 / 2.0) / 3)
        # mrr@5 = (1 + 1/3 + 0)/3
        assert m["mrr@5"] == pytest.approx((1.0 + 1 / 3) / 3)
        assert m["map@5"] == pytest.approx(m["mrr@5"])  # single positive


class TestGeneralMetrics:
    def test_hit_rate(self):
        scores = jnp.array([[0.9, 0.8, 0.1], [0.1, 0.2, 0.3]])
        targets = jnp.array([[0, 1, 0], [1, 0, 0]])
        assert float(M.hit_rate_at_k(scores, targets, 1)) == pytest.approx(0.0)
        assert float(M.hit_rate_at_k(scores, targets, 2)) == pytest.approx(0.5)
        assert float(M.hit_rate_at_k(scores, targets, 3)) == pytest.approx(1.0)

    def test_ndcg_multi_positive(self):
        # one row, relevant items at ranks 1 and 3 of the sorted list
        scores = jnp.array([[3.0, 2.0, 1.0, 0.5]])
        targets = jnp.array([[1, 0, 1, 0]])
        k = 4
        dcg = 1.0 / np.log2(2) + 1.0 / np.log2(4)
        idcg = 1.0 / np.log2(2) + 1.0 / np.log2(3)
        assert float(M.ndcg_at_k(scores, targets, k)) == pytest.approx(dcg / idcg)

    def test_map(self):
        scores = jnp.array([[3.0, 2.0, 1.0]])
        targets = jnp.array([[0, 1, 1]])
        # precisions at hits: rank2 -> 1/2, rank3 -> 2/3; AP = (1/2+2/3)/2
        assert float(M.map_at_k(scores, targets, 3)) == pytest.approx(
            (0.5 + 2 / 3) / 2)

    def test_auc_against_sklearn(self):
        from sklearn.metrics import roc_auc_score

        rng = np.random.default_rng(0)
        scores = rng.normal(size=200)
        targets = (rng.random(200) < 0.3).astype(np.float32)
        got = float(M.auc(jnp.asarray(scores)[None], jnp.asarray(targets)[None]))
        want = roc_auc_score(targets, scores)
        assert got == pytest.approx(want, abs=1e-6)

    def test_accuracy_stats(self):
        logits = jnp.array([2.0, -1.0, 0.5, -0.5])
        targets = jnp.array([1.0, 0.0, 0.0, 1.0])
        s = M.accuracy_stats(logits, targets)
        assert float(s["accuracy"]) == pytest.approx(0.5)
        assert float(s["pos_accuracy"]) == pytest.approx(0.5)
        assert float(s["neg_accuracy"]) == pytest.approx(0.5)

    def test_calculate_metrics_surface(self):
        scores = jnp.asarray(np.random.default_rng(1).normal(size=(8, 12)))
        targets = jnp.zeros((8, 12)).at[:, 0].set(1.0)
        m = M.calculate_metrics(scores, targets)
        for key in ("hit_rate@1", "hit_rate@5", "hit_rate@10", "ndcg@10",
                    "mrr@10", "map@10", "auc", "accuracy",
                    "pos_accuracy", "neg_accuracy"):
            assert key in m
