"""Parity + protocol tests for the exact full-catalog leave-one-out
evaluator (evals/full_eval.py) against naive whole-catalog scoring via
``model.score_candidates``."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ncf_tpu.data.synthetic import generate_interactions
from ncf_tpu.evals.evaluate import metrics_from_ranks
from ncf_tpu.evals.full_eval import (FullCatalogEvaluator, exclusion_pairs,
                                     full_ranks_naive)
from ncf_tpu.models import advanced_ncf
from ncf_tpu.utils.config import ModelConfig


def _setup(use_sequence=False, seed=0):
    inter = generate_interactions(
        num_users=120, num_items=90, num_days=40,
        avg_txns_per_user=12, seed=seed)
    cfg = ModelConfig(
        num_users=inter.num_users, num_items=inter.num_items,
        num_departments=inter.num_departments,
        num_categories=inter.num_categories,
        mf_dim=16, mlp_dim=16, temporal_dim=8,
        mlp_hidden_dims=[32, 16], num_heads=2,
        use_sequence=use_sequence, history_len=8,
        fused_tower="off")
    params = advanced_ncf.init(jax.random.PRNGKey(seed), cfg)
    loo_train, eval_users, eval_items = inter.leave_one_out()
    hist = loo_train.recent_history(cfg.history_len) if use_sequence else None
    return inter, cfg, params, eval_users, eval_items, hist


def _assert_rank_parity(fast, naive, n_users):
    exact = (fast == naive).mean()
    # the split-first-layer accumulation differs from the fused concat
    # matmul by ~1 ulp of f32; allow rare near-tie rank flips
    assert exact >= 0.99, f"only {exact:.3f} of ranks match"
    assert np.abs(fast.astype(np.int64) - naive.astype(np.int64)).max() <= 2
    mf = metrics_from_ranks(fast)
    mn = metrics_from_ranks(naive)
    for k in ("hr@10", "ndcg@10", "mean_rank"):
        assert abs(mf[k] - mn[k]) < 2e-2 * max(1.0, mn[k]), (k, mf[k], mn[k])


@pytest.mark.parametrize("use_sequence", [False, True])
def test_full_eval_matches_naive(use_sequence):
    inter, cfg, params, eval_users, eval_items, hist = _setup(use_sequence)
    ev = FullCatalogEvaluator(
        cfg, inter, eval_users, eval_items, user_history=hist,
        item_dept=inter.item_dept, item_cat=inter.item_cat,
        user_block=32, item_block=32)
    fast = ev.ranks(params)
    naive = full_ranks_naive(
        advanced_ncf, params, cfg, inter, eval_users, eval_items,
        user_history=hist, item_dept=inter.item_dept,
        item_cat=inter.item_cat, user_block=64)
    assert fast.shape == naive.shape == (len(eval_users),)
    _assert_rank_parity(fast, naive, len(eval_users))


def test_full_eval_odd_block_sizes():
    """Catalog padding: item_block that does not divide num_items."""
    inter, cfg, params, eval_users, eval_items, _ = _setup(False, seed=3)
    ev = FullCatalogEvaluator(
        cfg, inter, eval_users, eval_items,
        item_dept=inter.item_dept, item_cat=inter.item_cat,
        user_block=17, item_block=41)
    naive = full_ranks_naive(
        advanced_ncf, params, cfg, inter, eval_users, eval_items,
        item_dept=inter.item_dept, item_cat=inter.item_cat)
    _assert_rank_parity(ev.ranks(params), naive, len(eval_users))


def test_exclusion_pairs_dedup_and_membership():
    inter, _, _, eval_users, _, _ = _setup(False)
    u_idx, items = exclusion_pairs(inter, eval_users)
    # deduplicated: each (user, item) pair appears once
    pairs = set(zip(u_idx.tolist(), items.tolist()))
    assert len(pairs) == len(u_idx)
    # covers the full interacted set of the first eval user
    u0 = eval_users[0]
    expect = set(inter.item_ids[inter.user_ids == u0].tolist())
    got = set(items[u_idx == 0].tolist())
    assert got == expect


def test_constant_scores_rank_pessimistically():
    """A constant-output model must score hr@10 == 0 under the
    pessimistic tie rule (every non-history item outranks the
    positive), matching the sampled protocol's convention."""
    inter, cfg, params, eval_users, eval_items, _ = _setup(False)
    params = jax.tree.map(jnp.zeros_like, params)
    ev = FullCatalogEvaluator(
        cfg, inter, eval_users, eval_items,
        item_dept=inter.item_dept, item_cat=inter.item_cat,
        user_block=32, item_block=64)
    ranks = ev.ranks(params)
    m = metrics_from_ranks(ranks)
    assert m["hr@10"] == 0.0
    # rank == catalog minus the user's own distinct-item history
    # (exclusion pairs already have the positive dropped, and the
    # positive's catalog column is masked: V - 1 - |history \ positive|)
    u_idx, items = exclusion_pairs(inter, eval_users, eval_items)
    hist_sizes = np.bincount(u_idx, minlength=len(eval_users))
    np.testing.assert_array_equal(ranks, cfg.num_items - 1 - hist_sizes)


def test_full_eval_trained_signal():
    """Sanity: ranks from a real (random-but-structured) model are not
    degenerate and the positive's own score never counts against it."""
    inter, cfg, params, eval_users, eval_items, _ = _setup(False, seed=7)
    ev = FullCatalogEvaluator(
        cfg, inter, eval_users, eval_items,
        item_dept=inter.item_dept, item_cat=inter.item_cat)
    ranks = ev.ranks(params)
    assert ranks.min() >= 0
    assert ranks.max() < cfg.num_items


class TestTrainerFullProtocol:
    def _cfg(self, tmp_path, name="advanced_ncf"):
        from ncf_tpu.utils.config import Config
        cfg = Config()
        cfg.model.name = name
        cfg.model.mf_dim = 16
        cfg.model.mlp_dim = 16
        cfg.model.temporal_dim = 8
        cfg.model.mlp_hidden_dims = [32, 16]
        cfg.model.compute_dtype = "float32"
        cfg.data.validation_days = 5
        cfg.data.eval_protocol = "full"
        cfg.data.full_eval_user_block = 64
        cfg.data.full_eval_item_block = 32
        cfg.train.batch_size = 128
        cfg.train.num_epochs = 2
        cfg.train.checkpoint_dir = str(tmp_path / "ckpt")
        return cfg

    def test_trainer_validates_under_full_protocol(self, tmp_path):
        from ncf_tpu.train.trainer import Trainer
        inter = generate_interactions(
            num_users=200, num_items=60, num_days=30,
            avg_txns_per_user=10, seed=5)
        trainer = Trainer(self._cfg(tmp_path), inter)
        m = trainer.validate(epoch=0)
        assert m.get("eval_protocol_full") == 1.0
        assert 0.0 <= m["hr@10"] <= 1.0
        assert m["mean_rank"] < inter.num_items
        # full ranks agree with the naive oracle through the Trainer's
        # own evaluator wiring
        naive = full_ranks_naive(
            advanced_ncf, trainer.params, trainer.cfg.model, inter,
            np.asarray(trainer.eval_set.users),
            np.asarray(trainer.eval_set.candidates[:, 0]),
            item_dept=inter.item_dept, item_cat=inter.item_cat)
        _assert_rank_parity(trainer._device_eval.ranks(trainer.params),
                            naive, len(naive))

    def test_trainer_full_protocol_other_model_falls_back(self, tmp_path):
        from ncf_tpu.train.trainer import Trainer
        inter = generate_interactions(
            num_users=150, num_items=50, num_days=30,
            avg_txns_per_user=8, seed=6)
        trainer = Trainer(self._cfg(tmp_path, name="neumf"), inter)
        m = trainer.validate(epoch=0)
        assert m.get("eval_protocol_full") == 1.0
        assert 0.0 <= m["hr@10"] <= 1.0
