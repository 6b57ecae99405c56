"""Sparse-table-update path (train/sparse.py + step.py sparse builders).

The fbgemm fused-sparse-optimizer equivalent: table updates touch only
the batch's rows (O(batch) HBM traffic, not O(vocab)).  The load-bearing
property is EXACT equivalence with the dense rowwise-Adagrad path — same
rng stream, same clipping, same schedule — pinned end-to-end here.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ncf_tpu.data import generate_interactions
from ncf_tpu.train.sparse import (
    combine_duplicate_rows,
    sparse_rowwise_adagrad_update,
)
from ncf_tpu.train.step import sparse_mode_available
from ncf_tpu.utils.config import Config


def test_combine_duplicate_rows():
    ids = jnp.asarray([7, 2, 7, 5, 2, 2], jnp.int32)
    g = jnp.arange(12, dtype=jnp.float32).reshape(6, 2)
    rep, totals = combine_duplicate_rows(ids, g, num_rows=10)
    rep, totals = np.asarray(rep), np.asarray(totals)
    got = {int(r): totals[i] for i, r in enumerate(rep) if r < 10}
    np.testing.assert_allclose(got[2], g[1] + g[4] + g[5])
    np.testing.assert_allclose(got[5], g[3])
    np.testing.assert_allclose(got[7], g[0] + g[2])
    # sink ids are out of range AND distinct (unique_indices-safe)
    assert len(set(rep.tolist())) == len(rep)
    assert all(r >= 10 for r in rep if r not in (2, 5, 7))


def test_sparse_update_matches_dense_reference():
    """One sparse step == dense rowwise Adagrad (zeros elsewhere)."""
    rng = np.random.default_rng(0)
    V, d, N = 50, 8, 32
    table = jnp.asarray(rng.normal(size=(V, d)), jnp.float32)
    acc = jnp.asarray(rng.random(V), jnp.float32)
    ids = jnp.asarray(rng.integers(0, V, N), jnp.int32)
    g = jnp.asarray(rng.normal(size=(N, d)), jnp.float32)
    lr, eps = 0.05, 1e-8

    new_t, new_a = sparse_rowwise_adagrad_update(table, acc, ids, g, lr, eps)

    # dense reference: scatter-add to [V, d], rowwise update everywhere
    dense_g = np.zeros((V, d), np.float32)
    np.add.at(dense_g, np.asarray(ids), np.asarray(g))
    touched = np.zeros(V, bool)
    touched[np.asarray(ids)] = True
    acc_ref = np.asarray(acc) + np.where(
        touched, np.mean(dense_g ** 2, axis=1), 0.0)
    upd = lr * dense_g / (np.sqrt(acc_ref) + eps)[:, None]
    table_ref = np.asarray(table) - np.where(touched[:, None], upd, 0.0)

    np.testing.assert_allclose(np.asarray(new_a), acc_ref, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(new_t), table_ref, rtol=1e-5,
                               atol=1e-6)


def test_decay_on_touch():
    V, d = 20, 4
    table = jnp.ones((V, d), jnp.float32)
    acc = jnp.zeros(V, jnp.float32)
    ids = jnp.asarray([3, 3, 9], jnp.int32)
    g = jnp.zeros((3, d), jnp.float32)
    new_t, new_a = sparse_rowwise_adagrad_update(
        table, acc, ids, g, lr=1.0, eps=1e-8, weight_decay=0.1)
    new_t = np.asarray(new_t)
    # idle rows exactly untouched
    idle = [i for i in range(V) if i not in (3, 9)]
    np.testing.assert_array_equal(new_t[idle], np.ones((len(idle), d)))
    # touched rows decayed (zero grads, wd pulls toward 0)
    assert (new_t[3] < 1.0).all() and (new_t[9] < 1.0).all()


def _bigvocab_cfg(sparse: str, **kw):
    """Tiny CPU config that still lands in the precompute-OFF regime:
    entities (1500) > 4*B*S (4*64*5 = 1280)."""
    cfg = Config()
    cfg.model.num_users = 900
    cfg.model.num_items = 600
    cfg.model.mf_dim = 8
    cfg.model.mlp_dim = 8
    cfg.model.temporal_dim = 4
    cfg.model.mlp_hidden_dims = [16, 8]
    cfg.model.compute_dtype = "float32"
    cfg.train.batch_size = 64
    cfg.train.num_epochs = 2
    cfg.train.embedding_optimizer = "rowwise_adagrad"
    cfg.train.embedding_learning_rate = 0.01
    cfg.train.embedding_scatter = "xla"   # f32 dense grads for exactness
    cfg.train.sparse_table_update = sparse
    for k, v in kw.items():
        setattr(cfg.train, k, v)
    return cfg


@pytest.fixture(scope="module")
def big_inter():
    return generate_interactions(num_users=900, num_items=600, num_days=40,
                                 avg_txns_per_user=6, seed=11)


def test_sparse_mode_available_gating():
    cfg = _bigvocab_cfg("auto")
    assert sparse_mode_available(cfg)
    small = _bigvocab_cfg("auto")
    small.model.num_users = 100
    small.model.num_items = 50
    assert not sparse_mode_available(small)
    adam = _bigvocab_cfg("auto")
    adam.train.embedding_optimizer = "adam"
    assert not sparse_mode_available(adam)
    # sequence composes (round-4 continuation: history-row injection);
    # only strictly-causal per-example contexts are incompatible
    seq = _bigvocab_cfg("auto")
    seq.model.use_sequence = True
    assert sparse_mode_available(seq)
    causal = _bigvocab_cfg("auto")
    causal.model.use_sequence = True
    causal.model.causal_history = True
    assert not sparse_mode_available(causal)


@pytest.mark.parametrize("spd", [1, 3])
def test_end_to_end_equivalence_with_dense_path(tmp_path, big_inter, spd):
    """Sparse-on vs sparse-off full Trainer runs produce the same params
    (same rng stream, same clip, same schedule; ewd=0)."""
    from ncf_tpu.train import Trainer

    cfg_a = _bigvocab_cfg("off", steps_per_dispatch=spd)
    cfg_a.train.checkpoint_dir = str(tmp_path / f"a{spd}")
    t_a = Trainer(cfg_a, big_inter)
    assert not t_a.sparse_tables
    t_a.train()

    cfg_b = _bigvocab_cfg("on", steps_per_dispatch=spd)
    cfg_b.train.checkpoint_dir = str(tmp_path / f"b{spd}")
    t_b = Trainer(cfg_b, big_inter)
    assert t_b.sparse_tables
    t_b.train()

    flat_a = jax.tree_util.tree_flatten_with_path(t_a.params)[0]
    flat_b = dict(jax.tree_util.tree_flatten_with_path(t_b.params)[0])
    for path, leaf in flat_a:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_b[path]),
            rtol=2e-4, atol=2e-5,
            err_msg=jax.tree_util.keystr(path))
    # and the rowwise accumulators agree with the dense path's
    dense_acc = {
        jax.tree_util.keystr(p): leaf
        for p, leaf in jax.tree_util.tree_flatten_with_path(t_a.opt_state)[0]
        if "sum_sq" in jax.tree_util.keystr(p)}
    u_dense = next(v for k, v in dense_acc.items() if "user_emb" in k)
    np.testing.assert_allclose(np.asarray(t_b.opt_state["user_acc"]),
                               np.asarray(u_dense), rtol=1e-4, atol=1e-6)


def test_clip_trigger_equivalence(tmp_path, big_inter):
    """Gradient clipping that actually TRIGGERS with duplicate ids in the
    batch: the sparse path's clip norm is taken over per-unique-row
    totals (combine first), matching optax.clip_by_global_norm over the
    dense table gradient — round-4 fix of the round-3 advisor's medium
    finding (per-occurrence norms over-count duplicates)."""
    from ncf_tpu.train import Trainer

    cfg_a = _bigvocab_cfg("off", gradient_clip_norm=0.05)
    cfg_a.train.num_epochs = 1
    cfg_a.train.checkpoint_dir = str(tmp_path / "clip_a")
    t_a = Trainer(cfg_a, big_inter)
    t_a.train_epoch(0)

    cfg_b = _bigvocab_cfg("on", gradient_clip_norm=0.05)
    cfg_b.train.num_epochs = 1
    cfg_b.train.checkpoint_dir = str(tmp_path / "clip_b")
    t_b = Trainer(cfg_b, big_inter)
    assert t_b.sparse_tables
    t_b.train_epoch(0)

    flat_a = jax.tree_util.tree_flatten_with_path(t_a.params)[0]
    flat_b = dict(jax.tree_util.tree_flatten_with_path(t_b.params)[0])
    for path, leaf in flat_a:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_b[path]),
            rtol=2e-4, atol=2e-5, err_msg=jax.tree_util.keystr(path))


def test_sparse_checkpoint_resume(tmp_path, big_inter):
    from ncf_tpu.train import Trainer

    cfg = _bigvocab_cfg("on", checkpoint_every_dispatches=3,
                        keep_checkpoints=100)
    cfg.train.checkpoint_dir = str(tmp_path / "ck")
    t = Trainer(cfg, big_inter)
    t.train()
    final = jax.tree_util.tree_leaves(t.params)

    import json
    import os
    mids = []
    for name in sorted(os.listdir(cfg.train.checkpoint_dir)):
        mf = os.path.join(cfg.train.checkpoint_dir, name, "manifest.json")
        if os.path.isfile(mf):
            with open(mf) as f:
                m = json.load(f)
            if (m.get("extra") or {}).get("in_epoch"):
                mids.append(os.path.join(cfg.train.checkpoint_dir, name))
    assert mids
    t2 = Trainer(_bigvocab_cfg("on", checkpoint_every_dispatches=3,
                               keep_checkpoints=100,
                               checkpoint_dir=cfg.train.checkpoint_dir),
                 big_inter)
    assert t2.resume(mids[-1])
    t2.train()
    for a, b in zip(final, jax.tree_util.tree_leaves(t2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("clip", [0.0, 0.05])
def test_sequence_sparse_matches_dense_path(tmp_path, big_inter, clip):
    """use_sequence composed with sparse table updates: history rows
    inject like candidate rows, their grads join the item-table
    combine+scatter — full-Trainer trajectory identical to the dense
    path (including a triggered clip, whose norm must cover the
    history-occurrence totals too)."""
    from ncf_tpu.train import Trainer

    def cfg_for(sparse, tag):
        cfg = _bigvocab_cfg(sparse, gradient_clip_norm=clip)
        cfg.model.use_sequence = True
        cfg.model.history_len = 5
        cfg.train.num_epochs = 1
        cfg.train.checkpoint_dir = str(tmp_path / tag)
        return cfg

    t_a = Trainer(cfg_for("off", f"sa{clip}"), big_inter)
    assert not t_a.sparse_tables
    t_a.train_epoch(0)
    t_b = Trainer(cfg_for("on", f"sb{clip}"), big_inter)
    assert t_b.sparse_tables
    t_b.train_epoch(0)
    if clip == 0.0:
        # the big-vocab (precompute-OFF) eval path with sequence
        va, vb = t_a.validate(0), t_b.validate(0)
        assert np.isclose(va["val_loss"], vb["val_loss"], rtol=1e-4)
        assert np.isfinite(va["hr@10"])

    flat_a = jax.tree_util.tree_flatten_with_path(t_a.params)[0]
    flat_b = dict(jax.tree_util.tree_flatten_with_path(t_b.params)[0])
    for path, leaf in flat_a:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_b[path]),
            rtol=2e-4, atol=2e-5, err_msg=jax.tree_util.keystr(path))
    # history rows actually received updates: the item accumulator rows
    # touched must be a superset of the batch's candidate items alone
    dense_acc = {
        jax.tree_util.keystr(p): leaf
        for p, leaf in jax.tree_util.tree_flatten_with_path(t_a.opt_state)[0]
        if "sum_sq" in jax.tree_util.keystr(p)}
    i_dense = next(v for k, v in dense_acc.items() if "item_emb" in k)
    np.testing.assert_allclose(np.asarray(t_b.opt_state["item_acc"]),
                               np.asarray(i_dense), rtol=1e-4, atol=1e-6)
