"""Memory-efficient embedding optimizers (train/optim.py).

The reference's large-table story is torchrec/fbgemm fused optimizers —
ROWWISE_ADAGRAD by default for big tables (reference Dockerfile:24-28,
DistributedModelParallel trainer.py:85-88).  These tests pin the
TPU-native equivalents: param labeling, rowwise-Adagrad math, bf16-Adam
moment compaction, state memory, mesh sharding of the accumulators, and
checkpoint roundtrip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ncf_tpu.models import advanced_ncf
from ncf_tpu.train.optim import (
    embedding_labels,
    make_optimizer,
    scale_by_adam_compact,
    scale_by_rowwise_adagrad,
)
from ncf_tpu.utils.config import Config


def _small_cfg(**kw):
    cfg = Config()
    cfg.model.num_users = 64
    cfg.model.num_items = 32
    cfg.model.mf_dim = 8
    cfg.model.mlp_dim = 8
    cfg.model.temporal_dim = 4
    cfg.model.mlp_hidden_dims = [16, 8]
    for k, v in kw.items():
        setattr(cfg.train, k, v)
    return cfg


def test_embedding_labels_cover_tables_only():
    cfg = _small_cfg()
    params = advanced_ncf.init(jax.random.PRNGKey(0), cfg.model)
    labels = embedding_labels(params)
    flat = jax.tree_util.tree_flatten_with_path(labels)[0]
    emb = {jax.tree_util.keystr(p) for p, l in flat if l == "embedding"}
    assert emb == {"['user_emb']", "['item_emb']"}
    assert all(l in ("embedding", "dense") for _, l in flat)


def test_rowwise_adagrad_math():
    """One step by hand: G_row = mean(g^2 over d); update = g/(sqrt(G)+eps)."""
    tx = scale_by_rowwise_adagrad(eps=1e-8)
    p = {"t": jnp.zeros((3, 4))}
    g = {"t": jnp.asarray(np.arange(12, dtype=np.float32).reshape(3, 4))}
    state = tx.init(p)
    upd, state = tx.update(g, state, p)
    G = np.mean(np.asarray(g["t"]) ** 2, axis=1)
    expect = np.asarray(g["t"]) / (np.sqrt(G)[:, None] + 1e-8)
    np.testing.assert_allclose(np.asarray(upd["t"]), expect, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(state.sum_sq["t"]), G, rtol=1e-6)
    # second step accumulates
    _, state2 = tx.update(g, state, p)
    np.testing.assert_allclose(np.asarray(state2.sum_sq["t"]), 2 * G,
                               rtol=1e-6)


def test_rowwise_state_is_one_scalar_per_row():
    tx = scale_by_rowwise_adagrad()
    p = {"t": jnp.zeros((100, 64))}
    state = tx.init(p)
    assert state.sum_sq["t"].shape == (100,)
    assert state.sum_sq["t"].dtype == jnp.float32


def test_bf16_adam_tracks_full_adam():
    """A few steps of compact (bf16-moment) Adam stay within bf16 rounding
    of full f32 Adam."""
    full = optax.scale_by_adam()
    comp = scale_by_adam_compact()
    p = {"t": jnp.zeros((8, 4))}
    sf, sc = full.init(p), comp.init(p)
    key = jax.random.PRNGKey(0)
    for i in range(5):
        key, k = jax.random.split(key)
        g = {"t": jax.random.normal(k, (8, 4))}
        uf, sf = full.update(g, sf, p)
        uc, sc = comp.update(g, sc, p)
        np.testing.assert_allclose(np.asarray(uc["t"]), np.asarray(uf["t"]),
                                   rtol=2e-2, atol=2e-2)
    assert sc.mu["t"].dtype == jnp.bfloat16
    assert sc.nu["t"].dtype == jnp.bfloat16


@pytest.mark.parametrize("emb_opt", ["adam", "bf16_adam", "rowwise_adagrad"])
def test_table_state_memory(emb_opt):
    cfg = _small_cfg(embedding_optimizer=emb_opt)
    params = advanced_ncf.init(jax.random.PRNGKey(0), cfg.model)
    opt = make_optimizer(cfg.train, 10)
    state = opt.init(params)
    table_elems = sum(
        int(np.prod(v.shape)) for k, v in params.items()
        if k in ("user_emb", "item_emb"))
    table_rows = sum(
        v.shape[0] for k, v in params.items()
        if k in ("user_emb", "item_emb"))
    # full Adam: mu+nu f32 = 8 B/elem; bf16_adam: bf16 pair = 4 B/elem;
    # rowwise: one f32 scalar per ROW
    expect = {"adam": 8 * table_elems,
              "bf16_adam": 4 * table_elems,
              "rowwise_adagrad": 4 * table_rows}[emb_opt]
    flat = jax.tree_util.tree_flatten_with_path(state)[0]
    table_state_bytes = sum(
        leaf.size * leaf.dtype.itemsize
        for path, leaf in flat
        if any(t in jax.tree_util.keystr(path)
               for t in ("user_emb", "item_emb")))
    assert table_state_bytes == expect


def test_embedding_lr_scale_applies_only_to_tables():
    """With embedding_learning_rate set, table updates scale by
    emb_lr/lr while dense updates are unchanged."""
    base = _small_cfg(embedding_optimizer="rowwise_adagrad",
                      weight_decay=0.0, gradient_clip_norm=0.0)
    scaled = _small_cfg(embedding_optimizer="rowwise_adagrad",
                        weight_decay=0.0, gradient_clip_norm=0.0,
                        embedding_learning_rate=1e-2)  # 10x the 1e-3 lr
    params = advanced_ncf.init(jax.random.PRNGKey(0), base.model)
    grads = jax.tree.map(jnp.ones_like, params)
    u1, _ = (o := make_optimizer(base.train, 10)).update(
        grads, o.init(params), params)
    u2, _ = (o := make_optimizer(scaled.train, 10)).update(
        grads, o.init(params), params)
    np.testing.assert_allclose(np.asarray(u2["user_emb"]),
                               10.0 * np.asarray(u1["user_emb"]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(u2["mf_out"]["w"]),
                               np.asarray(u1["mf_out"]["w"]), rtol=1e-6)


def test_partial_rowwise_adam_matches_adam_when_nu_is_rowwise_constant():
    """With gradients CONSTANT across a row's dims, the rowwise second
    moment equals the elementwise one, so updates must match full Adam
    exactly; state carries one nu scalar per row."""
    import optax as _optax

    from ncf_tpu.train.optim import scale_by_partial_rowwise_adam

    full = _optax.scale_by_adam()
    part = scale_by_partial_rowwise_adam()
    p = {"t": jnp.zeros((6, 4))}
    sf, sp = full.init(p), part.init(p)
    assert sp.nu_row["t"].shape == (6,)
    key = jax.random.PRNGKey(3)
    for _ in range(4):
        key, k = jax.random.split(key)
        row = jax.random.normal(k, (6, 1))
        g = {"t": jnp.broadcast_to(row, (6, 4))}
        uf, sf = full.update(g, sf, p)
        up, sp = part.update(g, sp, p)
        np.testing.assert_allclose(np.asarray(up["t"]), np.asarray(uf["t"]),
                                   rtol=1e-5, atol=1e-6)


def test_partial_rowwise_adam_state_memory():
    cfg = _small_cfg(embedding_optimizer="partial_rowwise_adam")
    params = advanced_ncf.init(jax.random.PRNGKey(0), cfg.model)
    state = make_optimizer(cfg.train, 10).init(params)
    table_elems = sum(int(np.prod(v.shape)) for k, v in params.items()
                     if k in ("user_emb", "item_emb"))
    table_rows = sum(v.shape[0] for k, v in params.items()
                    if k in ("user_emb", "item_emb"))
    flat = jax.tree_util.tree_flatten_with_path(state)[0]
    got = sum(leaf.size * leaf.dtype.itemsize for path, leaf in flat
              if any(t in jax.tree_util.keystr(path)
                     for t in ("user_emb", "item_emb")))
    assert got == 4 * table_elems + 4 * table_rows


def test_rowwise_updates_preserve_grad_dtype():
    """bf16 table grads (the fast scatter path) stay bf16 through the
    update — the transient that bounds big-vocab HBM."""
    tx = scale_by_rowwise_adagrad()
    p = {"t": jnp.zeros((4, 8), jnp.float32)}
    g = {"t": jnp.ones((4, 8), jnp.bfloat16)}
    upd, _ = tx.update(g, tx.init(p), p)
    assert upd["t"].dtype == jnp.bfloat16


def test_weight_decay_masks_to_dense_under_rowwise():
    """With a memory-efficient table optimizer, weight decay applies to
    dense params only (fbgemm fused-optimizer default)."""
    cfg = _small_cfg(embedding_optimizer="rowwise_adagrad",
                     gradient_clip_norm=0.0, weight_decay=0.1)
    params = advanced_ncf.init(jax.random.PRNGKey(1), cfg.model)
    opt = make_optimizer(cfg.train, 10)
    state = opt.init(params)
    zero_g = jax.tree.map(jnp.zeros_like, params)
    upd, _ = opt.update(zero_g, state, params)
    # tables: zero grad + no decay => accumulator 0 => update exactly 0
    assert np.all(np.asarray(upd["user_emb"]) == 0.0)
    # dense: decay injects wd*param, so updates are non-zero
    assert np.any(np.asarray(upd["mf_out"]["w"]) != 0.0)


def test_trainer_rowwise_sharded_accumulators():
    """On an 8-device mesh the [rows] accumulators shard over 'ici' with
    their tables, and a short sharded train run converges."""
    from ncf_tpu.data import generate_interactions
    from ncf_tpu.parallel import make_mesh
    from ncf_tpu.train import Trainer

    inter = generate_interactions(num_users=512, num_items=128, num_days=30,
                                  avg_txns_per_user=8, seed=0)
    cfg = _small_cfg(embedding_optimizer="rowwise_adagrad",
                     embedding_learning_rate=0.03,
                     batch_size=256, num_epochs=1)
    cfg.model.num_users = 512
    cfg.model.num_items = 128
    cfg.model.compute_dtype = "float32"
    import tempfile
    cfg.train.checkpoint_dir = tempfile.mkdtemp()
    mesh = make_mesh(dcn=1, ici=8)
    t = Trainer(cfg, inter, mesh=mesh)
    flat = jax.tree_util.tree_flatten_with_path(t.opt_state)[0]
    accs = [(jax.tree_util.keystr(p), leaf) for p, leaf in flat
            if "sum_sq" in jax.tree_util.keystr(p)]
    assert len(accs) == 2
    for name, leaf in accs:
        assert leaf.sharding.spec == jax.sharding.PartitionSpec("ici"), name
    m = t.train()
    assert np.isfinite(m["val_loss"])
    # checkpoint roundtrip restores the rowwise state
    t2 = Trainer(cfg, inter, mesh=make_mesh(dcn=1, ici=8))
    t2.resume()
    r1 = jax.tree_util.tree_leaves(t.opt_state)
    r2 = jax.tree_util.tree_leaves(t2.opt_state)
    for a, b in zip(r1, r2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_validate_rejects_bad_embedding_optimizer():
    cfg = Config()
    cfg.train.embedding_optimizer = "sgd"
    with pytest.raises(ValueError, match="embedding_optimizer"):
        cfg.validate()
