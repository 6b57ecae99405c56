"""Sharded sparse table updates (train/sparse_sharded.py): the
fbgemm-fused-sparse-optimizer-under-DistributedModelParallel composition
(reference src/model/trainer.py:85-88 + Dockerfile:24-28).

Load-bearing property: EXACT equivalence with the dense sharded
rowwise-Adagrad path on (1,8) and (2,4) CPU meshes — same rng stream,
same clip (including when it triggers), same schedule — so the big-vocab
regime's multi-chip story is trajectory-identical to the single-chip one.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ncf_tpu.data import generate_interactions
from ncf_tpu.parallel import make_mesh
from ncf_tpu.train.sparse import (combine_duplicate_rows,
                                  sparse_rowwise_adagrad_apply)
from ncf_tpu.train.sparse_sharded import sharded_sparse_rowwise_adagrad_update
from ncf_tpu.train.step import sparse_mode_available
from ncf_tpu.utils.config import Config


@pytest.mark.parametrize("dcn,ici", [(1, 8), (2, 4), (1, 1)])
def test_sharded_update_matches_single_device(dcn, ici):
    """The shard_map primitive == local combine+apply, every mesh shape,
    clip triggering."""
    rng = np.random.default_rng(0)
    mesh = make_mesh(dcn=dcn, ici=ici)
    Vu, Vi, d, nu, ni = 64, 96, 8, 32, 160
    u_tab = jnp.asarray(rng.normal(size=(Vu, d)), jnp.float32)
    i_tab = jnp.asarray(rng.normal(size=(Vi, d)), jnp.float32)
    u_acc = jnp.asarray(rng.random(Vu), jnp.float32)
    i_acc = jnp.asarray(rng.random(Vi), jnp.float32)
    u_ids = jnp.asarray(rng.integers(0, Vu, nu), jnp.int32)
    i_ids = jnp.asarray(rng.integers(0, Vi, ni), jnp.int32)
    g_u = jnp.asarray(rng.normal(size=(nu, d)), jnp.float32)
    g_i = jnp.asarray(rng.normal(size=(ni, d)), jnp.float32)
    lr, eps, wd, clip, dense_sq = 0.05, 1e-8, 0.01, 0.5, 2.0

    # reference: local combine -> global-norm clip over totals -> apply
    u_rep, u_tot = combine_duplicate_rows(u_ids, g_u, Vu)
    i_rep, i_tot = combine_duplicate_rows(i_ids, g_i, Vi)
    gnorm = jnp.sqrt(jnp.sum(u_tot ** 2) + jnp.sum(i_tot ** 2) + dense_sq)
    sc = jnp.minimum(clip / gnorm, 1.0)
    ru, rau = sparse_rowwise_adagrad_apply(
        u_tab, u_acc, u_rep, u_tot * sc, lr, eps, wd)
    ri, rai = sparse_rowwise_adagrad_apply(
        i_tab, i_acc, i_rep, i_tot * sc, lr, eps, wd)

    @jax.jit
    def run(u_tab, u_acc, i_tab, i_acc, u_ids, i_ids, g_u, g_i):
        return sharded_sparse_rowwise_adagrad_update(
            mesh, [u_tab, i_tab], [u_acc, i_acc], [u_ids, i_ids],
            [g_u, g_i], lr, eps, wd, clip=clip,
            dense_sq=jnp.float32(dense_sq))

    (su, si), (sau, sai), gs = run(
        u_tab, u_acc, i_tab, i_acc, u_ids, i_ids, g_u, g_i)
    np.testing.assert_allclose(np.asarray(su), np.asarray(ru),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(si), np.asarray(ri),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sau), np.asarray(rau),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sai), np.asarray(rai),
                               rtol=1e-5, atol=1e-6)
    assert float(gs) == pytest.approx(float(sc), rel=1e-6)
    assert float(sc) < 1.0, "clip should actually trigger in this test"


def _cfg(sparse: str, tmp_path, tag: str, *, spd: int = 1,
         clip: float = 0.0, pipeline: str = "auto"):
    """896 users x 640 items: divisible by ici in {1,2,4,8}; entities
    (1536) > 4*B*S (1280) keeps the big-vocab (precompute-OFF) regime."""
    cfg = Config()
    cfg.model.num_users = 896
    cfg.model.num_items = 640
    cfg.model.mf_dim = 8
    cfg.model.mlp_dim = 8
    cfg.model.temporal_dim = 4
    cfg.model.mlp_hidden_dims = [16, 8]
    cfg.model.compute_dtype = "float32"
    cfg.train.batch_size = 64
    cfg.train.num_epochs = 1
    cfg.train.steps_per_dispatch = spd
    cfg.train.embedding_optimizer = "rowwise_adagrad"
    cfg.train.embedding_learning_rate = 0.01
    cfg.train.embedding_scatter = "xla"   # f32 dense grads for exactness
    cfg.train.sparse_table_update = sparse
    cfg.train.gradient_clip_norm = clip
    cfg.train.input_pipeline = pipeline
    cfg.train.checkpoint_dir = str(tmp_path / tag)
    return cfg


@pytest.fixture(scope="module")
def inter():
    return generate_interactions(num_users=896, num_items=640, num_days=40,
                                 avg_txns_per_user=6, seed=11)


def _assert_params_close(ta, tb, rtol=2e-4, atol=2e-5):
    fa = jax.tree_util.tree_flatten_with_path(ta.params)[0]
    fb = dict(jax.tree_util.tree_flatten_with_path(tb.params)[0])
    for path, leaf in fa:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(fb[path]), rtol=rtol, atol=atol,
            err_msg=jax.tree_util.keystr(path))


def test_gate_under_mesh():
    cfg = _cfg("auto", __import__("pathlib").Path("/tmp"), "g")
    mesh = make_mesh(dcn=1, ici=8)
    assert sparse_mode_available(cfg, mesh)
    # non-divisible table rows
    bad = _cfg("auto", __import__("pathlib").Path("/tmp"), "g2")
    bad.model.num_users = 900
    assert not sparse_mode_available(bad, mesh)
    # batch not divisible by device count
    bad2 = _cfg("auto", __import__("pathlib").Path("/tmp"), "g3")
    bad2.train.batch_size = 60
    assert not sparse_mode_available(bad2, mesh)
    # replicated tables: no sharded-sparse path
    bad3 = _cfg("auto", __import__("pathlib").Path("/tmp"), "g4")
    bad3.mesh.shard_embeddings = False
    assert not sparse_mode_available(bad3, mesh)


@pytest.mark.parametrize("dcn,ici,clip",
                         [(1, 8, 0.0), (2, 4, 0.0), (1, 8, 0.05)])
def test_sparse_matches_dense_sharded(inter, tmp_path, dcn, ici, clip):
    """Sparse-on vs sparse-off full Trainer runs on the SAME mesh produce
    the same params and accumulators (clip=0.05 actually triggers)."""
    from ncf_tpu.train import Trainer

    mesh = make_mesh(dcn=dcn, ici=ici)
    td = Trainer(_cfg("off", tmp_path, f"d{clip}", clip=clip), inter,
                 mesh=mesh)
    assert not td.sparse_tables
    td.train_epoch(0)
    ts = Trainer(_cfg("on", tmp_path, f"s{clip}", clip=clip), inter,
                 mesh=mesh)
    assert ts.sparse_tables
    # the tables AND the rowwise accumulators are actually row-sharded
    assert ts.params["user_emb"].sharding.spec[0] == "ici"
    assert ts.opt_state["user_acc"].sharding.spec[0] == "ici"
    ts.train_epoch(0)
    _assert_params_close(td, ts)
    dense_acc = {
        jax.tree_util.keystr(p): leaf
        for p, leaf in jax.tree_util.tree_flatten_with_path(td.opt_state)[0]
        if "sum_sq" in jax.tree_util.keystr(p)}
    u_dense = next(v for k, v in dense_acc.items() if "user_emb" in k)
    np.testing.assert_allclose(np.asarray(ts.opt_state["user_acc"]),
                               np.asarray(u_dense), rtol=1e-4, atol=1e-6)


def test_sharded_sparse_matches_single_device_sparse(inter, tmp_path):
    """Same host input pipeline => the sharded sparse run is
    trajectory-identical to the single-device sparse run."""
    from ncf_tpu.train import Trainer

    t1 = Trainer(_cfg("on", tmp_path, "sd", pipeline="host"), inter)
    assert t1.sparse_tables
    t1.train_epoch(0)
    t8 = Trainer(_cfg("on", tmp_path, "sh"), inter,
                 mesh=make_mesh(dcn=1, ici=8))
    t8.train_epoch(0)
    _assert_params_close(t1, t8)


def test_multi_step_dispatch_sharded_sparse(inter, tmp_path):
    """steps_per_dispatch > 1 under the mesh (lax.scan over the sharded
    sparse body) stays equivalent to the dense sharded path."""
    from ncf_tpu.train import Trainer

    mesh = make_mesh(dcn=1, ici=8)
    td = Trainer(_cfg("off", tmp_path, "md", spd=3), inter, mesh=mesh)
    td.train_epoch(0)
    ts = Trainer(_cfg("on", tmp_path, "ms", spd=3), inter, mesh=mesh)
    assert ts.sparse_tables
    ts.train_epoch(0)
    _assert_params_close(td, ts)


def test_sharded_sparse_checkpoint_to_single_device(inter, tmp_path):
    """Topology-change restore: sharded sparse save -> single-device
    sparse resume (SURVEY.md §7 hard part 5 for the sparse state)."""
    from ncf_tpu.train import Trainer

    mesh = make_mesh(dcn=1, ici=8)
    cfg = _cfg("on", tmp_path, "ck")
    t1 = Trainer(cfg, inter, mesh=mesh)
    t1.train_epoch(0)
    t1.save_checkpoint(0, {"val_loss": 1.0})

    t2 = Trainer(_cfg("on", tmp_path, "ck"), inter)   # same ckpt dir
    assert t2.resume()
    np.testing.assert_allclose(np.asarray(t1.params["user_emb"]),
                               np.asarray(t2.params["user_emb"]),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(t1.opt_state["item_acc"]),
                               np.asarray(t2.opt_state["item_acc"]),
                               rtol=1e-6)


@pytest.mark.parametrize("dcn,ici", [(1, 8), (2, 4)])
def test_sequence_sparse_sharded_matches_dense_sharded(inter, tmp_path,
                                                       dcn, ici):
    """The FULL composition: sequence path + sparse row updates +
    row-sharded tables.  History-occurrence grads route to owner shards
    through the same all-to-all as candidate grads; trajectory must
    match the dense sharded path on the same mesh."""
    from ncf_tpu.train import Trainer

    mesh = make_mesh(dcn=dcn, ici=ici)

    def cfg_seq(sparse, tag):
        cfg = _cfg(sparse, tmp_path, tag)
        cfg.model.use_sequence = True
        cfg.model.history_len = 5
        return cfg

    td = Trainer(cfg_seq("off", f"qd{dcn}{ici}"), inter, mesh=mesh)
    assert not td.sparse_tables
    td.train_epoch(0)
    ts = Trainer(cfg_seq("on", f"qs{dcn}{ici}"), inter, mesh=mesh)
    assert ts.sparse_tables
    ts.train_epoch(0)
    _assert_params_close(td, ts)
    dense_acc = {
        jax.tree_util.keystr(p): leaf
        for p, leaf in jax.tree_util.tree_flatten_with_path(td.opt_state)[0]
        if "sum_sq" in jax.tree_util.keystr(p)}
    i_dense = next(v for k, v in dense_acc.items() if "item_emb" in k)
    np.testing.assert_allclose(np.asarray(ts.opt_state["item_acc"]),
                               np.asarray(i_dense), rtol=1e-4, atol=1e-6)
