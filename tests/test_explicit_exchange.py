"""The explicit all-to-all embedding exchange INTEGRATED into the real
training path (VERDICT.md round-1 items 1-2).

Covers:
- ``exchange_lookup`` (parallel/embedding_sharding.py): exact parity with
  a plain gather on (1,8) and (2,4) ('dcn','ici') meshes, gradients
  (including the dcn psum), non-divisible id counts, multi-dim ids, and
  maximally skewed (sorted) id streams under exact capacity;
- ``cfg.mesh.embedding_exchange='explicit'``: a full Trainer epoch whose
  loss trajectory matches the pjit path (same seed, same batches), on
  both mesh shapes;
- dcn>1 semantics: training + validation + checkpoint save on a (2,4)
  mesh restored onto (1,8) and onto a single device.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ncf_tpu.data.synthetic import generate_interactions
from ncf_tpu.ops import embedding as embedding_ops
from ncf_tpu.parallel import make_mesh
from ncf_tpu.parallel.embedding_sharding import exchange_lookup
from ncf_tpu.train.trainer import Trainer
from ncf_tpu.utils.config import Config


@pytest.fixture(autouse=True)
def _clear_exchange_registry():
    yield
    embedding_ops.clear_exchange()


@pytest.fixture(scope="module")
def inter():
    return generate_interactions(num_users=256, num_items=64, num_days=30,
                                 avg_txns_per_user=12, seed=13)


def cfg_for(tmp_path, exchange="pjit"):
    cfg = Config()
    cfg.model.mf_dim = 16
    cfg.model.mlp_dim = 16
    cfg.model.temporal_dim = 8
    cfg.model.mlp_hidden_dims = [32, 16]
    cfg.model.compute_dtype = "float32"
    cfg.data.num_eval_negatives = 20
    cfg.train.batch_size = 128
    cfg.train.num_epochs = 1
    cfg.train.checkpoint_dir = str(tmp_path / "ck")
    cfg.mesh.embedding_exchange = exchange
    return cfg


MESHES = [(1, 8), (2, 4)]


class TestExchangeLookup:
    @pytest.mark.parametrize("dcn,ici", MESHES)
    def test_matches_gather(self, dcn, ici, rng):
        mesh = make_mesh(dcn=dcn, ici=ici)
        N, D = 64, 16
        table = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
        for n in (128, 77, 8):  # 77: pad path; 8: one id per device
            ids = jnp.asarray(rng.integers(0, N, n).astype(np.int32))
            out = exchange_lookup(mesh, table, ids)
            np.testing.assert_allclose(np.asarray(out),
                                       np.asarray(table)[np.asarray(ids)])

    @pytest.mark.parametrize("dcn,ici", MESHES)
    def test_multidim_ids(self, dcn, ici, rng):
        mesh = make_mesh(dcn=dcn, ici=ici)
        N, D = 32, 8
        table = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
        ids = jnp.asarray(rng.integers(0, N, (16, 5)).astype(np.int32))
        out = exchange_lookup(mesh, table, ids)
        assert out.shape == (16, 5, D)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(table)[np.asarray(ids)])

    @pytest.mark.parametrize("dcn,ici", MESHES)
    def test_grad_with_duplicates(self, dcn, ici, rng):
        """Gradient = segment-sum over duplicate ids, psum'd over dcn."""
        mesh = make_mesh(dcn=dcn, ici=ici)
        N, D = 32, 8
        table = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
        ids = jnp.asarray((rng.integers(0, 4, 64)).astype(np.int32))  # heavy dupes
        w = jnp.asarray(rng.normal(size=(64, D)).astype(np.float32))

        def loss_ex(t):
            return (exchange_lookup(mesh, t, ids) * w).sum()

        def loss_ref(t):
            return (jnp.take(t, ids, axis=0) * w).sum()

        g_ex = jax.jit(jax.grad(loss_ex))(table)
        g_ref = jax.grad(loss_ref)(table)
        np.testing.assert_allclose(np.asarray(g_ex), np.asarray(g_ref),
                                   rtol=1e-6, atol=1e-6)

    def test_sorted_skewed_ids_exact_capacity(self, rng):
        """The default pipeline ships sorted ids: every local id lands on
        one owner shard.  Exact capacity (factor<=0) must not drop any."""
        mesh = make_mesh(dcn=1, ici=8)
        N, D = 64, 16
        table = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
        ids = jnp.sort(jnp.asarray(rng.integers(0, N, 128).astype(np.int32)))
        out = exchange_lookup(mesh, table, ids, capacity_factor=0.0)
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(table)[np.asarray(ids)])

    def test_registry_routes_and_clears(self, rng):
        mesh = make_mesh(dcn=1, ici=8)
        N, D = 64, 16
        table = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
        ids = jnp.asarray(rng.integers(0, N, 32).astype(np.int32))
        embedding_ops.set_exchange(mesh, {N})
        assert embedding_ops.get_exchange() is not None
        out = embedding_ops.embedding_lookup(table, ids)
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(table)[np.asarray(ids)])
        # unregistered row counts take the plain path
        small = jnp.asarray(rng.normal(size=(5, D)).astype(np.float32))
        sids = jnp.asarray(rng.integers(0, 5, 32).astype(np.int32))
        out2 = embedding_ops.embedding_lookup(small, sids)
        np.testing.assert_allclose(np.asarray(out2),
                                   np.asarray(small)[np.asarray(sids)])
        embedding_ops.clear_exchange()
        assert embedding_ops.get_exchange() is None


class TestExplicitExchangeTraining:
    @pytest.mark.parametrize("dcn,ici", MESHES)
    def test_matches_pjit_trajectory(self, inter, tmp_path, dcn, ici):
        """Same seed, same batches: the explicit exchange must reproduce
        the pjit path's training (identical lookups; gradients differ only
        by float summation order in the scatter vs segment-sum)."""
        mesh = make_mesh(dcn=dcn, ici=ici)
        tp = Trainer(cfg_for(tmp_path / "p"), inter, mesh=mesh)
        tp.train_epoch(0)
        vp = tp.validate(0)
        params_p = jax.tree_util.tree_map(np.asarray, tp.params)

        te = Trainer(cfg_for(tmp_path / "e", exchange="explicit"), inter,
                     mesh=mesh)
        assert embedding_ops.get_exchange() is not None, (
            "trainer did not register the explicit exchange")
        te.train_epoch(0)
        ve = te.validate(0)
        params_e = jax.tree_util.tree_map(np.asarray, te.params)

        assert vp["val_loss"] == pytest.approx(ve["val_loss"], rel=1e-3)
        assert vp["hr@10"] == pytest.approx(ve["hr@10"], abs=0.05)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-3,
                                                    atol=1e-5),
            params_p, params_e)

    def test_dcn2_full_trainer_and_topology_change_restore(
            self, inter, tmp_path):
        """(dcn=2, ici=4): full epoch + validate + checkpoint, restored
        onto (1,8) and onto a single device (VERDICT item 2)."""
        mesh24 = make_mesh(dcn=2, ici=4)
        cfg = cfg_for(tmp_path, exchange="explicit")
        t = Trainer(cfg, inter, mesh=mesh24)
        m = t.train_epoch(0)
        assert np.isfinite(m.get("loss", 0.0))
        val = t.validate(0)
        assert np.isfinite(val["val_loss"])
        assert 0 <= val["hr@10"] <= 1
        t.save_checkpoint(0, {"val_loss": float(val["val_loss"])})
        src = np.asarray(t.params["user_emb"])

        t18 = Trainer(cfg_for(tmp_path, exchange="pjit"), inter,
                      mesh=make_mesh(dcn=1, ici=8))
        assert t18.resume()
        np.testing.assert_allclose(np.asarray(t18.params["user_emb"]), src,
                                   rtol=1e-6)

        t1 = Trainer(cfg_for(tmp_path), inter, mesh=None)
        assert t1.resume()
        np.testing.assert_allclose(np.asarray(t1.params["user_emb"]), src,
                                   rtol=1e-6)

    def test_dcn2_multi_step_dispatch(self, inter, tmp_path):
        mesh = make_mesh(dcn=2, ici=4)
        cfg = cfg_for(tmp_path, exchange="explicit")
        cfg.train.steps_per_dispatch = 3
        t = Trainer(cfg, inter, mesh=mesh)
        t.train_epoch(0)
        assert t.global_step == len(t.train_iter)
        assert np.isfinite(t.validate(0)["val_loss"])


class TestExchangeLifecycle:
    def test_registry_cleared_after_train(self, inter, tmp_path):
        """The process-global exchange registry must not outlive
        training: a serving lookup on a same-row-count table in this
        process would otherwise be silently routed through shard_map
        over the stale training mesh (deadlock on real multi-host)."""
        from ncf_tpu.ops import embedding as embedding_ops

        mesh = make_mesh(dcn=1, ici=8)
        cfg = cfg_for(tmp_path / "lc", exchange="explicit")
        cfg.train.num_epochs = 1
        t = Trainer(cfg, inter, mesh=mesh)
        assert embedding_ops.get_exchange() is not None
        t.train()
        assert embedding_ops.get_exchange() is None
        # a second train() re-registers for its own duration
        t.train(num_epochs=1)
        assert embedding_ops.get_exchange() is None
