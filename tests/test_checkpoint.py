"""Checkpoint save/restore/discovery/GC/consolidation tests
(reference capability: trainer.py:548-622, consolidate_shards.py; fixes
SURVEY.md §2.9.2)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ncf_tpu.models import advanced_ncf
from ncf_tpu.train import checkpoint as C
from ncf_tpu.utils.config import ModelConfig


@pytest.fixture
def state():
    cfg = ModelConfig(num_users=20, num_items=10, num_departments=3,
                      num_categories=4, mf_dim=8, mlp_dim=8, temporal_dim=4,
                      mlp_hidden_dims=[16, 8], compute_dtype="float32")
    params = advanced_ncf.init(jax.random.PRNGKey(0), cfg)
    opt = optax.adam(1e-3)
    return {"params": params, "opt_state": opt.init(params)}


class TestRoundtrip:
    def test_save_restore(self, state, tmp_path):
        d = str(tmp_path)
        ckpt = C.save(d, state, step=10, epoch=2,
                      metrics={"val_loss": 0.5}, config={"x": 1})
        zeros = jax.tree_util.tree_map(jnp.zeros_like, state)
        restored, manifest = C.restore(ckpt, zeros)
        assert manifest["step"] == 10 and manifest["epoch"] == 2
        assert manifest["metrics"]["val_loss"] == 0.5
        for a, b in zip(jax.tree_util.tree_leaves(state),
                        jax.tree_util.tree_leaves(restored)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_shape_mismatch_raises(self, state, tmp_path):
        d = str(tmp_path)
        ckpt = C.save(d, state, step=1)
        bad = jax.tree_util.tree_map(
            lambda x: np.zeros((3, 3), np.float32) if hasattr(x, "shape") else x,
            state)
        with pytest.raises((ValueError, KeyError)):
            C.restore(ckpt, bad)


class TestDiscovery:
    def test_find_latest_and_best(self, state, tmp_path):
        d = str(tmp_path)
        assert C.find_latest(d) is None
        c1 = C.save(d, state, step=5)
        c2 = C.save(d, state, step=17)
        assert C.find_latest(d) == c2
        C.mark_best(d, c1)
        assert C.find_best(d) == os.path.join(d, os.path.basename(c1))

    def test_garbage_collect_keeps_best(self, state, tmp_path):
        d = str(tmp_path)
        dirs = [C.save(d, state, step=s) for s in (1, 2, 3, 4, 5)]
        C.mark_best(d, dirs[0])
        removed = C.garbage_collect(d, keep=2)
        assert os.path.basename(dirs[0]) not in removed  # best survives
        remaining = {n for n in os.listdir(d) if n.startswith("ckpt_")}
        assert os.path.basename(dirs[0]) in remaining
        assert os.path.basename(dirs[-1]) in remaining
        assert len(remaining) == 3  # best + newest 2


class TestConsolidate:
    def test_consolidate_dense(self, state, tmp_path):
        d = str(tmp_path / "ck")
        out = str(tmp_path / "out")
        ckpt = C.save(d, state, step=1)
        C.consolidate(ckpt, out)
        zeros = jax.tree_util.tree_map(jnp.zeros_like, state)
        restored, _ = C.restore(out, zeros)
        for a, b in zip(jax.tree_util.tree_leaves(state),
                        jax.tree_util.tree_leaves(restored)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))


class TestOrbaxBackend:
    """Orbax leaf storage behind the same manifest/discovery layout
    (roadmap #10)."""

    def _state(self):
        import jax.numpy as jnp

        return {"params": {"w": jnp.arange(12.0).reshape(3, 4),
                           "b": jnp.ones((4,))},
                "opt": {"count": jnp.asarray(7, jnp.int32)}}

    def test_save_restore_roundtrip(self, tmp_path):
        import jax

        from ncf_tpu.train import checkpoint as ck

        state = self._state()
        p = ck.save(str(tmp_path), state, step=5, epoch=1,
                    metrics={"hr@10": 0.5}, backend="orbax")
        tmpl = jax.tree_util.tree_map(lambda x: x * 0, state)
        got, man = ck.restore(p, tmpl)
        assert man["backend"] == "orbax" and man["step"] == 5
        np.testing.assert_array_equal(np.asarray(got["params"]["w"]),
                                      np.asarray(state["params"]["w"]))
        assert int(got["opt"]["count"]) == 7
        # discovery / best-marking work unchanged
        assert ck.find_latest(str(tmp_path)) == p
        ck.mark_best(str(tmp_path), p)
        assert ck.find_best(str(tmp_path)) == p

    def test_async_save_commits(self, tmp_path):
        import jax

        from ncf_tpu.train import checkpoint as ck

        state = self._state()
        p = ck.save(str(tmp_path), state, step=9, backend="orbax",
                    async_save=True)
        ck.wait_for_pending()
        got, _ = ck.restore(p, jax.tree_util.tree_map(lambda x: x * 0, state))
        np.testing.assert_array_equal(np.asarray(got["params"]["b"]),
                                      np.ones(4))

    def test_trainer_with_orbax_backend(self, tiny_interactions, tmp_path):
        from ncf_tpu.train import Trainer
        from ncf_tpu.utils import Config

        cfg = Config()
        cfg.model.mf_dim = 8
        cfg.model.mlp_dim = 8
        cfg.model.temporal_dim = 4
        cfg.model.mlp_hidden_dims = [16]
        cfg.model.compute_dtype = "float32"
        cfg.train.batch_size = 64
        cfg.train.num_epochs = 1
        cfg.train.checkpoint_backend = "orbax_async"
        cfg.train.checkpoint_dir = str(tmp_path / "ck")
        t = Trainer(cfg, tiny_interactions)
        t.train()
        t2 = Trainer(cfg, tiny_interactions)
        assert t2.resume()
        assert t2.global_step == t.global_step
