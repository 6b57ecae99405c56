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
