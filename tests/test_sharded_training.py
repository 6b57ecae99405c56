"""Mesh-aware Trainer test: full training over the 8-device CPU mesh with
row-sharded embedding tables + data-parallel batches, compared against
the single-device path."""

import jax
import numpy as np
import pytest

from ncf_tpu.data.synthetic import generate_interactions
from ncf_tpu.parallel import make_mesh, param_shardings
from ncf_tpu.train.trainer import Trainer
from ncf_tpu.utils.config import Config


def cfg_for(tmp_path, num_users=256, num_items=64):
    cfg = Config()
    cfg.data.synthetic_users = num_users
    cfg.model.mf_dim = 16
    cfg.model.mlp_dim = 16
    cfg.model.temporal_dim = 8
    cfg.model.mlp_hidden_dims = [32, 16]
    cfg.model.compute_dtype = "float32"
    cfg.data.num_eval_negatives = 20
    cfg.train.batch_size = 128
    cfg.train.num_epochs = 1
    cfg.train.checkpoint_dir = str(tmp_path / "ck")
    return cfg


@pytest.fixture(scope="module")
def inter():
    # 256 users / 64 items: both divisible by the 8-device ici axis
    return generate_interactions(num_users=256, num_items=64, num_days=30,
                                 avg_txns_per_user=12, seed=13)


class TestShardedTrainer:
    def test_tables_are_sharded_and_training_runs(self, inter, tmp_path):
        mesh = make_mesh(dcn=1, ici=8)
        cfg = cfg_for(tmp_path)
        t = Trainer(cfg, inter, mesh=mesh)

        # embedding tables actually row-sharded
        spec = t.params["user_emb"].sharding.spec
        assert spec[0] == "ici", spec
        # dense tower replicated
        assert t.params["final"]["w"].sharding.spec == ()
        # optimizer state inherited the table sharding
        leaves = jax.tree_util.tree_flatten_with_path(t.opt_state)[0]
        mu_sharded = [
            leaf for path, leaf in leaves
            if "user_emb" in ".".join(str(getattr(p, "key", "")) for p in path)
            and hasattr(leaf, "sharding")]
        assert any(l.sharding.spec and l.sharding.spec[0] == "ici"
                   for l in mu_sharded)

        m = t.train_epoch(0)
        assert np.isfinite(m["loss"]) if "loss" in m else True
        val = t.validate(0)
        assert np.isfinite(val["val_loss"])
        assert 0 <= val["hr@10"] <= 1

    def test_sharded_checkpoint_roundtrip(self, inter, tmp_path):
        """Save from a sharded trainer, restore into an unsharded one —
        the topology-change restore of SURVEY.md §7 hard part 5."""
        mesh = make_mesh(dcn=1, ici=8)
        cfg = cfg_for(tmp_path)
        t1 = Trainer(cfg, inter, mesh=mesh)
        t1.train_epoch(0)
        t1.save_checkpoint(0, {"val_loss": 1.0})

        t2 = Trainer(cfg, inter, mesh=None)  # single-device restore
        assert t2.resume()
        a = np.asarray(t1.params["user_emb"])
        b = np.asarray(t2.params["user_emb"])
        np.testing.assert_allclose(a, b, rtol=1e-6)

    def test_sharded_matches_unsharded_loss_trajectory(self, inter, tmp_path):
        """Same seed, same data: the sharded step must produce the same
        validation loss as the single-device step (determinism across
        layouts, up to float reassociation)."""
        cfg_a = cfg_for(tmp_path / "a")
        cfg_b = cfg_for(tmp_path / "b")
        ta = Trainer(cfg_a, inter, mesh=None)
        tb = Trainer(cfg_b, inter, mesh=make_mesh(dcn=1, ici=8))
        ta.train_epoch(0)
        tb.train_epoch(0)
        va = ta.validate(0)["val_loss"]
        vb = tb.validate(0)["val_loss"]
        assert va == pytest.approx(vb, rel=2e-2)

    def test_multi_step_dispatch_on_mesh(self, inter, tmp_path):
        """steps_per_dispatch > 1 with a mesh: stacked batches keep the
        scan axis replicated and the batch axis data-parallel."""
        mesh = make_mesh(dcn=1, ici=8)
        cfg = cfg_for(tmp_path)
        cfg.train.steps_per_dispatch = 3
        t = Trainer(cfg, inter, mesh=mesh)
        m = t.train_epoch(0)
        assert t.global_step == len(t.train_iter)
        val = t.validate(0)
        assert np.isfinite(val["val_loss"])


class TestShardedSequence:
    """The sequence path (history attention) under the mesh: sharded
    tables + replicated history consts must match the single-device
    trajectory."""

    def test_sequence_trajectory_matches_single_device(self, inter,
                                                       tmp_path):
        cfg = cfg_for(tmp_path / "seq1")
        cfg.model.use_sequence = True
        cfg.model.history_len = 6
        cfg.train.input_pipeline = "host"
        t1 = Trainer(cfg, inter)
        m1 = t1.train_epoch(0)
        v1 = t1.validate(0)

        cfg8 = cfg_for(tmp_path / "seq8")
        cfg8.model.use_sequence = True
        cfg8.model.history_len = 6
        t8 = Trainer(cfg8, inter, mesh=make_mesh(dcn=1, ici=8))
        assert t8.params["user_emb"].sharding.spec[0] == "ici"
        m8 = t8.train_epoch(0)
        v8 = t8.validate(0)

        assert np.isclose(v1["val_loss"], v8["val_loss"], rtol=1e-4), (
            v1["val_loss"], v8["val_loss"])
        fa = jax.tree_util.tree_flatten_with_path(t1.params)[0]
        fb = dict(jax.tree_util.tree_flatten_with_path(t8.params)[0])
        for path, leaf in fa:
            np.testing.assert_allclose(
                np.asarray(leaf), np.asarray(fb[path]), rtol=2e-4,
                atol=2e-5, err_msg=jax.tree_util.keystr(path))
