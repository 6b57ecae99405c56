"""End-to-end training smoke tests (SURVEY.md §4 plan (e)): the jitted
train step reduces loss, the Trainer loop runs with validation + ranking
eval, checkpoints land on disk, and resume restores state."""

import jax
import numpy as np
import pytest

from ncf_tpu.data.synthetic import generate_interactions
from ncf_tpu.train.trainer import Trainer
from ncf_tpu.utils.config import Config


def small_cfg(tmp_path, **train_kw) -> Config:
    cfg = Config()
    cfg.model.mf_dim = 16
    cfg.model.mlp_dim = 16
    cfg.model.temporal_dim = 8
    cfg.model.mlp_hidden_dims = [32, 16]
    cfg.model.compute_dtype = "float32"
    cfg.model.negative_samples = 4
    cfg.data.validation_days = 5
    cfg.data.num_eval_negatives = 50
    cfg.train.batch_size = 128
    cfg.train.num_epochs = 3
    cfg.train.log_every_steps = 5
    cfg.train.checkpoint_dir = str(tmp_path / "ckpt")
    for k, v in train_kw.items():
        setattr(cfg.train, k, v)
    return cfg


@pytest.fixture(scope="module")
def inter():
    return generate_interactions(
        num_users=300, num_items=80, num_days=40,
        avg_txns_per_user=15, seed=11)


class TestTrainerSmoke:
    def test_loss_decreases_and_ranking_beats_random(self, inter, tmp_path):
        cfg = small_cfg(tmp_path)
        trainer = Trainer(cfg, inter)

        first_val = trainer.validate(epoch=-1)
        best = trainer.train()
        final_val = trainer.validate(epoch=99)

        assert final_val["val_loss"] < first_val["val_loss"]
        # random ranking => hr@10 ~ 10/51 ~ 0.196; trained must beat it
        assert final_val["hr@10"] > 0.27, final_val
        assert best, "train() should return best metrics"

    def test_checkpoint_and_resume(self, inter, tmp_path):
        cfg = small_cfg(tmp_path, num_epochs=1)
        t1 = Trainer(cfg, inter)
        t1.train()
        assert t1.global_step > 0

        t2 = Trainer(cfg, inter)
        assert t2.resume()
        assert t2.global_step == t1.global_step
        assert t2.start_epoch == 1
        a = jax.tree_util.tree_leaves(t1.params)
        b = jax.tree_util.tree_leaves(t2.params)
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y))

    def test_resume_without_checkpoint_is_false(self, inter, tmp_path):
        cfg = small_cfg(tmp_path / "none", num_epochs=1)
        t = Trainer(cfg, inter)
        assert not t.resume()


def test_steps_per_dispatch_multi_step(tiny_interactions, tmp_path):
    """K-step scan dispatch must train equivalently well (same data
    order, same per-step rng split chain) and keep step accounting."""
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
    cfg.train.steps_per_dispatch = 4
    cfg.train.checkpoint_dir = str(tmp_path / "ck")
    t = Trainer(cfg, tiny_interactions)
    m = t.train()
    assert np.isfinite(m["val_loss"])
    # global_step must count optimizer steps, not dispatches
    assert t.global_step == len(t.train_iter)


def test_early_stopping_metric_hr10(tiny_interactions, tmp_path):
    """early_stopping_metric=hr@10 maximizes hr@10 and stops after
    `patience` non-improving epochs (roadmap #6)."""
    from ncf_tpu.train import Trainer
    from ncf_tpu.utils import Config

    cfg = Config()
    cfg.model.mf_dim = 8
    cfg.model.mlp_dim = 8
    cfg.model.temporal_dim = 4
    cfg.model.mlp_hidden_dims = [16]
    cfg.model.compute_dtype = "float32"
    cfg.train.batch_size = 64
    cfg.train.num_epochs = 10
    cfg.train.early_stopping_metric = "hr@10"
    cfg.train.early_stopping_patience = 2
    cfg.train.checkpoint_dir = str(tmp_path / "ck")
    t = Trainer(cfg, tiny_interactions)

    # scripted validation: hr@10 peaks at epoch 2, val_loss keeps falling
    # (val_loss-based stopping would never trigger)
    script = [0.10, 0.30, 0.50, 0.40, 0.45, 0.20, 0.20, 0.2, 0.2, 0.2]
    calls = []

    def fake_validate(epoch):
        calls.append(epoch)
        return {"val_loss": 1.0 / (epoch + 2), "hr@10": script[epoch],
                "ndcg@10": 0.0}

    t.validate = fake_validate
    best = t.train()
    assert best["hr@10"] == 0.50 and best["epoch"] == 2
    # stopped after 2 bad epochs following the peak: epochs 0..4 evaluated
    assert calls == [0, 1, 2, 3, 4]
