"""steps_per_dispatch autotuning (train/autotune.py): cfg value 0 makes
the Trainer measure dispatch overhead and choose K; training state is
untouched by the probes and the chosen K trains normally."""

import numpy as np

from ncf_tpu.train.trainer import Trainer
from ncf_tpu.utils.config import Config


def test_autotune_selects_and_trains(tiny_interactions, tmp_path):
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
    cfg.train.steps_per_dispatch = 0          # auto

    t = Trainer(cfg, tiny_interactions)
    assert cfg.train.steps_per_dispatch in (1, 8, 16, 32)
    # probe steps must not have advanced training state
    assert t.global_step == 0
    m = t.train_epoch(0)
    assert t.global_step == len(t.train_iter) or (
        cfg.train.steps_per_dispatch > 1)  # grouped dispatch may pad/trim
    assert np.isfinite(m["epoch_seconds"])
    val = t.validate(0)
    assert np.isfinite(val["val_loss"])
