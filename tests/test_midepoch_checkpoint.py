"""Mid-epoch checkpointing + in-epoch resume (round-2 verdict item 7).

train.checkpoint_every_dispatches saves the full training state —
including the device PRNG key and the dispatch index — every N device
dispatches; the epoch iterators are deterministic per (seed, epoch), so
resume() re-enters the epoch at the recorded dispatch and the continued
run is BIT-FOR-BIT identical to an uninterrupted one (reference analogue:
periodic + emergency saves only, trainer.py:493-546).
"""

import json
import os

import jax
import numpy as np
import pytest

from ncf_tpu.data import generate_interactions
from ncf_tpu.train import Trainer
from ncf_tpu.utils.config import Config


def _cfg(ckpt_dir, pipeline="auto", **kw):
    cfg = Config()
    cfg.model.mf_dim = 8
    cfg.model.mlp_dim = 8
    cfg.model.temporal_dim = 4
    cfg.model.mlp_hidden_dims = [16, 8]
    cfg.model.compute_dtype = "float32"
    cfg.train.batch_size = 128
    cfg.train.num_epochs = 2
    cfg.train.checkpoint_dir = str(ckpt_dir)
    cfg.train.checkpoint_every_dispatches = 5
    cfg.train.keep_checkpoints = 1000
    cfg.train.input_pipeline = pipeline
    for k, v in kw.items():
        setattr(cfg.train, k, v)
    return cfg


@pytest.fixture(scope="module")
def inter():
    return generate_interactions(num_users=300, num_items=64, num_days=40,
                                 avg_txns_per_user=12, seed=9)


def _mid_epoch_ckpts(ckpt_dir):
    out = []
    for name in sorted(os.listdir(ckpt_dir)):
        mf = os.path.join(ckpt_dir, name, "manifest.json")
        if not os.path.isfile(mf):
            continue
        with open(mf) as f:
            m = json.load(f)
        if (m.get("extra") or {}).get("in_epoch"):
            out.append((os.path.join(ckpt_dir, name), m))
    return out


@pytest.mark.parametrize("pipeline,spd", [
    ("device", 1), ("device", 3), ("host", 1), ("host", 3),
])
def test_kill_resume_bit_exact(tmp_path, inter, pipeline, spd):
    """Uninterrupted run == resume-from-mid-epoch run, bit for bit, on
    both pipelines and with multi-step dispatch."""
    dir_a = tmp_path / f"a_{pipeline}_{spd}"
    cfg_a = _cfg(dir_a, pipeline=pipeline, steps_per_dispatch=spd)
    t_a = Trainer(cfg_a, inter)
    t_a.train()
    final_a = jax.tree_util.tree_leaves(t_a.params)
    step_a = t_a.global_step

    mids = _mid_epoch_ckpts(dir_a)
    assert mids, "no mid-epoch checkpoints were written"
    # pick a mid-epoch checkpoint from the SECOND epoch when one exists
    # (exercises the epoch>0 + skip path), else the last of epoch 0
    pick, manifest = next(
        ((p, m) for p, m in mids if m["epoch"] > 0), mids[-1])
    assert manifest["extra"]["dispatch"] > 0

    cfg_b = _cfg(dir_a, pipeline=pipeline, steps_per_dispatch=spd)
    t_b = Trainer(cfg_b, inter)
    assert t_b.resume(pick)
    assert t_b.start_epoch == manifest["epoch"]
    assert t_b._resume_dispatch == manifest["extra"]["dispatch"]
    t_b.train()
    final_b = jax.tree_util.tree_leaves(t_b.params)
    assert t_b.global_step == step_a
    for a, b in zip(final_a, final_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_latest_prefers_newest_and_restores_rng(tmp_path, inter):
    cfg = _cfg(tmp_path / "c")
    t = Trainer(cfg, inter)
    t.train()
    rng_before = np.asarray(t.rng)
    t2 = Trainer(_cfg(tmp_path / "c"), inter)
    assert t2.resume()
    # newest checkpoint is the final epoch-boundary one
    assert t2.start_epoch == cfg.train.num_epochs
    np.testing.assert_array_equal(np.asarray(t2.rng), rng_before)


def test_midepoch_gc_spares_epoch_boundary_ckpts(tmp_path, inter):
    """A tight keep_checkpoints budget with frequent mid-epoch saves must
    NOT cycle epoch-boundary checkpoints out (round-3 advisor low):
    mid-epoch saves GC only other mid-epoch checkpoints."""
    cfg = _cfg(tmp_path / "gc", checkpoint_every_dispatches=0,
               keep_checkpoints=2)
    t = Trainer(cfg, inter)
    boundary = t.save_checkpoint(0, {"val_loss": 1.0})
    # a burst of mid-epoch saves under a tight budget (pre-fix these
    # GC'd the boundary checkpoint out of the shared retention window)
    for d in range(1, 6):
        t.global_step += 1
        t.save_checkpoint(1, {"mid_epoch": 1.0},
                          extra={"dispatch": d, "in_epoch": True})
    ckpt_dir = str(tmp_path / "gc")
    assert os.path.isdir(boundary), "epoch-boundary checkpoint was GC'd"
    # and the mid-epoch set itself is bounded by the budget
    assert len(_mid_epoch_ckpts(ckpt_dir)) <= 2


def test_epoch_boundary_checkpoints_unaffected(tmp_path, inter):
    """checkpoint_every_dispatches=0 keeps the old behavior: only
    epoch-boundary saves, resume starts at the next epoch."""
    cfg = _cfg(tmp_path / "d", checkpoint_every_dispatches=0)
    t = Trainer(cfg, inter)
    t.train()
    assert not _mid_epoch_ckpts(str(tmp_path / "d"))
    t2 = Trainer(_cfg(tmp_path / "d", checkpoint_every_dispatches=0), inter)
    assert t2.resume()
    assert t2._resume_dispatch == 0
