"""Profiler trace capture + candidate_mode semantics tests."""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np

from ncf_tpu.utils.profiling import annotate, trace


class TestTraceCapture:
    def test_trace_writes_profile(self, tmp_path):
        d = str(tmp_path / "prof")
        with trace(d):
            with annotate("test-span"):
                x = jnp.ones((64, 64))
                y = jax.jit(lambda a: a @ a)(x)
                jax.block_until_ready(y)
        # xplane protobufs land under <dir>/plugins/profile/<run>/
        files = glob.glob(os.path.join(d, "**", "*.xplane.pb"),
                          recursive=True)
        assert files, f"no trace files under {d}"


class TestCandidateMode:
    def test_independent_mode_trains_mlp_path_to_rank(self, tmp_path):
        """In 'independent' mode the train step scores slots per-candidate
        (eval-consistent); the training logits must therefore differ
        across negative slots with different items, which 'joint' mode's
        MLP path cannot produce on its own."""
        from ncf_tpu.data.synthetic import generate_interactions
        from ncf_tpu.train.trainer import Trainer
        from ncf_tpu.utils.config import Config

        inter = generate_interactions(num_users=150, num_items=50,
                                      num_days=20, avg_txns_per_user=10,
                                      seed=3)
        results = {}
        for mode in ("joint", "independent"):
            cfg = Config()
            cfg.model.candidate_mode = mode
            cfg.model.mf_dim = 16
            cfg.model.mlp_dim = 16
            cfg.model.temporal_dim = 8
            cfg.model.mlp_hidden_dims = [32, 16]
            cfg.model.compute_dtype = "float32"
            cfg.data.num_eval_negatives = 30
            cfg.train.batch_size = 128
            cfg.train.num_epochs = 5
            cfg.train.checkpoint_dir = str(tmp_path / mode)
            t = Trainer(cfg, inter)
            before = t.validate(-1)
            t.train()
            after = t.validate(99)
            results[mode] = (before, after)
        # both modes must learn: ranking improves and loss drops
        for mode, (before, after) in results.items():
            assert after["hr@10"] > before["hr@10"], (mode, before, after)
            assert after["val_loss"] < before["val_loss"], mode
