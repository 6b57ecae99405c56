"""CLI smoke tests: each subcommand runs end-to-end on tiny synthetic data."""

import os

import pytest

from ncf_tpu.cli import main

TINY = [
    "data.synthetic_users=60", "data.synthetic_items=30",
    "data.synthetic_days=20", "data.synthetic_avg_txns_per_user=8",
    "model.mf_dim=8", "model.mlp_dim=8", "model.temporal_dim=4",
    "model.mlp_hidden_dims=[16,8]", "model.compute_dtype=float32",
    "data.num_eval_negatives=20",
]


class TestCLI:
    def test_datagen(self, tmp_path, capsys):
        out = str(tmp_path / "inter.jsonl")
        rc = main(["datagen", "--output", out] + TINY)
        assert rc == 0 and os.path.exists(out)
        assert "60 users x 30 items" in capsys.readouterr().out

    def test_train_then_evaluate_then_export_then_score(self, tmp_path, capsys):
        ckdir = str(tmp_path / "ck")
        overrides = TINY + [
            f"train.checkpoint_dir={ckdir}",
            "train.num_epochs=1", "train.batch_size=64",
        ]
        rc = main(["train"] + overrides)
        assert rc == 0
        assert os.path.isdir(ckdir)
        out = capsys.readouterr().out
        assert "val_loss" in out

        rc = main(["evaluate"] + overrides)
        assert rc == 0
        assert "hr@10" in capsys.readouterr().out

        emb = str(tmp_path / "emb.jsonl")
        rc = main(["export", "--output", emb] + overrides)
        assert rc == 0 and os.path.exists(emb)
        capsys.readouterr()

        csv = str(tmp_path / "preds.csv")
        rc = main(["score", "--output", csv, "--num-users", "10",
                   "--top-k", "5"] + overrides)
        assert rc == 0
        with open(csv) as f:
            lines = f.read().strip().split("\n")
        assert lines[0] == "customer_id,product_id,rank,score"
        assert len(lines) == 1 + 10 * 5

    def test_train_resume(self, tmp_path, capsys):
        ckdir = str(tmp_path / "ck2")
        overrides = TINY + [
            f"train.checkpoint_dir={ckdir}",
            "train.num_epochs=1", "train.batch_size=64",
        ]
        assert main(["train"] + overrides) == 0
        capsys.readouterr()
        assert main(["train", "--resume"] + overrides +
                    ["train.num_epochs=2"]) == 0

    def test_bad_override_fails(self):
        with pytest.raises((SystemExit, ValueError)):
            main(["datagen", "bogus.key=1"])


class TestDoctor:
    def test_doctor_runs_clean(self, tmp_path, capsys):
        from ncf_tpu.cli import build_parser

        p = build_parser()
        args = p.parse_args([
            "doctor", f"train.checkpoint_dir={tmp_path}/ck"])
        rc = args.fn(args)
        out = capsys.readouterr().out
        assert rc == 0, out
        for name in ("config", "devices", "compile", "hbm", "mesh",
                     "artifact_store", "native", "redis"):
            assert name in out

    def test_doctor_fails_on_bad_config(self, tmp_path, capsys):
        from ncf_tpu.cli import build_parser

        p = build_parser()
        args = p.parse_args([
            "doctor", "model.negative_samples=0",
            f"train.checkpoint_dir={tmp_path}/ck"])
        rc = args.fn(args)
        assert rc == 1
        assert "negative_samples" in capsys.readouterr().out

    def test_doctor_hbm_estimate_scales(self):
        from ncf_tpu.utils.config import Config
        from ncf_tpu.utils.doctor import estimate_train_hbm

        small, big = Config(), Config()
        big.model.num_users = 10_000_000
        big.model.num_items = 3_000_000
        est_small, est_big = estimate_train_hbm(small), estimate_train_hbm(big)
        assert est_big > est_small
        # 13M rows x 128 dims x 4 B  >= 6.6 GB of tables alone
        assert est_big > 6e9

    def test_doctor_mesh_check_detects_oversize(self, monkeypatch):
        from ncf_tpu.utils.config import Config
        from ncf_tpu.utils.doctor import check_mesh

        cfg = Config()
        cfg.mesh.enable = "on"
        cfg.mesh.dcn_axis = 64
        cfg.mesh.ici_axis = 64
        name, status, msg = check_mesh(cfg)
        assert status == "fail" and "4096" in msg
