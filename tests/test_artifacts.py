"""Artifact store (utils/artifacts.py) — the reference's post-training
GCS upload surface (train.py:71-107, task.py:146-150) with a local
directory backend and a scheme seam."""

import json
import os

import pytest

from ncf_tpu.utils.artifacts import (
    LocalArtifactStore,
    get_store,
    push_training_artifacts,
)


def test_push_pull_file_and_dir(tmp_path):
    store = LocalArtifactStore(str(tmp_path / "store"))
    src = tmp_path / "model.bin"
    src.write_bytes(b"weights")
    stored = store.push(str(src), "job1/model.bin")
    assert os.path.isfile(stored)
    out = tmp_path / "roundtrip.bin"
    store.pull("job1/model.bin", str(out))
    assert out.read_bytes() == b"weights"

    d = tmp_path / "ckpt_00000001"
    d.mkdir()
    (d / "a.npy").write_bytes(b"a")
    (d / "b.npy").write_bytes(b"b")
    store.push(str(d), "job1/checkpoint/ckpt_00000001")
    assert store.exists("job1/checkpoint/ckpt_00000001/a.npy")
    names = store.list("job1")
    assert "job1/model.bin" in names
    assert "job1/checkpoint/ckpt_00000001/b.npy" in names


def test_push_overwrites_atomically(tmp_path):
    store = LocalArtifactStore(str(tmp_path / "s"))
    d = tmp_path / "ck"
    d.mkdir()
    (d / "x").write_text("1")
    store.push(str(d), "j/ck")
    (d / "x").write_text("2")
    (d / "y").write_text("new")
    store.push(str(d), "j/ck")
    assert (tmp_path / "s" / "j" / "ck" / "x").read_text() == "2"
    assert (tmp_path / "s" / "j" / "ck" / "y").exists()
    assert not (tmp_path / "s" / "j" / "ck.tmp").exists()


def test_get_store_schemes(tmp_path):
    assert isinstance(get_store(str(tmp_path)), LocalArtifactStore)
    assert isinstance(get_store(f"file://{tmp_path}"), LocalArtifactStore)
    with pytest.raises(ValueError, match="gs"):
        get_store("gs://bucket/prefix")


def test_push_training_artifacts(tmp_path):
    # fake checkpoint layout the finder understands
    ckdir = tmp_path / "ckpts"
    ck = ckdir / "ckpt_00000042"
    ck.mkdir(parents=True)
    (ck / "manifest.json").write_text(json.dumps({"step": 42}))
    (ck / "params.npy").write_bytes(b"p")
    metrics = tmp_path / "metrics.jsonl"
    metrics.write_text('{"loss": 1.0}\n')

    stored = push_training_artifacts(
        str(tmp_path / "store"), "jobX",
        checkpoint_dir=str(ckdir), metrics_file=str(metrics))
    root = tmp_path / "store" / "jobX"
    assert (root / "checkpoint" / "ckpt_00000042" / "params.npy").exists()
    assert (root / "metrics.jsonl").exists()
    man = json.loads((root / "manifest.json").read_text())
    assert man["job"] == "jobX"
    assert "metrics.jsonl" in man["artifacts"]
    assert any("manifest.json" in s for s in stored)


def test_trainer_pushes_artifacts(tmp_path):
    from ncf_tpu.data import generate_interactions
    from ncf_tpu.train import Trainer
    from ncf_tpu.utils.config import Config

    inter = generate_interactions(num_users=200, num_items=50, num_days=30,
                                  avg_txns_per_user=8, seed=2)
    cfg = Config()
    cfg.model.mf_dim = 8
    cfg.model.mlp_dim = 8
    cfg.model.temporal_dim = 4
    cfg.model.mlp_hidden_dims = [16, 8]
    cfg.model.compute_dtype = "float32"
    cfg.train.batch_size = 128
    cfg.train.num_epochs = 1
    cfg.train.checkpoint_dir = str(tmp_path / "ck")
    cfg.train.metrics_file = str(tmp_path / "m.jsonl")
    cfg.train.artifact_store = str(tmp_path / "store")
    cfg.train.job_name = "smoke"
    Trainer(cfg, inter).train()
    root = tmp_path / "store" / "smoke"
    assert (root / "manifest.json").exists()
    assert (root / "metrics.jsonl").exists()
    assert any(p.name.startswith("ckpt_")
               for p in (root / "checkpoint").iterdir())


class TestShippedDemoCheckpoint:
    """The committed demo checkpoint (demo/checkpoint, built by
    scripts/make_demo_checkpoint.py) must restore into the DEFAULT
    config's param template and carry a genuinely trained model."""

    def test_exists_and_discoverable(self):
        from ncf_tpu.cli import shipped_demo_checkpoint
        p = shipped_demo_checkpoint()
        assert p is not None, "demo/checkpoint missing from the repo"

    def test_restores_and_is_trained(self):
        import json
        import os

        import jax
        import numpy as np

        from ncf_tpu.cli import shipped_demo_checkpoint
        from ncf_tpu.models import get_model
        from ncf_tpu.train import checkpoint as ckpt_lib
        from ncf_tpu.utils.config import Config

        cfg = Config()
        model = get_model(cfg.model.name)
        template = model.init(jax.random.PRNGKey(0), cfg.model)
        p = shipped_demo_checkpoint()
        state, manifest = ckpt_lib.restore(p, {"params": template})
        params = state["params"]
        # trained tables differ from init; metrics recorded at save time
        assert not np.allclose(np.asarray(params["user_emb"])[:100],
                               np.asarray(template["user_emb"])[:100])
        assert manifest["metrics"]["hr@10"] > 0.3
        # params-only: no optimizer state shipped
        files = os.listdir(p)
        assert not any(f.startswith("opt_state") for f in files)

    def test_demo_cli_uses_shipped_checkpoint(self, capsys):
        from ncf_tpu.cli import build_parser

        p = build_parser()
        args = p.parse_args(["demo", "--customer", "3", "--top-k", "3"])
        rc = args.fn(args)
        out = capsys.readouterr().out
        assert rc == 0
        assert "Top-3 for customer 3" in out
