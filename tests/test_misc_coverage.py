"""Coverage for remaining small surfaces: dashboard JSON export,
user-embedding export, cli consolidate."""

import json
import os

import jax
import numpy as np

from ncf_tpu.models import advanced_ncf
from ncf_tpu.serving.export import export_user_embeddings, load_embeddings_jsonl
from ncf_tpu.utils.config import Config
from ncf_tpu.utils.logging import MetricsLogger
from ncf_tpu.utils.monitoring import build_dashboard, save_dashboard_json


class TestDashboardExport:
    def test_save_json(self, tmp_path):
        m = MetricsLogger()
        m.write(kind="request", latency_ms=12.0)
        spec = build_dashboard(m)
        path = save_dashboard_json(spec, str(tmp_path / "dash.json"))
        loaded = json.load(open(path))
        assert loaded["displayName"] == "Recommendation Serving"
        assert len(loaded["panels"]) == 4


class TestUserEmbeddingExport:
    def test_jsonl_roundtrip(self, tmp_path):
        cfg = Config()
        cfg.model.num_users = 12
        cfg.model.num_items = 10
        cfg.model.mf_dim = 8
        cfg.model.mlp_dim = 8
        cfg.model.temporal_dim = 4
        cfg.model.mlp_hidden_dims = [16]
        cfg.model.compute_dtype = "float32"
        params = advanced_ncf.init(jax.random.PRNGKey(0), cfg.model)
        path = export_user_embeddings(params, cfg, str(tmp_path / "u.jsonl"))
        ids, mat = load_embeddings_jsonl(path)
        assert len(ids) == 12 and mat.shape == (12, 8)
        np.testing.assert_allclose(np.linalg.norm(mat, axis=1), 1.0,
                                   atol=1e-3)


class TestCliConsolidate:
    def test_consolidate_subcommand(self, tmp_path, capsys):
        from ncf_tpu.cli import main

        overrides = [
            "data.synthetic_users=50", "data.synthetic_items=30",
            "data.synthetic_days=15", "model.mf_dim=8", "model.mlp_dim=8",
            "model.temporal_dim=4", "model.mlp_hidden_dims=[16]",
            "model.compute_dtype=float32", "data.num_eval_negatives=10",
            f"train.checkpoint_dir={tmp_path}/ck",
            "train.num_epochs=1", "train.batch_size=64",
        ]
        assert main(["train"] + overrides) == 0
        capsys.readouterr()
        out_dir = str(tmp_path / "cons")
        assert main(["consolidate", "--output", out_dir] + overrides) == 0
        assert os.path.exists(os.path.join(out_dir, "manifest.json"))
        assert "consolidated" in capsys.readouterr().out


def test_sparse_min_bytes_roofline_shape():
    """The big-vocab roofline (bench.sparse_min_bytes) must scale with
    touched rows, not the vocabulary, and order floor < asshipped."""
    import bench

    a = bench.sparse_min_bytes(B=16384, S=5, U=9_000_000, V=3_000_000,
                               dense_b=1_000_000)
    b = bench.sparse_min_bytes(B=32768, S=5, U=9_000_000, V=3_000_000,
                               dense_b=1_000_000)
    c = bench.sparse_min_bytes(B=16384, S=5, U=90_000_000, V=30_000_000,
                               dense_b=1_000_000)
    assert a["floor"] < a["asshipped"]
    # doubling the batch roughly doubles touched-row traffic
    assert 1.8 < (b["floor"] - 3_000_000) / (a["floor"] - 3_000_000) < 2.2
    # 10x the vocab changes NOTHING (the whole point of sparse updates)
    assert c == a
