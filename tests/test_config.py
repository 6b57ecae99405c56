"""Config system tests: YAML roundtrip, overrides, validation, and the
shipped benchmark configs."""

import glob
import os

import pytest

from ncf_tpu.utils.config import Config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestConfig:
    def test_yaml_roundtrip(self, tmp_path):
        cfg = Config()
        cfg.model.mf_dim = 48
        cfg.train.learning_rate = 3e-4
        path = str(tmp_path / "c.yaml")
        cfg.save_yaml(path)
        loaded = Config.from_yaml(path)
        assert loaded.model.mf_dim == 48
        assert loaded.train.learning_rate == pytest.approx(3e-4)

    def test_overrides_types(self):
        cfg = Config().apply_overrides([
            "train.learning_rate=3e-4",
            "model.mlp_hidden_dims=[64,32]",
            "mesh.shard_embeddings=false",
            "model.name=neumf",
        ])
        assert isinstance(cfg.train.learning_rate, float)
        assert cfg.model.mlp_hidden_dims == [64, 32]
        assert cfg.mesh.shard_embeddings is False
        assert cfg.model.name == "neumf"

    def test_unknown_path_raises(self):
        with pytest.raises(ValueError):
            Config().apply_overrides(["nope.x=1"])
        with pytest.raises(ValueError):
            Config().apply_overrides(["model.nope=1"])

    def test_validation(self):
        cfg = Config()
        cfg.model.mlp_dim = 30  # not divisible by 4 heads
        with pytest.raises(ValueError):
            cfg.validate()
        cfg = Config()
        cfg.train.batch_size = 0
        with pytest.raises(ValueError):
            cfg.validate()

    def test_unknown_yaml_keys_warn_not_crash(self, tmp_path):
        path = str(tmp_path / "c.yaml")
        with open(path, "w") as f:
            f.write("model:\n  mf_dim: 16\n  bogus_key: 1\nbogus_section:\n  x: 2\n")
        cfg = Config.from_yaml(path)
        assert cfg.model.mf_dim == 16


class TestShippedConfigs:
    @pytest.mark.parametrize("path", sorted(
        glob.glob(os.path.join(REPO, "configs", "*.yaml"))))
    def test_loads_and_validates(self, path):
        cfg = Config.from_yaml(path)
        cfg.validate()
        assert cfg.model.name in ("ncf", "neumf", "advanced_ncf")
