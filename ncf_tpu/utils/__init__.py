from ncf_tpu.utils.logging import MetricsLogger
from ncf_tpu.utils.config import (
    Config,
    DataConfig,
    MeshConfig,
    ModelConfig,
    ServingConfig,
    TrainConfig,
    setup_logging,
)

__all__ = [
    "MetricsLogger",
    "Config",
    "DataConfig",
    "MeshConfig",
    "ModelConfig",
    "ServingConfig",
    "TrainConfig",
    "setup_logging",
]
