from psg_tpu.core.config import (
    Config,
    DataConfig,
    MeshConfig,
    ModelConfig,
    OptimizationConfig,
    TrainingConfig,
    load_config,
)
from psg_tpu.core.prng import key_seq, split_like

__all__ = [
    "Config",
    "DataConfig",
    "MeshConfig",
    "ModelConfig",
    "OptimizationConfig",
    "TrainingConfig",
    "load_config",
    "key_seq",
    "split_like",
]
