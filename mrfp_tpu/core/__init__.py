from mrfp_tpu.core.config import (
    Config,
    DataConfig,
    MeshConfig,
    ModelConfig,
    PerturbConfig,
    TrainConfig,
    baseline_config,
    mrfp_config,
    mrfp_plus_config,
)
from mrfp_tpu.core.mesh import create_mesh, batch_sharding, replicated
from mrfp_tpu.core.rng import step_keys

__all__ = [
    "Config", "DataConfig", "MeshConfig", "ModelConfig", "PerturbConfig",
    "TrainConfig", "baseline_config", "mrfp_config", "mrfp_plus_config",
    "create_mesh", "batch_sharding", "replicated", "step_keys",
]
