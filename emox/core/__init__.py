"""Core: configuration, dtypes/precision policy, mesh + sharding utilities."""

from emox.core.config import (
    AudioConfig,
    DataConfig,
    DiffusionConfig,
    InferenceConfig,
    MeshConfig,
    ModelConfig,
    TrainConfig,
    VAEConfig,
    load_config,
    save_config,
)
from emox.core.dtypes import Policy, DEFAULT_POLICY
from emox.core.mesh import (
    MeshAxes,
    create_mesh,
    local_mesh,
    batch_sharding,
    replicated,
    shard_params_replicated,
)

__all__ = [
    "AudioConfig",
    "DataConfig",
    "DiffusionConfig",
    "InferenceConfig",
    "MeshConfig",
    "ModelConfig",
    "TrainConfig",
    "VAEConfig",
    "load_config",
    "save_config",
    "Policy",
    "DEFAULT_POLICY",
    "MeshAxes",
    "create_mesh",
    "local_mesh",
    "batch_sharding",
    "replicated",
    "shard_params_replicated",
]
