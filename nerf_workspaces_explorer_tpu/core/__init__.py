from nerf_workspaces_explorer_tpu.core.types import COORD, HW, XYZ
from nerf_workspaces_explorer_tpu.core.config import (
    ExperimentConfig,
    FrameworkConfig,
    InferenceConfig,
    LoggingConfig,
    ModelConfig,
    RenderingConfig,
    TrainingConfig,
    load_config,
)

__all__ = [
    "COORD",
    "HW",
    "XYZ",
    "ExperimentConfig",
    "FrameworkConfig",
    "InferenceConfig",
    "LoggingConfig",
    "ModelConfig",
    "RenderingConfig",
    "TrainingConfig",
    "load_config",
]
