from gaze_tpu.core.config import (
    ATConfig,
    CameraConfig,
    ImageConfig,
    LFConfig,
    LossConfig,
    MeshConfig,
    PipelineConfig,
    SPConfig,
    TrainConfig,
    TVL1Config,
    default_config,
)

__all__ = [
    "ATConfig",
    "CameraConfig",
    "ImageConfig",
    "LFConfig",
    "LossConfig",
    "MeshConfig",
    "PipelineConfig",
    "SPConfig",
    "TrainConfig",
    "TVL1Config",
    "default_config",
]
