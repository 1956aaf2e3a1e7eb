from gaze_tpu.evaluation.losses import bce, floss, mse
from gaze_tpu.evaluation.metrics import aae, auc_judd, compute_aae_auc, pixel_to_ray

__all__ = [
    "aae",
    "auc_judd",
    "bce",
    "compute_aae_auc",
    "floss",
    "mse",
    "pixel_to_ray",
]
