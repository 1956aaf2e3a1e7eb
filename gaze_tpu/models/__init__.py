from gaze_tpu.models.at import LSTMNet, attention_map, fixation_pool
from gaze_tpu.models.lf import LateFusion
from gaze_tpu.models.sp import SPNet
from gaze_tpu.models.vgg import VGG16Features

__all__ = [
    "LSTMNet",
    "LateFusion",
    "SPNet",
    "VGG16Features",
    "attention_map",
    "fixation_pool",
]
