from gaze_tpu.ops.heatmap import heatmap_argmax, normalize_map, render_gaussian
from gaze_tpu.ops.tvl1 import dequantize_flow, quantize_flow, tvl1_flow
from gaze_tpu.ops.warp import bilinear_sample, warp_backward

__all__ = [
    "bilinear_sample",
    "dequantize_flow",
    "heatmap_argmax",
    "normalize_map",
    "quantize_flow",
    "render_gaussian",
    "tvl1_flow",
    "warp_backward",
]
