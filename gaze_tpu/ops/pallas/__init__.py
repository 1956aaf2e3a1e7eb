from gaze_tpu.ops.pallas.warp import warp_fields

__all__ = ["warp_fields"]
