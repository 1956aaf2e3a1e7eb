from gaze_tpu.utils.logging import StepLogger, dump_heatmap_png

__all__ = ["StepLogger", "dump_heatmap_png"]
