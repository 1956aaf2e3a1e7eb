"""gaze_tpu — TPU-native egocentric gaze prediction framework.

A brand-new JAX/XLA/Pallas/pjit implementation of the capabilities of
``hyf015/egocentric-gaze-prediction`` (ECCV 2018, "Predicting Gaze in
Egocentric Video by Learning Task-dependent Attention Transition"):

- ``ops``        — TV-L1 optical flow, bilinear warp, Gaussian heatmap
                   rendering, fused resize/normalize preprocessing.
- ``models``     — SP (two-stream VGG16 encoder-decoder saliency net),
                   AT (attention-transition LSTM), LF (late-fusion head),
                   and the fused end-to-end pipeline.
- ``data``       — GTEA Gaze+ manifest/loader, synthetic moving-dot data,
                   host-side sharded prefetch.
- ``train``      — per-module data-parallel train loops (pjit over a mesh).
- ``evaluation`` — floss (focal loss), AAE/AUC metrics.
- ``parallel``   — mesh construction and sharding helpers.
- ``core``       — configs, PRNG, checkpointing.

Reference provenance: the upstream mount was empty at build time (see
SURVEY.md §0); structural citations use the reconstructed upstream layout
``ref:<path>`` and are tagged per SURVEY.md's confidence convention.
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level API (keeps `import gaze_tpu` free of jax imports)."""
    if name == "GazePipeline":
        from gaze_tpu.models.pipeline import GazePipeline

        return GazePipeline
    if name in ("StreamServer", "DistributedStreamServer"):
        from gaze_tpu import serve

        return getattr(serve, name)
    if name in ("default_config", "parity_config", "production_config",
                "production_fast_config"):
        from gaze_tpu.core import config

        return getattr(config, name)
    raise AttributeError(name)
