from gaze_tpu.data.gtea import GTEAManifest, build_manifest, pair_batches
from gaze_tpu.data.prefetch import device_prefetch
from gaze_tpu.data.synthetic import SyntheticSpec, batch_iterator, generate_sequence

__all__ = [
    "GTEAManifest",
    "SyntheticSpec",
    "batch_iterator",
    "build_manifest",
    "device_prefetch",
    "generate_sequence",
    "pair_batches",
]
