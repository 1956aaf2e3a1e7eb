"""PyTorch VGG16 -> flax parameter conversion.

The reference initializes both SP encoders from torchvision's
ImageNet-pretrained VGG16 (ref:models/SP.py [M]; needed for accuracy
parity). This environment is offline, so the converter consumes a local
``vgg16*.pth`` state-dict file when one is provided and falls back to
random init otherwise (documented expectation, SURVEY.md §7 hard part 4).

Layout conversion: torch Conv2d weights are OIHW; flax NHWC convs take
HWIO -> transpose (2, 3, 1, 0). The temporal stream's first conv has a
different input arity (flow channels); its kernel is cross-modality
initialized TSN-style: average the RGB input channels and replicate.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

# torchvision vgg16 .features module indices of each conv layer, in our
# naming order conv{stage}_{idx}.
_TORCH_FEATURE_IDX = {
    "conv1_1": 0, "conv1_2": 2,
    "conv2_1": 5, "conv2_2": 7,
    "conv3_1": 10, "conv3_2": 12, "conv3_3": 14,
    "conv4_1": 17, "conv4_2": 19, "conv4_3": 21,
    "conv5_1": 24, "conv5_2": 26, "conv5_3": 28,
}


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth/.pth.tar state dict into numpy (host-only torch use)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: v.detach().cpu().numpy() for k, v in obj.items() if hasattr(v, "detach")}


def vgg16_params_from_torch(
    state: Dict[str, np.ndarray], in_channels: int = 3, prefix: str = "features"
) -> Dict[str, Any]:
    """Build the params dict of ``VGG16Features`` from a torch state dict.

    Args:
      state: numpy state dict of torchvision vgg16 (keys ``features.N.*``).
      in_channels: input arity of conv1_1 (3 for RGB, 2 for flow — the
        kernel is channel-averaged and replicated when != 3).
    """
    params: Dict[str, Any] = {}
    for name, idx in _TORCH_FEATURE_IDX.items():
        w = state[f"{prefix}.{idx}.weight"]  # (O, I, kh, kw)
        b = state[f"{prefix}.{idx}.bias"]
        if name == "conv1_1" and in_channels != w.shape[1]:
            mean = w.mean(axis=1, keepdims=True)
            w = np.repeat(mean, in_channels, axis=1) * (w.shape[1] / in_channels)
        kernel = np.transpose(w, (2, 3, 1, 0))  # HWIO
        params[name] = {"kernel": kernel.astype(np.float32),
                        "bias": b.astype(np.float32)}
    return params


def init_sp_from_torch_vgg16(sp_variables: Any, vgg_pth_path: str, flow_channels: int) -> Any:
    """Return SP variables with both encoder streams loaded from an
    ImageNet VGG16 checkpoint; decoder/fusion stay at their random init
    (the reference trains those from scratch [M])."""
    import flax

    state = load_torch_state_dict(vgg_pth_path)
    flat = flax.core.unfreeze(sp_variables)
    flat["params"]["spatial"] = vgg16_params_from_torch(state, in_channels=3)
    flat["params"]["temporal"] = vgg16_params_from_torch(state, in_channels=flow_channels)
    return flax.core.freeze(flat) if isinstance(sp_variables, flax.core.FrozenDict) else flat
