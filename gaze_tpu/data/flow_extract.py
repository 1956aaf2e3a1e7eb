"""Offline flow-image extraction: the *producer* half of dense_flow.

The reference's preprocessing step runs ``yjxiong/dense_flow`` (C++/
OpenCV/CUDA) over every video to populate ``<root>/flows/`` with 8-bit
quantized TV-L1 flow JPEGs that the temporal stream then consumes as
images (SURVEY.md §1 L0 / §2 "Flow input format" [M]). This repo already
*consumes* that layout (``data/gtea.py``, ``--precomputed_flow``); this
module *produces* it — the on-TPU TV-L1 solver (``ops/tvl1.py``, with
``--tvl1_preset dense_flow`` for the OpenCV-matched schedule) batch-
solves consecutive frame pairs and writes the same on-disk layouts:

    flows/<video>/flow_x_<frame> + flow_y_<frame>   separate grayscale
    flows/<video>/<frame>                           packed (ch0=x, ch1=y)

so a reference-era PyTorch workflow (or this repo's strict-parity
``--precomputed_flow on`` mode) can run off TPU-extracted flow with no
dense_flow/CUDA install. Quantization is ``ops.tvl1.quantize_flow``:
clip to [-bound, bound], map linearly to [0, 255] (zero motion = 128 up
to rounding), the exact inverse of the consumption path's
``dequantize_flow`` / 0.5-centered ``normalize_flow_image``.

Frame t's flow image encodes the pair (t-1, t) and is stored under frame
t's name — the lookup convention ``build_manifest`` uses — so frame 0
has no flow file (its pairs are never formed).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Iterable, List, Optional, Tuple

import numpy as np

from gaze_tpu.core.config import TVL1Config

_FORMATS = ("jpg", "png")
_LAYOUTS = ("xy", "packed")


@dataclasses.dataclass(frozen=True)
class FlowExtractSpec:
    """Knobs of one extraction run (CLI: ``--extract_flow`` + friends)."""

    tvl1: TVL1Config
    bound: float                 # quantization clip, ±pixels (dense_flow -b)
    layout: str = "xy"           # "xy" (flow_x_/flow_y_ grayscale) | "packed"
    fmt: str = "jpg"             # "jpg" (dense_flow's choice, lossy) | "png"
    quality: int = 95            # JPEG quality (ignored for png)
    batch_size: int = 32         # frame pairs per device solve
    flow_scale: float = 1.0      # solve at this fraction of native res
                                 # (1.0 = dense_flow's native-grid solve)

    def __post_init__(self):
        if self.fmt not in _FORMATS:
            raise ValueError(f"fmt must be one of {_FORMATS}, got {self.fmt!r}")
        if self.layout not in _LAYOUTS:
            raise ValueError(
                f"layout must be one of {_LAYOUTS}, got {self.layout!r}")


def make_flow_quant_fn(spec: FlowExtractSpec, hw: Tuple[int, int]):
    """jittable (prev_u8, cur_u8) -> uint8 (B, H, W, 2) quantized flow.

    Solves on the native (H, W) grid by default; ``flow_scale < 1``
    mirrors the serving pipeline's reduced-grid solve (solve small,
    bilinear-upsample the field, rescale displacements — see
    ``GazePipeline.preprocess_pair``) as a throughput knob.
    """
    import jax
    import jax.numpy as jnp

    from gaze_tpu.ops.image import resize_bilinear
    from gaze_tpu.ops.preprocess import rgb_to_gray, to_float
    from gaze_tpu.ops.tvl1 import quantize_flow, tvl1_flow

    H, W = hw

    def fn(prev_u8: jnp.ndarray, cur_u8: jnp.ndarray) -> jnp.ndarray:
        g0 = rgb_to_gray(to_float(prev_u8))
        g1 = rgb_to_gray(to_float(cur_u8))
        s = spec.flow_scale
        if s != 1.0:
            fh, fw = int(round(H * s)), int(round(W * s))
            lo = tvl1_flow(
                resize_bilinear(g0, (fh, fw)), resize_bilinear(g1, (fh, fw)),
                spec.tvl1,
            )
            flow = jax.image.resize(
                lo, (lo.shape[0], H, W, 2), method="bilinear"
            ) * (1.0 / s)
        else:
            flow = tvl1_flow(g0, g1, spec.tvl1)
        return quantize_flow(flow, spec.bound)

    return fn


def _flow_name(image_name: str, fmt: str) -> str:
    """Flow filename for a frame image name, preserving the consumption
    lookup (same name for jpg; stem + .png for png — ``build_manifest``
    tries both)."""
    if fmt == "jpg":
        return image_name
    return os.path.splitext(image_name)[0] + ".png"


def _cv2():
    """OpenCV if importable, else None. dense_flow writes its flow
    images with ``cv::imwrite`` (yjxiong/dense_flow), so the cv2 encoder
    is the byte-level parity choice for produced layouts; PIL is the
    fallback when cv2 is absent. NOTE: this image ships cv2 WITHOUT
    opencv-contrib, so ``DualTVL1OpticalFlow`` itself is unavailable —
    a numeric solver cross-check against OpenCV remains impossible here;
    only the imwrite/imread codec path can be matched."""
    try:
        import cv2

        return cv2
    except ImportError:
        return None


def _imwrite(arr_rgb_or_gray: np.ndarray, path: str, quality: int) -> None:
    cv2 = _cv2()
    if cv2 is not None:
        a = arr_rgb_or_gray
        if a.ndim == 3:  # cv2 writes BGR — flip so the file decodes as RGB
            a = a[..., ::-1]
        params = (
            [int(cv2.IMWRITE_JPEG_QUALITY), quality]
            if path.endswith((".jpg", ".jpeg")) else []
        )
        if not cv2.imwrite(path, np.ascontiguousarray(a), params):
            raise OSError(f"cv2.imwrite failed for {path!r}")
        return
    from PIL import Image

    img = Image.fromarray(
        arr_rgb_or_gray, mode="L" if arr_rgb_or_gray.ndim == 2 else "RGB"
    )
    if path.endswith(".png"):
        img.save(path)
    else:
        img.save(path, quality=quality)


def _save_gray(arr: np.ndarray, path: str, quality: int) -> None:
    _imwrite(arr, path, quality)


def _save_packed(arr_xy: np.ndarray, path: str, quality: int) -> None:
    """Packed 3-channel image: ch0=x, ch1=y, ch2=128 (unused padding —
    the consumption path reads only the first two channels)."""
    pad = np.full(arr_xy.shape[:2] + (1,), 128, np.uint8)
    _imwrite(np.concatenate([arr_xy, pad], axis=-1), path, quality)


def extract_video_flow(
    image_paths: List[str],
    out_dir: str,
    spec: FlowExtractSpec,
    solve_fn=None,
) -> int:
    """Extract flow images for one video's ordered frame list.

    Returns the number of flow images written (= len(image_paths) - 1).
    ``solve_fn`` lets callers share one jit-compiled solver across videos
    of identical resolution.
    """
    import jax
    import jax.numpy as jnp

    from gaze_tpu.data.native_io import decode_batch

    if len(image_paths) < 2:
        return 0
    os.makedirs(out_dir, exist_ok=True)
    # Decode PER WINDOW, not the whole video: a real GTEA video is ~15k
    # frames at 720x960x3 (~30 GB as one array). Each window needs only
    # frames [s-1, s+B) resident; the windows overlap by one frame.
    probe = decode_batch(image_paths[:1])
    H, W = probe.shape[1:3]
    if solve_fn is None:
        solve_fn = jax.jit(make_flow_quant_fn(spec, (H, W)))
    T = len(image_paths)
    written = 0
    B = spec.batch_size
    for s in range(1, T, B):
        idx = list(range(s, min(s + B, T)))
        # Pad the tail by repeating the last pair: one compiled shape.
        pad = B - len(idx)
        bidx = idx + [idx[-1]] * pad
        lo = idx[0] - 1
        window = decode_batch(image_paths[lo:idx[-1] + 1])
        q = np.asarray(solve_fn(
            jnp.asarray(window[[i - 1 - lo for i in bidx]]),
            jnp.asarray(window[[i - lo for i in bidx]]),
        ))
        for j, i in enumerate(idx):
            name = _flow_name(os.path.basename(image_paths[i]), spec.fmt)
            if spec.layout == "xy":
                _save_gray(q[j, :, :, 0],
                           os.path.join(out_dir, "flow_x_" + name),
                           spec.quality)
                _save_gray(q[j, :, :, 1],
                           os.path.join(out_dir, "flow_y_" + name),
                           spec.quality)
            else:
                _save_packed(q[j], os.path.join(out_dir, name), spec.quality)
            written += 1
    return written


def extract_flow_images(
    data_root: str,
    spec: FlowExtractSpec,
    out_root: Optional[str] = None,
    videos: Optional[Iterable[str]] = None,
    verbose: bool = True,
) -> int:
    """dense_flow-equivalent offline pass over ``<data_root>/images/``.

    Writes ``<out_root or data_root/flows>/<video>/…`` flow images for
    every consecutive frame pair of every (or the given) video. Gaze/
    fixsac annotations are NOT required — like dense_flow, this runs on
    bare frame directories. Returns total flow images written.
    """
    import jax

    images_dir = os.path.join(data_root, "images")
    if not os.path.isdir(images_dir):
        raise FileNotFoundError(
            f"--extract_flow: no images/ directory under {data_root!r}")
    out_root = out_root or os.path.join(data_root, "flows")
    vids = sorted(videos) if videos is not None else sorted(
        d for d in os.listdir(images_dir)
        if os.path.isdir(os.path.join(images_dir, d))
    )
    total = 0
    solver_cache = {}  # (H, W) -> jitted solve, shared across videos
    for v in vids:
        vdir = os.path.join(images_dir, v)
        paths = [os.path.join(vdir, n) for n in sorted(os.listdir(vdir))]
        if len(paths) < 2:
            continue
        from PIL import Image

        with Image.open(paths[0]) as im:
            hw = (im.height, im.width)
        if hw not in solver_cache:
            solver_cache[hw] = jax.jit(make_flow_quant_fn(spec, hw))
        n = extract_video_flow(
            paths, os.path.join(out_root, v), spec, solve_fn=solver_cache[hw]
        )
        total += n
        if verbose:
            print({"extract_flow": v, "flow_images": n,
                   "out": os.path.join(out_root, v)})
    return total
