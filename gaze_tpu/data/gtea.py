"""GTEA Gaze+ / GTEA Gaze dataset manifest and host-side loading.

TPU-native rebuild of ``ref:data/STdatas.py`` [M] (SURVEY.md §2 "SP
dataset"): the on-disk layout the reference consumes is

    <root>/images/<video>/<frame>.jpg      RGB frames (ffmpeg-extracted)
    <root>/flows/<video>/<frame>.jpg       optional precomputed flow imgs
    <root>/gaze/<video>.txt                per-frame gaze "x y" (pixels,
                                           native resolution)
    <root>/fixsac/<video>.txt              per-frame 0/1 fixation labels

Differences from the reference, by design:
- JPEG decode happens on host (PIL) — TPUs have no image decoder — but
  resize/normalize/heatmap-render move on-device (``gaze_tpu.ops``).
- Flow images are optional: the default path computes TV-L1 on-TPU from
  consecutive frames (BASELINE.json), with ``flows/`` honored when
  present for strict parity runs.
- The train/test split is leave-one-subject-out, keyed on the leading
  subject token of the video name (GTEA Gaze+ convention, e.g.
  "Ahmad_American"), matching the reference's split [M].
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np


@dataclasses.dataclass(frozen=True)
class FrameRecord:
    video: str
    index: int            # frame index within the video (0-based)
    image_path: str
    flow_path: Optional[str]
    gaze: Tuple[float, float]   # native-resolution pixels
    fixation: float             # 1.0 fixation / 0.0 saccade


@dataclasses.dataclass
class GTEAManifest:
    root: str
    videos: List[str]
    frames: Dict[str, List[FrameRecord]]
    native_hw: Tuple[int, int]

    def subjects(self) -> List[str]:
        return sorted({v.split("_")[0] for v in self.videos})

    def split_leave_one_out(self, test_subject: str) -> Tuple[List[FrameRecord], List[FrameRecord]]:
        """Leave-one-subject-out split (reference convention [M])."""
        train, test = [], []
        for v in self.videos:
            bucket = test if v.split("_")[0] == test_subject else train
            bucket.extend(self.frames[v])
        return train, test


def _read_gaze_txt(path: str) -> np.ndarray:
    """Parse a per-frame gaze txt of "x y" rows -> (T, 2) float32."""
    rows = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 2:
                rows.append((float(parts[0]), float(parts[1])))
    return np.asarray(rows, dtype=np.float32)


def _read_fixsac_txt(path: str) -> np.ndarray:
    with open(path) as f:
        return np.asarray([float(l.strip() or 0) for l in f if l.strip() != ""],
                          dtype=np.float32)


def build_manifest(root: str, native_hw: Tuple[int, int] = (720, 960)) -> GTEAManifest:
    """Scan the dataset root into a manifest. Raises FileNotFoundError if
    the layout is absent (callers gate on this — no dataset ships here)."""
    images_dir = os.path.join(root, "images")
    if not os.path.isdir(images_dir):
        raise FileNotFoundError(f"no GTEA layout under {root!r} (missing images/)")
    flows_root = os.path.join(root, "flows")
    videos = sorted(
        d for d in os.listdir(images_dir) if os.path.isdir(os.path.join(images_dir, d))
    )
    frames: Dict[str, List[FrameRecord]] = {}
    for v in videos:
        vdir = os.path.join(images_dir, v)
        names = sorted(os.listdir(vdir))
        gaze = _read_gaze_txt(os.path.join(root, "gaze", v + ".txt"))
        fixsac_path = os.path.join(root, "fixsac", v + ".txt")
        if os.path.exists(fixsac_path):
            fixsac = _read_fixsac_txt(fixsac_path)
        elif len(gaze):
            # No eye-tracker segmentation shipped: derive labels from
            # the raw gaze with I-DT dispersion (data/fixation.py).
            from gaze_tpu.data.fixation import detect_fixations_idt

            fixsac = detect_fixations_idt(gaze)
        else:
            fixsac = np.ones((len(names),), np.float32)
        recs = []
        n = min(len(names), len(gaze), len(fixsac))
        for i in range(n):
            fp = os.path.join(flows_root, v, names[i])
            recs.append(
                FrameRecord(
                    video=v,
                    index=i,
                    image_path=os.path.join(vdir, names[i]),
                    flow_path=fp if os.path.exists(fp) else None,
                    gaze=(float(gaze[i, 0]), float(gaze[i, 1])),
                    fixation=float(fixsac[i]),
                )
            )
        frames[v] = recs
    return GTEAManifest(root=root, videos=videos, frames=frames, native_hw=native_hw)


def _decode_images(paths: List[str]) -> np.ndarray:
    """Batch-decode JPEGs — native threaded decoder when built (see
    ``gaze_tpu.data.native_io``), PIL otherwise."""
    from gaze_tpu.data.native_io import decode_batch

    return decode_batch(paths)


def pair_batches(
    records: Sequence[FrameRecord],
    batch_size: int,
    target_hw: Tuple[int, int],
    shuffle: bool = True,
    seed: int = 0,
    drop_remainder: bool = True,
) -> Iterator[dict]:
    """Yield SP batches of consecutive-frame pairs with gaze labels.

    Gaze coordinates are rescaled from native resolution to ``target_hw``
    pixels so labels match the on-device processing grid. Decode is plain
    host PIL; heavier pipelining lives in ``gaze_tpu.data.prefetch``.
    """
    by_video: Dict[str, List[FrameRecord]] = {}
    for r in records:
        by_video.setdefault(r.video, []).append(r)
    pairs: List[Tuple[FrameRecord, FrameRecord]] = []
    for recs in by_video.values():
        recs = sorted(recs, key=lambda r: r.index)
        for a, b in zip(recs[:-1], recs[1:]):
            if b.index == a.index + 1:
                pairs.append((a, b))
    order = np.arange(len(pairs))
    if shuffle:
        np.random.default_rng(seed).shuffle(order)

    th, tw = target_hw
    for s in range(0, len(order) - (batch_size - 1 if drop_remainder else 0), batch_size):
        chunk = [pairs[i] for i in order[s : s + batch_size]]
        if not chunk:
            return
        both = _decode_images(
            [a.image_path for a, _ in chunk] + [b.image_path for _, b in chunk]
        )
        prev, cur = both[: len(chunk)], both[len(chunk) :]
        nh, nw = prev.shape[1], prev.shape[2]
        gaze = np.asarray(
            [[b.gaze[0] * tw / nw, b.gaze[1] * th / nh] for _, b in chunk],
            dtype=np.float32,
        )
        fixsac = np.asarray([b.fixation for _, b in chunk], dtype=np.float32)
        yield {"prev": prev, "cur": cur, "gaze": gaze, "fixsac": fixsac}
