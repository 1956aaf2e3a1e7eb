"""Rollout-eval decode-throughput benchmark (fake on-disk GTEA layout).

Measures end-to-end `rollout_eval_videos` frames/s — host JPEG decode +
device rollout — to quantify the double-buffered group-batched decode
(VERDICT r2 missing #5: eval was host-decode-bound; the TPU idled
between chunks). `--before REV` loads rollout.py from a git revision so
before/after run in the SAME session against the same layout.

Usage:
    python tools/bench_eval_decode.py                 # current code
    python tools/bench_eval_decode.py --before REV    # old decode loop
"""

from __future__ import annotations

import argparse
import importlib.util
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_layout(root: str, videos: int, frames: int, w: int, h: int) -> None:
    import numpy as np
    from PIL import Image

    rng = np.random.default_rng(0)
    for v in range(videos):
        name = f"S{v}_Task_C1"
        vdir = os.path.join(root, "images", name)
        os.makedirs(vdir, exist_ok=True)
        base = rng.integers(0, 255, (h, w, 3), np.uint8)
        for i in range(frames):
            # cheap per-frame variation; realistic JPEG entropy
            img = np.roll(base, i * 3, axis=1)
            Image.fromarray(img).save(
                os.path.join(vdir, f"{i:06d}.jpg"), quality=85
            )
        os.makedirs(os.path.join(root, "gaze"), exist_ok=True)
        with open(os.path.join(root, "gaze", f"{name}.txt"), "w") as f:
            for i in range(frames):
                f.write(f"{(i * 7) % w} {(i * 5) % h}\n")
        os.makedirs(os.path.join(root, "fixsac"), exist_ok=True)
        with open(os.path.join(root, "fixsac", f"{name}.txt"), "w") as f:
            for i in range(frames):
                f.write(f"{1 if (i // 8) % 2 else 0}\n")


def load_rollout_module(rev: str | None):
    if rev is None:
        from gaze_tpu.evaluation import rollout

        return rollout
    src = subprocess.run(
        ["git", "show", f"{rev}:gaze_tpu/evaluation/rollout.py"],
        check=True, capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ).stdout
    with tempfile.NamedTemporaryFile(
        "w", suffix="_rollout_old.py", delete=False
    ) as f:
        f.write(src)
        path = f.name
    spec = importlib.util.spec_from_file_location("rollout_old", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--before", default=None, metavar="REV",
                   help="benchmark rollout.py from this git revision")
    p.add_argument("--videos", type=int, default=8)
    p.add_argument("--frames", type=int, default=192)
    p.add_argument("--native", default="480x360",
                   help="fake layout's native JPEG size WxH")
    p.add_argument("--root", default=None,
                   help="reuse an existing layout dir (else a temp one)")
    p.add_argument("--chunk_len", type=int, default=32)
    args = p.parse_args()

    w, h = (int(x) for x in args.native.split("x"))
    root = args.root or os.path.join(
        tempfile.gettempdir(), f"gtea_evalbench_{args.videos}x{args.frames}"
    )
    if not os.path.isdir(os.path.join(root, "images")):
        print(f"building layout at {root} ...", file=sys.stderr)
        build_layout(root, args.videos, args.frames, w, h)

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from gaze_tpu.core.config import production_config
    from gaze_tpu.data.gtea import build_manifest
    from gaze_tpu.models.pipeline import GazePipeline

    rollout = load_rollout_module(args.before)
    cfg = production_config()
    pipeline = GazePipeline(cfg, dtype=jnp.bfloat16)
    variables = pipeline.init_variables(jax.random.key(0))
    manifest = build_manifest(root, native_hw=(h, w))
    videos = {v: manifest.frames[v] for v in manifest.videos}
    n_frames = sum(len(r) - 1 for r in videos.values())  # frame 0 seeds

    def run():
        t0 = time.perf_counter()
        res = rollout.rollout_eval_videos(
            pipeline, variables, videos,
            chunk_len=args.chunk_len, group_size=args.videos,
        )
        dt = time.perf_counter() - t0
        scored = sum(n for _, _, n in res.values())
        return dt, scored

    run()  # warm: compile + page cache
    best = min(run()[0] for _ in range(3))
    label = args.before or "current"
    print(f"{label}: {n_frames} frames in {best:.2f}s -> "
          f"{n_frames / best:.1f} frames/s (eval end-to-end)")


if __name__ == "__main__":
    main()
