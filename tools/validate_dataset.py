"""GTEA dataset preflight: run this FIRST when real data appears.

SURVEY.md §0 and VERDICT round-1 both pin "re-verify on real data" as
the standing top-priority the moment a GTEA Gaze+/GTEA tree exists.
This tool makes that a one-command check instead of an ad-hoc ritual:

    python tools/validate_dataset.py /data/gteaplus [--camera gtea]
    python tools/validate_dataset.py /data/gteaplus --pipeline_check

It scans the manifest and reports, per video and in aggregate:
  - frame/gaze/fixsac counts and any length mismatches (truncated to
    the common length, as the loader does);
  - untracked-gaze statistics (zero/NaN/out-of-frame rows -> masked);
  - fixation-label source (fixsac txt vs derived I-DT) + fixation rate;
  - precomputed-flow coverage (packed / split dense_flow layouts);
  - native decode health on a sample frame (resolution vs --camera).

With --pipeline_check it additionally pushes one real pair batch
through the f32 parity pipeline (flow -> SP -> AT -> LF on the default
device) and reports output shapes/finiteness — proof the data path and
the compute path meet before anyone burns a training run.

Exit code: 0 = usable, 1 = layout missing/empty, 2 = usable but with
warnings (mismatched lengths, low gaze validity, partial flow).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("root", help="dataset root (images/, gaze/, [fixsac/, flows/])")
    p.add_argument("--camera", choices=["gtea_plus", "gtea"], default="gtea_plus")
    p.add_argument("--pipeline_check", action="store_true",
                   help="run one real batch through the f32 parity pipeline")
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--image_size", type=int, default=224,
                   help="model grid for --pipeline_check (smaller = "
                        "faster smoke; parity runs use 224)")
    args = p.parse_args()

    from gaze_tpu.core.config import CameraConfig
    from gaze_tpu.data.gtea import build_manifest

    cam = (CameraConfig.gtea_gaze() if args.camera == "gtea"
           else CameraConfig.gtea_gaze_plus())
    try:
        manifest = build_manifest(
            args.root, native_hw=(cam.native_height, cam.native_width)
        )
    except FileNotFoundError as e:
        print(json.dumps({"ok": False, "error": str(e)}))
        return 1
    if not manifest.videos:
        print(json.dumps({"ok": False, "error": "no videos under images/"}))
        return 1

    warnings = []
    report = {"root": args.root, "videos": {}, "subjects": manifest.subjects()}
    tot_frames = tot_valid = tot_fix = tot_flow = tot_pairs = 0
    for v in manifest.videos:
        recs = manifest.frames[v]
        n_img = len(os.listdir(os.path.join(args.root, "images", v)))
        n = len(recs)
        valid = sum(r.gaze_valid for r in recs)
        fix = sum(r.fixation > 0 for r in recs)
        # Flow is consumed per consecutive PAIR under the current frame's
        # name (data/gtea.py), so frame 0 never needs one — count
        # coverage over pair targets only (a dense_flow dump with no
        # frame-0 file is complete, not partial).
        flow = sum(r.flow_path is not None or r.flow_xy_paths is not None
                   for r in recs if r.index > 0)
        fixsac_on_disk = os.path.exists(
            os.path.join(args.root, "fixsac", v + ".txt"))
        entry = {
            "frames": n,
            "gaze_valid_pct": round(100.0 * valid / max(n, 1), 1),
            "fixation_pct": round(100.0 * fix / max(n, 1), 1),
            "fixsac_source": "txt" if fixsac_on_disk else "derived_idt",
            "flow_coverage_pct": round(100.0 * flow / max(n - 1, 1), 1),
        }
        if n < n_img:
            entry["truncated_from"] = n_img
            warnings.append(f"{v}: {n_img} images but {n} usable frames "
                            "(gaze/fixsac shorter — loader truncates)")
        if n and valid / n < 0.5:
            warnings.append(f"{v}: only {entry['gaze_valid_pct']}% gaze rows "
                            "valid — check the txt format ('x y' per frame)")
        report["videos"][v] = entry
        tot_frames += n
        tot_valid += valid
        tot_fix += fix
        tot_flow += flow
        tot_pairs += max(n - 1, 0)

    # Decode one frame: confirms native/PIL decode works and the real
    # resolution matches the --camera preset the AAE math will assume.
    from gaze_tpu.data.gtea import _decode_images

    first = manifest.frames[manifest.videos[0]][0]
    img = _decode_images([first.image_path])
    report["sample_decode_hw"] = list(img.shape[1:3])
    if tuple(img.shape[1:3]) != (cam.native_height, cam.native_width):
        warnings.append(
            f"decoded resolution {img.shape[1:3]} != --camera "
            f"{args.camera} native ({cam.native_height}, {cam.native_width})"
            " — AAE degrees will be computed with the preset intrinsics"
        )

    report["totals"] = {
        "frames": tot_frames,
        "gaze_valid_pct": round(100.0 * tot_valid / max(tot_frames, 1), 1),
        "fixation_pct": round(100.0 * tot_fix / max(tot_frames, 1), 1),
        "flow_coverage_pct": round(100.0 * tot_flow / max(tot_pairs, 1), 1),
    }
    if 0 < tot_flow < tot_pairs:
        warnings.append("partial flows/ coverage — --precomputed_flow auto "
                        "will fall back to on-TPU TV-L1")

    if args.pipeline_check:
        import dataclasses

        import jax
        import numpy as np

        from gaze_tpu.core.config import parity_config
        from gaze_tpu.data.gtea import pair_batches
        from gaze_tpu.models.pipeline import GazePipeline

        cfg = parity_config()
        cfg = dataclasses.replace(
            cfg,
            image=dataclasses.replace(
                cfg.image, height=args.image_size, width=args.image_size
            ),
        )
        pipeline = GazePipeline(cfg)
        variables = pipeline.init_variables(jax.random.key(0))
        recs = [r for v in manifest.videos for r in manifest.frames[v]]
        batch = next(iter(pair_batches(
            recs, args.batch_size, (cfg.image.height, cfg.image.width),
            shuffle=False, drop_remainder=False,
        )), None)
        if batch is None:
            warnings.append(
                "pipeline_check: no consecutive-frame pairs exist (every "
                "video has <2 usable frames) — nothing to run"
            )
            report["pipeline_check"] = None
            report["ok"] = True
            report["warnings"] = warnings
            print(json.dumps(report, indent=1))
            return 2
        state = pipeline.init_state(batch["cur"].shape[0])
        _, out = jax.jit(pipeline.step)(
            variables, state, batch["prev"], batch["cur"], batch["fixsac"],
            flow_img=batch.get("flow_img"),
        )
        hm = np.asarray(out["heatmap"])
        report["pipeline_check"] = {
            "heatmap_shape": list(hm.shape),
            "finite": bool(np.isfinite(hm).all()),
            "used_precomputed_flow": "flow_img" in batch,
        }
        if not report["pipeline_check"]["finite"]:
            warnings.append("pipeline produced non-finite heatmaps")

    report["ok"] = True
    report["warnings"] = warnings
    print(json.dumps(report, indent=1))
    return 2 if warnings else 0


if __name__ == "__main__":
    sys.exit(main())
