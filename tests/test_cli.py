"""CLI orchestrator smoke tests — each reference-mirroring stage flag
drives a real tiny run on the synthetic dataset (SURVEY.md §3 call
stacks, end to end)."""

import os

import numpy as np
import pytest

from gaze_tpu import cli


def run_cli(args):
    cli.main(args)


@pytest.fixture()
def save_dir(tmp_path):
    return str(tmp_path / "save")


ARGS_COMMON = [
    "--synthetic",
    "--image_size", "32",
    "--batch_size", "4",
    "--steps_per_epoch", "3",
    "--epochs", "1",
    "--seq_len", "4",
    "--log_every", "1",
]


class TestCLIStages:
    def test_train_sp(self, save_dir):
        # --ckpt_every 2 exercises the periodic async checkpoint path
        run_cli(["--train_sp", "--save_dir", save_dir, "--ckpt_every", "2"]
                + ARGS_COMMON)
        assert os.path.isdir(os.path.join(save_dir, "sp"))

    def test_full_pipeline_sequence(self, save_dir):
        # SP -> AT -> LF -> eval, exactly the reference's
        # gaze_full.py --train_sp --train_lstm --train_late + eval [M]
        run_cli(
            ["--train_sp", "--train_lstm", "--train_late", "--eval",
             "--save_dir", save_dir] + ARGS_COMMON
        )
        for stage in ("sp", "at", "lf"):
            assert os.path.isdir(os.path.join(save_dir, stage)), stage
        # every stage tracks a best-validation checkpoint (AT included)
        for stage in ("sp", "at", "lf"):
            assert os.path.isdir(os.path.join(save_dir, stage + "_best")), stage

    def test_eval_from_checkpoints(self, save_dir, capsys):
        run_cli(
            ["--train_sp", "--train_lstm", "--train_late",
             "--save_dir", save_dir] + ARGS_COMMON
        )
        # fresh invocation restoring all three stages from disk
        run_cli(["--eval", "--save_dir", save_dir] + ARGS_COMMON)
        # real checkpoints restored -> no random-init warning
        assert "random init" not in capsys.readouterr().err

    def test_eval_without_checkpoints_warns(self, save_dir, capsys):
        """--eval on an empty save_dir still runs (template fallback) but
        says so per module — silently scoring random-init weights is the
        checkpoint-dir-typo footgun (the reference hard-fails on a
        missing .pth.tar)."""
        run_cli(["--eval", "--save_dir", save_dir] + ARGS_COMMON)
        err = capsys.readouterr().err
        for module in ("sp", "at", "lf"):
            assert f"no {module} checkpoint" in err, err

    def test_eval_decoder_impls(self, save_dir, capsys):
        """--decoder {pixelshuffle,halfres} drive the alternative SP
        tails through the real rollout eval; halfres (interpolated odd
        samples) must land near the canonical result on the same
        checkpoints, pixelshuffle (exact) must match it closely."""
        run_cli(
            ["--train_sp", "--train_lstm", "--train_late",
             "--save_dir", save_dir] + ARGS_COMMON
        )

        import ast

        def eval_aae(extra):
            run_cli(["--eval", "--save_dir", save_dir] + extra + ARGS_COMMON)
            lines = [l for l in capsys.readouterr().out.splitlines()
                     if l.startswith("{") and "AAE_deg" in l]
            return ast.literal_eval(lines[-1])["AAE_deg"]

        base = eval_aae([])
        exact = eval_aae(["--decoder", "pixelshuffle"])
        half = eval_aae(["--decoder", "halfres"])
        assert exact == pytest.approx(base, abs=0.15)
        assert half == pytest.approx(base, abs=2.0)

    def test_export_torch(self, save_dir, tmp_path):
        """--export_torch restores all stages from disk and writes a
        torch bundle whose SP weights match the checkpointed params."""
        torch = pytest.importorskip("torch")
        run_cli(
            ["--train_sp", "--train_lstm", "--train_late",
             "--save_dir", save_dir] + ARGS_COMMON
        )
        path = str(tmp_path / "bundle.pth")
        run_cli(["--export_torch", path, "--save_dir", save_dir] + ARGS_COMMON)
        bundle = torch.load(path, weights_only=False)
        assert set(bundle) == {"sp", "at", "lf"}
        w = bundle["sp"]["spatial.conv1_1.weight"]
        assert w.shape == (64, 3, 3, 3) and float(w.abs().sum()) > 0


class TestDistributedHelpers:
    def test_single_process_noop(self):
        from gaze_tpu.core.distributed import global_mesh, initialize, local_batch_slice

        initialize(num_processes=1)  # must be a no-op
        mesh = global_mesh()
        assert mesh.size >= 1
        assert local_batch_slice(8) == slice(0, 8)

    def test_single_process_any_batch(self):
        from gaze_tpu.core.distributed import local_batch_slice

        # one host feeds everything; divisibility is trivially satisfied
        assert local_batch_slice(7) == slice(0, 7)


class TestGTEAEval:
    @pytest.fixture()
    def fake_root(self, tmp_path):
        from PIL import Image
        import numpy as np

        root = tmp_path / "gtea"
        rng = np.random.default_rng(0)
        for video in ["Alice_Pizza", "Bob_Burger"]:
            vdir = root / "images" / video
            vdir.mkdir(parents=True)
            for i in range(6):
                img = rng.integers(0, 255, (24, 32, 3), dtype=np.uint8)
                Image.fromarray(img).save(vdir / f"{i:06d}.jpg")
            (root / "gaze").mkdir(exist_ok=True)
            with open(root / "gaze" / f"{video}.txt", "w") as f:
                for i in range(6):
                    f.write(f"{10 + i} {12 + i}\n")
            (root / "fixsac").mkdir(exist_ok=True)
            with open(root / "fixsac" / f"{video}.txt", "w") as f:
                f.write("1\n1\n0\n1\n1\n1\n")
        return str(root)

    def test_full_stack_on_gtea_layout(self, fake_root, save_dir, capsys):
        """Train + per-video eval against the reference's on-disk dataset
        layout (leave-one-subject-out split, native JPEG decode)."""
        run_cli(
            ["--train_sp", "--train_late", "--eval",
             "--data_root", fake_root, "--test_subject", "Alice",
             "--save_dir", save_dir,
             "--image_size", "32", "--batch_size", "2", "--epochs", "1",
             "--seq_len", "4", "--log_every", "1"]
        )
        out = capsys.readouterr().out
        assert "Alice_Pizza" in out      # per-video breakdown
        assert "AAE_deg" in out

    def test_eval_quant_sp_on_gtea_layout(self, fake_root, save_dir, capsys):
        """--quant_sp evaluates end to end on the on-disk layout: the PTQ
        calibration draws its batches from the real training split."""
        run_cli(
            ["--eval", "--quant_sp",
             "--data_root", fake_root, "--test_subject", "Alice",
             "--save_dir", save_dir,
             "--image_size", "32", "--batch_size", "2", "--epochs", "1",
             "--seq_len", "4", "--log_every", "1"]
        )
        out = capsys.readouterr().out
        assert "'quant_sp': 'int8'" in out
        assert "AAE_deg" in out

    def test_eval_is_true_sequential_rollout(self, fake_root, save_dir, capsys):
        """The CLI's --eval must equal a hand-rolled frame-by-frame
        ``pipeline.step`` rollout (LSTM state carried across the video,
        fixsac-gated, AT pooled at the SP argmax — SURVEY §3.4), proving
        eval is NOT teacher-forced and the chunk/group padding in
        evaluation/rollout.py is exact."""
        import ast

        import jax
        import jax.numpy as jnp

        from gaze_tpu.core.checkpoint import save_checkpoint
        from gaze_tpu.data.native_io import decode_batch
        from gaze_tpu.evaluation.metrics import aae, auc_judd
        from gaze_tpu.models.pipeline import GazePipeline
        from gaze_tpu.train.at import create_at_state
        from gaze_tpu.train.lf import create_lf_state
        from gaze_tpu.train.sp import create_sp_state

        args = cli.build_argparser().parse_args(
            ["--image_size", "32", "--batch_size", "2"]
        )
        cfg = cli.make_config(args)
        pipeline = GazePipeline(cfg)
        rng = jax.random.key(0)
        sp_state = create_sp_state(rng, pipeline)
        at_state = create_at_state(rng, pipeline)
        lf_state = create_lf_state(rng, pipeline)
        save_checkpoint(os.path.join(save_dir, "sp"), 0, sp_state)
        save_checkpoint(os.path.join(save_dir, "at"), 0, at_state)
        save_checkpoint(os.path.join(save_dir, "lf"), 0, lf_state)

        run_cli(["--eval", "--data_root", fake_root, "--test_subject", "Alice",
                 "--save_dir", save_dir, "--image_size", "32",
                 "--batch_size", "2"])
        lines = [l for l in capsys.readouterr().out.splitlines()
                 if l.startswith("{")]
        cli_result = ast.literal_eval(lines[-1])

        # Hand-rolled rollout over the single test video, B=1, no padding.
        variables = {
            "sp": {"params": sp_state.params, "batch_stats": sp_state.batch_stats},
            "at": {"params": at_state.params},
            "lf": {"params": lf_state.params},
        }
        vdir = os.path.join(fake_root, "images", "Alice_Pizza")
        frames = decode_batch(
            [os.path.join(vdir, n) for n in sorted(os.listdir(vdir))]
        )
        gaze = np.array([[10 + i, 12 + i] for i in range(6)], np.float32)
        gaze *= [32 / frames.shape[2], 32 / frames.shape[1]]
        fixsac = np.array([1, 1, 0, 1, 1, 1], np.float32)
        state = pipeline.init_state(1)
        step_fn = jax.jit(pipeline.step)
        aaes, aucs = [], []
        for t in range(1, 6):
            state, out = step_fn(
                variables, state,
                jnp.asarray(frames[t - 1 : t]), jnp.asarray(frames[t : t + 1]),
                jnp.asarray(fixsac[t : t + 1]),
            )
            aaes.append(float(aae(out["heatmap"], jnp.asarray(gaze[t : t + 1]),
                                  cfg.camera)[0]))
            aucs.append(float(auc_judd(out["heatmap"],
                                       jnp.asarray(gaze[t : t + 1]))[0]))
        assert cli_result["AAE_deg"] == pytest.approx(np.mean(aaes), abs=1e-3)
        assert cli_result["AUC"] == pytest.approx(np.mean(aucs), abs=1e-3)


class TestExtractLate:
    def test_dumps_per_video_maps(self, save_dir, capsys, tmp_path):
        """--extract_late writes the reference workflow's on-disk map
        artifacts: per-video saliency+attention+frame-index arrays."""
        from PIL import Image

        rng = np.random.default_rng(0)
        root = tmp_path / "gtea"
        for video in ["Alice_Pizza", "Bob_Burger"]:
            vdir = root / "images" / video
            vdir.mkdir(parents=True)
            for i in range(4):
                Image.fromarray(
                    rng.integers(0, 255, (24, 32, 3), dtype=np.uint8)
                ).save(vdir / f"{i:06d}.jpg")
            (root / "gaze").mkdir(exist_ok=True)
            with open(root / "gaze" / f"{video}.txt", "w") as f:
                f.write("10 12\n" * 4)
            (root / "fixsac").mkdir(exist_ok=True)
            with open(root / "fixsac" / f"{video}.txt", "w") as f:
                f.write("1\n" * 4)
        run_cli(["--extract_late", "--data_root", str(root),
                 "--test_subject", "Alice", "--save_dir", save_dir,
                 "--image_size", "32", "--batch_size", "2"])
        for video in ["Alice_Pizza", "Bob_Burger"]:
            z = np.load(os.path.join(save_dir, "maps", f"{video}.npz"))
            assert z["saliency"].shape == (3, 32, 32)   # pairs (0,1)..(2,3)
            assert z["attention"].shape == (3, 32, 32)
            np.testing.assert_array_equal(z["index"], [1, 2, 3])
            assert np.isfinite(z["saliency"]).all()


class TestInferBatch:
    def test_directory_of_videos_and_frame_dirs(self, save_dir, tmp_path,
                                                capsys):
        """--infer_batch: one MJPEG AVI + one frame directory, different
        lengths, as lockstep streams -> one native-pixel track each with
        the right row counts and the '-1 -1' first row."""
        import io

        from PIL import Image

        from gaze_tpu.data.video import write_mjpeg_avi

        rng = np.random.default_rng(3)
        root = tmp_path / "videos"
        root.mkdir()

        def jpeg_bytes(h, w):
            buf = io.BytesIO()
            Image.fromarray(
                rng.integers(0, 255, (h, w, 3), np.uint8)
            ).save(buf, "JPEG")
            return buf.getvalue()

        # video a: 5-frame 48x64 MJPEG AVI
        write_mjpeg_avi(str(root / "a.avi"),
                        [jpeg_bytes(48, 64) for _ in range(5)], 64, 48)
        # video b: 7-frame 32x32 frame DIRECTORY of PNGs — mixed with
        # a's JPEGs in the same per-tick batch, exercising the
        # per-format decode grouping (native_io routes off paths[0]).
        (root / "b").mkdir()
        for i in range(7):
            buf = io.BytesIO()
            Image.fromarray(
                rng.integers(0, 255, (32, 32, 3), np.uint8)
            ).save(buf, "PNG")
            (root / "b" / f"{i:04d}.png").write_bytes(buf.getvalue())

        out_dir = str(tmp_path / "tracks")
        run_cli(
            ["--infer_batch", str(root), "--infer_out", out_dir,
             "--save_dir", save_dir] + ARGS_COMMON
        )
        a = open(os.path.join(out_dir, "a.txt")).read().splitlines()
        b = open(os.path.join(out_dir, "b.txt")).read().splitlines()
        assert len(a) == 5 and len(b) == 7
        assert a[0] == "-1 -1" and b[0] == "-1 -1"
        # later rows are native-pixel coordinates inside each frame
        ax, ay = map(float, a[-1].split())
        assert 0 <= ax <= 64 and 0 <= ay <= 48
        bx, by = map(float, b[-1].split())
        assert 0 <= bx <= 32 and 0 <= by <= 32
        # LAST real frame of the shorter video must be a real prediction
        # (the submit() pipeline lag must not clip it)
        assert a[-1] != "-1 -1" and b[-1] != "-1 -1"

    def test_duplicate_stems_raise(self, save_dir, tmp_path):
        """a.avi next to frame-dir 'a' would overwrite a.txt — refuse."""
        import io

        from PIL import Image

        from gaze_tpu.data.video import write_mjpeg_avi

        rng = np.random.default_rng(5)
        root = tmp_path / "dup"
        root.mkdir()
        buf = io.BytesIO()
        Image.fromarray(
            rng.integers(0, 255, (32, 32, 3), np.uint8)
        ).save(buf, "JPEG")
        write_mjpeg_avi(str(root / "a.avi"), [buf.getvalue()] * 2, 32, 32)
        (root / "a").mkdir()
        (root / "a" / "0000.jpg").write_bytes(buf.getvalue())
        with pytest.raises(ValueError, match="duplicate"):
            run_cli(["--infer_batch", str(root), "--save_dir", save_dir]
                    + ARGS_COMMON)

    def test_bare_quant_save_writes_bundle(self, save_dir, tmp_path):
        """--quant_sp --quant_save with NO eval/infer action must still
        calibrate and write the deployment bundle (it used to be a
        silent no-op)."""
        bundle = str(tmp_path / "int8.npz")
        run_cli(["--train_sp", "--save_dir", save_dir] + ARGS_COMMON)
        run_cli(["--quant_sp", "--quant_save", bundle,
                 "--save_dir", save_dir] + ARGS_COMMON)
        from gaze_tpu.models.quant_io import load_quant_sp

        qsp = load_quant_sp(bundle)
        assert qsp.spatial.kernels["conv1_1"].dtype == np.int8


class TestCLIConfig:
    def test_image_size_hxw(self):
        args = cli.build_argparser().parse_args(["--image_size", "288x384"])
        cfg = cli.make_config(args)
        assert (cfg.image.height, cfg.image.width) == (288, 384)

    def test_camera_preset(self):
        args = cli.build_argparser().parse_args(["--camera", "gtea"])
        cfg = cli.make_config(args)
        assert (cfg.camera.native_width, cfg.camera.native_height) == (640, 480)
        args = cli.build_argparser().parse_args([])
        cfg = cli.make_config(args)
        assert (cfg.camera.native_width, cfg.camera.native_height) == (960, 720)

    def test_remat_plumbing(self):
        """--remat reaches SPConfig.remat; default stays 'none'."""
        args = cli.build_argparser().parse_args(["--remat", "encoders"])
        assert cli.make_config(args).sp.remat == "encoders"
        args = cli.build_argparser().parse_args([])
        assert cli.make_config(args).sp.remat == "none"

    def test_quant_bundle_flags_parse(self):
        args = cli.build_argparser().parse_args(
            ["--quant_save", "a.npz", "--quant_load", "b.npz"]
        )
        assert args.quant_save == "a.npz" and args.quant_load == "b.npz"

    def test_tvl1_knobs(self):
        """--flow_scale/--tvl1_warps/--tvl1_iters reach TVL1Config; the
        defaults stay on the parity path."""
        args = cli.build_argparser().parse_args(
            ["--flow_scale", "0.5", "--tvl1_warps", "3", "--tvl1_iters", "5"]
        )
        cfg = cli.make_config(args)
        assert (cfg.tvl1.flow_scale, cfg.tvl1.warps, cfg.tvl1.iters) == (0.5, 3, 5)
        base = cli.make_config(cli.build_argparser().parse_args([]))
        assert base.tvl1.flow_scale == 1.0
        assert (base.tvl1.warps, base.tvl1.iters) == (5, 10)

    def test_presets_exported(self):
        """The config presets are part of the lazy public API and the
        fast preset differs from production only in solver effort."""
        import gaze_tpu

        prod = gaze_tpu.production_config()
        fast = gaze_tpu.production_fast_config()
        assert fast.tvl1.flow_scale == prod.tvl1.flow_scale == 0.5
        assert (fast.tvl1.warps, fast.tvl1.iters) == (3, 5)
        assert gaze_tpu.parity_config().tvl1.flow_scale == 1.0


class TestInferVideo:
    """--infer: raw MJPEG AVI -> per-frame gaze track, end to end with
    no ffmpeg binary (SURVEY §3.4 packaged; L0 ingestion via the
    pure-Python demuxer)."""

    def test_infer_from_mjpeg_avi(self, save_dir, tmp_path):
        import io

        from PIL import Image

        from gaze_tpu.data.synthetic import SyntheticSpec, generate_sequence
        from gaze_tpu.data.video import write_mjpeg_avi

        frames, _, _ = generate_sequence(
            SyntheticSpec(num_frames=6, height=48, width=64, blob_sigma=3.0)
        )
        jpegs = []
        for fr in frames:
            buf = io.BytesIO()
            Image.fromarray(fr).save(buf, format="JPEG", quality=92)
            jpegs.append(buf.getvalue())
        avi = str(tmp_path / "clip.avi")
        write_mjpeg_avi(avi, jpegs, 64, 48)

        out_txt = str(tmp_path / "gaze.txt")
        hm_dir = str(tmp_path / "maps")
        overlay = str(tmp_path / "overlay.avi")
        run_cli([
            "--infer", avi, "--infer_out", out_txt,
            "--infer_heatmaps", hm_dir, "--infer_heatmap_every", "2",
            "--infer_overlay", overlay,
            "--save_dir", save_dir,  # empty -> random-init weights
        ] + ARGS_COMMON)

        rows = open(out_txt).read().strip().splitlines()
        assert len(rows) == 6
        assert rows[0] == "-1 -1"  # no flow pair for frame 0
        for r in rows[1:]:
            x, y = (float(v) for v in r.split())
            assert 0 <= x < 64 and 0 <= y < 48  # native coords
        import os

        pngs = sorted(os.listdir(hm_dir))
        assert pngs and all(p.endswith(".png") for p in pngs)

        # Overlay video: native-resolution, one frame per input frame,
        # and the post-warmup frames carry the green gaze marker.
        from gaze_tpu.data.video import iter_mjpeg_avi_frames

        decoded = [
            np.asarray(Image.open(io.BytesIO(j)).convert("RGB"))
            for j in iter_mjpeg_avi_frames(overlay)
        ]
        assert len(decoded) == 6
        assert decoded[0].shape == (48, 64, 3)
        marker = np.array([0, 255, 64])
        hit = any(
            (np.abs(d.astype(int) - marker).sum(axis=-1) < 60).any()
            for d in decoded[1:]
        )
        assert hit, "no gaze marker found in overlay frames"

    def test_infer_from_mp4(self, save_dir, tmp_path):
        """--infer on an MP4 (mp4v/MPEG-4): L0 ingestion rides the
        cv2/avcodec fallback — the real-recording container the
        reference needs the ffmpeg binary for."""
        import pytest

        cv2 = pytest.importorskip("cv2")

        from gaze_tpu.data.synthetic import SyntheticSpec, generate_sequence

        frames, _, _ = generate_sequence(
            SyntheticSpec(num_frames=5, height=48, width=64, blob_sigma=3.0)
        )
        mp4 = str(tmp_path / "clip.mp4")
        w = cv2.VideoWriter(
            mp4, cv2.VideoWriter_fourcc(*"mp4v"), 24.0, (64, 48)
        )
        assert w.isOpened()
        for fr in frames:
            w.write(fr[..., ::-1])  # RGB -> BGR
        w.release()

        out_txt = str(tmp_path / "gaze.txt")
        run_cli([
            "--infer", mp4, "--infer_out", out_txt,
            "--save_dir", save_dir,
        ] + ARGS_COMMON)
        rows = open(out_txt).read().strip().splitlines()
        assert len(rows) == 5
        assert rows[0] == "-1 -1"
        for r in rows[1:]:
            x, y = (float(v) for v in r.split())
            assert 0 <= x < 64 and 0 <= y < 48
