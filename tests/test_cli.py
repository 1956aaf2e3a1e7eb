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

    def test_eval_from_checkpoints(self, save_dir):
        run_cli(
            ["--train_sp", "--train_lstm", "--train_late",
             "--save_dir", save_dir] + ARGS_COMMON
        )
        # fresh invocation restoring all three stages from disk
        run_cli(["--eval", "--save_dir", save_dir] + ARGS_COMMON)


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
