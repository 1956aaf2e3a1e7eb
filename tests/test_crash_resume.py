"""Failure-recovery e2e: SIGKILL a training run mid-epoch, resume.

SURVEY.md §5 "Failure detection / elastic recovery": the reference loses
everything past its last blocking epoch save; this build checkpoints
asynchronously every ``--ckpt_every`` steps and every stage restores
from the latest on-disk step at startup (cli.py run_train_sp). This test
proves the property for real: a subprocess CLI run is SIGKILLed while
training (possibly mid-async-write — Orbax's tmp-dir commit protocol
must hide the torn step), and a second invocation must resume from the
surviving step, not from scratch.
"""

import os
import signal
import subprocess
import sys
import time

import pytest

ARGS = [
    "--train_sp", "--synthetic",
    "--image_size", "32",
    "--batch_size", "4",
    "--seq_len", "4",
    "--log_every", "50",
]


def _env() -> dict:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_NUM_CPU_DEVICES"] = "2"
    repo_root = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    parts = [p for p in env.get("PYTHONPATH", "").split(os.pathsep) if p]
    if repo_root not in parts:
        parts.insert(0, repo_root)
    env["PYTHONPATH"] = os.pathsep.join(parts)
    return env


class TestCrashResume:
    def test_sigkill_then_resume(self, tmp_path):
        from gaze_tpu.core.checkpoint import latest_step

        save_dir = str(tmp_path / "save")
        sp_dir = os.path.join(save_dir, "sp")

        # A run far too long to finish, checkpointing every step.
        proc = subprocess.Popen(
            [sys.executable, "-m", "gaze_tpu.cli",
             "--save_dir", save_dir,
             "--steps_per_epoch", "100000", "--epochs", "1",
             "--ckpt_every", "1"] + ARGS,
            env=_env(),
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        # Wait for a COMMITTED on-disk step, then kill without warning.
        deadline = time.time() + 420
        step = None
        try:
            while time.time() < deadline:
                if proc.poll() is not None:
                    pytest.fail(
                        "run finished before kill:\n" + proc.communicate()[0]
                    )
                step = latest_step(sp_dir)
                if step is not None and step >= 2:
                    break
                time.sleep(0.25)
            else:
                pytest.fail("no checkpoint appeared within the deadline")
        finally:
            if proc.poll() is None:
                proc.send_signal(signal.SIGKILL)
        proc.communicate()
        assert proc.returncode == -signal.SIGKILL

        survived = latest_step(sp_dir)
        assert survived is not None and survived >= 2

        # Resume: a short second run must restore the surviving step and
        # continue from it — NOT restart at step 0 — then finish cleanly
        # (stage-end blocking save + best-validation tracking).
        out = subprocess.run(
            [sys.executable, "-m", "gaze_tpu.cli",
             "--save_dir", save_dir,
             "--steps_per_epoch", "3", "--epochs", "1"] + ARGS,
            env=_env(),
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            timeout=600,
        )
        assert out.returncode == 0, out.stdout
        final = latest_step(sp_dir)
        assert final == survived + 3, (survived, final, out.stdout)
        assert os.path.isdir(sp_dir + "_best")
