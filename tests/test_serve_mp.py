"""REAL multi-process serving test: two OS processes, one gloo job,
one DistributedStreamServer pool sharded across both — each rank feeds
and reads only its half (tests/mp_serve_worker.py). Verifies the
assembled global gaze tracks equal a single-process StreamServer run
on the same pool — i.e. per-host serving I/O changes nothing about the
math, the multi-host analogue of the training test in
tests/test_multiprocess.py."""

import importlib.util
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = os.path.join(os.path.dirname(__file__), "mp_serve_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _worker_env() -> dict:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_NUM_CPU_DEVICES"] = "2"
    repo_root = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    parts = [p for p in env.get("PYTHONPATH", "").split(os.pathsep) if p]
    if repo_root not in parts:
        parts.insert(0, repo_root)
    env["PYTHONPATH"] = os.pathsep.join(parts)
    return env


@pytest.fixture(scope="module")
def rank_outputs(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mp_serve")
    port = _free_port()
    env = _worker_env()
    procs, outs = [], []
    for rank in range(2):
        out = tmp / f"rank{rank}.npz"
        outs.append(out)
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, _WORKER,
                    "--process_id", str(rank),
                    "--num_processes", "2",
                    "--port", str(port),
                    "--out", str(out),
                ],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("serving worker timed out")
        logs.append(stdout)
    for rank, (p, log) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{log}"
    return [dict(np.load(o)) for o in outs]


class TestMultiProcessServing:
    def test_topology(self, rank_outputs):
        for r in rank_outputs:
            assert int(r["process_count"]) == 2
            assert int(r["device_count"]) == 4

    def test_matches_single_process_server(self, rank_outputs):
        """concat(rank gaze tracks) == single-process StreamServer on
        the same global pool/frames."""
        spec = importlib.util.spec_from_file_location("mp_serve_worker",
                                                      _WORKER)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        ref = mod.reference_run()  # (T, S, 2)
        got = np.concatenate(
            [rank_outputs[0]["gaze"], rank_outputs[1]["gaze"]], axis=1
        )
        np.testing.assert_array_equal(got, ref)

    def test_first_tick_sentinels(self, rank_outputs):
        for r in rank_outputs:
            assert (r["gaze"][0] == -1).all()  # no flow pair yet
            assert (r["gaze"][1:] >= 0).all()
