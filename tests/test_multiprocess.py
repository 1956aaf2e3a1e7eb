"""REAL multi-process distributed training test.

Launches two OS processes (tests/mp_worker.py) that join one JAX
distributed job over a localhost coordinator with gloo CPU collectives,
each owning 2 local CPU devices (4 global). Each rank feeds only its
half of the global batch (per-host input sharding via
``local_batch_slice`` + ``host_sharded_array``) and runs the genuine SP
DP train step — the gradient all-reduce crosses the process boundary,
the same topology as multi-host TPU (ICI within a host's devices, the
inter-process hop standing in for DCN).

This closes the "multi-host is simulation-only" gap: every API in
core/distributed.py executes here for real — initialize() with a
coordinator, process_count/process_index-driven input sharding, and
make_array_from_process_local_data assembly.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = os.path.join(os.path.dirname(__file__), "mp_worker.py")
_NUM_STEPS = 2


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _worker_env() -> dict:
    # The suite runs post-testenv-reexec: env is already sanitized
    # (local CPU compiles, no axon sitecustomize). Workers get 2 local
    # devices each so the job is multi-device AND multi-process.
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
    tmp = tmp_path_factory.mktemp("mp")
    port = _free_port()
    env = _worker_env()
    procs = []
    outs = []
    for rank in range(2):
        out = tmp / f"rank{rank}.npz"
        outs.append(out)
        procs.append(
            subprocess.Popen(
                [
                    sys.executable,
                    _WORKER,
                    "--process_id", str(rank),
                    "--num_processes", "2",
                    "--port", str(port),
                    "--out", str(out),
                    "--num_steps", str(_NUM_STEPS),
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
            pytest.fail("multi-process worker timed out")
        logs.append(stdout)
    for rank, (p, log) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{log}"
    return [dict(np.load(o)) for o in outs]


class TestMultiProcessDP:
    def test_job_topology(self, rank_outputs):
        for r in rank_outputs:
            assert int(r["process_count"]) == 2
            assert int(r["device_count"]) == 4

    def test_ranks_agree_bitwise(self, rank_outputs):
        """Replicated state must be identical on every process — any
        divergence means the all-reduce didn't actually synchronize."""
        r0, r1 = rank_outputs
        assert set(r0) == set(r1)
        for k in r0:
            np.testing.assert_array_equal(r0[k], r1[k], err_msg=k)

    def test_matches_single_process(self, rank_outputs):
        """2-process x 2-device DP == plain single-device jit on the same
        global batch (SGD; see TestDataParallel for why not Adam).
        Tolerances cover cross-device/process reduction reordering."""
        import importlib.util

        spec = importlib.util.spec_from_file_location("mp_worker", _WORKER)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)

        ref_losses, ref_params = mod.reference_run(_NUM_STEPS)
        r0 = rank_outputs[0]
        np.testing.assert_allclose(r0["losses"], ref_losses, rtol=1e-5)

        import jax

        ref_leaves = jax.tree_util.tree_leaves(ref_params)
        mp_leaves = [r0[f"param_{i}"] for i in range(len(ref_leaves))]
        for a, b in zip(ref_leaves, mp_leaves):
            np.testing.assert_allclose(np.asarray(a), b, atol=1e-5)
