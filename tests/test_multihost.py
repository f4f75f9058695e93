"""Multi-host distributed BA: real separate processes over jax.distributed.

BASELINE config 5 targets N>=2 hosts. Without a pod, the faithful
simulation (SURVEY.md §4) is `jax.distributed` multi-process on CPU:
2 OS processes x 2 virtual devices joined by a localhost coordinator,
running the same shard_map program as single-host — the collectives
genuinely cross process boundaries.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "mp_ba_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_ba_matches_single(tmp_path):
    port = _free_port()
    out = str(tmp_path / "mp_result.npz")
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(HERE) + os.pathsep + env.get(
        "PYTHONPATH", ""
    )
    # workers force CPU + 2 virtual devices themselves
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-u", WORKER, str(pid), "2", str(port), out],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in range(2)
    ]
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout.decode())
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log}"
    assert os.path.exists(out), "process 0 wrote no result"

    got = np.load(out)

    # reference: same bundle, same solver, single process
    sys.path.insert(0, HERE)
    from mp_ba_worker import solve_single_process

    poses_ref, chi2_ref, pg_t_ref, pg_err_ref = solve_single_process()
    assert np.isfinite(got["chi2"])
    assert abs(got["chi2"] - chi2_ref) < 1e-2 * max(1.0, abs(chi2_ref))
    np.testing.assert_allclose(got["poses"], poses_ref, atol=1e-3)
    # pose graph solved across process boundaries matches single-process
    assert np.isfinite(got["pg_err"])
    assert abs(got["pg_err"] - pg_err_ref) < 1e-2 * max(1.0, abs(pg_err_ref))
    np.testing.assert_allclose(got["pg_t"], pg_t_ref, atol=1e-3)
