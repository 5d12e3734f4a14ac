"""Multi-process (simulated multi-host) distributed BA.

SURVEY.md §2.3/§5: the reference has NO distributed backend; the TPU-native
framework adds one. This test spawns 2 separate Python processes, wires them
into one jax.distributed cluster (gloo over localhost — the CPU stand-in for
DCN), and solves a BA problem whose edges are sharded over the 8 global
devices (4 per process). The result must match the single-process solver.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

from rover_slam_tpu.optim import ba
from tests.test_ba import make_ba_problem, pose_errors

pytestmark = [pytest.mark.slow, pytest.mark.multihost]

_WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_ba_matches_single_process(tmp_path):
    out = str(tmp_path / "mh_result.npz")
    port = 29517
    env = dict(os.environ)
    env["PYTHONPATH"] = _REPO  # drop any axon site hook; force plain CPU
    procs = [subprocess.Popen(
        [sys.executable, _WORKER, str(pid), "2", str(port), out],
        env=env, cwd=_REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(2)]
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=560)
        logs.append(stdout.decode())
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"
    assert os.path.exists(out), logs[0][-2000:]

    res = np.load(out)
    assert int(res["n_global_devices"]) == 8

    prob, (R_true, t_true, X_true), _ = make_ba_problem(Kw=6, Lw=120,
                                                        noise_px=0.5)
    ref = ba.solve_ba(prob, iters=10, cg_iters=25, solver="pcg", phases=1)
    # Cross-process result lands in the same basin as the local solver.
    assert float(res["costs"][-1]) < float(ref.cost_history[0])
    assert np.linalg.norm(res["R"] - np.asarray(ref.R_cw)) < 1e-2
    ang, dte = pose_errors(res["R"], res["t"], R_true, t_true)
    assert ang.max() < 0.2
    assert dte.max() < 0.05
    # Landmark-sharded mode solved across processes too.
    assert float(res["costs_lm"][-1]) < float(ref.cost_history[0])
    ang2, dte2 = pose_errors(res["R_lm"], res["t"], R_true, t_true)
    assert ang2.max() < 0.2
