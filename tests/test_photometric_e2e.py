"""Photometric end-to-end gate: the REAL SuperPoint network (random weights —
no checkpoints ship in this environment) runs on rendered textured IMAGES, and
the full CLI pipeline (native loader -> SuperPoint -> SLAM -> TUM trajectory ->
scale-aligned ATE) must initialize, keep tracking, and produce a finite ATE.

This replaces the oracle-descriptor shortcut for the system-level claim the
reference gets from EuRoC/TUM-VI dataset runs (SURVEY.md §4): no image had
been tracked end-to-end before this gate existed. The reference counterpart
is the Examples/ mains + evaluate_ate_scale.py protocol
(reference: tum_vi_eval_examples.sh:8-12, src/System.cc:50-282 wiring).
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest
import yaml

from rover_slam_tpu.utils import synthetic as syn

pytestmark = pytest.mark.slow

HW = (240, 320)
FX = 220.0


def _settings(root, extra=None):
    d = {
        "Camera.type": "PinHole",
        "Camera1.fx": FX, "Camera1.fy": FX,
        "Camera1.cx": HW[1] / 2.0, "Camera1.cy": HW[0] / 2.0,
        "Camera.width": HW[1], "Camera.height": HW[0], "Camera.fps": 20.0,
        "ORBextractor.nFeatures": 256,
        "loopClosing": 0,
    }
    d.update(extra or {})
    p = os.path.join(root, "settings.yaml")
    with open(p, "w") as f:
        yaml.safe_dump(d, f)
    return p


@pytest.fixture(scope="module")
def photo_seq(tmp_path_factory):
    """Textured sprite cloud + forward/lateral trajectory, mono + stereo."""
    root = str(tmp_path_factory.mktemp("photo_mav0"))
    world = syn.make_photo_world(n_sprites=300, patch=15, seed=0, image_hw=HW)
    R, t, times = syn.forward_trajectory(n_frames=30, dt=0.1, speed=0.4,
                                         lateral=0.8, seed=1)
    _, gt = syn.write_euroc_sequence(root, world, R, t, times, baseline=0.11)
    sp = _settings(root, {"Camera.bf": FX * 0.11})
    return root, sp, gt


def _run(root, sp, gt, sensor, tmp_path, max_frames=None):
    stats_p = str(tmp_path / f"stats_{sensor}.json")
    argv = [sp, root, "--sensor", sensor,
            "--out", str(tmp_path / f"traj_{sensor}.txt"),
            "--gt", gt, "--stats-out", stats_p]
    if max_frames:
        argv += ["--max-frames", str(max_frames)]
    # Run the CLI in a SUBPROCESS (it is a CLI, after all): isolates each
    # photometric drive from the suite's accumulated in-process XLA state —
    # a deterministic XLA:CPU compiler segfault fires when this exact program
    # is compiled after the ~140-test prefix in one process.
    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               PYTHONPATH=os.path.dirname(os.path.dirname(__file__)))
    proc = subprocess.run(
        [sys.executable, "-m", "rover_slam_tpu.apps.run_euroc"] + argv,
        env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-3000:]
    with open(stats_p) as f:
        return json.load(f)


def test_mono_photometric(photo_seq, tmp_path):
    root, sp, gt = photo_seq
    s = _run(root, sp, gt, "monocular", tmp_path)
    # Real images tracked end-to-end: the map must have grown well past the
    # two init keyframes, and the scale-aligned ATE must be finite and sane.
    assert s["n_kf"] >= 8, s
    assert s["ate_cm"] is not None and np.isfinite(s["ate_cm"]), s
    assert s["ate_cm"] < 150.0, s


def test_stereo_photometric(photo_seq, tmp_path):
    root, sp, gt = photo_seq
    s = _run(root, sp, gt, "stereo", tmp_path)
    assert s["n_kf"] >= 8, s
    assert s["ate_cm"] is not None and np.isfinite(s["ate_cm"]), s
    assert s["ate_cm"] < 100.0, s


@pytest.fixture(scope="module")
def photo_vi_seq(tmp_path_factory):
    """Wavy forward trajectory with exact IMU at 20 fps (slow per-frame motion
    -> strong matching; sinusoidal acceleration -> observable scale)."""
    root = str(tmp_path_factory.mktemp("photo_vi"))
    world = syn.make_photo_world(n_sprites=450, patch=15, seed=3,
                                 image_hw=HW,
                                 extent=((-7, 7), (-5, 5), (2, 24)))
    # Gentle sway: per-frame motion small enough that random-weight SuperPoint
    # matching stays strong for the whole run (the visual map must be
    # internally consistent for the inertial alignment to be meaningful);
    # sinusoidal acceleration keeps monocular scale observable.
    R, t, times, _, imu = syn.wavy_forward_with_imu(n_frames=100, dt=0.05,
                                                    v_fwd=0.7, A_x=0.35,
                                                    A_y=0.25)
    _, gt = syn.write_euroc_sequence(root, world, R, t, times, imu=imu)
    sp = _settings(root, {
        "IMU.NoiseGyro": 1.7e-4, "IMU.NoiseAcc": 2e-3,
        "IMU.GyroWalk": 1e-6, "IMU.AccWalk": 1e-5, "IMU.Frequency": 200.0,
    })
    return root, sp, gt


def test_mono_inertial_photometric(photo_vi_seq, tmp_path):
    root, sp, gt = photo_vi_seq
    s = _run(root, sp, gt, "monocular-inertial", tmp_path)
    assert s["n_kf"] >= 8, s
    # METRIC ATE (no scale alignment for inertial sensors): finite and sane
    # proves gravity/scale init produced a usable metric map.
    assert s["ate_cm"] is not None and np.isfinite(s["ate_cm"]), s
    assert s["ate_cm"] < 200.0, s
    assert s.get("imu_ready"), s   # gravity/scale initialization fired
