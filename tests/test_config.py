"""Settings/config surface tests (reference: src/Settings.cc + Appendix C keys)."""
import numpy as np
import pytest

from rover_slam_tpu.geometry import cameras
from rover_slam_tpu.utils import config

EUROC_YAML = """
%YAML:1.0
File.version: "1.0"
Camera.type: "PinHole"
Camera1.fx: 458.654
Camera1.fy: 457.296
Camera1.cx: 367.215
Camera1.cy: 248.375
Camera.width: 752
Camera.height: 480
Camera.fps: 20.0
Camera.bf: 47.90639384423901
IMU.NoiseGyro: 1.7e-4
IMU.NoiseAcc: 2.0e-3
IMU.GyroWalk: 1.9e-5
IMU.AccWalk: 3.0e-3
IMU.Frequency: 200.0
ORBextractor.nFeatures: 1200
System.thFarPoints: 20.0
"""

TUMVI_YAML = """
%YAML:1.0
Camera.type: "KannalaBrandt8"
Camera1.fx: 190.978
Camera1.fy: 190.973
Camera1.cx: 254.932
Camera1.cy: 256.897
Camera1.k1: 0.00348238
Camera1.k2: 0.000715034
Camera1.k3: -0.00205323
Camera1.k4: 0.000202936
Camera.width: 512
Camera.height: 512
Camera.fps: 20.0
"""


def test_pinhole_parse(tmp_path):
    p = tmp_path / "euroc.yaml"
    p.write_text(EUROC_YAML)
    s = config.load_settings(str(p), sensor="monocular")
    assert s.cam_kind == cameras.PINHOLE
    np.testing.assert_allclose(s.cam_params[:4],
                               [458.654, 457.296, 367.215, 248.375])
    assert s.image_hw == (480, 752)
    assert s.fps == 20.0
    assert s.n_features == 1200
    assert s.th_far_points == 20.0


def test_kb8_parse(tmp_path):
    p = tmp_path / "tumvi.yaml"
    p.write_text(TUMVI_YAML)
    s = config.load_settings(str(p), sensor="monocular")
    assert s.cam_kind == cameras.KANNALA_BRANDT8
    np.testing.assert_allclose(s.cam_params[4], 0.00348238)


def test_inertial_noise_scaling(tmp_path):
    p = tmp_path / "euroc.yaml"
    p.write_text(EUROC_YAML)
    s = config.load_settings(str(p), sensor="monocular-inertial")
    assert s.imu is not None
    # sigma * sqrt(freq), walk / sqrt(freq) (reference src/Tracking.cc:665-672)
    np.testing.assert_allclose(float(s.imu.sigma_g), 1.7e-4 * np.sqrt(200),
                               rtol=1e-5)
    np.testing.assert_allclose(float(s.imu.walk_a), 3e-3 / np.sqrt(200),
                               rtol=1e-5)


def test_stereo_baseline_from_bf(tmp_path):
    p = tmp_path / "euroc.yaml"
    p.write_text(EUROC_YAML)
    s = config.load_settings(str(p), sensor="stereo")
    np.testing.assert_allclose(s.baseline, 47.90639384423901 / 458.654,
                               rtol=1e-6)


def test_version_gate():
    with pytest.raises(config.SettingsError, match="version"):
        config.load_settings({"File.version": "2.0", "Camera.fx": 1.0,
                              "Camera.fy": 1, "Camera.cx": 0, "Camera.cy": 0,
                              "Camera.width": 10, "Camera.height": 10})


def test_missing_required():
    with pytest.raises(config.SettingsError, match="missing"):
        config.load_settings({"Camera.type": "PinHole"})


def test_resize_scales_intrinsics():
    s = config.load_settings({
        "Camera.type": "PinHole", "Camera.fx": 400.0, "Camera.fy": 400.0,
        "Camera.cx": 320.0, "Camera.cy": 240.0,
        "Camera.width": 640, "Camera.height": 480,
        "Camera.newWidth": 320, "Camera.newHeight": 240})
    np.testing.assert_allclose(s.cam_params[0], 200.0)
    assert s.image_hw == (240, 320)


def test_build_system(tmp_path):
    p = tmp_path / "euroc.yaml"
    p.write_text(EUROC_YAML)
    s = config.load_settings(str(p), sensor="monocular")
    slam = config.build_system(s, map_capacity=(8, 64, 256), desc_dim=16)
    assert slam.cfg.image_hw == (480, 752)
