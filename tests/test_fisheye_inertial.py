"""Fisheye (KannalaBrandt8) monocular-INERTIAL end-to-end — the TUM-VI
configuration (reference: KannalaBrandt8 camera model + IMU_MONOCULAR mode,
mono_inertial_tum_vi example; SURVEY.md §7 step 7)."""
import numpy as np
import jax.numpy as jnp
import pytest

from rover_slam_tpu.geometry import cameras as cam_mod
from rover_slam_tpu.imu import preintegration as pre
from rover_slam_tpu.slam import tracking as T
from rover_slam_tpu.slam.inertial_system import MonocularInertialSLAM
from rover_slam_tpu.slam.tracking import TrackerConfig
from rover_slam_tpu.utils import synthetic, trajectory

pytestmark = pytest.mark.slow

# TUM-VI 512 fisheye intrinsics + IMU noise (tum_vi.yaml values).
KB8 = np.asarray(cam_mod.make_kb8(190.978, 190.973, 254.932, 256.897,
                                  0.00348238, 0.000715034, -0.00205323,
                                  0.000202936))
CALIB = pre.ImuCalib(
    Rbc=jnp.eye(3), tbc=jnp.zeros(3),
    sigma_g=jnp.float32(0.00016 * np.sqrt(200.0)),
    sigma_a=jnp.float32(0.0028 * np.sqrt(200.0)),
    walk_g=jnp.float32(0.000022 / np.sqrt(200.0)),
    walk_a=jnp.float32(0.00086 / np.sqrt(200.0)),
)


@pytest.fixture(scope="module")
def fisheye_vi_run():
    base = synthetic.ring_world(n_landmarks=1600, desc_dim=64, seed=2)
    world = synthetic.SyntheticWorld(
        landmarks=base.landmarks, desc=base.desc, cam_params=KB8,
        cam_kind=cam_mod.KANNALA_BRANDT8, image_hw=(512, 512))
    R_gt, t_gt, times, v_gt, imu = synthetic.orbit_with_imu(
        n_frames=50, revs=0.5, dt=0.1)
    frames = synthetic.render_sequence(world, R_gt, t_gt, times, n_kpts=512,
                                       pix_noise=0.5, desc_noise=0.05)
    slam = MonocularInertialSLAM(
        world.cam_params, CALIB, tinit_s=1.5,
        config=TrackerConfig(cam_kind=cam_mod.KANNALA_BRANDT8,
                             image_hw=(512, 512)),
        map_capacity=(96, 512, 16384), desc_dim=64)
    for i, f in enumerate(frames):
        if i > 0:
            accs, gyros, tt = imu[i - 1]
            for a, g, t in zip(accs, gyros, tt):
                slam.feed_imu(a, g, t)
        slam.track_frame(f.kpts, f.rays, f.desc, f.valid, f.time)
    return slam, (R_gt, t_gt, times, v_gt)


def test_tracks_and_initializes(fisheye_vi_run):
    slam, _ = fisheye_vi_run
    assert slam.tracking_state == T.OK
    assert slam.imu_ready, "IMU never initialized on the fisheye run"


def test_metric_ate(fisheye_vi_run):
    """Metric (no scale alignment) ATE: gravity + scale must be recovered
    through the fisheye projection model."""
    slam, (R_gt, t_gt, times, v_gt) = fisheye_vi_run
    est_t, est_R, est_tcw = slam.get_trajectory()
    est_pos = np.stack([-est_R[i].T @ est_tcw[i] for i in range(len(est_t))])
    gt_pos = np.stack([-R_gt[i].T @ t_gt[i] for i in range(len(times))])
    pairs = trajectory.associate_by_time(est_t, times)
    pairs = [p for p in pairs if est_t[p[0]] >= 2.0]
    e = np.stack([est_pos[i] for i, _ in pairs])
    g = np.stack([gt_pos[j] for _, j in pairs])
    rmse_noscale, _ = trajectory.ate_rmse(e, g, with_scale=False)
    assert rmse_noscale < 0.5, f"fisheye metric ATE {rmse_noscale:.3f} m"
