"""Stereo-inertial e2e: metric from stereo, gravity/bias from IMU
(reference IMU_STEREO / stereo_inertial_euroc config)."""
import numpy as np
import jax.numpy as jnp
import pytest

from rover_slam_tpu.imu import preintegration as pre
from rover_slam_tpu.slam import tracking as T
from rover_slam_tpu.slam.stereo_inertial import StereoInertialSLAM
from rover_slam_tpu.utils import synthetic, trajectory
from tests.test_e2e_inertial import CALIB

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def si_run():
    world = synthetic.ring_world(n_landmarks=6000, desc_dim=64, seed=0)
    R_gt, t_gt, times, v_gt, imu = synthetic.orbit_with_imu(
        n_frames=40, revs=0.4, dt=0.1)
    frames = synthetic.render_sequence(world, R_gt, t_gt, times, n_kpts=512,
                                       pix_noise=0.5, desc_noise=0.05)
    baseline = 0.11
    fx = float(np.asarray(world.cam_params)[0])
    slam = StereoInertialSLAM(world.cam_params, CALIB, baseline,
                              tinit_s=1.0, map_capacity=(64, 512, 16384),
                              desc_dim=64)
    for i, f in enumerate(frames):
        if i > 0:
            accs, gyros, tt = imu[i - 1]
            for a, g, t in zip(accs, gyros, tt):
                slam.feed_imu(a, g, t)
        Xc = (f.R_cw @ world.landmarks[np.maximum(f.lm_id, 0)].T).T + f.t_cw
        depth_true = np.where(f.lm_id >= 0, Xc[:, 2], -1.0)
        disp = np.where(depth_true > 0,
                        fx * baseline / np.maximum(depth_true, 1e-3), 0)
        kpts_r = f.kpts.copy()
        kpts_r[:, 0] -= disp
        slam.track_stereo_frame(f.kpts, f.rays, f.desc, f.valid,
                                kpts_r, f.desc, f.valid, f.time)
    return slam, (R_gt, t_gt, times)


def test_tracks_and_imu_ready(si_run):
    slam, _ = si_run
    assert slam.tracking_state == T.OK
    assert slam.imu_ready
    # Gyro bias recovered (scale was never free).
    np.testing.assert_allclose(np.asarray(slam.bg), [0.002, -0.001, 0.003],
                               atol=2e-3)


def test_metric_no_alignment(si_run):
    slam, (R_gt, t_gt, times) = si_run
    est_t, est_R, est_tcw = slam.get_trajectory()
    est_pos = np.stack([-est_R[i].T @ est_tcw[i] for i in range(len(est_t))])
    gt_pos = np.stack([-R_gt[i].T @ t_gt[i] for i in range(len(times))])
    # Poses logged before the gravity alignment live in the pre-alignment
    # frame: score the post-init segment (same protocol as the mono-inertial
    # test).
    pairs = [p for p in trajectory.associate_by_time(est_t, times)
             if est_t[p[0]] >= 1.5]
    e = np.stack([est_pos[i] for i, _ in pairs])
    g = np.stack([gt_pos[j] for _, j in pairs])
    rmse, _ = trajectory.ate_rmse(e, g, with_scale=False)
    rmse_s, _ = trajectory.ate_rmse(e, g, with_scale=True)
    # Ratcheted from 0.15 (round-3): stereo observations are now 3-dim
    # solver residuals in every optimizer; stereo system measured 0.93 cm
    # metric on TPU.
    assert rmse < 0.08, f"stereo-inertial metric ATE {rmse:.3f} m"
    # Metric: scale alignment must not help much.
    assert rmse < 1.5 * rmse_s + 0.02
