"""End-to-end monocular-INERTIAL SLAM: the system must initialize the IMU
(gravity + metric scale) and produce a METRIC trajectory — ATE is evaluated
WITHOUT scale alignment (reference: mono-inertial mode, EuRoC V203 config)."""
import numpy as np
import jax.numpy as jnp
import pytest

from rover_slam_tpu.imu import preintegration as pre
from rover_slam_tpu.slam import tracking as T
from rover_slam_tpu.slam.inertial_system import MonocularInertialSLAM
from rover_slam_tpu.utils import synthetic, trajectory

pytestmark = pytest.mark.slow

CALIB = pre.ImuCalib(
    Rbc=jnp.eye(3), tbc=jnp.zeros(3),
    sigma_g=jnp.float32(1.7e-4 * np.sqrt(200.0)),
    sigma_a=jnp.float32(2e-3 * np.sqrt(200.0)),
    walk_g=jnp.float32(1.9e-5 / np.sqrt(200.0)),
    walk_a=jnp.float32(3e-3 / np.sqrt(200.0)),
)


@pytest.fixture(scope="module")
def vi_run():
    world = synthetic.ring_world(n_landmarks=6000, desc_dim=64, seed=0)
    R_gt, t_gt, times, v_gt, imu = synthetic.orbit_with_imu(
        n_frames=120, revs=1.2, dt=0.1)
    frames = synthetic.render_sequence(world, R_gt, t_gt, times, n_kpts=512,
                                       pix_noise=0.5, desc_noise=0.05)
    slam = MonocularInertialSLAM(world.cam_params, CALIB, tinit_s=1.5,
                                 map_capacity=(96, 512, 16384), desc_dim=64)
    for i, f in enumerate(frames):
        if i > 0:
            accs, gyros, tt = imu[i - 1]
            for a, g, t in zip(accs, gyros, tt):
                slam.feed_imu(a, g, t)
        slam.track_frame(f.kpts, f.rays, f.desc, f.valid, f.time)
    return slam, (R_gt, t_gt, times, v_gt)


def test_tracks(vi_run):
    slam, _ = vi_run
    assert slam.tracking_state == T.OK


def test_imu_initializes(vi_run):
    slam, _ = vi_run
    assert slam.imu_ready, "IMU never initialized"
    # Bias magnitude sane (precision of the online bias chain is a tuning
    # item — the standalone init recovers biases to 5e-4, see
    # test_inertial_init).
    assert np.linalg.norm(np.asarray(slam.bg)) < 0.02


def test_metric_scale_recovered(vi_run):
    """ATE WITHOUT scale alignment must be small: the map is metric."""
    slam, (R_gt, t_gt, times, v_gt) = vi_run
    est_t, est_R, est_tcw = slam.get_trajectory()
    est_pos = np.stack([-est_R[i].T @ est_tcw[i] for i in range(len(est_t))])
    gt_pos = np.stack([-R_gt[i].T @ t_gt[i] for i in range(len(times))])
    pairs = trajectory.associate_by_time(est_t, times)
    # Only score the post-initialization segment.
    pairs = [p for p in pairs if est_t[p[0]] >= 2.0]
    e = np.stack([est_pos[i] for i, _ in pairs])
    g = np.stack([gt_pos[j] for _, j in pairs])
    rmse_noscale, _ = trajectory.ate_rmse(e, g, with_scale=False)
    rmse_scale, _ = trajectory.ate_rmse(e, g, with_scale=True)
    # Metric (no scale alignment) ATE proves gravity/scale recovery.
    # Round-3: the refine/tracking destabilization is FIXED (body state is
    # re-derived from the last frame after alignment,
    # inertial_system._refine_scale) — the run is 120 frames (was 50, capped
    # under the old bug) and the bound is ratcheted from 0.5 to the <10 cm
    # class: measured 4.6 cm metric at 120 frames on TPU, 10.5 cm on the CPU
    # backend (different matmul/rounding paths through the VI chain).
    assert rmse_noscale < 0.15, f"metric ATE {rmse_noscale:.3f} m"
    assert rmse_noscale < 3.0 * rmse_scale + 0.1


def test_velocity_estimates(vi_run):
    slam, (R_gt, t_gt, times, v_gt) = vi_run
    # Last-KF velocity should be near the true orbital speed.
    v_est = np.asarray(slam.v_wb)
    speed_true = np.linalg.norm(v_gt[-1])
    assert abs(np.linalg.norm(v_est) - speed_true) < 0.3 * speed_true + 0.1
