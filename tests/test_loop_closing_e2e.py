"""Loop-closing integration: orbit trajectory revisits its start; the system
must detect the loop and correct drift (reference: LoopClosing::Run pipeline)."""
import numpy as np
import jax.numpy as jnp
import pytest

from rover_slam_tpu.slam.system import MonocularSLAM
from rover_slam_tpu.slam import tracking as T
from rover_slam_tpu.slam.loop_closing import LoopConfig
from rover_slam_tpu.utils import synthetic, trajectory

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def loop_run():
    world = synthetic.ring_world(n_landmarks=6000, desc_dim=64, seed=0)
    R_gt, t_gt, times = synthetic.orbit_trajectory(n_frames=100, revs=1.25)
    frames = synthetic.render_sequence(world, R_gt, t_gt, times, n_kpts=512,
                                       pix_noise=0.5, desc_noise=0.05)
    from rover_slam_tpu.slam.tracking import TrackerConfig
    slam = MonocularSLAM(world.cam_params, map_capacity=(128, 512, 16384),
                         desc_dim=64, enable_loop_closing=True,
                         config=TrackerConfig(local_map_only=True),
                         loop_config=LoopConfig(min_covis_weight=20,
                                                min_recent_kfs_gap=15))
    for f in frames:
        slam.track_frame(f.kpts, f.rays, f.desc, f.valid, f.time)
    return slam, (R_gt, t_gt, times)


def test_tracks_orbit(loop_run):
    slam, _ = loop_run
    assert slam.tracking_state == T.OK
    assert slam.n_kf > 10


def test_loop_detected(loop_run):
    slam, _ = loop_run
    assert len(slam.loop_events) >= 1, "no loop closure fired"
    kf, info = slam.loop_events[0]
    # Loop should connect back to an early keyframe.
    assert info["candidate"] < kf - 10
    assert 0.5 < info["scale"] < 2.0


def test_ate_after_loop(loop_run):
    slam, (R_gt, t_gt, times) = loop_run
    est_t, est_R, est_tcw = slam.get_trajectory()
    est_pos = np.stack([-est_R[i].T @ est_tcw[i] for i in range(len(est_t))])
    gt_pos = np.stack([-R_gt[i].T @ t_gt[i] for i in range(len(times))])
    pairs = trajectory.associate_by_time(est_t, times)
    e = np.stack([est_pos[i] for i, _ in pairs])
    g = np.stack([gt_pos[j] for _, j in pairs])
    rmse, _ = trajectory.ate_rmse(e, g, with_scale=True)
    # ~33 m path around the orbit; mono drift corrected by the loop.
    assert rmse < 0.5, f"ATE RMSE {rmse:.3f} m"
