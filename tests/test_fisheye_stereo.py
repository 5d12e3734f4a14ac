"""Fisheye (KannalaBrandt8) STEREO: the general-extrinsic stereo front end
(reference Frame::ComputeStereoFishEyeMatches src/Frame.cc:1619-1700 +
GeometricCamera::TriangulateMatches — the TUM-VI 512 stereo configuration,
no rectification)."""
import numpy as np
import jax.numpy as jnp
import pytest

from rover_slam_tpu.geometry import cameras as cam_mod, lie
from rover_slam_tpu.slam import tracking as T
from rover_slam_tpu.slam.stereo import (fisheye_stereo_match_kernel,
                                        FisheyeStereoSLAM)
from rover_slam_tpu.slam.tracking import TrackerConfig
from rover_slam_tpu.utils import synthetic, trajectory

pytestmark = pytest.mark.slow

KB8 = np.asarray(cam_mod.make_kb8(190.978, 190.973, 254.932, 256.897,
                                  0.00348238, 0.000715034, -0.00205323,
                                  0.000202936))
# TUM-VI-like rig: ~10cm baseline, slight toe-in.
R_RL = np.asarray(lie.so3_exp(jnp.asarray([0.0, 0.02, 0.0])))
T_RL = np.asarray([-0.101, 0.002, 0.001], np.float32)


def _kb8_world(seed=3, n=1600):
    base = synthetic.ring_world(n_landmarks=n, desc_dim=64, seed=seed)
    return synthetic.SyntheticWorld(
        landmarks=base.landmarks, desc=base.desc, cam_params=KB8,
        cam_kind=cam_mod.KANNALA_BRANDT8, image_hw=(512, 512))


def _right_pose(R_lw, t_lw):
    """x_r = R_rl x_l + t_rl and x_l = R_lw x_w + t_lw."""
    R_rw = R_RL @ np.asarray(R_lw)
    t_rw = R_RL @ np.asarray(t_lw) + T_RL
    return R_rw, t_rw


def test_fisheye_match_recovers_metric_depth():
    rng = np.random.default_rng(0)
    world = _kb8_world()
    R_lw, t_lw = np.eye(3), np.zeros(3)
    R_rw, t_rw = _right_pose(R_lw, t_lw)
    fl = synthetic.render_frame(world, jnp.asarray(R_lw, jnp.float32),
                                jnp.asarray(t_lw, jnp.float32), 0.0,
                                n_kpts=512, pix_noise=0.02, desc_noise=0.03,
                                seed=11)
    fr = synthetic.render_frame(world, jnp.asarray(R_rw, jnp.float32),
                                jnp.asarray(t_rw, jnp.float32), 0.0,
                                n_kpts=512, pix_noise=0.02, desc_noise=0.03,
                                seed=12)
    matches, Xl, ok = fisheye_stereo_match_kernel(
        jnp.asarray(fl.rays), jnp.asarray(fl.desc), jnp.asarray(fl.valid),
        jnp.asarray(fr.rays), jnp.asarray(fr.desc), jnp.asarray(fr.valid),
        jnp.asarray(R_RL, jnp.float32), jnp.asarray(T_RL, jnp.float32))
    ok = np.asarray(ok)
    assert ok.sum() > 100, f"only {ok.sum()} stereo matches"
    # Triangulated depth vs ground truth (landmark in the left cam frame).
    lm = np.asarray(fl.lm_id)
    Xw = np.asarray(world.landmarks)[np.clip(lm, 0, len(world.landmarks) - 1)]
    gt_depth = (R_lw @ Xw.T).T[:, 2] + t_lw[2]
    est_depth = np.asarray(Xl)[:, 2]
    sel = ok & (lm >= 0)
    # Depth noise scales as (Z/b)*sigma_angle: at ~10m range on a 10cm
    # baseline even 0.02px noise gives ~1-2% depth error — gate at 5%.
    rel = np.abs(est_depth[sel] - gt_depth[sel]) / gt_depth[sel]
    assert np.median(rel) < 0.05, f"median rel depth err {np.median(rel):.3f}"


def test_fisheye_stereo_slam_metric_e2e():
    """Full fisheye-stereo run: metric ATE without scale alignment must be
    small — stereo depth makes the map metric from frame 0."""
    world = _kb8_world(seed=4)
    R_gt, t_gt, times = synthetic.forward_trajectory(n_frames=30, dt=0.1,
                                                     speed=0.5, yaw_rate=0.03)
    frames_l = synthetic.render_sequence(world, R_gt, t_gt, times,
                                         n_kpts=512, pix_noise=0.4,
                                         desc_noise=0.05)
    R_r = np.stack([_right_pose(R, t)[0] for R, t in
                    zip(np.asarray(R_gt), np.asarray(t_gt))])
    t_r = np.stack([_right_pose(R, t)[1] for R, t in
                    zip(np.asarray(R_gt), np.asarray(t_gt))])
    frames_r = synthetic.render_sequence(world, jnp.asarray(R_r, jnp.float32),
                                         jnp.asarray(t_r, jnp.float32), times,
                                         n_kpts=512, pix_noise=0.4,
                                         desc_noise=0.05)
    slam = FisheyeStereoSLAM(
        world.cam_params, (R_RL.astype(np.float32), T_RL),
        config=TrackerConfig(cam_kind=cam_mod.KANNALA_BRANDT8,
                             image_hw=(512, 512)),
        map_capacity=(64, 512, 16384), desc_dim=64)
    for fl, fr in zip(frames_l, frames_r):
        slam.track_stereo_frame(fl.kpts, fl.rays, fl.desc, fl.valid,
                                fr.rays, fr.desc, fr.valid, fl.time)
    assert slam.tracking_state == T.OK
    est_t, est_R, est_tcw = slam.get_trajectory()
    est_pos = np.stack([-est_R[i].T @ est_tcw[i] for i in range(len(est_t))])
    gt_pos = np.stack([-np.asarray(R).T @ np.asarray(t)
                       for R, t in zip(R_gt, t_gt)])
    pairs = trajectory.associate_by_time(est_t, times)
    e = np.stack([est_pos[i] for i, _ in pairs])
    g = np.stack([gt_pos[j] for _, j in pairs])
    rmse, _ = trajectory.ate_rmse(e, g, with_scale=False)
    assert rmse < 0.10, f"fisheye-stereo metric ATE {rmse:.3f} m"
    # Scale really is observed (not gauge-fixed by alignment). At this
    # range/baseline ratio (~100) with 0.4px noise a few-percent scale bias
    # is expected physics — gate loosely against the aligned error.
    rmse_s, _ = trajectory.ate_rmse(e, g, with_scale=True)
    assert rmse < 8.0 * rmse_s + 0.05
