"""Multi-session / map-merge test: save a session, reload, track in a NEW map,
then recognize the old place and weld the maps (reference Atlas multi-session:
SaveAtlas/LoadAtlas + MergeLocal)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rover_slam_tpu.map import map_state as ms, atlas
from rover_slam_tpu.slam.system import MonocularSLAM
from rover_slam_tpu.slam.loop_closing import (LoopCloser, LoopConfig,
                                              _sim3_between_kfs,
                                              _merge_maps_kernel)
from rover_slam_tpu.slam import tracking as T
from rover_slam_tpu.utils import synthetic, trajectory

pytestmark = pytest.mark.slow


def test_merge_maps_kernel_geometry():
    """Two copies of the same scene in different map frames merge into one
    consistent frame."""
    world = synthetic.make_world(n_landmarks=2000, desc_dim=64, seed=5)
    R_gt, t_gt, times = synthetic.forward_trajectory(n_frames=14, dt=0.1,
                                                     speed=0.5)
    frames = synthetic.render_sequence(world, R_gt, t_gt, times, n_kpts=512,
                                       pix_noise=0.4, desc_noise=0.04)
    # Session 1: map the area.
    slam = MonocularSLAM(world.cam_params, map_capacity=(64, 512, 8192),
                         desc_dim=64)
    for f in frames:
        slam.track_frame(f.kpts, f.rays, f.desc, f.valid, f.time)
    assert slam.tracking_state == T.OK
    st = slam.state
    n_kf_1 = slam.n_kf

    # Session 2: new map id, SAME physical frames (re-tracked from scratch in
    # a fresh map whose frame/scale differ).
    st = atlas.create_new_map(st)
    slam.state = st
    slam.tracking_state = T.NOT_INITIALIZED
    slam.init_frame = None
    slam.velocity = None
    slam.n_kf_old = n_kf_1
    # Re-run a sub-sequence; tracking reinitializes INTO THE NEW MAP.
    slam.tracking_state = T.NO_IMAGES_YET
    for f in frames[:10]:
        slam.track_frame(f.kpts, f.rays, f.desc, f.valid, f.time + 100.0)
    assert slam.tracking_state == T.OK
    st = slam.state
    assert int(st.kf_map_id[n_kf_1]) == 1   # new session's keyframes labeled 1

    # Place recognition across maps: last new-map KF vs an old-map KF.
    kf_q = slam.n_kf - 1
    kf_c = 5
    assert int(st.kf_map_id[kf_q]) != int(st.kf_map_id[kf_c])
    res, nm = _sim3_between_kfs(st, jnp.asarray(kf_q, jnp.int32),
                                jnp.asarray(kf_c, jnp.int32),
                                slam.cam_params, jax.random.PRNGKey(0),
                                0, False)
    assert bool(res.success), f"cross-map Sim3 failed ({int(nm)} matches)"

    merged = _merge_maps_kernel(st, jnp.asarray(kf_q, jnp.int32),
                                jnp.asarray(kf_c, jnp.int32),
                                res.s, res.R, res.t)
    # All keyframes now in one map.
    assert int(jnp.sum(merged.kf_active
                       & (merged.kf_map_id != merged.kf_map_id[kf_q]))) == 0
    # Geometric weld quality: the old map's KF poses, after transform, must
    # describe the same trajectory as the new map's (frames overlap): compare
    # camera centers of matched times.
    c_old = np.stack([-np.asarray(merged.kf_R_cw[k]).T @
                      np.asarray(merged.kf_t_cw[k]) for k in range(n_kf_1)])
    t_old = np.asarray(merged.kf_time[:n_kf_1])
    c_new = np.stack([-np.asarray(merged.kf_R_cw[k]).T @
                      np.asarray(merged.kf_t_cw[k])
                      for k in range(n_kf_1, slam.n_kf)])
    t_new = np.asarray(merged.kf_time[n_kf_1:slam.n_kf]) - 100.0
    pairs = trajectory.associate_by_time(t_new, t_old)
    e = np.stack([c_new[i] for i, _ in pairs])
    g = np.stack([c_old[j] for _, j in pairs])
    err = np.linalg.norm(e - g, axis=1)
    # same (session-1-scaled) world now: sub-landmark-noise agreement
    assert np.median(err) < 0.05, err


def test_save_load_relocalize(tmp_path):
    """Checkpoint a session, reload into a fresh system, relocalize against
    the loaded map (multi-session resume)."""
    world = synthetic.make_world(n_landmarks=2000, desc_dim=64, seed=6)
    R_gt, t_gt, times = synthetic.forward_trajectory(n_frames=14, dt=0.1,
                                                     speed=0.5)
    frames = synthetic.render_sequence(world, R_gt, t_gt, times, n_kpts=512,
                                       pix_noise=0.4, desc_noise=0.04)
    slam = MonocularSLAM(world.cam_params, map_capacity=(64, 512, 8192),
                         desc_dim=64)
    for f in frames:
        slam.track_frame(f.kpts, f.rays, f.desc, f.valid, f.time)
    assert slam.tracking_state == T.OK
    p = str(tmp_path / "session.npz")
    atlas.save_atlas(slam.state, p)

    slam2 = MonocularSLAM(world.cam_params, map_capacity=(64, 512, 8192),
                          desc_dim=64)
    slam2.state = atlas.load_atlas(p)
    slam2.n_kf = int(slam2.state.n_kf)
    slam2.tracking_state = T.RECENTLY_LOST
    slam2._lost_frames = 5
    slam2.last_frame = T.FrameData(
        jnp.zeros((512, 2)), jnp.ones((512, 3)), jnp.zeros((512, 64)),
        jnp.zeros(512, bool), 0.0, R_cw=jnp.eye(3), t_cw=jnp.zeros(3),
        landmark_idx=jnp.full((512,), -1, jnp.int32))
    f = frames[7]
    info = slam2.track_frame(f.kpts, f.rays, f.desc, f.valid, 50.0)
    assert info["state"] == T.OK, "relocalization into loaded map failed"
