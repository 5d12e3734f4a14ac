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

    # Place recognition across maps: last new-map KF vs an old-map KF
    # (chosen dynamically — the c2 keyframe policy decides how many
    # keyframes session 1 produced).
    kf_q = slam.n_kf - 1
    kf_c = max(1, n_kf_1 // 2)
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


def test_resume_merge_via_detection(tmp_path):
    """Full multi-session resume through the REAL pipeline (reference
    LoadAtlas + LoopClosing merge, /root/reference/src/System.cc:156-206 +
    src/LoopClosing.cc:2098): save session 1, resume with config.resume_atlas
    (which rebuilds the place-recognition database over the loaded map),
    re-track the same area in a FRESH map, and require the cross-map merge to
    fire through detect_candidates — not by calling the Sim3 solver by hand."""
    from rover_slam_tpu.utils import config as cfgmod
    from rover_slam_tpu.slam.tracking import TrackerConfig

    world = synthetic.ring_world(n_landmarks=6000, desc_dim=64, seed=3)
    R_gt, t_gt, times = synthetic.orbit_trajectory(n_frames=60, revs=0.6)
    frames = synthetic.render_sequence(world, R_gt, t_gt, times, n_kpts=512,
                                       pix_noise=0.5, desc_noise=0.05)

    def build():
        return MonocularSLAM(
            world.cam_params, map_capacity=(96, 512, 16384), desc_dim=64,
            enable_loop_closing=True,
            config=TrackerConfig(local_map_only=True),
            loop_config=LoopConfig(min_covis_weight=20,
                                   min_recent_kfs_gap=8,
                                   consistency_needed=2))

    slam = build()
    for f in frames:
        slam.track_frame(f.kpts, f.rays, f.desc, f.valid, f.time)
    assert slam.tracking_state == T.OK
    p = str(tmp_path / "session.npz")
    atlas.save_atlas(slam.state, p)

    # Session 2: fresh system resumed from the checkpoint.
    slam2 = build()
    cfgmod.resume_atlas(slam2, atlas.load_atlas(p))
    n_loaded = slam2.n_kf
    assert int(jnp.sum(slam2.loop_closer.db.active)) > 0, \
        "database not rebuilt on load"
    merged = False
    for f in frames:
        slam2.track_frame(f.kpts, f.rays, f.desc, f.valid, f.time + 500.0)
        if any(info.get("merge") for _, info in slam2.loop_events):
            merged = True
            break
    assert merged, "cross-session merge never fired through detection"
    st = slam2.state
    # All active keyframes end up in ONE map after the weld.
    act = st.kf_active
    ids = jnp.where(act, st.kf_map_id, -1)
    uniq = np.unique(np.asarray(ids))
    uniq = uniq[uniq >= 0]
    assert len(uniq) == 1, f"maps not merged: {uniq}"


def _warped_session(delta, seed=9):
    """Session 1 over a ring arc, then a DELIBERATE drift warp: keyframe
    camera centers (and their anchored landmarks, consistently) shift by
    delta*ramp(kf_id) — zero at the seam (low ids), full delta beyond the
    weld window. The rigid weld aligns the seam exactly and leaves the far
    end off by |delta|; only welding BA + merge pose-graph propagation
    (reference src/Optimizer.cc:5195 + :5667) can fix the interior."""
    world = synthetic.ring_world(n_landmarks=6000, desc_dim=64, seed=seed)
    R_gt, t_gt, times = synthetic.orbit_trajectory(n_frames=60, revs=0.6)
    frames = synthetic.render_sequence(world, R_gt, t_gt, times, n_kpts=512,
                                       pix_noise=0.5, desc_noise=0.05)
    slam = MonocularSLAM(world.cam_params, map_capacity=(96, 512, 16384),
                         desc_dim=64)
    for f in frames:
        slam.track_frame(f.kpts, f.rays, f.desc, f.valid, f.time)
    assert slam.tracking_state == T.OK
    st = slam.state
    n1 = slam.n_kf
    # Pre-warp truth (for scoring the far end after the merge pipeline).
    centers_true = np.stack([
        -np.asarray(st.kf_R_cw[k]).T @ np.asarray(st.kf_t_cw[k])
        for k in range(n1)])
    ramp = np.clip((np.arange(st.K) - 1) / 3.0, 0.0, 1.0)
    off = ramp[:, None] * np.asarray(delta)[None, :]       # [K,3]
    R_all = np.asarray(st.kf_R_cw)
    t_all = np.asarray(st.kf_t_cw)
    centers = -np.einsum("kji,kj->ki", R_all, t_all)
    t_new = -np.einsum("kij,kj->ki", R_all, centers + off)
    anchor = np.clip(np.asarray(st.lm_anchor_kf), 0, st.K - 1)
    lm_new = np.asarray(st.lm_pos) + off[anchor]
    st = st.replace(
        kf_t_cw=jnp.where(jnp.arange(st.K)[:, None] < n1,
                          jnp.asarray(t_new), st.kf_t_cw),
        lm_pos=jnp.where(st.lm_active[:, None], jnp.asarray(lm_new),
                         st.lm_pos))
    return world, frames, st, n1, centers_true


@pytest.mark.parametrize("propagate", [False, True])
def test_merge_propagates_drift_correction(propagate):
    """VERDICT round-3 item 10: a merge with deliberate drift in the absorbed
    map — the rigid weld alone leaves the interior off by |delta|; welding BA
    (absorbed-side window vs fused active landmarks) + essential-graph
    propagation pulls the whole absorbed map back."""
    # Drift sized to the robust-kernel capture range: the correcting fused
    # landmarks must reproject within the Huber-useful band (~10 px at the
    # ring's ~5-7 m depths) — beyond that NO single-shot weld can converge
    # (the reference's Fuse search radius of a few px has the same physics;
    # larger drift harmonizes over subsequent detections, not one event).
    delta = np.array([0.09, 0.0, -0.07], np.float32)
    world, frames, st_old, n1, centers_true = _warped_session(delta)

    from rover_slam_tpu.utils import config as cfgmod
    # welding_window reaches past the drift ramp so the welding BA corrects
    # keyframes carrying the full offset; the graph pass then propagates that
    # correction through the constant-offset interior.
    lc = LoopConfig(min_covis_weight=20, min_recent_kfs_gap=8,
                    consistency_needed=2, run_gba=False, welding_window=12,
                    welding_ba_iters=10)
    if not propagate:
        lc.welding_ba_iters = 0
        lc.merge_pose_graph_iters = 0
    slam2 = MonocularSLAM(world.cam_params, map_capacity=(96, 512, 16384),
                          desc_dim=64, enable_loop_closing=True,
                          loop_config=lc)
    cfgmod.resume_atlas(slam2, st_old)
    merged = False
    for f in frames[:25]:
        slam2.track_frame(f.kpts, f.rays, f.desc, f.valid, f.time + 500.0)
        if any(info.get("merge") for _, info in slam2.loop_events):
            merged = True
            break
    assert merged, "merge never fired"
    st = slam2.state
    centers_now = np.stack([
        -np.asarray(st.kf_R_cw[k]).T @ np.asarray(st.kf_t_cw[k])
        for k in range(n1)])
    # Far end of the absorbed map (full-delta region).
    far = np.arange(n1) >= 10
    err_far = np.linalg.norm(centers_now[far] - centers_true[far],
                             axis=1)
    if propagate:
        # Measured: 3.2 cm at merge_rounds=2 vs the 11.4 cm injected drift
        # (the deferred two-phase detection fires the merge 1-2 KFs later
        # than the round-3 eager path, so the welding window catches a bit
        # less of the drift ramp; the no-propagate control below still
        # bounds what a rigid weld alone leaves: > 5.7 cm).
        assert np.median(err_far) < 0.35 * np.linalg.norm(delta), \
            f"propagation failed: far-end err {np.median(err_far):.3f}"
    else:
        # Rigid weld alone cannot fix the interior drift.
        assert np.median(err_far) > 0.5 * np.linalg.norm(delta), \
            f"unexpectedly corrected without propagation: {np.median(err_far):.3f}"


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
    # dt below the timestamp-jump gate (a >1 s gap would correctly spawn a
    # fresh Atlas map instead of relocalizing, src/Tracking.cc:2040-2086).
    info = slam2.track_frame(f.kpts, f.rays, f.desc, f.valid, 0.5)
    assert info["state"] == T.OK, "relocalization into loaded map failed"
