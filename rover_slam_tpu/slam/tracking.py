"""Tracking front-end: host state machine over jitted device programs.

TPU-native replacement for the reference's Tracking thread
(reference: src/Tracking.cc — state machine {NO_IMAGES_YET, NOT_INITIALIZED, OK,
RECENTLY_LOST, LOST} :2012-2732, MonocularInitialization :2879-2988,
TrackWithMotionModel :3427-3547, TrackLocalMap :3564-3726, NeedNewKeyFrame
:3728-3930).

Design split (SURVEY.md §7 hard part 3): branchy per-frame control flow stays in
host Python, but every branch's compute is a pre-compiled fixed-shape jitted
program (motion-model track, local-map track, initialization) so no recompiles
happen at runtime. The map lives on device; only scalar decisions come back.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..geometry import lie, cameras, two_view, triangulation
from ..imu import preintegration as preint
from ..map import map_state as ms
from ..ops import association as assoc
from ..optim import pose_opt, ba, robust

# Scale/view-adaptive projection-search gates (reference
# MapPoint::PredictScale distance band + isInFrustum viewing cos,
# src/MapPoint.cc:568-689): module-level so tests can ablate them.
import os as _os
ADAPT_DEPTH_BAND = float(_os.environ.get("ROVER_ADAPT_BAND", "2.5"))
ADAPT_COS_MIN = float(_os.environ.get("ROVER_ADAPT_COS", "0.35"))

# Tracking states (reference include/Tracking.h eTrackingState)
NO_IMAGES_YET = 0
NOT_INITIALIZED = 1
OK = 2
RECENTLY_LOST = 3
LOST = 4


@dataclass
class TrackerConfig:
    cam_kind: int = cameras.PINHOLE
    image_hw: tuple = (480, 640)
    # thresholds (reference Appendix B)
    min_matches_motion: int = 20      # src/Tracking.cc:3472
    min_matches_ref_kf: int = 15      # :3261
    min_inliers_track: int = 10       # motion-model acceptance
    min_inliers_local_map: int = 30   # :3650-3720
    min_inliers_weak: int = 12    # weak-acceptance band [weak, local_map):
                                  # keep the optimized pose, stay OK, and
                                  # INSERT A KEYFRAME URGENTLY instead of
                                  # going RECENTLY_LOST (the reference keeps
                                  # tracking through weak stretches and its
                                  # always-insert KF policy feeds the map
                                  # exactly then; a hard fail here blocks
                                  # insertion and the map can never recover
                                  # — fatal under pipelined, delayed
                                  # decisions)
    min_init_matches: int = 80        # :2922 (100 in ref; oracle frames are smaller)
    proj_radius: float = 15.0
    desc_th2: float = assoc.TH_HIGH ** 2
    local_map_only: bool = False  # True = reference-style covis-local search
    kf_min_interval: int = 1  # >=1: a well-tracked frame right after an
                              # insert never re-inserts (the reference fork's
                              # always-insert if(true) is reproducible with 0
                              # + kf_tracked_ratio >= 1; SURVEY.md lists the
                              # if(true) as a quirk NOT to replicate)
    kf_max_interval: int = 10
    kf_tracked_ratio: float = 0.75    # c2 policy (reference :3848 uses 0.9 of
                                      # the ref-KF count; our peak-decay
                                      # estimator fluctuates +-10% frame to
                                      # frame on real features, so 0.9 fired
                                      # near-every frame — 0.75 holds the
                                      # same ATE at ~1 KF / 3-4 frames on the
                                      # bench orbit)
    local_window: int = 8             # optimized KFs in local BA
    fixed_window: int = 8             # fixed anchor KFs in local BA
    # Per-phase LM iterations of the windowed local BA (x2 phases with an
    # outlier cut between, like the reference's two-stage local BA). TPU
    # sweep: 2 reaches the same steady-state cost as 3/5 (each LM step is
    # ~3 ms of sequential latency; 2x2 = 16.6 ms vs 3x2 = 21.4 ms on-chip).
    ba_iters: int = 2
    ba_every: int = 1  # run local BA every Nth keyframe (reference aborts LBA
                       # under queue pressure — mbAbortBA — so skipping under
                       # load is faithful; sweep: skipping costs more than it
                       # saves — weaker tracking inserts extra keyframes)
    kf_cull_every: int = 0  # cull redundant keyframes every N insertions
                            # (reference KeyFrameCulling runs per-KF,
                            # src/LocalMapping.cc:1310; 0 = off — synthetic
                            # full-visibility scenes mark everything redundant)
    kf_cull_redundancy: float = 0.9   # reference: 90% of MPs seen >=3x elsewhere
    time_recently_lost_s: float = 2.0  # RECENTLY_LOST grace window before LOST
                                       # (reference 2s visual / 5s inertial,
                                       # src/Tracking.cc:2273,2287)
    min_kfs_keep_map: int = 10  # on LOST: reset map if younger, else new
                                # Atlas map (src/Tracking.cc:2302-2308)
    min_reloc_inliers: int = 30  # relocalization acceptance (reference
                                 # requires >=50 inliers after guided
                                 # expansion, src/Tracking.cc:4646-4660; a
                                 # spurious accept corrupts the motion model
                                 # far worse than staying lost a few frames)
    reloc_every: int = 2         # attempt relocalization every Nth lost
                                 # frame (each attempt is a full-map match +
                                 # PnP RANSAC + a blocking scalar fetch)
    timestamp_jump_s: float = 1.0   # frame-timestamp gap (or any backwards
                                    # jump) that spawns a fresh Atlas map
                                    # (reference CreateMapInAtlas on dt jump,
                                    # src/Tracking.cc:2040-2086); <=0 disables
    insert_kfs_when_lost: bool = False  # with IMU: keep inserting keyframes
                                        # from predicted poses while
                                        # RECENTLY_LOST so the inertial chain
                                        # bridges the visual outage
                                        # (reference IMU.InsertKFsWhenLost)
    init_depth_scale: bool = True     # rescale init map to median depth 1
    init_sigma_px: float = 1.0    # two-view RANSAC measurement sigma (pixels,
                                  # reference TwoViewReconstruction sigma=1.0)
    th_far_points: float = 100.0  # System.thFarPoints: discard landmarks
                                  # beyond this depth in the projection
                                  # search (reference SPmatcher.cc:1184)
    # Per-frame pose-LM schedules (reference PoseOptimization runs 4x10 per
    # stage on CPU, src/Optimizer.cc:280; each LM iteration is a SEQUENTIAL
    # device step on TPU, so the schedule is a latency knob — sweep in
    # PROGRESS notes; defaults preserve tracked ATE at ~half the track-step
    # latency of the 2x8/3x8 schedule).
    motion_rounds: int = 2
    motion_iters: int = 5
    local_rounds: int = 2
    local_iters: int = 6


@dataclass
class FrameData:
    """Host-side per-frame bundle (device arrays)."""
    kpts: jnp.ndarray
    rays: jnp.ndarray
    desc: jnp.ndarray
    valid: jnp.ndarray
    time: float
    R_cw: Optional[jnp.ndarray] = None
    t_cw: Optional[jnp.ndarray] = None
    landmark_idx: Optional[jnp.ndarray] = None
    invd: Optional[jnp.ndarray] = None   # [N] stereo inverse depth (<=0 none)


# ---------------------------------------------------------------------------
# Jitted kernels
# ---------------------------------------------------------------------------

@jax.jit
def _match_prev(desc0, valid0, desc1, valid1):
    # Lowe ratio is essential: a keypoint's landmark may simply be absent in
    # the other frame, and the raw TH_HIGH gate (1.4^2=1.96) barely rejects
    # unrelated unit descriptors (d^2 ~= 2.0). (reference SPmatcher uses
    # mfNNratio in its descriptor paths.)
    return assoc.mutual_nn_match(desc0, valid0, desc1, valid1, ratio=0.8)


@functools.partial(jax.jit, static_argnames=("cam_kind",))
def _track_motion_kernel(R0, t0, prev_lm_idx, prev_valid, lm_pos, lm_active,
                         matches_prev_to_cur, cur_kpts, cur_valid,
                         cam_params, cam_kind):
    """Pose-optimize current frame against landmarks seen in the previous frame,
    transported through descriptor matches prev->cur.

    Returns (R, t, inliers [N_cur] landmark idx per current kpt, n_inliers).
    """
    N = cur_kpts.shape[0]
    L = lm_pos.shape[0]
    # Per-current-kpt landmark id: invert matches (prev i -> cur j) by
    # compare+argmax (assoc.invert_matches — scatters are ~0.3 ms each).
    m = matches_prev_to_cur
    has = (m >= 0) & (prev_lm_idx >= 0) & prev_valid
    inv = assoc.invert_matches(jnp.where(has, m, -1), N)
    cur_lm = jnp.where(inv >= 0, prev_lm_idx[jnp.clip(inv, 0, N - 1)], -1)
    lm_c = jnp.clip(cur_lm, 0, L - 1)
    ok = (cur_lm >= 0) & lm_active[lm_c] & cur_valid
    Xw = lm_pos[lm_c]
    res = pose_opt.pose_optimization(R0, t0, Xw, cur_kpts, ok, cam_params,
                                     cam_kind=cam_kind)
    cur_lm = jnp.where(res.inliers, cur_lm, -1)
    return res.R_cw, res.t_cw, cur_lm, jnp.sum(ok.astype(jnp.int32)), res.n_inliers


@functools.partial(jax.jit, static_argnames=("cam_kind", "image_hw"))
def _track_local_map_kernel(R0, t0, lm_pos, lm_desc, lm_active, seen_lm,
                            cur_kpts, cur_desc, cur_valid, cur_lm_in,
                            cam_params, cam_kind, image_hw,
                            proj_radius, desc_th2):
    """Project the active map into the frame, associate, pose-optimize
    (reference TrackLocalMap + SearchLocalPoints)."""
    N = cur_kpts.shape[0]
    L = lm_pos.shape[0]
    uv, depth, visible = assoc.project_landmarks(
        lm_pos, lm_active, R0, t0, cam_params, cam_kind, image_hw)
    kpt_lm, _ = assoc.projection_match(uv, lm_desc, visible,
                                       cur_kpts, cur_desc, cur_valid,
                                       radius=proj_radius, th_desc2=desc_th2)
    # Keep existing associations from motion tracking where present.
    cur_lm = jnp.where(cur_lm_in >= 0, cur_lm_in, kpt_lm)
    lm_c = jnp.clip(cur_lm, 0, L - 1)
    ok = (cur_lm >= 0) & cur_valid & lm_active[lm_c]
    Xw = lm_pos[lm_c]
    res = pose_opt.pose_optimization(R0, t0, Xw, cur_kpts, ok, cam_params,
                                     cam_kind=cam_kind)
    cur_lm = jnp.where(res.inliers, cur_lm, -1)
    return res.R_cw, res.t_cw, cur_lm, res.n_inliers, jnp.sum(visible)


@functools.partial(jax.jit, static_argnames=("cam_kind",))
def _init_map_kernel(state: ms.MapState, f0_kpts, f0_rays, f0_desc, f0_valid,
                     f1_kpts, f1_rays, f1_desc, f1_valid, t0, t1,
                     matches01, tv_success, R_21, t_21, points3d, is_tri,
                     cam_params, cam_kind):
    """Create the initial two-keyframe map from a two-view reconstruction
    (reference CreateInitialMapMonocular). Scale: median depth -> 1."""
    N = f0_kpts.shape[0]
    # Scale so median depth of triangulated points = 1 (reference behavior).
    depths = jnp.where(is_tri, points3d[:, 2], jnp.nan)
    med = jnp.nanmedian(depths)
    scale = jnp.where(jnp.isfinite(med) & (med > 1e-6), 1.0 / med, 1.0)
    X = points3d * scale
    t21s = t_21 * scale

    # Add landmarks for triangulated matches. Keyframes go at the next free
    # slots (NOT 0/1 — re-initialization into a fresh Atlas map starts from a
    # non-empty table, reference CreateMapInAtlas).
    base = state.n_kf
    normals = X / jnp.maximum(jnp.linalg.norm(X, axis=-1, keepdims=True), 1e-9)
    state, slots = ms.add_landmarks(state, X, f0_desc, normals,
                                    jnp.full((N,), base, jnp.int32), is_tri)

    lm_idx0 = jnp.where(slots >= 0, slots, -1)
    state, k0 = ms.add_keyframe(state, jnp.eye(3), jnp.zeros(3),
                                f0_kpts, f0_rays, f0_desc, f0_valid,
                                lm_idx0, t0, parent=-1)
    # KF1 at (R_21, t21s); its keypoint j = matches01[i] observes slot[i].
    inv01 = assoc.invert_matches(
        jnp.where((matches01 >= 0) & (slots >= 0), matches01, -1), N)
    lm_idx1 = jnp.where(inv01 >= 0, slots[jnp.clip(inv01, 0, N - 1)], -1)
    state, k1 = ms.add_keyframe(state, R_21, t21s,
                                f1_kpts, f1_rays, f1_desc, f1_valid,
                                lm_idx1, t1, parent=k0)
    return state, lm_idx1, scale


def _ba_window_args(state: ms.MapState, window_ids, opt_mask, bf=None):
    """Build a BAProblem over the given keyframe window using ALL keypoint
    slots as (padded) edges and the global landmark table.

    Edge layout is keyframe-major (edge rows [k*N, (k+1)*N) belong to window
    keyframe k) — the contract solve_ba's kf_major=True fast path relies on;
    do not reorder or re-pad without dropping that flag."""
    Kw = window_ids.shape[0]
    N = state.N
    L = state.L
    win = jnp.clip(window_ids, 0, state.K - 1)
    li = state.kf_landmark_idx[win]                       # [Kw,N]
    kv = state.kf_kpt_valid[win]
    win_ok = (window_ids >= 0)[:, None]
    e_lm = jnp.where((li >= 0) & kv & win_ok, li, 0).reshape(-1)
    e_valid = ((li >= 0) & kv & win_ok).reshape(-1)
    e_lm = jnp.clip(e_lm, 0, L - 1)
    e_valid = e_valid & state.lm_active[e_lm]
    e_kf = jnp.broadcast_to(jnp.arange(Kw)[:, None], (Kw, N)).reshape(-1)
    e_uv = state.kf_kpts[win].reshape(-1, 2)
    # Landmarks to optimize: observed by at least one *optimized* window KF.
    lm_opt = jnp.zeros((L,), bool).at[e_lm].max(
        e_valid & opt_mask[e_kf], mode="drop")
    prob = ba.BAProblem(
        R_cw=state.kf_R_cw[win], t_cw=state.kf_t_cw[win],
        pose_opt_mask=opt_mask & (window_ids >= 0),
        lm_pos=state.lm_pos, lm_opt_mask=lm_opt & state.lm_active,
        cam_params=jnp.zeros(0),  # filled by caller
        e_kf=e_kf.astype(jnp.int32), e_lm=e_lm.astype(jnp.int32),
        e_uv=e_uv, e_valid=e_valid,
        e_info=jnp.ones((Kw * N,), jnp.float32),
        e_invd=(None if bf is None
                else state.kf_kpt_invd[win].reshape(-1)),
        bf=bf)
    return prob


@functools.partial(jax.jit, static_argnames=("cam_kind", "iters"))
def _local_ba_kernel(state: ms.MapState, window_ids, opt_mask, cam_params,
                     cam_kind, iters, bf=None):
    return _local_ba_body(state, window_ids, opt_mask, cam_params, cam_kind,
                          iters, bf=bf)


def _local_ba_body(state: ms.MapState, window_ids, opt_mask, cam_params,
                   cam_kind, iters, bf=None):
    """Local BA over a keyframe window; writes results back into the map.
    (reference Optimizer::LocalBundleAdjustment src/Optimizer.cc:1740)."""
    prob = _ba_window_args(state, window_ids, opt_mask, bf=bf)._replace(
        cam_params=cam_params)
    # lm_cap: the window can reference at most n_opt*N landmark variables;
    # compacting the Schur arrays to that bound (instead of the full padded
    # table) cuts the local-BA HBM traffic ~4x.
    # red_solver="direct": the reduced camera system is [6*Kw, 6*Kw] (~96x96
    # for the default window) — the closed-form recursive block inverse
    # (blockinv.invn) is O(log n) vectorized matmuls, where the reduced-CG
    # loop is 32 SEQUENTIAL tiny matvecs per LM step (~1.5 ms of pure
    # latency each step; xprof showed the two LM scans as ~40% of the whole
    # keyframe-insert program).
    res = ba.solve_ba(prob, cam_kind=cam_kind, iters=iters, solver="schur",
                      lm_cap=2048, kf_major=True, red_solver="direct")
    win = jnp.clip(window_ids, 0, state.K - 1)
    write = (opt_mask & (window_ids >= 0))
    new_R = jnp.where(write[:, None, None], res.R_cw, state.kf_R_cw[win])
    new_t = jnp.where(write[:, None], res.t_cw, state.kf_t_cw[win])
    state = state.replace(
        kf_R_cw=state.kf_R_cw.at[win].set(new_R),
        kf_t_cw=state.kf_t_cw.at[win].set(new_t),
        lm_pos=res.lm_pos,
    )
    # Remove outlier observations (reference post-pass under map mutex).
    Kw = window_ids.shape[0]
    N = state.N
    bad = (~res.e_inlier) & prob.e_valid
    bad = bad.reshape(Kw, N)
    li = state.kf_landmark_idx.at[win].set(
        jnp.where(bad, -1, state.kf_landmark_idx[win]))
    state = state.replace(kf_landmark_idx=li)
    return state


@functools.partial(jax.jit, static_argnames=("cam_kind",))
def _triangulate_pair_kernel(state: ms.MapState, kf_new, kf_nbr, cam_params,
                             cam_kind, min_parallax_cos=0.9998):
    return _triangulate_pair_kernel_body(state, kf_new, kf_nbr, cam_params,
                                         cam_kind, jnp.asarray(True),
                                         min_parallax_cos)


def _triangulate_pair_kernel_body(state: ms.MapState, kf_new, kf_nbr,
                                  cam_params, cam_kind, enabled,
                                  min_parallax_cos=0.9998,
                                  ext_matches=None):
    """Create new landmarks between a new keyframe and one covisible neighbor
    (reference LocalMapping::CreateNewMapPoints src/LocalMapping.cc:517-955).

    Matches unassociated keypoints (mutual NN + epipolar gate), triangulates,
    and registers observations in both keyframes. `enabled` (traced bool)
    masks the whole update so the caller can gate on covisibility weight
    without a host round trip.

    ext_matches: optional [N] new->nbr match indices from a learned matcher
    (the reference's LightGlue SearchForTriangulation path,
    src/Matchers/SPmatcher.cc:1355-1399); geometric gates still apply.
    """
    N = state.N
    d_new = state.kf_desc[kf_new].astype(jnp.float32)
    free_new = state.kf_kpt_valid[kf_new] & (state.kf_landmark_idx[kf_new] < 0)
    free_nbr = state.kf_kpt_valid[kf_nbr] & (state.kf_landmark_idx[kf_nbr] < 0)
    if ext_matches is not None:
        mc = jnp.clip(ext_matches, 0, N - 1)
        matches = jnp.where((ext_matches >= 0) & free_new & free_nbr[mc],
                            ext_matches, -1)
    else:
        d_nbr = state.kf_desc[kf_nbr].astype(jnp.float32)
        matches, _ = assoc.mutual_nn_match(d_new, free_new, d_nbr, free_nbr,
                                           th_desc2=assoc.TH_LOW ** 2,
                                           ratio=0.8)
    R0, t0 = state.kf_R_cw[kf_new], state.kf_t_cw[kf_new]
    R1, t1 = state.kf_R_cw[kf_nbr], state.kf_t_cw[kf_nbr]
    # Relative pose for epipolar gate: T0w * T1w^-1.
    R1i, t1i = lie.se3_inverse(R1, t1)
    R01, t01 = lie.se3_compose(R0, t0, R1i, t1i)
    matches = assoc.epipolar_gate(state.kf_rays[kf_new], state.kf_rays[kf_nbr],
                                  matches, R01, t01, th=0.01)
    m = jnp.clip(matches, 0, N - 1)
    ray0 = state.kf_rays[kf_new]
    ray1 = state.kf_rays[kf_nbr][m]
    Xw, tri_ok = triangulation.triangulate_and_check(
        ray0, ray1, R0, t0, R1, t1, min_parallax_cos=min_parallax_cos)
    ok = tri_ok & (matches >= 0)
    # Reprojection sanity in both views (reference checks chi2 both sides).
    uv0 = cameras.project(cam_kind, cam_params, lie.se3_apply(R0, t0, Xw))
    uv1 = cameras.project(cam_kind, cam_params, lie.se3_apply(R1, t1, Xw))
    e0 = jnp.sum((uv0 - state.kf_kpts[kf_new]) ** 2, axis=-1)
    e1 = jnp.sum((uv1 - state.kf_kpts[kf_nbr][m]) ** 2, axis=-1)
    ok = ok & (e0 < robust.CHI2_MONO * 4) & (e1 < robust.CHI2_MONO * 4) & enabled

    normals = Xw / jnp.maximum(jnp.linalg.norm(Xw, axis=-1, keepdims=True), 1e-9)
    state, slots = ms.add_landmarks(state, Xw, d_new, normals,
                                    jnp.full((N,), kf_new, jnp.int32), ok)
    # Register observations in both KFs (neighbor side via gather-based
    # match inversion — no scatter).
    li_new = jnp.where(slots >= 0, slots, state.kf_landmark_idx[kf_new])
    inv_nb = assoc.invert_matches(
        jnp.where(slots >= 0, matches, -1), N)
    li_nbr = jnp.where(inv_nb >= 0,
                       slots[jnp.clip(inv_nb, 0, N - 1)],
                       state.kf_landmark_idx[kf_nbr])
    state = state.replace(kf_landmark_idx=state.kf_landmark_idx
                          .at[kf_new].set(li_new)
                          .at[kf_nbr].set(li_nbr))
    # New landmarks start with their two registering observations (the
    # reference's AddObservation bookkeeping; culling reads lm_n_obs).
    from ..ops import scatterless
    two = scatterless.seg_add(
        slots, jnp.full((N, 1), 2.0, jnp.float32), state.L)[:, 0]
    state = state.replace(lm_n_obs=state.lm_n_obs + two.astype(jnp.int32))
    n_new = jnp.sum(slots >= 0)
    return state, n_new


@functools.partial(jax.jit,
                   static_argnames=("cam_kind", "image_hw", "local_map_only",
                                    "motion_rounds", "motion_iters",
                                    "local_rounds", "local_iters"))
def _track_step_kernel(state: ms.MapState,
                       prev_desc, prev_valid, prev_lidx,
                       cur_kpts, cur_desc, cur_valid,
                       R_pred, t_pred,
                       cam_params, cam_kind, image_hw,
                       min_matches_motion, min_inliers_track,
                       min_inliers_local_map, proj_radius, desc_th2,
                       ref_kf=None, local_map_only: bool = False,
                       ext_matches=None, max_depth=100.0,
                       min_matches_ref_kf=15,
                       motion_rounds: int = 2, motion_iters: int = 5,
                       local_rounds: int = 2, local_iters: int = 6,
                       cur_invd=None, bf=None, local_mask=None,
                       min_inliers_weak=12):
    return _track_step_body(state, prev_desc, prev_valid, prev_lidx,
                            cur_kpts, cur_desc, cur_valid, R_pred, t_pred,
                            cam_params, cam_kind, image_hw,
                            min_matches_motion, min_inliers_track,
                            min_inliers_local_map, proj_radius, desc_th2,
                            ref_kf=ref_kf, local_map_only=local_map_only,
                            ext_matches=ext_matches, max_depth=max_depth,
                            min_matches_ref_kf=min_matches_ref_kf,
                            motion_rounds=motion_rounds,
                            motion_iters=motion_iters,
                            local_rounds=local_rounds,
                            local_iters=local_iters, cur_invd=cur_invd,
                            bf=bf, local_mask=local_mask,
                            min_inliers_weak=min_inliers_weak)


def _track_step_body(state: ms.MapState,
                     prev_desc, prev_valid, prev_lidx,
                     cur_kpts, cur_desc, cur_valid,
                     R_pred, t_pred,
                     cam_params, cam_kind, image_hw,
                     min_matches_motion, min_inliers_track,
                     min_inliers_local_map, proj_radius, desc_th2,
                     ref_kf=None, local_map_only: bool = False,
                     ext_matches=None, max_depth=100.0,
                     min_matches_ref_kf=15,
                     motion_rounds: int = 2, motion_iters: int = 5,
                     local_rounds: int = 2, local_iters: int = 6,
                     cur_invd=None, bf=None, local_mask=None,
                     min_inliers_weak=12):
    """ONE fused per-frame tracking program: frame-to-frame match -> motion-model
    pose opt -> local-map projection track -> pose opt.

    Fusing the whole hot path into a single dispatch matters doubly on TPU:
    one launch + one scalar fetch per frame instead of ~6 launches and ~4
    blocking syncs (the reference pays the same structural cost as separate
    ONNX sessions + CPU loops, SURVEY.md §3.2).

    ext_matches: optional [N] prev->cur match indices from an external
    (learned) matcher — the LightGlue path of the reference's
    SPmatcher::SearchBySP (src/Matchers/SPmatcher.cc:1050). When None the
    in-kernel mutual-NN descriptor match is used.

    Returns (R, t, cur_lm, ok (bool), n_inl, motion_ok).
    """
    L = state.lm_pos.shape[0]
    N = cur_kpts.shape[0]
    if ext_matches is None:
        matches, _ = assoc.mutual_nn_match(prev_desc, prev_valid, cur_desc,
                                           cur_valid, ratio=0.8)
    else:
        matches = ext_matches
    # --- motion-model stage ---
    has = (matches >= 0) & (prev_lidx >= 0) & prev_valid
    inv_m = assoc.invert_matches(jnp.where(has, matches, -1), N)
    cur_lm0 = jnp.where(inv_m >= 0, prev_lidx[jnp.clip(inv_m, 0, N - 1)], -1)
    lm_c = jnp.clip(cur_lm0, 0, L - 1)
    cand_ok = (cur_lm0 >= 0) & state.lm_active[lm_c] & cur_valid
    res_m = pose_opt.pose_optimization(R_pred, t_pred, state.lm_pos[lm_c],
                                       cur_kpts, cand_ok, cam_params,
                                       cam_kind=cam_kind,
                                       rounds=motion_rounds,
                                       iters_per_round=motion_iters,
                                       check_cost=False,
                                       invd=cur_invd, bf=bf)
    n_cand = jnp.sum(cand_ok.astype(jnp.int32))
    motion_ok = (n_cand >= min_matches_motion) & \
        (res_m.n_inliers >= min_inliers_track)

    # --- reference-keyframe fallback (reference TrackReferenceKeyFrame,
    # src/Tracking.cc:3245-3315: on motion-model failure, match the frame
    # against the reference KEYFRAME's landmark-bearing keypoints and
    # pose-optimize — the recovery stage between "motion model failed" and
    # full relocalization). lax.cond: only the taken branch executes. ---
    ref = jnp.clip(ref_kf, 0, state.K - 1)

    def _ref_kf_track(_):
        ref_desc = state.kf_desc[ref].astype(jnp.float32)
        ref_lidx = state.kf_landmark_idx[ref]
        ref_has = state.kf_kpt_valid[ref] & (ref_lidx >= 0)
        m_ref, _ = assoc.mutual_nn_match(ref_desc, ref_has,
                                         cur_desc, cur_valid, ratio=0.8)
        inv_r = assoc.invert_matches(
            jnp.where((m_ref >= 0) & ref_has, m_ref, -1), N)
        lm_r = jnp.where(inv_r >= 0, ref_lidx[jnp.clip(inv_r, 0, N - 1)], -1)
        lmc = jnp.clip(lm_r, 0, L - 1)
        okc = (lm_r >= 0) & state.lm_active[lmc] & cur_valid
        res_r = pose_opt.pose_optimization(
            R_pred, t_pred, state.lm_pos[lmc], cur_kpts, okc, cam_params,
            cam_kind=cam_kind, rounds=motion_rounds,
            iters_per_round=motion_iters, check_cost=False,
            invd=cur_invd, bf=bf)
        okr = (jnp.sum(okc.astype(jnp.int32)) >= min_matches_ref_kf) & \
            (res_r.n_inliers >= min_inliers_track)
        return (okr, res_r.R_cw, res_r.t_cw,
                jnp.where(res_r.inliers, lm_r, -1))

    def _no_fallback(_):
        return (jnp.asarray(False),
                R_pred, t_pred, jnp.full((N,), -1, jnp.int32))

    ref_ok, R_r, t_r, lm_r = jax.lax.cond(motion_ok, _no_fallback,
                                          _ref_kf_track, operand=None)
    stage1_ok = motion_ok | ref_ok
    R1 = jnp.where(motion_ok, res_m.R_cw, jnp.where(ref_ok, R_r, R_pred))
    t1 = jnp.where(motion_ok, res_m.t_cw, jnp.where(ref_ok, t_r, t_pred))
    cur_lm1 = jnp.where(motion_ok, jnp.where(res_m.inliers, cur_lm0, -1),
                        jnp.where(ref_ok, lm_r, -1))

    # --- local-map stage ---
    if local_map_only:
        # Reference-style local map: landmarks seen by the reference keyframe's
        # covisibility neighborhood (Tracking::UpdateLocalKeyFrames/Points,
        # src/Tracking.cc:4190-4444). Restricting the search lets drift
        # accumulate past the projection radius until explicit loop closure —
        # and bounds per-frame work for city-scale maps. Without it the full
        # map is projected (one matmul): continuous implicit loop closure.
        if local_mask is not None:
            # Precomputed at the last keyframe insert (the map only changes
            # at keyframe rate): saves an observation-matrix scatter + covis
            # matmul per FRAME.
            search_mask = state.lm_active & local_mask
        else:
            W = ms.covisibility(state)
            nbrs = (W[ref_kf] > 0).at[ref_kf].set(True)
            obs = ms.observation_matrix(state)          # [K, L]
            lm_local = (nbrs.astype(jnp.float32) @ obs) > 0
            search_mask = state.lm_active & lm_local
    else:
        search_mask = state.lm_active
    # Never project landmarks of a non-active Atlas map: after
    # CreateMapInAtlas they live in a different world frame until a
    # place-recognition merge aligns them (reference tracks strictly in the
    # active map, src/Tracking.cc:2049-2086).
    search_mask = search_mask & (state.lm_map_id == state.active_map_id)
    # max_depth: System.thFarPoints when configured (reference discards
    # far points in the projection search, SPmatcher.cc:1184).
    uv, depth, visible = assoc.project_landmarks(
        state.lm_pos, search_mask, R1, t1, cam_params, cam_kind, image_hw,
        max_depth=max_depth)
    # Scale/view-adaptive gating (reference MapPoint::PredictScale +
    # isInFrustum viewing-cos and min/max-distance gates,
    # src/MapPoint.cc:568-689, SPmatcher.cc:1170-1354,1736-1743): the
    # reference STORES per-point mean view direction and a scale-derived
    # distance band; here both derive on the fly from the anchor keyframe's
    # CURRENT pose (one [L] gather) — self-updating under BA/loop
    # corrections, no extra state. Landmarks viewed from far outside the
    # distance band or the viewing cone their descriptor was minted in are
    # aliases, not matches; the radius tightens on well-aligned views
    # (reference th=2.5 vs 4.0 at viewCos>0.998).
    anc = jnp.clip(state.lm_anchor_kf, 0, state.K - 1)
    Ra, ta = state.kf_R_cw[anc], state.kf_t_cw[anc]
    C_a = -jnp.einsum("lji,lj->li", Ra, ta)             # anchor cam centers
    C_c = -jnp.einsum("ji,j->i", R1, t1)                # current cam center
    rel_a = state.lm_pos - C_a
    rel_c = state.lm_pos - C_c
    d_a = jnp.linalg.norm(rel_a, axis=-1)
    d_c = jnp.linalg.norm(rel_c, axis=-1)
    # Viewing direction vs the landmark's MEAN observed direction
    # (lm_normal, refreshed each insert from all observing keyframes — an
    # anchor-only direction goes stale under rotation and gates out valid
    # wide-FOV landmarks). Limit 0.35 (~70 deg) vs the reference's 0.5: the
    # fisheye configs observe across wider direction spans per landmark.
    has_n = jnp.linalg.norm(state.lm_normal, axis=-1) > 0.5
    cosv = jnp.sum(state.lm_normal * rel_c, axis=-1) / jnp.maximum(d_c, 1e-9)
    band = ADAPT_DEPTH_BAND
    gate_ok = (d_a > 1e-6) & (d_c >= d_a / band) & (d_c <= d_a * band) \
        & (~has_n | (cosv > ADAPT_COS_MIN))
    visible = visible & gate_ok
    rad_l = proj_radius * jnp.where(cosv > 0.998, 0.5, 1.0)
    kpt_lm, _ = assoc.projection_match(uv, state.lm_desc.astype(jnp.float32),
                                       visible, cur_kpts, cur_desc, cur_valid,
                                       radius=rad_l, th_desc2=desc_th2)
    cur_lm = jnp.where(cur_lm1 >= 0, cur_lm1, kpt_lm)
    lm_c2 = jnp.clip(cur_lm, 0, L - 1)
    ok2 = (cur_lm >= 0) & cur_valid & state.lm_active[lm_c2]
    res_l = pose_opt.pose_optimization(R1, t1, state.lm_pos[lm_c2],
                                       cur_kpts, ok2, cam_params,
                                       cam_kind=cam_kind,
                                       rounds=local_rounds,
                                       iters_per_round=local_iters,
                                       check_cost=False,
                                       invd=cur_invd, bf=bf)
    cur_lm = jnp.where(res_l.inliers, cur_lm, -1)
    # Tracking success requires a FINITE pose: a lost-streak prediction can
    # carry non-finite values, and accepting one would poison the motion
    # model for every later frame.
    pose_finite = (jnp.all(jnp.isfinite(res_l.R_cw))
                   & jnp.all(jnp.isfinite(res_l.t_cw)))
    ok = (res_l.n_inliers >= min_inliers_local_map) & pose_finite
    # Weak band: enough inliers to trust the optimized pose, not enough to
    # call the frame well-tracked — the host keeps OK and inserts a keyframe
    # urgently (see TrackerConfig.min_inliers_weak).
    # (no stage1 requirement: the local projection search can recover the
    # frame on its own — its optimized pose over >=weak inliers beats the
    # open-loop prediction that failing the frame would substitute)
    # Rotation-consistency gate: a genuinely weak-but-real frame optimizes
    # to within a few degrees of the motion prediction, while a spurious fit
    # over ~12 aliased matches (64-D descriptors leak random pairs through
    # the 1.96 gate) lands on an arbitrary rotation — without this gate one
    # such frame resets the RECENTLY_LOST clock and the system never
    # declares LOST on unmatchable input.
    cos_dR = 0.5 * (jnp.trace(res_l.R_cw @ R_pred.T) - 1.0)
    weak = (res_l.n_inliers >= min_inliers_weak) & pose_finite & ~ok \
        & (cos_dR > 0.94)
    usable = ok | weak
    R2 = jnp.where(usable, res_l.R_cw, R_pred)
    t2 = jnp.where(usable, res_l.t_cw, t_pred)
    flags = jnp.stack([ok.astype(jnp.int32), res_l.n_inliers,
                       stage1_ok.astype(jnp.int32), n_cand,
                       weak.astype(jnp.int32)])
    return R2, t2, jnp.where(usable, cur_lm, -1), flags


@functools.partial(jax.jit, static_argnames=("n",))
def _top_covis_for_frame(state: ms.MapState, frame_lidx, frame_valid,
                         n: int = 2):
    """Top-n keyframes sharing landmarks with a (not yet inserted) frame —
    the neighbors its triangulation will run against. One tiny program whose
    [n] result the host fetches to drive the batched learned-matcher call."""
    L = state.L
    has = (frame_lidx >= 0) & frame_valid
    obs = ms.observation_matrix(state).astype(jnp.float32)   # [K, L]
    # Gather the frame's landmark columns instead of scattering an indicator
    # (frame landmarks are one-per-keypoint, so the masked column sum equals
    # the indicator matvec).
    cols = obs[:, jnp.clip(frame_lidx, 0, L - 1)]            # [K, N]
    w = cols @ has.astype(jnp.float32)
    w = jnp.where(state.kf_active, w, -1.0)
    wts, ids = jax.lax.top_k(w, n)
    return jnp.where(wts > 0, ids, -1).astype(jnp.int32)


@functools.partial(jax.jit,
                   static_argnames=("cam_kind", "n_opt", "n_fixed", "ba_iters",
                                    "run_ba"),
                   donate_argnums=(0,))
def _insert_keyframe_kernel(state: ms.MapState, R, t, kpts, rays, desc, valid,
                            lidx, time, parent, cam_params, cam_kind,
                            n_opt: int, n_fixed: int, ba_iters: int,
                            run_ba: bool = True,
                            ext_tri_ids=None, ext_tri_matches=None,
                            kpt_invd=None, bf=None):
    """ONE fused keyframe-insertion program: add KF -> covisibility -> new-point
    triangulation against the top-2 covisible neighbors -> windowed local BA
    with writeback. (The reference queues the same work to its LocalMapping
    thread, src/LocalMapping.cc:95-362.)

    ext_tri_ids [2] / ext_tri_matches [2, N]: optional learned-matcher
    triangulation matches against the given neighbor keyframes (computed by
    the host via one BATCHED LightGlue dispatch — reference
    SearchForTriangulation, src/LocalMapping.cc:634). The covisibility-weight
    gate still applies.

    Returns (state, scalars [kf_id, n_new0, n_new1, n_obs, n_kf, n_lm,
    lm_dropped], local_mask).
    """
    return _insert_keyframe_body(state, R, t, kpts, rays, desc, valid, lidx,
                                 time, parent, cam_params, cam_kind,
                                 n_opt, n_fixed, ba_iters, run_ba=run_ba,
                                 ext_tri_ids=ext_tri_ids,
                                 ext_tri_matches=ext_tri_matches,
                                 kpt_invd=kpt_invd, bf=bf)


def _insert_keyframe_body(state: ms.MapState, R, t, kpts, rays, desc, valid,
                          lidx, time, parent, cam_params, cam_kind,
                          n_opt: int, n_fixed: int, ba_iters: int,
                          run_ba: bool = True, ba_gate=None,
                          ext_tri_ids=None, ext_tri_matches=None,
                          kpt_invd=None, bf=None):
    state, kf_id = ms.add_keyframe(state, R, t, kpts, rays, desc, valid, lidx,
                                   time, parent=parent, kpt_invd=kpt_invd)
    # ONE observation-matrix build threads through neighbor selection AND the
    # fusion stage (each build is a ~1.4 ms scatter on TPU; see
    # maintenance.fuse_into_keyframe for why the slightly stale view is safe).
    obs = ms.observation_matrix(state)
    W = obs @ obs.T
    W = W * (1.0 - jnp.eye(state.K, dtype=W.dtype))
    if ext_tri_ids is not None:
        ids = ext_tri_ids
        wts = W[kf_id, jnp.clip(ids, 0, state.K - 1)]
    else:
        ids, wts = ms.best_covisible(W, kf_id, 2)

    def tri(state, j):
        nbr = jnp.clip(ids[j], 0, state.K - 1)
        enabled = (ids[j] >= 0) & (wts[j] >= 10)
        new_state, n_new = _triangulate_pair_kernel_body(
            state, kf_id, nbr, cam_params, cam_kind, enabled,
            ext_matches=(None if ext_tri_matches is None
                         else ext_tri_matches[j]))
        return new_state, n_new

    state, n_new0 = tri(state, 0)
    state, n_new1 = tri(state, 1)

    # Neighborhood fusion before the BA (reference SearchInNeighbors runs
    # between CreateNewMapPoints and the local BA, src/LocalMapping.cc:156).
    from ..map import maintenance as mnt
    state, _, _ = mnt.fuse_into_keyframe(state, kf_id, cam_params, cam_kind,
                                         obs=obs)
    # Refresh representative descriptors of the touched landmarks (reference
    # ComputeDistinctiveDescriptors in ProcessNewKeyFrame). Shares the
    # insert's observation build (slightly stale re the just-triangulated
    # points — their descriptors were just written and need no recompute).
    state = mnt.update_distinctive_descriptors(state, kf_id, obs=obs)

    if run_ba:
        window, opt_mask = _covis_window(state, kf_id, n_opt, n_fixed)
        if ba_gate is None:
            state = _local_ba_body(state, window, opt_mask, cam_params,
                                   cam_kind, ba_iters, bf=bf)
        else:
            # Traced BA gate (ba_every > 1): the windowed BA runs on every
            # Nth insert — the reference's LocalMapping aborts its LBA under
            # keyframe-queue pressure the same way (mbAbortBA,
            # /root/reference/src/LocalMapping.cc:1301); skipped inserts
            # still triangulate/fuse and the next gated BA covers them
            # through the covisibility window.
            state = jax.lax.cond(
                ba_gate,
                lambda s: _local_ba_body(s, window, opt_mask, cam_params,
                                         cam_kind, ba_iters, bf=bf),
                lambda s: s, state)

    # Landmark statistics + culling at keyframe rate (reference
    # IncreaseVisible/IncreaseFound per tracked frame + MapPointCulling in
    # the mapping thread; keyframe-rate stats approximate the same ratios).
    from ..map import maintenance as mnt
    uv_l, depth_l, visible_l = assoc.project_landmarks(
        state.lm_pos, state.lm_active, state.kf_R_cw[kf_id],
        state.kf_t_cw[kf_id], cam_params, cam_kind)
    li_kf = state.kf_landmark_idx[kf_id]
    from ..ops import scatterless
    found_l = scatterless.seg_any(li_kf, li_kf >= 0, state.L)
    state = mnt.update_found_visible(state, visible_l, found_l)
    # Exact observation-count reconciliation before the cull reads them
    # (the incremental updates drift through fusion chains; advisor finding).
    # ONE post-triangulation observation build is shared by the recount and
    # the local-map mask below.
    obs2 = ms.observation_matrix(state)
    state = mnt.recount_lm_obs(state, obs=obs2)
    state = mnt.cull_landmarks(state)
    # Mean viewing direction over ALL observing keyframes (reference
    # MapPoint::UpdateNormalAndDepth, src/MapPoint.cc:568-640) — two matmuls
    # on the observation matrix already in hand. The tracker's view-adaptive
    # gate compares against this; an anchor-only direction goes stale under
    # rotation.
    ow = obs2.astype(jnp.float32)
    n_obs_l = ow.sum(0)                                    # [L]
    centers = -jnp.einsum("kji,kj->ki", state.kf_R_cw, state.kf_t_cw)
    sum_c = ow.T @ jnp.where(state.kf_active[:, None], centers, 0.0)
    dirs = state.lm_pos * n_obs_l[:, None] - sum_c
    nn = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True),
                            1e-9)
    state = state.replace(lm_normal=jnp.where(
        (state.lm_active & (n_obs_l > 0))[:, None], nn, state.lm_normal))

    # Local-map search mask for the tracker (reference
    # Tracking::UpdateLocalKeyFrames/Points, src/Tracking.cc:4190-4444):
    # landmarks seen by this keyframe's covisibility neighborhood. The map
    # only changes at keyframe rate, so computing it HERE saves the track
    # kernel an observation-matrix build + covis matmul EVERY FRAME.
    w_row = obs2 @ obs2[kf_id]                            # [K]
    nbrs = (w_row > 0).at[kf_id].set(True)
    local_mask = ((nbrs.astype(jnp.float32) @ obs2) > 0) & state.lm_active

    # Reference-KF tracked count for the c2 keyframe policy: ONLY landmarks
    # with >=3 observations count (reference NeedNewKeyFrame uses
    # mpReferenceKF->TrackedMapPoints(nMinObs=3), src/Tracking.cc:3762-3767).
    # Counting the just-triangulated 2-obs points here made ref_kf_tracked
    # always exceed the next frames' inlier counts, so c2 fired every frame
    # and the system inserted a keyframe per frame (round-3 verdict weak #4).
    li_new = state.kf_landmark_idx[kf_id]
    li_c = jnp.clip(li_new, 0, state.L - 1)
    n_obs = jnp.sum((li_new >= 0) & state.kf_kpt_valid[kf_id]
                    & state.lm_active[li_c] & (state.lm_n_obs[li_c] >= 3))
    scalars = jnp.stack([kf_id, n_new0, n_new1, n_obs,
                         state.n_kf, state.n_lm, state.lm_dropped])
    return state, scalars, local_mask


@functools.partial(jax.jit,
                   static_argnames=("cam_kind", "image_hw", "local_map_only",
                                    "motion_rounds", "motion_iters",
                                    "local_rounds", "local_iters",
                                    "n_opt", "n_fixed", "ba_iters",
                                    "ba_every"),
                   donate_argnums=(0, 1, 2))
def _track_and_map_kernel(state: ms.MapState, policy, local_mask,
                          prev_desc, prev_valid, prev_lidx,
                          cur_kpts, cur_rays, cur_desc, cur_valid,
                          R_pred, t_pred, time,
                          cam_params, cam_kind, image_hw,
                          min_matches_motion, min_inliers_track,
                          min_inliers_local_map, proj_radius, desc_th2,
                          kf_tracked_ratio, kf_min_interval, kf_max_interval,
                          n_opt: int, n_fixed: int, ba_iters: int,
                          local_map_only: bool = False,
                          ext_matches=None, max_depth=100.0,
                          min_matches_ref_kf=15,
                          motion_rounds: int = 2, motion_iters: int = 5,
                          local_rounds: int = 2, local_iters: int = 6,
                          cur_invd=None, bf=None, min_inliers_weak=12,
                          ba_every: int = 1):
    """ONE fused per-frame program: tracking + ON-DEVICE keyframe decision +
    conditional keyframe insertion (covis, triangulation, fusion, local BA).

    This is what makes deep pipelining safe: with the host-side insert, the
    map only gains triangulations when a frame FINISHES (K frames after
    dispatch), so on a rotating camera the newest territory never has
    landmarks and tracking starves within ~10 frames (measured: inliers
    58 -> 11 in 9 frames the moment pipeline=4 engaged on the orbit bench).
    Here the keyframe policy (the c2 inlier-decay test + interval bounds +
    weak-band urgency, see system._need_new_keyframe) is evaluated on device
    from this frame's own flags, and lax.cond executes the insert program in
    the SAME dispatch — the map evolves at full frame rate no matter how far
    the host lags. The reference gets the same effect from its synchronous
    Tracking -> LocalMapping handoff (src/Tracking.cc:3930 ->
    src/LocalMapping.cc:95); this is its TPU-native form.

    policy: [2] float32 device carry = (frames_since_kf, peak inliers since
    last insert). local_mask: [L] bool local-map search mask carry (refreshed
    by each in-kernel insert).

    Returns (state, policy, local_mask, R, t, lm_idx, flags[8]) with
    flags = [ok, n_inl, stage1_ok, n_cand, weak, did_insert, n_kf, n_lm];
    lm_idx includes the keypoint->landmark registrations of the insert when
    one fired (so the next frame's motion stage sees brand-new
    triangulations — sync mode only exposes them through the search mask).
    """
    R2, t2, cur_lm, tflags = _track_step_body(
        state, prev_desc, prev_valid, prev_lidx,
        cur_kpts, cur_desc, cur_valid, R_pred, t_pred,
        cam_params, cam_kind, image_hw,
        min_matches_motion, min_inliers_track,
        min_inliers_local_map, proj_radius, desc_th2,
        ref_kf=jnp.maximum(state.n_kf - 1, 0),
        local_map_only=local_map_only, ext_matches=ext_matches,
        max_depth=max_depth, min_matches_ref_kf=min_matches_ref_kf,
        motion_rounds=motion_rounds, motion_iters=motion_iters,
        local_rounds=local_rounds, local_iters=local_iters,
        cur_invd=cur_invd, bf=bf, local_mask=local_mask,
        min_inliers_weak=min_inliers_weak)
    ok = tflags[0] > 0
    weak = tflags[4] > 0
    n_inl = tflags[1].astype(jnp.float32)
    fs, peak0 = policy[0], policy[1]
    # Inserts since the last windowed BA (the ba_every gate); a [2] policy
    # from older callers/checkpoints reads as 0 = BA due now.
    sba = policy[2] if policy.shape[0] > 2 else jnp.zeros(())
    peak = jnp.maximum(peak0, n_inl)
    c2 = n_inl < kf_tracked_ratio * jnp.maximum(peak, 20.0)
    need = weak | (fs >= kf_max_interval) | ((fs >= kf_min_interval) & c2)
    # Capacity guard: never insert into a full table (the host compacts /
    # culls when its lagged counters show pressure; see _maintain_capacity).
    can = (state.n_kf < state.K) & \
        (state.n_lm < state.L - 2 * state.N - 64)
    do_insert = (ok | weak) & need & can & (fs >= 1)

    ba_due = (sba + 1.0 >= float(ba_every)) | (ba_every <= 1)

    def _ins(op):
        st, mask_prev = op
        st2, scal, mask2 = _insert_keyframe_body(
            st, R2, t2, cur_kpts, cur_rays, cur_desc, cur_valid, cur_lm,
            time, parent=jnp.maximum(st.n_kf - 1, 0),
            cam_params=cam_params, cam_kind=cam_kind,
            n_opt=n_opt, n_fixed=n_fixed, ba_iters=ba_iters,
            run_ba=True, ba_gate=(None if ba_every <= 1 else ba_due),
            kpt_invd=cur_invd, bf=bf)
        li_new = st2.kf_landmark_idx[jnp.clip(scal[0], 0, st2.K - 1)]
        return st2, mask2, li_new

    def _no(op):
        st, mask_prev = op
        return st, mask_prev, cur_lm

    state, local_mask, lm_idx = jax.lax.cond(do_insert, _ins, _no,
                                             (state, local_mask))
    sba_next = jnp.where(do_insert,
                         jnp.where(ba_due, 0.0, sba + 1.0), sba)
    policy = jnp.where(do_insert,
                       jnp.stack([jnp.zeros(()), n_inl, sba_next]),
                       jnp.stack([fs + 1.0, peak, sba_next]))
    flags = jnp.concatenate([
        tflags, jnp.stack([do_insert.astype(jnp.int32),
                           state.n_kf.astype(jnp.int32),
                           state.n_lm.astype(jnp.int32)])])
    return state, policy, local_mask, R2, t2, lm_idx, flags


@functools.partial(jax.jit, static_argnames=("cam_kind",))
def _relocalize_kernel(state: ms.MapState, cur_kpts, cur_desc, cur_valid,
                       cam_params, key, cam_kind):
    """Global relocalization: match the lost frame's descriptors against the
    WHOLE landmark table (one matmul) and solve PnP RANSAC.

    (reference Tracking::Relocalization src/Tracking.cc:4446-4672 goes through
    BoW candidate keyframes + per-candidate matching + MLPnP; with the map
    device-resident the global descriptor match is a single MXU op, so no
    candidate narrowing is needed.)
    Returns (R, t, cur_lm [N], ok, n_inliers)."""
    from ..optim import pnp
    active = state.lm_active & (state.lm_map_id == state.active_map_id)
    matches, _ = assoc.mutual_nn_match(
        cur_desc, cur_valid, state.lm_desc.astype(jnp.float32),
        active, ratio=0.8)
    L = state.L
    m = jnp.clip(matches, 0, L - 1)
    ok_m = matches >= 0
    res = pnp.pnp_ransac(state.lm_pos[m], cur_kpts, ok_m, cam_params, key,
                         cam_kind=cam_kind)
    cur_lm = jnp.where(res.inliers & ok_m, matches, -1)

    # --- guided expansion (reference Relocalization second/third chances,
    # src/Tracking.cc:4620-4672: after PnP + pose opt, SearchByProjection
    # with a WIDE window (th=10) -> re-optimize -> NARROW window (th=3) ->
    # accept only a strong inlier set). The direct descriptor match above
    # often lands just a couple dozen inliers on noisy descriptors; the
    # projection passes recover the rest once a rough pose exists. ---
    def _expand(Rp, tp, lm_in, radius):
        uv, depth, visible = assoc.project_landmarks(
            state.lm_pos, active, Rp, tp, cam_params, cam_kind)
        kpt_lm, _ = assoc.projection_match(
            uv, state.lm_desc.astype(jnp.float32), visible,
            cur_kpts, cur_desc, cur_valid, radius=radius)
        lm2 = jnp.where(lm_in >= 0, lm_in, kpt_lm)
        okc = (lm2 >= 0) & cur_valid & active[jnp.clip(lm2, 0, L - 1)]
        r = pose_opt.pose_optimization(
            Rp, tp, state.lm_pos[jnp.clip(lm2, 0, L - 1)], cur_kpts, okc,
            cam_params, cam_kind=cam_kind, rounds=2, iters_per_round=6,
            check_cost=False)
        return r.R_cw, r.t_cw, jnp.where(r.inliers, lm2, -1), r.n_inliers

    def _guided(_):
        R1, t1, lm1, n1 = _expand(res.R_cw, res.t_cw, cur_lm, 10.0)
        R2, t2, lm2, n2 = _expand(R1, t1, lm1, 3.0)
        return R2, t2, lm2, n2

    def _keep(_):
        return res.R_cw, res.t_cw, cur_lm, res.n_inliers

    # Only expand when PnP produced SOMETHING (lax.cond: the two projection
    # passes + re-optimizations only execute when there is a pose to expand).
    R2, t2, cur_lm, n_inl = jax.lax.cond(
        res.success & (res.n_inliers >= 8), _guided, _keep, operand=None)
    # Success requires a finite pose (a degenerate RANSAC draw must not
    # poison the tracker's motion model).
    finite = jnp.all(jnp.isfinite(R2)) & jnp.all(jnp.isfinite(t2))
    return R2, t2, cur_lm, res.success & finite, n_inl


@functools.partial(jax.jit, static_argnames=("cam_kind",))
def _reloc_from_kf_matches(state: ms.MapState, cand_ids, ext_matches,
                           cur_kpts, cur_desc, cur_valid, cam_params, key,
                           cam_kind: int):
    """Relocalization from learned KF<->frame matches: for each candidate
    keyframe, transport its landmark associations through the (batched
    LightGlue) matches and solve PnP RANSAC; the best candidate wins
    (reference Relocalization: SearchByBoWSP per candidate + MLPnP RANSAC,
    src/Tracking.cc:4446-4672).

    cand_ids [B], ext_matches [B, N] (candidate-KF kpt -> frame kpt).
    Returns (R, t, cur_lm [N], ok, n_inliers)."""
    from ..optim import pnp
    B = cand_ids.shape[0]
    N = cur_kpts.shape[0]
    L = state.L

    def one(c, m, k):
        cc = jnp.clip(c, 0, state.K - 1)
        kf_lidx = state.kf_landmark_idx[cc]
        has = (m >= 0) & (kf_lidx >= 0) & state.kf_kpt_valid[cc]
        inv_c = assoc.invert_matches(jnp.where(has, m, -1), N)
        lm_of_cur = jnp.where(inv_c >= 0,
                              kf_lidx[jnp.clip(inv_c, 0, N - 1)], -1)
        lc = jnp.clip(lm_of_cur, 0, L - 1)
        ok_m = (lm_of_cur >= 0) & cur_valid & state.lm_active[lc] & (c >= 0)
        res = pnp.pnp_ransac(state.lm_pos[lc], cur_kpts, ok_m, cam_params, k,
                             cam_kind=cam_kind)
        lm = jnp.where(res.inliers & ok_m, lm_of_cur, -1)
        finite = (jnp.all(jnp.isfinite(res.R_cw))
                  & jnp.all(jnp.isfinite(res.t_cw)))
        n = jnp.where(res.success & finite & (c >= 0), res.n_inliers, -1)
        return res.R_cw, res.t_cw, lm, n

    keys = jax.random.split(key, B)
    Rs, ts, lms, ns = jax.vmap(one)(cand_ids, ext_matches, keys)
    best = jnp.argmax(ns)
    Rb, tb, lmb, nb = Rs[best], ts[best], lms[best], ns[best]

    # Guided expansion on the winning candidate (reference Relocalization
    # wide->narrow SearchByProjection passes, src/Tracking.cc:4620-4672) —
    # same two-stage refinement as the global-table kernel above.
    active = state.lm_active & (state.lm_map_id == state.active_map_id)

    def _expand(Rp, tp, lm_in, radius):
        uv, depth, visible = assoc.project_landmarks(
            state.lm_pos, active, Rp, tp, cam_params, cam_kind)
        kpt_lm, _ = assoc.projection_match(
            uv, state.lm_desc.astype(jnp.float32), visible,
            cur_kpts, cur_desc, cur_valid, radius=radius)
        lm2 = jnp.where(lm_in >= 0, lm_in, kpt_lm)
        okc = (lm2 >= 0) & cur_valid & active[jnp.clip(lm2, 0, L - 1)]
        r = pose_opt.pose_optimization(
            Rp, tp, state.lm_pos[jnp.clip(lm2, 0, L - 1)], cur_kpts, okc,
            cam_params, cam_kind=cam_kind, rounds=2, iters_per_round=6,
            check_cost=False)
        return r.R_cw, r.t_cw, jnp.where(r.inliers, lm2, -1), r.n_inliers

    def _guided(_):
        R1, t1, lm1, n1 = _expand(Rb, tb, lmb, 10.0)
        return _expand(R1, t1, lm1, 3.0)

    def _keep(_):
        return Rb, tb, lmb, jnp.maximum(nb, 0)

    R2, t2, lm2, n2 = jax.lax.cond(nb >= 8, _guided, _keep, operand=None)
    finite = jnp.all(jnp.isfinite(R2)) & jnp.all(jnp.isfinite(t2))
    return R2, t2, lm2, (nb > 0) & finite, n2


# --- small jitted wrappers so the host loop never dispatches eager ops
# (eager dispatch is a per-op round trip on remote TPU backends) ---

@jax.jit
def _add_keyframe_kernel(state, R, t, kpts, rays, desc, valid, lidx, time,
                         parent):
    return ms.add_keyframe(state, R, t, kpts, rays, desc, valid, lidx, time,
                           parent=parent)


@functools.partial(jax.jit, static_argnames=("n",))
def _best_covis_kernel(state: ms.MapState, kf_id, n: int):
    W = ms.covisibility(state)
    return ms.best_covisible(W, kf_id, n)


@jax.jit
def _rel_to_kf_kernel(state: ms.MapState, R_cw, t_cw, ref_slot):
    """Frame pose relative to a reference keyframe: T_cr = T_cw * T_rw^-1
    (the reference's per-frame trajectory log entry Tcr,
    src/Tracking.cc:2697-2719)."""
    Rr = state.kf_R_cw[ref_slot]
    tr = state.kf_t_cw[ref_slot]
    R_cr = R_cw @ Rr.T
    t_cr = t_cw - R_cr @ tr
    return R_cr, t_cr


@jax.jit
def _relative_pose(R_prev, t_prev, R_cur, t_cur):
    Ri, ti = lie.se3_inverse(R_prev, t_prev)
    return lie.se3_compose(R_cur, t_cur, Ri, ti)


@jax.jit
def _compose_pose(dR, dt, R1, t1):
    return lie.se3_compose(dR, dt, R1, t1)


@jax.jit
def _count_kf_obs(state: ms.MapState, kf_id):
    return jnp.sum((state.kf_landmark_idx[kf_id] >= 0)
                   & state.kf_kpt_valid[kf_id])


@jax.jit
def _init_coords(rays0, rays1, matches):
    x0 = rays0[:, :2] / rays0[:, 2:]
    m = jnp.clip(matches, 0, rays1.shape[0] - 1)
    r1 = rays1[m]
    x1 = r1[:, :2] / r1[:, 2:]
    return x0, x1


@functools.partial(jax.jit, static_argnames=("n_opt", "n_fixed"))
def _covis_window(state: ms.MapState, center_kf, n_opt: int, n_fixed: int):
    """Top covisible keyframes of center_kf: first n_opt optimized, next
    n_fixed fixed (reference: covis-1-ring + fixed anchors).

    Only the CENTER keyframe's covisibility row is needed, so this is an
    O(K*L) matvec on the observation matrix, not the O(K^2*L) full
    covisibility matmul."""
    obs = ms.observation_matrix(state)
    w_row = (obs @ obs[center_kf]).at[center_kf].set(0.0)
    wts, ids = jax.lax.top_k(w_row, n_opt + n_fixed - 1)
    ids = jnp.where(wts > 0, ids, -1).astype(jnp.int32)
    window = jnp.concatenate([center_kf[None], ids])
    opt_mask = jnp.arange(n_opt + n_fixed) < n_opt
    # Always keep keyframe 0 fixed if present (gauge anchor, reference fixes
    # the map-origin KF).
    opt_mask = opt_mask & (window != 0)
    return window.astype(jnp.int32), opt_mask
