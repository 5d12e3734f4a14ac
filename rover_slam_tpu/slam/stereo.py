"""Stereo SLAM: left/right matching, fixed-baseline triangulation, stereo init.

TPU-native replacement for the reference's stereo path
(reference: Frame::ComputeStereoMatches src/Frame.cc:1159 — rectified scanline
search with threshold (TH_HIGH+TH_LOW)/2 and disparity range [0, mbf/b];
ComputeStereoFishEyeMatches :1619-1700 — BF-knn + Lowe ratio +
GeometricCamera::TriangulateMatches; Tracking::StereoInitialization
src/Tracking.cc:2739 — first frame becomes a keyframe with landmarks from
stereo depth, no scale ambiguity).

Matching is one masked descriptor-distance matrix with an epipolar row gate
(rectified) or a generalized epipolar gate (fisheye Tlr), batched over all
keypoints.
"""
from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..geometry import lie, cameras, triangulation
from ..map import map_state as ms
from ..ops import association as assoc
from . import tracking as T
from .system import MonocularSLAM


@functools.partial(jax.jit, static_argnames=("rectified",))
def stereo_match_kernel(kpts_l, desc_l, valid_l, kpts_r, desc_r, valid_r,
                        baseline_fx, row_tol=2.0, max_disp=192.0,
                        rectified: bool = True,
                        th_desc2=((assoc.TH_HIGH + assoc.TH_LOW) / 2) ** 2):
    """Rectified stereo matching: mutual NN constrained to the same scanline
    with positive disparity. Returns (match_r [N] int32, depth [N], disp [N]).

    depth = baseline_fx / disparity (reference mbf / disparity).
    """
    d2 = assoc.desc_dist2(desc_l, desc_r)
    drow = jnp.abs(kpts_l[:, None, 1] - kpts_r[None, :, 1])
    disp = kpts_l[:, None, 0] - kpts_r[None, :, 0]
    ok = (valid_l[:, None] & valid_r[None, :] & (drow <= row_tol)
          & (disp > 0.1) & (disp < max_disp) & (d2 <= th_desc2))
    big = jnp.float32(1e9)
    d2m = jnp.where(ok, d2, big)
    best_r = jnp.argmin(d2m, axis=1)
    best_l = jnp.argmin(d2m, axis=0)
    has = jnp.take_along_axis(d2m, best_r[:, None], axis=1)[:, 0] < big
    mutual = (best_l[best_r] == jnp.arange(desc_l.shape[0])) & has
    match_r = jnp.where(mutual, best_r, -1)
    disp_sel = jnp.take_along_axis(disp, jnp.clip(best_r, 0, desc_r.shape[0]-1)[:, None],
                                   axis=1)[:, 0]
    depth = jnp.where(mutual, baseline_fx / jnp.maximum(disp_sel, 0.1), -1.0)
    return match_r.astype(jnp.int32), depth, jnp.where(mutual, disp_sel, -1.0)


@jax.jit
def fisheye_stereo_match_kernel(rays_l, desc_l, valid_l, rays_r, desc_r,
                                valid_r, R_rl, t_rl,
                                th_desc2=assoc.TH_LOW ** 2,
                                epi_th: float = 0.01):
    """General (fisheye) stereo: mutual NN + ratio + epipolar gate + two-view
    triangulation with the known extrinsic (reference
    ComputeStereoFishEyeMatches + KannalaBrandt8::TriangulateMatches).

    R_rl/t_rl: pose of left cam in right cam frame (x_r = R_rl x_l + t_rl).
    Returns (match_r [N], Xl [N,3] points in left-cam frame, valid [N]).
    """
    matches, _ = assoc.mutual_nn_match(desc_l, valid_l, desc_r, valid_r,
                                       th_desc2=th_desc2, ratio=0.8)
    # Epipolar gate in bearing space: treat left cam as cam0, right as cam1
    # with T01 = pose of cam1 in cam0: x_l = R_lr x_r + t_lr.
    R_lr = jnp.swapaxes(R_rl, -1, -2)
    t_lr = -R_lr @ t_rl
    matches = assoc.epipolar_gate(rays_l, rays_r, matches, R_lr, t_lr,
                                  th=epi_th)
    m = jnp.clip(matches, 0, rays_r.shape[0] - 1)
    # Triangulate: cam_l at identity (Tcw = I), cam_r at T_rl.
    Xl, tri_ok = triangulation.triangulate_and_check(
        rays_l, rays_r[m], jnp.eye(3), jnp.zeros(3), R_rl, t_rl,
        min_parallax_cos=1.0)
    valid = (matches >= 0) & tri_ok & (Xl[:, 2] > 0.05)
    return matches, Xl, valid


class StereoSLAM(MonocularSLAM):
    """Stereo (rectified) SLAM: metric from the first frame.

    track_stereo_frame() takes both eyes' extractions; depth from the stereo
    match seeds landmarks at every keyframe (reference StereoInitialization +
    CreateNewKeyFrame stereo landmark spawning src/Tracking.cc:3940-4080).
    """

    def __init__(self, cam_params, baseline: float, **kw):
        super().__init__(cam_params, **kw)
        self.baseline = float(baseline)
        self.baseline_fx = self.baseline * float(np.asarray(cam_params)[0])
        # Metric stereo observations become 3-dim residuals in every solver
        # (reference EdgeStereoSE3ProjectXYZ*, include/G2oTypes.h:497-575).
        self.bf = self.baseline_fx
        if self.loop_closer is not None:
            self.loop_closer.bf = self.baseline_fx

    def track_stereo_frame(self, kpts_l, rays_l, desc_l, valid_l,
                           kpts_r, desc_r, valid_r, time) -> dict:
        match_r, depth, disp = stereo_match_kernel(
            jnp.asarray(kpts_l), jnp.asarray(desc_l), jnp.asarray(valid_l),
            jnp.asarray(kpts_r), jnp.asarray(desc_r), jnp.asarray(valid_r),
            jnp.asarray(self.baseline_fx, jnp.float32))
        return self._after_stereo_depth(kpts_l, rays_l, desc_l, valid_l,
                                        depth, time)

    def _after_stereo_depth(self, kpts_l, rays_l, desc_l, valid_l, depth,
                            time) -> dict:
        """Common post-depth stereo step: init on the first usable frame,
        else monocular-style tracking with the depth stashed for keyframe
        landmark spawning."""
        self._stereo_depth = depth
        if self.tracking_state in (T.NO_IMAGES_YET, T.NOT_INITIALIZED):
            ok = self._stereo_init(kpts_l, rays_l, desc_l, valid_l, depth, time)
            return {"state": self.tracking_state, "init": ok}
        return self.track_frame(kpts_l, rays_l, desc_l, valid_l, time)

    def _stereo_init(self, kpts, rays, desc, valid, depth, time) -> bool:
        """(reference StereoInitialization src/Tracking.cc:2739): first frame
        with enough stereo points becomes KF 0; landmarks at measured depth."""
        has_depth = np.asarray((depth > 0) & jnp.asarray(valid))
        if has_depth.sum() < 100:
            return False
        if not self._ensure_kf_capacity(need=1):
            return False
        rays_j = jnp.asarray(rays)
        X = rays_j / rays_j[:, 2:] * jnp.asarray(depth)[:, None]
        state, slots = ms.add_landmarks(
            self.state, X, jnp.asarray(desc),
            X / jnp.maximum(jnp.linalg.norm(X, axis=-1, keepdims=True), 1e-9),
            jnp.zeros((self.state.N,), jnp.int32),
            jnp.asarray(has_depth))
        lm_idx = jnp.where(slots >= 0, slots, -1)
        invd = jnp.where(jnp.asarray(depth) > 0,
                         1.0 / jnp.maximum(jnp.asarray(depth), 1e-6), -1.0)
        state, kf_id = ms.add_keyframe(
            state, jnp.eye(3), jnp.zeros(3), jnp.asarray(kpts), rays_j,
            jnp.asarray(desc), jnp.asarray(valid), lm_idx,
            jnp.asarray(time, jnp.float32), parent=-1, kpt_invd=invd)
        self.state = state
        self._assign_uid(int(kf_id))
        self.n_kf = int(state.n_kf)
        frame = T.FrameData(jnp.asarray(kpts), rays_j, jnp.asarray(desc),
                            jnp.asarray(valid), float(time),
                            R_cw=jnp.eye(3), t_cw=jnp.zeros(3),
                            landmark_idx=lm_idx)
        self.last_frame = frame
        self.tracking_state = T.OK
        self.ref_kf_tracked = int(has_depth.sum())
        self._last_n_inl = self.ref_kf_tracked
        self._register_init_kf_in_db(int(kf_id))
        self._log_pose(frame)
        return True

    def _fused_mapping_ok(self) -> bool:
        # The stereo insert spawns depth-seeded landmarks host-side below;
        # keep the host-decision pipeline path until that moves in-kernel.
        return False

    def _insert_keyframe(self, frame):
        """Insert KF, then spawn landmarks from stereo depth for unmatched
        keypoints (the reference creates close-depth stereo points directly,
        src/Tracking.cc:3990-4080), then the usual mapping work."""
        super()._insert_keyframe(frame)
        depth = getattr(self, "_stereo_depth", None)
        if depth is None:
            return
        kf_id = self.n_kf - 1
        # Far-point gate ~ 40 baselines (reference Stereo.ThDepth * baseline).
        self.state = _spawn_stereo_landmarks_kernel(
            self.state, jnp.asarray(kf_id, jnp.int32), depth,
            jnp.asarray(40.0 * self.baseline, jnp.float32))


class RGBDSLAM(StereoSLAM):
    """RGB-D SLAM: per-keypoint depth from the sensor instead of stereo
    disparity (reference System(..., RGBD): Frame RGBD ctor samples the depth
    map at keypoints, scaled by RGBD.DepthMapFactor; the rest of the pipeline
    is the stereo path)."""

    def __init__(self, cam_params, depth_factor: float = 1.0,
                 max_depth: float = 20.0, **kw):
        # baseline only sets the far-point gate scale; use max_depth directly.
        super().__init__(cam_params, baseline=max_depth / 40.0, **kw)
        self.depth_factor = float(depth_factor)

    def track_rgbd_frame(self, kpts, rays, desc, valid, depth, time) -> dict:
        """depth: [N] sensor depth at each keypoint (0/negative = invalid)."""
        depth = jnp.asarray(depth, jnp.float32) / self.depth_factor
        self._stereo_depth = jnp.where(depth > 0.05, depth, -1.0)
        if self.tracking_state in (T.NO_IMAGES_YET, T.NOT_INITIALIZED):
            ok = self._stereo_init(kpts, rays, desc, valid,
                                   self._stereo_depth, time)
            return {"state": self.tracking_state, "init": ok}
        return self.track_frame(kpts, rays, desc, valid, time)


@jax.jit
def _spawn_stereo_landmarks_kernel(state: ms.MapState, kf_id, depth, max_depth):
    """Create landmarks at stereo depth for keypoints without one."""
    N = state.N
    rays = state.kf_rays[kf_id]
    free = (state.kf_kpt_valid[kf_id] & (state.kf_landmark_idx[kf_id] < 0)
            & (depth > 0) & (depth < max_depth))
    Xc = rays / jnp.maximum(rays[:, 2:], 1e-6) * depth[:, None]
    # to world: X = Tcw^-1 Xc
    Ri, ti = lie.se3_inverse(state.kf_R_cw[kf_id], state.kf_t_cw[kf_id])
    Xw = lie.se3_apply(Ri, ti, Xc)
    center = ti  # camera center in world
    nrm = Xw - center
    nrm = nrm / jnp.maximum(jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-9)
    state, slots = ms.add_landmarks(
        state, Xw, state.kf_desc[kf_id].astype(jnp.float32), nrm,
        jnp.full((N,), kf_id, jnp.int32), free)
    li = jnp.where(slots >= 0, slots, state.kf_landmark_idx[kf_id])
    return state.replace(
        kf_landmark_idx=state.kf_landmark_idx.at[kf_id].set(li))


class FisheyeStereoMixin:
    """Fisheye (non-rectified) stereo front end: BF mutual-NN + ratio +
    epipolar gate + two-view triangulation against the known left->right
    extrinsic (reference Frame::ComputeStereoFishEyeMatches
    src/Frame.cc:1619-1700 + GeometricCamera::TriangulateMatches). Works for
    any camera model whose keypoints come with unit rays (KannalaBrandt8 for
    TUM-VI)."""

    def _init_fisheye(self, T_rl):
        """T_rl: 4x4 (or (R, t)) pose of the LEFT cam in the RIGHT cam frame
        (x_r = R_rl x_l + t_rl) — the inverse of the YAML Stereo.T_c1_c2."""
        if isinstance(T_rl, tuple):
            R_rl, t_rl = T_rl
        else:
            m = np.asarray(T_rl, np.float32).reshape(4, 4)
            R_rl, t_rl = m[:3, :3], m[:3, 3]
        self.R_rl = jnp.asarray(R_rl, jnp.float32)
        self.t_rl = jnp.asarray(t_rl, jnp.float32)

    def track_stereo_frame(self, kpts_l, rays_l, desc_l, valid_l,
                           rays_r, desc_r, valid_r, time) -> dict:
        """NOTE: takes the RIGHT eye's unit RAYS (not pixels) — fisheye
        matching runs in bearing space."""
        _, Xl, ok = fisheye_stereo_match_kernel(
            jnp.asarray(rays_l), jnp.asarray(desc_l), jnp.asarray(valid_l),
            jnp.asarray(rays_r), jnp.asarray(desc_r), jnp.asarray(valid_r),
            self.R_rl, self.t_rl)
        depth = jnp.where(ok, Xl[:, 2], -1.0)
        return self._after_stereo_depth(kpts_l, rays_l, desc_l, valid_l,
                                        depth, time)


class FisheyeStereoSLAM(FisheyeStereoMixin, StereoSLAM):
    """Stereo SLAM for fisheye/unrectified rigs (reference: KB8 stereo with
    Stereo.T_c1_c2 + lapping areas instead of rectification maps)."""

    def __init__(self, cam_params, T_rl, **kw):
        if isinstance(T_rl, tuple):
            t = np.asarray(T_rl[1], np.float64)
        else:
            t = np.asarray(T_rl, np.float64).reshape(4, 4)[:3, 3]
        super().__init__(cam_params, baseline=float(np.linalg.norm(t)), **kw)
        self._init_fisheye(T_rl)
