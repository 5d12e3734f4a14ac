"""Stereo-inertial SLAM: metric stereo + IMU (gravity/bias only — no scale).

TPU-native replacement for the reference's IMU_STEREO mode
(reference: System(..., IMU_STEREO); stereo_inertial_euroc main. The IMU init
runs with fixed scale (Sim3Solver fixed-scale mode, InertialOptimization with
the scale vertex fixed) because stereo depth is already metric —
src/Optimizer.cc InertialOptimization callers with bFixedVel/scale semantics,
LocalMapping::InitializeIMU stereo branch mTinit=1.0s).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..imu import preintegration as preint
from . import tracking as T
from .inertial_system import MonocularInertialSLAM
from .stereo import (stereo_match_kernel, _spawn_stereo_landmarks_kernel,
                     FisheyeStereoMixin)
from ..map import map_state as ms
from ..optim import inertial_init as ii


class StereoInertialSLAM(MonocularInertialSLAM):
    """Stereo + IMU: metric from frame 0, gravity/bias from the IMU init with
    the scale fixed at 1."""

    def __init__(self, cam_params, imu_calib: preint.ImuCalib,
                 baseline: float, tinit_s: float = 1.0, **kw):
        super().__init__(cam_params, imu_calib, tinit_s=tinit_s, **kw)
        self.baseline = float(baseline)
        self.baseline_fx = self.baseline * float(np.asarray(cam_params)[0])
        # 3-dim stereo residuals in every solver (see slam/stereo.py).
        self.bf = self.baseline_fx
        if self.loop_closer is not None:
            self.loop_closer.bf = self.baseline_fx

    def track_stereo_frame(self, kpts_l, rays_l, desc_l, valid_l,
                           kpts_r, desc_r, valid_r, time) -> dict:
        match_r, depth, _ = stereo_match_kernel(
            jnp.asarray(kpts_l), jnp.asarray(desc_l), jnp.asarray(valid_l),
            jnp.asarray(kpts_r), jnp.asarray(desc_r), jnp.asarray(valid_r),
            jnp.asarray(self.baseline_fx, jnp.float32))
        return self._after_stereo_depth(kpts_l, rays_l, desc_l, valid_l,
                                        depth, time)

    def _after_stereo_depth(self, kpts_l, rays_l, desc_l, valid_l, depth,
                            time) -> dict:
        self._stereo_depth = depth
        if self.tracking_state in (T.NO_IMAGES_YET, T.NOT_INITIALIZED):
            ok = self._stereo_init(kpts_l, rays_l, desc_l, valid_l, depth,
                                   time)
            info = {"state": self.tracking_state, "init": ok}
            info["imu_ready"] = self.imu_ready
            self._last_frame_time = float(time)
            self._imu_buf = []
            return info
        return self.track_frame(kpts_l, rays_l, desc_l, valid_l, time)

    def _stereo_init(self, kpts, rays, desc, valid, depth, time) -> bool:
        """(reference StereoInitialization): metric map from frame 0."""
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
            jnp.full((self.state.N,), int(self.state.n_kf), jnp.int32),
            jnp.asarray(has_depth))
        lm_idx = jnp.where(slots >= 0, slots, -1)
        invd = jnp.where(jnp.asarray(depth) > 0,
                         1.0 / jnp.maximum(jnp.asarray(depth), 1e-6), -1.0)
        state, kf_id = ms.add_keyframe(
            state, jnp.eye(3), jnp.zeros(3), jnp.asarray(kpts), rays_j,
            jnp.asarray(desc), jnp.asarray(valid), lm_idx,
            jnp.asarray(time, jnp.float32), parent=-1, kpt_invd=invd)
        self.state = state
        self.n_kf = int(self.state.n_kf)
        self._assign_uid(self.n_kf - 1)
        frame = T.FrameData(jnp.asarray(kpts), rays_j, jnp.asarray(desc),
                            jnp.asarray(valid), float(time),
                            R_cw=jnp.eye(3), t_cw=jnp.zeros(3),
                            landmark_idx=lm_idx)
        self.last_frame = frame
        self.tracking_state = T.OK
        self.ref_kf_tracked = int(has_depth.sum())
        self._last_n_inl = self.ref_kf_tracked
        # IMU segment bookkeeping starts at this first keyframe.
        self._kf_preints = []
        self._kf_base = self.n_kf - 1
        self._preint_since_kf = None
        self._register_init_kf_in_db(self.n_kf - 1)
        self._log_pose(frame)
        return True

    def _insert_keyframe(self, frame):
        super()._insert_keyframe(frame)
        depth = getattr(self, "_stereo_depth", None)
        if depth is not None:
            self.state = _spawn_stereo_landmarks_kernel(
                self.state, jnp.asarray(self.n_kf - 1, jnp.int32), depth,
                jnp.asarray(40.0 * self.baseline, jnp.float32))

    def _initialize_imu(self):
        """Stereo: gravity + biases only; scale is already metric."""
        K = self.n_kf
        Kmax = len(self._kf_preints) + 1
        K = min(K, Kmax)
        if K < 4:
            return
        idx = list(range(self.n_kf - K, self.n_kf))
        segs = self._kf_preints[-(K - 1):]
        prob = self._build_init_problem(idx, segs)
        res = ii.inertial_only_optimization(prob, prior_g=1e2, prior_a=1e6,
                                            fix_scale=True)
        from .inertial_system import _apply_alignment_kernel
        v_full = jnp.zeros((self.state.K, 3))
        v_full = v_full.at[jnp.asarray(idx)].set(res.v_wb[:len(idx)])
        self.state = _apply_alignment_kernel(self.state, res.Rwg,
                                             jnp.asarray(1.0), v_full,
                                             res.bg, res.ba,
                                             self.calib.Rbc, self.calib.tbc)
        self.bg, self.ba = res.bg, res.ba
        lf = self.last_frame
        if lf is not None and lf.R_cw is not None:
            lf.R_cw = lf.R_cw @ res.Rwg
        self.velocity = None
        # Body state at the last FRAME, not the stale last-keyframe snapshot
        # (see inertial_system._refine_scale).
        from .inertial_system import _body_from_camera
        k_last = self.n_kf - 1
        if lf is not None and lf.R_cw is not None:
            self.R_wb, self.p_wb = _body_from_camera(
                lf.R_cw, lf.t_cw, self.calib.Rbc, self.calib.tbc)
            self.v_wb = self.state.kf_v_wb[k_last]
        else:
            self.R_wb = self.state.kf_R_wb[k_last]
            self.p_wb = self.state.kf_p_wb[k_last]
            self.v_wb = self.state.kf_v_wb[k_last]
        self.imu_ready = True

    def _refine_scale(self, max_window: int = 30):
        # Scale is metric from stereo: refine gravity/bias only.
        W = min(max_window, self.n_kf - self._kf_base)
        lo = self.n_kf - W
        segs = self._kf_preints[lo - self._kf_base:
                                self.n_kf - 1 - self._kf_base]
        if len(segs) < 5:
            return
        prob = self._build_init_problem(list(range(lo, self.n_kf)), segs)
        res = ii.inertial_only_optimization(prob, prior_g=1e2, prior_a=1e6,
                                            fix_scale=True)
        self.bg, self.ba = res.bg, res.ba


class FisheyeStereoInertialSLAM(FisheyeStereoMixin, StereoInertialSLAM):
    """Fisheye stereo + IMU (the reference's TUM-VI 512 stereo-inertial
    configuration: KannalaBrandt8 cameras, Stereo.T_c1_c2 extrinsic)."""

    def __init__(self, cam_params, imu_calib, T_rl, **kw):
        if isinstance(T_rl, tuple):
            t = np.asarray(T_rl[1], np.float64)
        else:
            t = np.asarray(T_rl, np.float64).reshape(4, 4)[:3, 3]
        super().__init__(cam_params, imu_calib,
                         baseline=float(np.linalg.norm(t)), **kw)
        self._init_fisheye(T_rl)
