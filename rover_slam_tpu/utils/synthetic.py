"""Synthetic SLAM world: oracle frontend with ground truth.

The reference's de-facto integration tests are EuRoC/TUM-VI dataset runs
(SURVEY.md §4); with no datasets in this environment, this module provides the
equivalent: a deterministic 3D world whose "feature extractor" returns exactly
the kind of output SuperPoint+LightGlue produce (fixed-K keypoints, unit
descriptors, validity masks), but with known ground truth — so the whole
backend (tracking, mapping, BA, loop closing) is exercised end-to-end and
scored with the same ATE protocol as the reference's evaluate_ate_scale.py.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from ..geometry import lie, cameras


class SyntheticWorld(NamedTuple):
    landmarks: np.ndarray     # [L,3] world points
    desc: np.ndarray          # [L,D] unit descriptors (the landmark identity)
    cam_params: np.ndarray
    cam_kind: int
    image_hw: tuple


class SyntheticFrame(NamedTuple):
    kpts: np.ndarray          # [N,2] pixels (noisy)
    rays: np.ndarray          # [N,3] unprojected bearings of noisy kpts
    desc: np.ndarray          # [N,D] noisy unit descriptors
    valid: np.ndarray         # [N] bool
    lm_id: np.ndarray         # [N] true landmark id (for diagnostics only)
    R_cw: np.ndarray          # ground truth pose
    t_cw: np.ndarray
    time: float


def make_world(n_landmarks=4000, desc_dim=64, seed=0,
               extent=((-8, 8), (-6, 6), (0, 25)),
               image_hw=(480, 640)) -> SyntheticWorld:
    rng = np.random.default_rng(seed)
    L = n_landmarks
    pts = np.stack([rng.uniform(*extent[0], L), rng.uniform(*extent[1], L),
                    rng.uniform(*extent[2], L)], 1).astype(np.float32)
    d = rng.normal(size=(L, desc_dim)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    cam = np.asarray(cameras.make_pinhole(458.654, 457.296, 367.215, 248.375))
    return SyntheticWorld(pts, d, cam, cameras.PINHOLE, image_hw)


def forward_trajectory(n_frames=60, dt=0.1, speed=0.5, yaw_rate=0.05, seed=1,
                       lateral=0.6):
    """Ground-truth Tcw trajectory: forward+lateral motion with gentle yaw +
    jitter. Pure forward motion is the degenerate case for monocular two-view
    initialization (epipole at image center), so like real handheld/EuRoC
    sequences the default has a lateral velocity component.
    Returns (R_cw [F,3,3], t_cw [F,3], times [F])."""
    rng = np.random.default_rng(seed)
    Rs, ts, times = [], [], []
    R_wc = np.eye(3, dtype=np.float32)
    p_wc = np.zeros(3, dtype=np.float32)
    for i in range(n_frames):
        w = np.array([0.0, yaw_rate, 0.0], np.float32) * dt
        w += rng.normal(0, 0.002, 3).astype(np.float32)
        R_wc = R_wc @ np.asarray(lie.so3_exp(jnp.asarray(w)), dtype=np.float32)
        v_cam = np.array([lateral * speed, 0.0, speed], np.float32)
        v = R_wc @ v_cam
        p_wc = p_wc + v * dt + rng.normal(0, 0.002, 3).astype(np.float32)
        R_cw = R_wc.T
        t_cw = -R_cw @ p_wc
        Rs.append(R_cw.copy()); ts.append(t_cw.copy()); times.append(i * dt)
    return np.stack(Rs), np.stack(ts), np.asarray(times, np.float32)


def ring_world(n_landmarks=6000, desc_dim=64, seed=0, radius=12.0,
               height=4.0, orbit_radius=5.0, image_hw=(480, 640)) -> SyntheticWorld:
    """Landmarks on a cylinder wall around an orbit — every viewpoint along a
    circular trajectory sees texture (loop-closure scenario)."""
    rng = np.random.default_rng(seed)
    th = rng.uniform(0, 2 * np.pi, n_landmarks)
    r = radius + rng.uniform(-1.0, 1.0, n_landmarks)
    y = rng.uniform(-height, height, n_landmarks)
    pts = np.stack([r * np.sin(th), y, r * np.cos(th)], 1).astype(np.float32)
    d = rng.normal(size=(n_landmarks, desc_dim)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    cam = np.asarray(cameras.make_pinhole(458.654, 457.296, 367.215, 248.375))
    return SyntheticWorld(pts, d, cam, cameras.PINHOLE, image_hw)


def orbit_trajectory(n_frames=80, orbit_radius=5.0, seed=1, noise=0.001,
                     dt=0.1, revs=1.05):
    """Camera orbits the origin looking outward; returns to its start (> one
    revolution) so place recognition fires. Returns (R_cw, t_cw, times)."""
    rng = np.random.default_rng(seed)
    Rs, ts, times = [], [], []
    for i in range(n_frames):
        th = 2 * np.pi * revs * i / n_frames
        # camera position on the orbit; looks radially outward (+z out).
        p_wc = np.array([orbit_radius * np.sin(th), 0.0,
                         orbit_radius * np.cos(th)], np.float32)
        R_wc = np.asarray(lie.so3_exp(jnp.asarray([0.0, th, 0.0])),
                          dtype=np.float32)
        p_wc += rng.normal(0, noise, 3).astype(np.float32)
        R_cw = R_wc.T
        t_cw = -R_cw @ p_wc
        Rs.append(R_cw); ts.append(t_cw); times.append(i * dt)
    return np.stack(Rs), np.stack(ts), np.asarray(times, np.float32)


def orbit_with_imu(n_frames=100, orbit_radius=5.0, revs=1.25, dt=0.1,
                   hz=200, bg=(0.002, -0.001, 0.003), ba=(-0.02, 0.03, 0.01),
                   noise_g=1.7e-4, noise_a=2e-3, seed=2,
                   g_w=(0.0, -9.81, 0.0)):
    """Analytic circular orbit with IMU samples (gravity perpendicular to the
    orbit plane, -y world). Camera == body (Rbc = I).

    Returns (R_cw [F,3,3], t_cw [F,3], times [F], v_wb [F,3],
             imu_per_frame: list of (acc [n,3], gyro [n,3], t [n])).
    """
    rng = np.random.default_rng(seed)
    T_total = n_frames * dt
    omega = 2 * np.pi * revs / T_total
    r = orbit_radius
    g = np.asarray(g_w, np.float32)
    bg = np.asarray(bg, np.float32)
    ba = np.asarray(ba, np.float32)

    # Radial wobble + vertical bob: a smooth circle has almost no third-order
    # content, making monocular scale nearly unobservable over short windows;
    # handheld/MAV trajectories (EuRoC) are jerky, which is what the
    # scale/gravity init actually relies on.
    w_r, A_r = 2.7, 0.25
    w_y, A_y = 3.3, 0.20

    def body_state(t):
        th = omega * t
        rr = r + A_r * np.sin(w_r * t)
        dr = A_r * w_r * np.cos(w_r * t)
        ddr = -A_r * w_r * w_r * np.sin(w_r * t)
        s_, c_ = np.sin(th), np.cos(th)
        e_rad = np.array([s_, 0.0, c_])
        e_tan = np.array([c_, 0.0, -s_])
        y = A_y * np.sin(w_y * t)
        dy = A_y * w_y * np.cos(w_y * t)
        ddy = -A_y * w_y * w_y * np.sin(w_y * t)
        p = (rr * e_rad + np.array([0.0, y, 0.0])).astype(np.float32)
        v = (dr * e_rad + rr * omega * e_tan
             + np.array([0.0, dy, 0.0])).astype(np.float32)
        a = ((ddr - rr * omega * omega) * e_rad + 2 * dr * omega * e_tan
             + np.array([0.0, ddy, 0.0])).astype(np.float32)
        R_wb = np.asarray(lie.so3_exp(jnp.asarray([0.0, th, 0.0])),
                          dtype=np.float32)
        return R_wb, p, v, a

    Rs, ts, vs, times, imu = [], [], [], [], []
    n_per = int(round(dt * hz))
    for i in range(n_frames):
        t_f = i * dt
        R_wb, p, v, _ = body_state(t_f)
        R_cw = R_wb.T
        t_cw = -R_cw @ p
        Rs.append(R_cw); ts.append(t_cw); vs.append(v); times.append(t_f)
        if i + 1 < n_frames:
            accs, gyros, tt = [], [], []
            for j in range(n_per):
                t_s = t_f + (j + 1) / hz * (dt * hz / n_per)
                Rj, _, _, aj = body_state(t_s)
                f_b = Rj.T @ (aj - g) + ba \
                    + rng.normal(0, noise_a * np.sqrt(hz), 3)
                w_b = np.array([0.0, omega, 0.0], np.float32) + bg \
                    + rng.normal(0, noise_g * np.sqrt(hz), 3)
                accs.append(f_b.astype(np.float32))
                gyros.append(w_b.astype(np.float32))
                tt.append(t_s)
            imu.append((np.stack(accs), np.stack(gyros), np.asarray(tt)))
    return (np.stack(Rs), np.stack(ts), np.asarray(times, np.float32),
            np.stack(vs), imu)


def render_frame(world: SyntheticWorld, R_cw, t_cw, time, n_kpts=512,
                 pix_noise=0.4, desc_noise=0.08, dropout=0.05, seed=0
                 ) -> SyntheticFrame:
    """Oracle extraction: visible landmarks -> noisy keypoints/descriptors."""
    rng = np.random.default_rng((seed * 1000003 + int(time * 1e3)) % (2 ** 31))
    Xc = (R_cw @ world.landmarks.T).T + t_cw
    z = Xc[:, 2]
    uv = np.array(cameras.project(world.cam_kind, jnp.asarray(world.cam_params),
                                  jnp.asarray(Xc)))
    h, w = world.image_hw
    vis = (z > 0.3) & (z < 40.0) & (uv[:, 0] >= 8) & (uv[:, 0] < w - 8) \
        & (uv[:, 1] >= 8) & (uv[:, 1] < h - 8)
    vis &= rng.uniform(size=len(z)) > dropout
    ids = np.where(vis)[0]
    if len(ids) > n_kpts:
        # Keep a deterministic random subset (mimics top-K by score).
        ids = rng.choice(ids, n_kpts, replace=False)
    N = n_kpts
    kpts = np.zeros((N, 2), np.float32)
    desc = np.zeros((N, world.desc.shape[1]), np.float32)
    valid = np.zeros(N, bool)
    lm_id = np.full(N, -1, np.int64)
    n = len(ids)
    kpts[:n] = uv[ids] + rng.normal(0, pix_noise, (n, 2))
    d = world.desc[ids] + rng.normal(0, desc_noise, (n, world.desc.shape[1]))
    desc[:n] = d / np.linalg.norm(d, axis=1, keepdims=True)
    valid[:n] = True
    lm_id[:n] = ids
    rays = np.array(cameras.unproject(world.cam_kind,
                                      jnp.asarray(world.cam_params),
                                      jnp.asarray(kpts)))
    return SyntheticFrame(kpts, rays, desc, valid, lm_id,
                          np.asarray(R_cw, np.float32),
                          np.asarray(t_cw, np.float32), float(time))


def render_sequence(world, R_cw, t_cw, times, **kw):
    return [render_frame(world, R_cw[i], t_cw[i], times[i], seed=i, **kw)
            for i in range(len(times))]
