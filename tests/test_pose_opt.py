"""Motion-only pose optimization tests (reference: Optimizer::PoseOptimization
src/Optimizer.cc:55-415): recovery from noise + outliers, chi2 gating."""
import numpy as np
import jax.numpy as jnp

from rover_slam_tpu.geometry import lie, cameras
from rover_slam_tpu.optim import pose_opt

RNG = np.random.default_rng(20)
CAM = cameras.make_pinhole(458.654, 457.296, 367.215, 248.375)


def make_problem(M=200, noise_px=0.5, outlier_frac=0.0, pose_err_scale=0.1):
    Xw = np.stack([RNG.uniform(-3, 3, M), RNG.uniform(-2, 2, M),
                   RNG.uniform(4, 12, M)], 1).astype(np.float32)
    xi_true = np.concatenate([RNG.uniform(-0.2, 0.2, 3), RNG.uniform(-0.1, 0.1, 3)])
    R_true, t_true = lie.se3_exp(jnp.asarray(xi_true, jnp.float32))
    Xc = lie.se3_apply(R_true, t_true, jnp.asarray(Xw))
    uv = np.array(cameras.pinhole_project(CAM, Xc))
    uv += RNG.normal(0, noise_px, uv.shape)
    n_out = int(M * outlier_frac)
    if n_out:
        idx = RNG.choice(M, n_out, replace=False)
        uv[idx] += RNG.uniform(20, 100, (n_out, 2)) * RNG.choice([-1, 1], (n_out, 2))
    # Perturbed initial pose.
    xi0 = xi_true + RNG.normal(0, pose_err_scale, 6)
    R0, t0 = lie.se3_exp(jnp.asarray(xi0, jnp.float32))
    return (jnp.asarray(Xw), jnp.asarray(uv, jnp.float32),
            (R_true, t_true), (R0, t0), idx if n_out else np.array([], int))


def pose_error(R, t, R_true, t_true):
    dR = np.asarray(R) @ np.asarray(R_true).T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    dt = np.linalg.norm(np.asarray(t) - np.asarray(t_true))
    return ang, dt


def test_clean_recovery():
    Xw, uv, (R_true, t_true), (R0, t0), _ = make_problem(noise_px=0.0)
    res = pose_opt.pose_optimization(R0, t0, Xw, uv, jnp.ones(len(Xw), bool), CAM)
    ang, dt = pose_error(res.R_cw, res.t_cw, R_true, t_true)
    assert ang < 0.01 and dt < 0.001
    assert int(res.n_inliers) == len(Xw)


def test_noisy_recovery():
    Xw, uv, (R_true, t_true), (R0, t0), _ = make_problem(noise_px=0.5)
    res = pose_opt.pose_optimization(R0, t0, Xw, uv, jnp.ones(len(Xw), bool), CAM)
    ang, dt = pose_error(res.R_cw, res.t_cw, R_true, t_true)
    assert ang < 0.1 and dt < 0.02


def test_outlier_rejection():
    Xw, uv, (R_true, t_true), (R0, t0), out_idx = make_problem(
        M=300, noise_px=0.5, outlier_frac=0.3)
    res = pose_opt.pose_optimization(R0, t0, Xw, uv, jnp.ones(len(Xw), bool), CAM)
    ang, dt = pose_error(res.R_cw, res.t_cw, R_true, t_true)
    assert ang < 0.2 and dt < 0.05
    inl = np.asarray(res.inliers)
    # Outliers classified out.
    assert inl[out_idx].mean() < 0.1
    assert inl.sum() > 0.6 * len(Xw)


def test_invalid_mask_ignored():
    Xw, uv, (R_true, t_true), (R0, t0), _ = make_problem(M=100, noise_px=0.2)
    # Corrupt half the entries but mark them invalid.
    uv2 = np.asarray(uv).copy()
    uv2[50:] = 1e5
    valid = jnp.asarray(np.arange(100) < 50)
    res = pose_opt.pose_optimization(R0, t0, Xw, jnp.asarray(uv2), valid, CAM)
    ang, dt = pose_error(res.R_cw, res.t_cw, R_true, t_true)
    assert ang < 0.2 and dt < 0.05
    assert int(res.n_inliers) <= 50


def test_large_initial_error_converges():
    Xw, uv, (R_true, t_true), (R0, t0), _ = make_problem(
        M=200, noise_px=0.3, pose_err_scale=0.35)
    res = pose_opt.pose_optimization(R0, t0, Xw, uv, jnp.ones(len(Xw), bool), CAM)
    ang, dt = pose_error(res.R_cw, res.t_cw, R_true, t_true)
    assert ang < 0.5 and dt < 0.1
