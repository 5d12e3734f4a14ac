"""Stereo observations as optimization residuals (reference 3-dim
(u_L, v_L, u_R) edges: EdgeStereoSE3ProjectXYZ(OnlyPose)
/root/reference/include/G2oTypes.h:497-575, used in pose optimization
/root/reference/src/Optimizer.cc:160-230 and local/global BA with chi2 7.815).

The defining property pinned here: a stereo edge constrains SCALE where mono
reprojection edges are scale-blind — scaling the whole scene (landmarks +
camera centers) leaves every mono residual at zero but moves the stereo
disparity residual, so the optimizer recovers the true scale only when the
third residual row is present.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rover_slam_tpu.geometry import cameras, lie
from rover_slam_tpu.optim import ba, pose_opt


def _scene(n=200, seed=0):
    rng = np.random.default_rng(seed)
    X = np.stack([rng.uniform(-3, 3, n), rng.uniform(-2, 2, n),
                  rng.uniform(4, 10, n)], 1).astype(np.float32)
    cam = np.asarray(cameras.make_pinhole(458.0, 458.0, 320.0, 240.0),
                     np.float32)
    return X, cam


def test_stereo_edge_constrains_scale_pose_opt():
    """Scale the world by s: mono pose-opt is happy anywhere along the scaled
    translation; with stereo rows the optimizer must pull the pose to the
    TRUE metric translation."""
    X, cam = _scene()
    bf = 458.0 * 0.11            # EuRoC-ish baseline*fx
    R_gt = np.asarray(lie.so3_exp(jnp.asarray([0.02, -0.03, 0.01])))
    t_gt = np.array([0.3, -0.1, 0.5], np.float32)
    Xc = (R_gt @ X.T).T + t_gt
    uv = np.asarray(cameras.project(cameras.PINHOLE, jnp.asarray(cam),
                                    jnp.asarray(Xc)))
    invd = (1.0 / Xc[:, 2]).astype(np.float32)
    valid = jnp.ones((X.shape[0],), bool)

    # Start from a 20%-scaled-translation guess (mono's unobservable mode
    # when the map is scaled consistently: here landmarks are METRIC, so the
    # mono solver fixes this too — the discriminating test is below on BA).
    res = pose_opt.pose_optimization(
        jnp.asarray(R_gt), jnp.asarray(t_gt * 1.2), jnp.asarray(X),
        jnp.asarray(uv), valid, jnp.asarray(cam),
        invd=jnp.asarray(invd), bf=jnp.asarray(bf, jnp.float32))
    assert float(jnp.linalg.norm(res.t_cw - t_gt)) < 1e-2
    assert int(res.n_inliers) > 190


def test_stereo_edges_fix_global_scale_in_ba():
    """Two-keyframe BA with a gauge-fixed first pose: feed a 1.3x-scaled map
    + poses. Mono edges are exactly consistent with the scaled scene (cost 0,
    nothing to correct). Stereo rows measure METRIC inverse depth, so only
    the stereo problem recovers the true scale."""
    X, cam = _scene(300, seed=1)
    bf = 458.0 * 0.11
    # Two keyframes: identity and a baseline to the right.
    R0, t0 = np.eye(3, dtype=np.float32), np.zeros(3, np.float32)
    R1 = np.asarray(lie.so3_exp(jnp.asarray([0.0, 0.05, 0.0])),
                    dtype=np.float32)
    t1 = np.array([-0.4, 0.0, 0.1], np.float32)
    uv, invd, e_kf, e_lm = [], [], [], []
    for k, (R, t) in enumerate(((R0, t0), (R1, t1))):
        Xc = (R @ X.T).T + t
        uv.append(np.asarray(cameras.project(cameras.PINHOLE,
                                             jnp.asarray(cam),
                                             jnp.asarray(Xc))))
        invd.append((1.0 / Xc[:, 2]).astype(np.float32))
        e_kf.append(np.full(X.shape[0], k, np.int32))
        e_lm.append(np.arange(X.shape[0], dtype=np.int32))
    s = 1.3   # corrupt the scale of the ESTIMATE
    prob_kw = dict(
        R_cw=jnp.asarray(np.stack([R0, R1])),
        t_cw=jnp.asarray(np.stack([t0 * s, t1 * s])),
        pose_opt_mask=jnp.asarray([False, True]),
        lm_pos=jnp.asarray(X * s),
        lm_opt_mask=jnp.ones((X.shape[0],), bool),
        cam_params=jnp.asarray(cam),
        e_kf=jnp.asarray(np.concatenate(e_kf)),
        e_lm=jnp.asarray(np.concatenate(e_lm)),
        e_uv=jnp.asarray(np.concatenate(uv)),
        e_valid=jnp.ones((2 * X.shape[0],), bool),
        e_info=jnp.ones((2 * X.shape[0],), jnp.float32))

    mono = ba.solve_ba(ba.BAProblem(**prob_kw), iters=15, phases=1,
                       solver="pcg", cg_iters=30)
    stereo = ba.solve_ba(
        ba.BAProblem(**prob_kw,
                     e_invd=jnp.asarray(np.concatenate(invd)),
                     bf=jnp.asarray(bf, jnp.float32)),
        iters=15, phases=1, solver="pcg", cg_iters=30)

    scale_mono = float(jnp.median(mono.lm_pos[:, 2] / X[:, 2]))
    scale_stereo = float(jnp.median(stereo.lm_pos[:, 2] / X[:, 2]))
    # Mono: the scaled scene is a zero-cost optimum — scale stays wrong.
    assert abs(scale_mono - s) < 0.05, scale_mono
    # Stereo: metric observations pull the map back to true scale.
    assert abs(scale_stereo - 1.0) < 0.05, scale_stereo


def test_stereo_chi2_gate_775():
    """Stereo edges are gated at 7.815 (3 dof), mono at 5.991: an edge whose
    3-dim chi2 sits between the gates survives as stereo, dies as mono with
    the same residual magnitude split across rows."""
    X, cam = _scene(50, seed=2)
    bf = 458.0 * 0.11
    Xc = X.copy()
    uv = np.asarray(cameras.project(cameras.PINHOLE, jnp.asarray(cam),
                                    jnp.asarray(Xc)))
    invd = (1.0 / Xc[:, 2]).astype(np.float32)
    # Perturb one measurement so its chi2 lands between 5.991 and 7.815.
    uv_p = uv.copy()
    uv_p[0, 0] += np.sqrt(6.5)   # chi2 ~ 6.5 in the u row
    res = pose_opt.pose_optimization(
        jnp.eye(3), jnp.zeros(3), jnp.asarray(X), jnp.asarray(uv_p),
        jnp.ones((50,), bool), jnp.asarray(cam), rounds=1, iters_per_round=0,
        invd=jnp.asarray(invd), bf=jnp.asarray(bf, jnp.float32))
    res_m = pose_opt.pose_optimization(
        jnp.eye(3), jnp.zeros(3), jnp.asarray(X), jnp.asarray(uv_p),
        jnp.ones((50,), bool), jnp.asarray(cam), rounds=1, iters_per_round=0)
    # Note: the stereo 3rd row includes r_u again, roughly doubling the u
    # contribution — chi2 ~ 2*6.5 = 13 > 7.815 would kill it; instead place
    # the perturbation in v (not repeated in row 3).
    uv_v = uv.copy()
    uv_v[0, 1] += np.sqrt(6.5)
    res_s = pose_opt.pose_optimization(
        jnp.eye(3), jnp.zeros(3), jnp.asarray(X), jnp.asarray(uv_v),
        jnp.ones((50,), bool), jnp.asarray(cam), rounds=1, iters_per_round=0,
        invd=jnp.asarray(invd), bf=jnp.asarray(bf, jnp.float32))
    res_sm = pose_opt.pose_optimization(
        jnp.eye(3), jnp.zeros(3), jnp.asarray(X), jnp.asarray(uv_v),
        jnp.ones((50,), bool), jnp.asarray(cam), rounds=1, iters_per_round=0)
    assert bool(res_s.inliers[0])        # 6.5 < 7.815: stereo keeps it
    assert not bool(res_sm.inliers[0])   # 6.5 > 5.991: mono rejects it
