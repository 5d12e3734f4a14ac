"""Inertial-only initialization tests (reference: Optimizer::InertialOptimization
+ LocalMapping::InitializeIMU 3-stage schedule)."""
import numpy as np
import jax.numpy as jnp

from rover_slam_tpu.geometry import lie
from rover_slam_tpu.imu import preintegration as pre
from rover_slam_tpu.optim import inertial_init as ii
from tests.test_vi_ba import CALIB, simulate_vi


def make_init_problem(sim, scale_error=1.0, grav_rot=(0.0, 0.0)):
    """Visual poses scaled by 1/scale_error and rotated by grav_rot (the
    unobserved monocular scale/gravity the init must recover)."""
    R_gt, p_gt, v_gt, bg_true, ba_true, Xw, preints, _ = sim
    K = len(R_gt)
    Rpre = np.asarray(lie.so3_exp(jnp.asarray(
        [grav_rot[0], grav_rot[1], 0.0])), dtype=np.float32)
    # Visual world = Rpre^T * true world, scaled by 1/scale_error.
    R_vis = np.einsum("ij,kjl->kil", Rpre.T, R_gt)
    p_vis = np.einsum("ij,kj->ki", Rpre.T, p_gt) / scale_error

    def stackf(attr):
        arr = [np.asarray(getattr(s, attr)) for s in preints]
        arr.append(np.zeros_like(arr[0]))
        return jnp.asarray(np.stack(arr))

    infos = [np.asarray(pre.information_9(s)) for s in preints]
    infos.append(np.zeros((9, 9), np.float32))
    prob = ii.InertialInitProblem(
        R_wb=jnp.asarray(R_vis), p_wb=jnp.asarray(p_vis),
        kf_valid=jnp.ones(K, bool),
        imu_dR=stackf("dR"), imu_dV=stackf("dV"), imu_dP=stackf("dP"),
        imu_JRg=stackf("JRg"), imu_JVg=stackf("JVg"), imu_JVa=stackf("JVa"),
        imu_JPg=stackf("JPg"), imu_JPa=stackf("JPa"),
        imu_dt=stackf("dt"), imu_bg0=stackf("bg"), imu_ba0=stackf("ba"),
        imu_info=jnp.asarray(np.stack(infos)),
        imu_valid=jnp.asarray(np.arange(K) < K - 1))
    return prob


def test_recovers_scale_gravity_bias():
    sim = simulate_vi(Kw=10)
    bg_true, v_gt = sim[3], sim[2]
    scale_err = 2.5
    grav_rot = (0.06, -0.04)
    prob = make_init_problem(sim, scale_error=scale_err, grav_rot=grav_rot)
    res = ii.inertial_only_optimization(prob, prior_g=1e2, prior_a=1e6)
    # Scale: visual map is 1/2.5 of metric -> estimator should find s ~ 2.5.
    np.testing.assert_allclose(float(res.scale), scale_err, rtol=0.05)
    # Gravity direction: Rwg rotates gravity into the visual frame.
    g_est = np.asarray(res.Rwg) @ np.array([0, 0, -pre.GRAVITY])
    Rpre = np.asarray(lie.so3_exp(jnp.asarray([grav_rot[0], grav_rot[1], 0.0])))
    g_true_vis = Rpre.T @ np.array([0, 0, -pre.GRAVITY])
    cos = g_est @ g_true_vis / (np.linalg.norm(g_est) * np.linalg.norm(g_true_vis))
    assert np.degrees(np.arccos(np.clip(cos, -1, 1))) < 1.0
    # Gyro bias recovered.
    np.testing.assert_allclose(np.asarray(res.bg), bg_true, atol=5e-4)
    # Velocities are METRIC (the GS residual scales only positions), expressed
    # in the visual world's orientation.
    v_vis_est = np.asarray(res.v_wb)
    v_expect = np.einsum("ij,kj->ki", Rpre.T, v_gt)
    np.testing.assert_allclose(v_vis_est, v_expect, atol=0.08)


def test_aligned_world_fix_scale():
    """Stereo/inertial mode: scale fixed at 1, gravity already near -z."""
    sim = simulate_vi(Kw=8)
    bg_true = sim[3]
    prob = make_init_problem(sim)
    res = ii.inertial_only_optimization(prob, prior_g=1e2, prior_a=1e6,
                                        fix_scale=True)
    assert abs(float(res.scale) - 1.0) < 1e-6
    np.testing.assert_allclose(np.asarray(res.bg), bg_true, atol=5e-4)


def test_apply_scaled_rotation():
    sim = simulate_vi(Kw=6)
    R_gt, p_gt, v_gt = sim[0], sim[1], sim[2]
    Rwg = np.asarray(lie.so3_exp(jnp.asarray([0.1, -0.05, 0.0])))
    s = 2.0
    R2, p2, v2, lm2 = ii.apply_scaled_rotation(
        jnp.asarray(R_gt), jnp.asarray(p_gt), jnp.asarray(v_gt),
        jnp.asarray(sim[5]), jnp.asarray(Rwg), jnp.asarray(s))
    # Norms scale, orthonormality preserved.
    np.testing.assert_allclose(np.linalg.norm(np.asarray(p2), axis=1),
                               s * np.linalg.norm(p_gt, axis=1), rtol=1e-5)
    eye = np.eye(3)
    for k in range(len(R_gt)):
        np.testing.assert_allclose(np.asarray(R2[k]) @ np.asarray(R2[k]).T,
                                   eye, atol=1e-5)


def test_init_then_vi_ba_escapes_zero_bias_basin():
    """The reference's pipeline order (inertial init THEN VI-BA) finds the true
    biases that VI-BA alone misses from a zero init (local minimum)."""
    from rover_slam_tpu.optim import vi_ba
    from tests.test_vi_ba import make_problem
    sim = simulate_vi()
    bg_true, ba_true = sim[3], sim[4]
    prob_init = make_init_problem(sim)
    res = ii.inertial_only_optimization(prob_init, prior_g=1e2, prior_a=1e6)
    prob = make_problem(sim)
    K = len(sim[0])
    prob = prob._replace(bg=jnp.tile(res.bg[None], (K, 1)),
                         ba=jnp.tile(res.ba[None], (K, 1)),
                         v_wb=jnp.asarray(res.v_wb))
    R, p, v, bg, ba, X, costs = vi_ba.solve_vi_ba(prob, iters=10)
    bg_err = np.linalg.norm(np.asarray(bg[2]) - bg_true)
    assert bg_err < 5e-4, (np.asarray(bg[2]), bg_true)
    # Accel bias converges over much longer windows (reference VIBA2 at 15s);
    # position accuracy here reflects the residual ba error.
    p_err = np.linalg.norm(np.asarray(p) - sim[1], axis=1)
    assert p_err.max() < 0.03
