"""Visual-inertial BA tests (reference: Optimizer::LocalInertialBA semantics)."""
import numpy as np
import jax.numpy as jnp

from rover_slam_tpu.geometry import lie, cameras
from rover_slam_tpu.imu import preintegration as pre
from rover_slam_tpu.optim import vi_ba

CAM = cameras.make_pinhole(458.654, 457.296, 367.215, 248.375)
CALIB = pre.ImuCalib(
    Rbc=jnp.eye(3), tbc=jnp.zeros(3),
    sigma_g=jnp.float32(1.7e-4 * np.sqrt(200.0)),
    sigma_a=jnp.float32(2e-3 * np.sqrt(200.0)),
    walk_g=jnp.float32(1.9e-5 / np.sqrt(200.0)),
    walk_a=jnp.float32(3e-3 / np.sqrt(200.0)),
)


def simulate_vi(Kw=6, Lw=100, dt_kf=0.25, hz=200, bg_true=(0.002, -0.001, 0.003),
                ba_true=(-0.02, 0.03, 0.01), seed=80):
    """Body moves with constant world velocity + yaw; IMU samples + projections."""
    rng = np.random.default_rng(seed)
    n_per = int(dt_kf * hz)
    dt = 1.0 / hz
    g_w = np.array([0.0, 0.0, -pre.GRAVITY])
    w_body = np.array([0.0, 0.3, 0.0])    # yaw rate
    v0 = np.array([0.4, 0.0, 0.1])

    bg_true = np.asarray(bg_true, np.float32)
    ba_true = np.asarray(ba_true, np.float32)

    R = np.eye(3); p = np.zeros(3); v = v0.copy()
    R_list, p_list, v_list = [R.copy()], [p.copy()], [v.copy()]
    preints = []
    t_abs = 0.0
    for k in range(Kw - 1):
        st = pre.init_state()
        accs, gyros = [], []
        for i in range(n_per):
            # Accelerated motion: monocular scale is unobservable under
            # constant velocity, so excite with a sinusoidal world acceleration
            # (the reference demands the same via its 'not enough motion' gate).
            a_w = np.array([1.5 * np.sin(2.0 * t_abs),
                            0.8 * np.cos(3.0 * t_abs), 0.0])
            f_b = R.T @ (a_w - g_w)
            accs.append(f_b + ba_true)   # accel bias on measurement
            gyros.append(w_body + bg_true)
            # integrate ground truth (measurement uses state at sample start)
            p = p + v * dt + 0.5 * a_w * dt * dt
            v = v + a_w * dt
            R = R @ np.asarray(lie.so3_exp(jnp.asarray(w_body * dt)))
            t_abs += dt
        st = pre.integrate(jnp.asarray(np.array(accs), jnp.float32),
                           jnp.asarray(np.array(gyros), jnp.float32),
                           jnp.full((n_per,), dt, jnp.float32),
                           jnp.ones((n_per,), bool), CALIB)
        preints.append(st)
        R_list.append(R.copy()); p_list.append(p.copy()); v_list.append(v.copy())

    R_gt = np.stack(R_list).astype(np.float32)
    p_gt = np.stack(p_list).astype(np.float32)
    v_gt = np.stack(v_list).astype(np.float32)

    # Landmarks + observations (camera == body: R_cb = I).
    Xw = np.stack([rng.uniform(-4, 4, Lw), rng.uniform(-3, 3, Lw),
                   rng.uniform(6, 14, Lw)], 1).astype(np.float32)
    e_kf = np.repeat(np.arange(Kw), Lw).astype(np.int32)
    e_lm = np.tile(np.arange(Lw), Kw).astype(np.int32)
    Xc = np.einsum("kji,klj->kli", R_gt, Xw[None] - p_gt[:, None])  # R^T (X-p)
    uv = np.array(cameras.project(cameras.PINHOLE, CAM,
                                  jnp.asarray(Xc.reshape(-1, 3))))
    uv += rng.normal(0, 0.5, uv.shape)

    return (R_gt, p_gt, v_gt, bg_true, ba_true, Xw, preints,
            (e_kf, e_lm, uv))


def make_problem(sim, pose_noise=0.02, vel_noise=0.05, lm_noise=0.05,
                 fix_first=1, seed=81):
    rng = np.random.default_rng(seed)
    R_gt, p_gt, v_gt, bg_true, ba_true, Xw, preints, (e_kf, e_lm, uv) = sim
    Kw = len(R_gt)
    Lw = len(Xw)
    R0 = R_gt.copy(); p0 = p_gt.copy(); v0 = v_gt.copy()
    for k in range(fix_first, Kw):
        dR = np.asarray(lie.so3_exp(jnp.asarray(
            rng.normal(0, pose_noise, 3).astype(np.float32))))
        R0[k] = dR @ R0[k]
        p0[k] = p0[k] + rng.normal(0, pose_noise, 3)
        v0[k] = v0[k] + rng.normal(0, vel_noise, 3)

    def stackf(attr):
        arr = [np.asarray(getattr(s, attr)) for s in preints]
        arr.append(np.zeros_like(arr[0]))
        return jnp.asarray(np.stack(arr))

    infos = [np.asarray(pre.information_9(s)) for s in preints]
    infos.append(np.zeros((9, 9), np.float32))

    prob = vi_ba.VIBAProblem(
        R_wb=jnp.asarray(R0), p_wb=jnp.asarray(p0), v_wb=jnp.asarray(v0),
        bg=jnp.zeros((Kw, 3)), ba=jnp.zeros((Kw, 3)),
        pose_opt_mask=jnp.asarray(np.arange(Kw) >= fix_first),
        kf_valid=jnp.ones(Kw, bool),
        R_cb=jnp.eye(3), t_cb=jnp.zeros(3), cam_params=CAM,
        imu_dR=stackf("dR"), imu_dV=stackf("dV"), imu_dP=stackf("dP"),
        imu_JRg=stackf("JRg"), imu_JVg=stackf("JVg"), imu_JVa=stackf("JVa"),
        imu_JPg=stackf("JPg"), imu_JPa=stackf("JPa"),
        imu_dt=stackf("dt"), imu_bg0=stackf("bg"), imu_ba0=stackf("ba"),
        imu_info=jnp.asarray(np.stack(infos)),
        imu_valid=jnp.asarray(np.arange(Kw) < Kw - 1),
        walk_info=jnp.asarray([1.0 / CALIB.walk_g ** 2] * 3
                              + [1.0 / CALIB.walk_a ** 2] * 3) * 0.25,
        lm_pos=jnp.asarray(Xw + rng.normal(0, lm_noise, Xw.shape)
                           .astype(np.float32)),
        lm_opt_mask=jnp.ones(Lw, bool),
        e_kf=jnp.asarray(e_kf), e_lm=jnp.asarray(e_lm),
        e_uv=jnp.asarray(uv, jnp.float32),
        e_valid=jnp.ones(len(e_kf), bool),
        e_info=jnp.ones(len(e_kf), jnp.float32))
    return prob


def test_vi_ba_converges_and_estimates_bias():
    sim = simulate_vi()
    R_gt, p_gt, v_gt, bg_true, ba_true = sim[0], sim[1], sim[2], sim[3], sim[4]
    prob = make_problem(sim)
    R, p, v, bg, ba, X, costs = vi_ba.solve_vi_ba(prob, iters=10)
    assert float(costs[-1]) < float(costs[0])
    p_err = np.linalg.norm(np.asarray(p) - p_gt, axis=1)
    v_err = np.linalg.norm(np.asarray(v) - v_gt, axis=1)
    # From a zero-bias init VI-BA reaches a consistent (slightly biased)
    # solution; the true-bias basin needs the inertial init first
    # (test_init_then_vi_ba_escapes_zero_bias_basin) — same as the reference
    # pipeline order.
    assert p_err.max() < 0.05, p_err
    assert v_err.max() < 0.08, v_err


def test_vi_ba_respects_fixed():
    sim = simulate_vi()
    prob = make_problem(sim)
    R, p, v, bg, ba, X, costs = vi_ba.solve_vi_ba(prob, iters=3)
    np.testing.assert_allclose(np.asarray(R[0]), np.asarray(prob.R_wb[0]), atol=0)
    np.testing.assert_allclose(np.asarray(p[0]), np.asarray(prob.p_wb[0]), atol=0)


def test_merge_inertial_ba_welds_two_windows():
    """MergeInertialBA (reference Optimizer.cc:6017): two temporal windows
    with NO preintegration spanning the weld must re-align through the shared
    fused landmarks. The active side starts with a residual rigid
    misalignment (what's left after the Sim3 weld)."""
    Kw, weld = 8, 4
    sim = simulate_vi(Kw=Kw)
    R_gt, p_gt, v_gt = sim[0], sim[1], sim[2]
    prob = make_problem(sim, pose_noise=0.0, vel_noise=0.0, lm_noise=0.02)
    # Residual gravity-consistent misalignment of the active side: yaw + shift.
    dR = np.asarray(lie.so3_exp(jnp.asarray([0.0, 0.0, 0.04], jnp.float32)))
    dt_off = np.array([0.06, -0.04, 0.03], np.float32)
    R0 = np.asarray(prob.R_wb).copy()
    p0 = np.asarray(prob.p_wb).copy()
    v0 = np.asarray(prob.v_wb).copy()
    for k in range(weld, Kw):
        R0[k] = R0[k] @ dR.T          # R_wb' = (dR R_bw^T)^T... x_w' = dR x_w
        p0[k] = dR @ p0[k] + dt_off
        v0[k] = dR @ v0[k]
    prob = prob._replace(R_wb=jnp.asarray(R0), p_wb=jnp.asarray(p0),
                         v_wb=jnp.asarray(v0),
                         pose_opt_mask=jnp.ones(Kw, bool))
    err_before = np.linalg.norm(p0 - p_gt, axis=1).max()
    R, p, v, bg, ba, X, costs = vi_ba.merge_inertial_ba(
        prob, weld_slot=weld, iters=20)
    assert float(costs[-1]) < float(costs[0])
    # Gauge anchor respected.
    np.testing.assert_allclose(np.asarray(p[0]), p0[0], atol=0)
    p_err = np.linalg.norm(np.asarray(p) - p_gt, axis=1)
    assert err_before > 0.05            # the weld error was real
    assert p_err.max() < err_before / 3, (err_before, p_err)
    v_err = np.linalg.norm(np.asarray(v) - v_gt, axis=1)
    assert v_err.max() < 0.08, v_err


def test_merge_inertial_ba_breaks_imu_chain_at_weld():
    """The cross-weld preintegration slot must not be used: corrupting it
    must not change the solution."""
    Kw, weld = 6, 3
    sim = simulate_vi(Kw=Kw)
    prob = make_problem(sim)
    poisoned = prob._replace(
        imu_dP=prob.imu_dP.at[weld - 1].set(jnp.asarray([100.0, 0.0, 0.0])))
    out_a = vi_ba.merge_inertial_ba(prob, weld_slot=weld, iters=4)
    out_b = vi_ba.merge_inertial_ba(poisoned, weld_slot=weld, iters=4)
    np.testing.assert_allclose(np.asarray(out_a[1]), np.asarray(out_b[1]),
                               atol=1e-6)


def test_vi_ba_imu_constrains_scale_free_drift():
    """Without IMU edges, a (nearly) unconstrained window drifts; with IMU the
    velocity/gravity coupling pins it."""
    sim = simulate_vi()
    prob = make_problem(sim, pose_noise=0.05, vel_noise=0.2)
    p_gt = sim[1]
    # With IMU:
    _, p_imu, _, _, _, _, _ = vi_ba.solve_vi_ba(prob, iters=10)
    err_imu = np.linalg.norm(np.asarray(p_imu) - p_gt, axis=1).max()
    # Without IMU (invalidate inertial edges):
    prob_no = prob._replace(imu_valid=jnp.zeros(len(prob.imu_valid), bool))
    _, p_no, _, _, _, _, _ = vi_ba.solve_vi_ba(prob_no, iters=10)
    err_no = np.linalg.norm(np.asarray(p_no) - p_gt, axis=1).max()
    assert err_imu <= err_no * 1.5 + 1e-3
    assert err_imu < 0.05
