"""Bundle adjustment tests on synthetic scenes (reference: Optimizer::
LocalBundleAdjustment src/Optimizer.cc:1740-2202 semantics — fixed anchors,
Huber, chi2 inlier gating)."""
import numpy as np
import jax.numpy as jnp

from rover_slam_tpu.geometry import lie, cameras
from rover_slam_tpu.optim import ba

RNG = np.random.default_rng(30)
CAM = cameras.make_pinhole(458.654, 457.296, 367.215, 248.375)


def make_ba_problem(Kw=6, Lw=120, noise_px=0.5, pose_noise=0.05, lm_noise=0.1,
                    outlier_frac=0.0, fix_first=2):
    """Cameras on an arc looking at a point cloud."""
    Xw_true = np.stack([RNG.uniform(-4, 4, Lw), RNG.uniform(-3, 3, Lw),
                        RNG.uniform(6, 14, Lw)], 1).astype(np.float32)
    R_true, t_true = [], []
    for k in range(Kw):
        xi = np.array([0.3 * k, 0.02 * k, 0.0, 0.0, 0.03 * k, 0.0], np.float32)
        Rk, tk = lie.se3_exp(jnp.asarray(xi))
        R_true.append(np.asarray(Rk)); t_true.append(np.asarray(tk))
    R_true = np.stack(R_true); t_true = np.stack(t_true)

    # All KF x LM edges (dense synthetic visibility).
    e_kf = np.repeat(np.arange(Kw), Lw).astype(np.int32)
    e_lm = np.tile(np.arange(Lw), Kw).astype(np.int32)
    Xc = np.einsum("kij,lj->kli", R_true, Xw_true) + t_true[:, None]
    uv = np.array(cameras.pinhole_project(CAM, jnp.asarray(Xc.reshape(-1, 3))))
    uv += RNG.normal(0, noise_px, uv.shape)
    n_out = int(len(uv) * outlier_frac)
    out_idx = RNG.choice(len(uv), n_out, replace=False) if n_out else np.array([], int)
    if n_out:
        uv[out_idx] += RNG.uniform(20, 80, (n_out, 2)) * RNG.choice([-1, 1], (n_out, 2))

    # Perturb initial guesses (keep fixed anchors exact).
    R0, t0 = R_true.copy(), t_true.copy()
    for k in range(fix_first, Kw):
        xi = RNG.normal(0, pose_noise, 6).astype(np.float32)
        dR, dt = lie.se3_exp(jnp.asarray(xi))
        R0[k] = np.asarray(dR) @ R0[k]
        t0[k] = np.asarray(dR) @ t0[k] + np.asarray(dt)
    X0 = Xw_true + RNG.normal(0, lm_noise, Xw_true.shape).astype(np.float32)

    prob = ba.BAProblem(
        R_cw=jnp.asarray(R0), t_cw=jnp.asarray(t0),
        pose_opt_mask=jnp.asarray(np.arange(Kw) >= fix_first),
        lm_pos=jnp.asarray(X0), lm_opt_mask=jnp.ones(Lw, bool),
        cam_params=CAM,
        e_kf=jnp.asarray(e_kf), e_lm=jnp.asarray(e_lm),
        e_uv=jnp.asarray(uv, jnp.float32),
        e_valid=jnp.ones(len(e_kf), bool),
        e_info=jnp.ones(len(e_kf), jnp.float32),
    )
    return prob, (R_true, t_true, Xw_true), out_idx


def pose_errors(R, t, R_true, t_true):
    dR = np.einsum("kij,kpj->kip", np.asarray(R), R_true)  # R R_true^T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR, axis1=1, axis2=2) - 1) / 2, -1, 1)))
    dt = np.linalg.norm(np.asarray(t) - t_true, axis=1)
    return ang, dt


def test_ba_clean_converges():
    prob, (R_true, t_true, X_true), _ = make_ba_problem(noise_px=0.0)
    res = ba.solve_ba(prob, iters=10, cg_iters=25)
    ang, dt = pose_errors(res.R_cw, res.t_cw, R_true, t_true)
    # note: 0.03 deg is the f32 arccos noise floor of this metric
    assert ang.max() < 0.05, ang
    assert dt.max() < 0.005, dt
    assert float(res.cost_history[-1]) < 1e-3
    lm_err = np.linalg.norm(np.asarray(res.lm_pos) - X_true, axis=1)
    assert np.median(lm_err) < 0.01


def test_pcg_matches_schur():
    """The matrix-free PCG path (distributed solver) reaches the same basin as
    the exact Schur elimination on a well-conditioned problem."""
    prob, (R_true, t_true, X_true), _ = make_ba_problem(noise_px=0.5)
    res_s = ba.solve_ba(prob, iters=10, cg_iters=25, solver="schur")
    res_p = ba.solve_ba(prob, iters=10, cg_iters=25, solver="pcg")
    cs = float(res_s.cost_history[-1])
    cp = float(res_p.cost_history[-1])
    assert cp < cs * 1.1 + 1e-3, (cs, cp)
    dt = np.linalg.norm(np.asarray(res_s.t_cw) - np.asarray(res_p.t_cw), axis=1)
    assert dt.max() < 0.02


def test_ba_noisy():
    prob, (R_true, t_true, X_true), _ = make_ba_problem(noise_px=0.5)
    res = ba.solve_ba(prob, iters=10, cg_iters=25)
    ang, dt = pose_errors(res.R_cw, res.t_cw, R_true, t_true)
    assert ang.max() < 0.1
    assert dt.max() < 0.03
    # Cost decreased monotonically-ish.
    costs = np.asarray(res.cost_history)
    assert costs[-1] < costs[0]


def test_ba_outliers_gated():
    prob, (R_true, t_true, X_true), out_idx = make_ba_problem(
        noise_px=0.5, outlier_frac=0.15)
    res = ba.solve_ba(prob, iters=12, cg_iters=25)
    ang, dt = pose_errors(res.R_cw, res.t_cw, R_true, t_true)
    assert ang.max() < 0.5
    assert dt.max() < 0.1
    inl = np.asarray(res.e_inlier)
    assert inl[out_idx].mean() < 0.1  # outlier edges flagged


def test_fixed_poses_unchanged():
    prob, (R_true, t_true, _), _ = make_ba_problem()
    res = ba.solve_ba(prob, iters=5, cg_iters=15)
    np.testing.assert_allclose(np.asarray(res.R_cw[:2]), np.asarray(prob.R_cw[:2]), atol=0)
    np.testing.assert_allclose(np.asarray(res.t_cw[:2]), np.asarray(prob.t_cw[:2]), atol=0)


def test_invalid_edges_ignored():
    prob, (R_true, t_true, _), _ = make_ba_problem(noise_px=0.3)
    # Corrupt 30% of edges but mark invalid.
    E = len(prob.e_kf)
    bad = np.zeros(E, bool); bad[RNG.choice(E, E // 3, replace=False)] = True
    uv = np.array(prob.e_uv); uv[bad] = 1e4
    prob = prob._replace(e_uv=jnp.asarray(uv), e_valid=jnp.asarray(~bad))
    res = ba.solve_ba(prob, iters=10, cg_iters=25)
    ang, dt = pose_errors(res.R_cw, res.t_cw, R_true, t_true)
    assert ang.max() < 0.15
    assert dt.max() < 0.05


def test_ba_matches_scipy_gauss_newton():
    """One undamped GN step of our matrix-free PCG vs. a dense numpy solve."""
    prob, _, _ = make_ba_problem(Kw=3, Lw=30, noise_px=0.3, fix_first=1)
    # Dense reference: build J explicitly with finite differences is overkill;
    # instead check that solve_ba reaches the same cost basin as many iterations
    # of a small dense GN implemented here.
    res = ba.solve_ba(prob, iters=15, cg_iters=40)
    final_cost = float(np.asarray(res.cost_history)[-1])

    # Dense GN in numpy (float64) on the same problem.
    R = np.array(prob.R_cw, np.float64); t = np.array(prob.t_cw, np.float64)
    X = np.array(prob.lm_pos, np.float64)
    e_kf = np.asarray(prob.e_kf); e_lm = np.asarray(prob.e_lm)
    uv = np.asarray(prob.e_uv, np.float64)
    fx, fy, cx, cy = 458.654, 457.296, 367.215, 248.375
    Kw, Lw = 3, 30
    nv = 6 * Kw + 3 * Lw
    for it in range(30):
        Xc = np.einsum("eij,ej->ei", R[e_kf], X[e_lm]) + t[e_kf]
        z = Xc[:, 2]
        uvh = np.stack([fx * Xc[:, 0] / z + cx, fy * Xc[:, 1] / z + cy], 1)
        e = uv - uvh
        Jp = np.zeros((len(e), 2, 3))
        Jp[:, 0, 0] = fx / z; Jp[:, 0, 2] = -fx * Xc[:, 0] / z**2
        Jp[:, 1, 1] = fy / z; Jp[:, 1, 2] = -fy * Xc[:, 1] / z**2
        hatX = np.zeros((len(e), 3, 3))
        hatX[:, 0, 1] = -Xc[:, 2]; hatX[:, 0, 2] = Xc[:, 1]
        hatX[:, 1, 0] = Xc[:, 2]; hatX[:, 1, 2] = -Xc[:, 0]
        hatX[:, 2, 0] = -Xc[:, 1]; hatX[:, 2, 1] = Xc[:, 0]
        Jc = np.concatenate([-Jp, np.einsum("eij,ejk->eik", Jp, hatX)], -1)
        Jl = -np.einsum("eij,ejk->eik", Jp, R[e_kf])
        H = np.zeros((nv, nv)); g = np.zeros(nv)
        for i in range(len(e)):
            ci = 6 * e_kf[i]; li = 6 * Kw + 3 * e_lm[i]
            H[ci:ci+6, ci:ci+6] += Jc[i].T @ Jc[i]
            H[li:li+3, li:li+3] += Jl[i].T @ Jl[i]
            H[ci:ci+6, li:li+3] += Jc[i].T @ Jl[i]
            H[li:li+3, ci:ci+6] += Jl[i].T @ Jc[i]
            g[ci:ci+6] += Jc[i].T @ e[i]
            g[li:li+3] += Jl[i].T @ e[i]
        # Fix camera 0.
        H[:6] = 0; H[:, :6] = 0; H[:6, :6] = np.eye(6); g[:6] = 0
        dx = -np.linalg.solve(H + 1e-6 * np.eye(nv), g)
        for k in range(1, Kw):
            import rover_slam_tpu.geometry.lie as lie_mod
            dR, dt_ = lie_mod.se3_exp(jnp.asarray(dx[6*k:6*k+6], jnp.float32))
            R[k] = np.asarray(dR, np.float64) @ R[k]
            t[k] = np.asarray(dR, np.float64) @ t[k] + np.asarray(dt_, np.float64)
        X += dx[6 * Kw:].reshape(Lw, 3)
    Xc = np.einsum("eij,ej->ei", R[e_kf], X[e_lm]) + t[e_kf]
    z = Xc[:, 2]
    uvh = np.stack([fx * Xc[:, 0] / z + cx, fy * Xc[:, 1] / z + cy], 1)
    dense_cost = np.sum((uv - uvh) ** 2)
    # Our solver should reach within 5% of the dense-GN optimum cost.
    assert final_cost < dense_cost * 1.05 + 1e-6, (final_cost, dense_cost)


def test_lm_cap_compaction_matches_full():
    """lm_cap compaction (static-size variable gather) must reproduce the
    uncompacted Schur solve: optimize a window where only part of the landmark
    table is variable and some edges reference FIXED landmarks."""
    prob, (R_true, t_true, Xw_true), _ = make_ba_problem(Kw=5, Lw=150,
                                                         pose_noise=0.03)
    # Hold 50 landmarks fixed at their TRUE positions (like converged
    # out-of-window anchors).
    opt = np.ones(150, bool)
    opt[100:] = False
    lm0 = np.array(prob.lm_pos)
    lm0[100:] = Xw_true[100:]
    prob = prob._replace(lm_opt_mask=jnp.asarray(opt),
                         lm_pos=jnp.asarray(lm0))
    res_full = ba.solve_ba(prob, iters=6, solver="schur")
    res_cap = ba.solve_ba(prob, iters=6, solver="schur", lm_cap=128)
    np.testing.assert_allclose(np.asarray(res_cap.R_cw),
                               np.asarray(res_full.R_cw), atol=2e-5)
    np.testing.assert_allclose(np.asarray(res_cap.t_cw),
                               np.asarray(res_full.t_cw), atol=2e-4)
    np.testing.assert_allclose(np.asarray(res_cap.lm_pos),
                               np.asarray(res_full.lm_pos), atol=1e-3)
    # Fixed landmarks untouched.
    np.testing.assert_array_equal(np.asarray(res_cap.lm_pos[100:]),
                                  np.asarray(prob.lm_pos[100:]))
    # Still converges to the truth.
    rot_err, tr_err = pose_errors(res_cap.R_cw, res_cap.t_cw, R_true, t_true)
    assert tr_err.max() < 0.02
