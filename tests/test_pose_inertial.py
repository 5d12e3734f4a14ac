"""Motion-only VI pose optimization + marginal-prior chain tests
(reference: Optimizer::PoseInertialOptimizationLastKeyFrame/LastFrame,
src/Optimizer.cc:416/983, ConstraintPoseImu include/G2oTypes.h:820)."""
import numpy as np
import jax.numpy as jnp

from rover_slam_tpu.geometry import lie, cameras
from rover_slam_tpu.imu import preintegration as pre
from rover_slam_tpu.optim import pose_inertial as pio

from test_vi_ba import simulate_vi, CAM, CALIB


def _build_problem(sim, k, R1, p1, v1, bg1, ba1, prior_H=None,
                   anchor_state=None, uv_override=None):
    """Problem for frame k (anchor = state k-1) from the simulate_vi output."""
    R_gt, p_gt, v_gt, bg_true, ba_true, Xw, preints, (e_kf, e_lm, uv) = sim
    st = preints[k - 1]
    Lw = len(Xw)
    sel = e_kf == k
    uv_k = uv[sel] if uv_override is None else uv_override
    dt = float(st.dt)
    walk_info = np.array([1.0 / float(CALIB.walk_g) ** 2 / dt] * 3
                         + [1.0 / float(CALIB.walk_a) ** 2 / dt] * 3,
                         np.float32)
    if anchor_state is None:
        anchor_state = (R_gt[k - 1], p_gt[k - 1], v_gt[k - 1],
                        bg_true, ba_true)
    Ra, pa, va, bga, baa = anchor_state
    return pio.PoseInertialProblem(
        R_wb0=jnp.asarray(Ra), p_wb0=jnp.asarray(pa), v_wb0=jnp.asarray(va),
        bg0=jnp.asarray(bga), ba0=jnp.asarray(baa),
        R_wb1=jnp.asarray(R1), p_wb1=jnp.asarray(p1), v_wb1=jnp.asarray(v1),
        bg1=jnp.asarray(bg1), ba1=jnp.asarray(ba1),
        prior_H=jnp.zeros((15, 15)) if prior_H is None else jnp.asarray(prior_H),
        prior_valid=jnp.asarray(prior_H is not None),
        imu_dR=st.dR, imu_dV=st.dV, imu_dP=st.dP, imu_JRg=st.JRg,
        imu_JVg=st.JVg, imu_JVa=st.JVa, imu_JPg=st.JPg, imu_JPa=st.JPa,
        imu_dt=st.dt, imu_bg0=st.bg, imu_ba0=st.ba,
        imu_info=pre.information_9(st),
        walk_info=jnp.asarray(walk_info),
        Xw=jnp.asarray(Xw), uv=jnp.asarray(uv_k, jnp.float32),
        e_valid=jnp.ones(Lw, bool), e_info=jnp.ones(Lw, jnp.float32),
        R_cb=jnp.eye(3), t_cb=jnp.zeros(3), cam_params=CAM)


def _perturbed(sim, k, rng, pose_noise=0.03, vel_noise=0.1):
    R_gt, p_gt, v_gt, bg_true, ba_true = sim[0], sim[1], sim[2], sim[3], sim[4]
    dR = np.asarray(lie.so3_exp(jnp.asarray(
        rng.normal(0, pose_noise, 3).astype(np.float32))))
    return (dR @ R_gt[k], p_gt[k] + rng.normal(0, pose_noise, 3),
            v_gt[k] + rng.normal(0, vel_noise, 3), bg_true, ba_true)


def test_recover_pose_last_keyframe():
    """Anchor fixed at GT, perturbed frame -> pose+velocity recovered."""
    sim = simulate_vi(Kw=4, Lw=120, seed=10)
    R_gt, p_gt, v_gt = sim[0], sim[1], sim[2]
    rng = np.random.default_rng(3)
    k = 1
    R1, p1, v1, bg1, ba1 = _perturbed(sim, k, rng)
    prob = _build_problem(sim, k, R1, p1, v1, bg1, ba1)
    res = pio.solve_pose_inertial(prob, anchor_fixed=True)
    assert np.linalg.norm(np.asarray(res.p_wb) - p_gt[k]) < 5e-3
    assert np.linalg.norm(np.asarray(res.R_wb) - R_gt[k]) < 5e-3
    assert np.linalg.norm(np.asarray(res.v_wb) - v_gt[k]) < 5e-2
    assert int(res.n_inliers) > 100
    # Anchor untouched in LastKeyFrame mode.
    assert np.allclose(np.asarray(res.p_wb0), p_gt[k - 1])


def test_marginal_prior_psd():
    sim = simulate_vi(Kw=4, Lw=120, seed=11)
    rng = np.random.default_rng(4)
    R1, p1, v1, bg1, ba1 = _perturbed(sim, 1, rng)
    prob = _build_problem(sim, 1, R1, p1, v1, bg1, ba1)
    res = pio.solve_pose_inertial(prob, anchor_fixed=True)
    H = np.asarray(res.marg_H)
    assert np.allclose(H, H.T, atol=1e-3)
    ev = np.linalg.eigvalsh(H)
    assert ev.min() > -1e-2 * max(ev.max(), 1.0)
    # Pose block must be well constrained by 120 visual edges.
    assert ev.max() > 1.0


def test_prior_chain_last_frame():
    """Frame-to-frame chain with recursive marginalization stays on the GT
    trajectory; velocity tracked without any direct velocity measurement."""
    sim = simulate_vi(Kw=6, Lw=120, seed=12)
    R_gt, p_gt, v_gt, bg_true, ba_true = sim[:5]
    rng = np.random.default_rng(5)

    # Start the chain at GT state 0 (as after a keyframe-anchored solve).
    anchor = (R_gt[0], p_gt[0], v_gt[0], bg_true, ba_true)
    prior_H = None
    errs = []
    for k in range(1, 6):
        st = sim[6][k - 1]
        # Initialize the frame from IMU prediction (like PredictStateIMU).
        R1, p1, v1 = pre.predict_state(
            jnp.asarray(anchor[0]), jnp.asarray(anchor[1]),
            jnp.asarray(anchor[2]), st, jnp.asarray(anchor[3]),
            jnp.asarray(anchor[4]))
        prob = _build_problem(sim, k, R1, p1, v1, anchor[3], anchor[4],
                              prior_H=prior_H, anchor_state=anchor)
        res = pio.solve_pose_inertial(prob, anchor_fixed=(k == 1))
        errs.append(np.linalg.norm(np.asarray(res.p_wb) - p_gt[k]))
        anchor = tuple(np.asarray(a) for a in
                       (res.R_wb, res.p_wb, res.v_wb, res.bg, res.ba))
        prior_H = np.asarray(res.marg_H)
    assert max(errs) < 1e-2, f"position errors along chain: {errs}"
    assert np.linalg.norm(anchor[2] - v_gt[5]) < 5e-2
    # Biases should not run away from the truth.
    assert np.linalg.norm(anchor[3] - bg_true) < 5e-3
    assert np.linalg.norm(anchor[4] - ba_true) < 5e-2


def test_outlier_gating():
    """Corrupted observations must be gated out by the chi2 rounds."""
    sim = simulate_vi(Kw=4, Lw=150, seed=13)
    R_gt, p_gt = sim[0], sim[1]
    e_kf, e_lm, uv = sim[7]
    rng = np.random.default_rng(6)
    k = 1
    sel = e_kf == k
    uv_k = uv[sel].copy()
    bad = rng.choice(len(uv_k), 30, replace=False)
    uv_k[bad] += rng.uniform(30, 80, (30, 2)) * rng.choice([-1, 1], (30, 2))
    R1, p1, v1, bg1, ba1 = _perturbed(sim, k, rng, pose_noise=0.02)
    prob = _build_problem(sim, k, R1, p1, v1, bg1, ba1, uv_override=uv_k)
    res = pio.solve_pose_inertial(prob, anchor_fixed=True)
    inl = np.asarray(res.inliers)
    assert not inl[bad].any(), "corrupted edges not gated"
    assert inl.sum() >= 100
    assert np.linalg.norm(np.asarray(res.p_wb) - p_gt[k]) < 1e-2
