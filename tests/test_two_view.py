"""Two-view reconstruction tests (reference: src/TwoViewReconstruction.cc)."""
import numpy as np
import jax
import jax.numpy as jnp

from rover_slam_tpu.geometry import lie, two_view

def make_pair(M=150, planar=False, noise=0.001, rot=(0.02, -0.05, 0.01),
              trans=(0.5, 0.05, 0.1), seed=60):
    RNG = np.random.default_rng(seed)  # per-call: test outcomes order-independent
    if planar:
        X = np.stack([RNG.uniform(-3, 3, M), RNG.uniform(-2, 2, M),
                      np.full(M, 8.0) + 0.5 * RNG.uniform(-3, 3, M) * 0], 1)
    else:
        X = np.stack([RNG.uniform(-3, 3, M), RNG.uniform(-2, 2, M),
                      RNG.uniform(5, 15, M)], 1)
    X = X.astype(np.float32)
    R = np.asarray(lie.so3_exp(jnp.asarray(np.array(rot, np.float32))))
    t = np.array(trans, np.float32)
    X2 = (R @ X.T).T + t
    x1 = X[:, :2] / X[:, 2:3] + RNG.normal(0, noise, (M, 2))
    x2 = X2[:, :2] / X2[:, 2:3] + RNG.normal(0, noise, (M, 2))
    return (jnp.asarray(x1, jnp.float32), jnp.asarray(x2, jnp.float32),
            R, t, X)


def check_motion(res, R_true, t_true, atol_deg=2.0, atol_dir_deg=30.0):
    """Raw linear-init accuracy only: at t/z~0.05 with 0.5px noise the 8-point
    problem is ill-conditioned (even float64 exact fits show ~12% E error), so
    translation direction is only coarse. The reference behaves the same and
    immediately refines with full BA (CreateInitialMapMonocular ->
    GlobalBundleAdjustemnt), which test_init_plus_ba_refines asserts tightly."""
    assert bool(res.success)
    dR = np.asarray(res.R_21) @ R_true.T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < atol_deg, ang
    t_dir = t_true / np.linalg.norm(t_true)
    t_hat = np.asarray(res.t_21)
    cos = abs(np.dot(t_hat, t_dir))
    assert np.degrees(np.arccos(np.clip(cos, -1, 1))) < atol_dir_deg


def test_general_scene_essential():
    x1, x2, R, t, X = make_pair()
    res = two_view.reconstruct(x1, x2, jnp.ones(len(x1), bool),
                               jax.random.PRNGKey(0))
    check_motion(res, R, t)
    assert int(res.is_triangulated.sum()) > 60
    # Triangulated structure is finite with positive depth (metric accuracy is
    # asserted post-BA in test_init_plus_ba_refines).
    Xh = np.asarray(res.points3d)
    tri = np.asarray(res.is_triangulated)
    assert np.isfinite(Xh[tri]).all()
    assert (Xh[tri, 2] > 0).all()


def test_planar_scene_homography():
    x1, x2, R, t, X = make_pair(planar=True)
    res = two_view.reconstruct(x1, x2, jnp.ones(len(x1), bool),
                               jax.random.PRNGKey(1))
    assert bool(res.used_homography)
    check_motion(res, R, t)


def test_outliers_rejected():
    # Comfortable baseline: this test is about outlier rejection, not about
    # riding the parallax-gate margin.
    x1, x2, R, t, X = make_pair(M=200, trans=(1.0, 0.1, 0.2))
    x2_np = np.array(x2)
    rng = np.random.default_rng(61)
    idx = rng.choice(200, 60, replace=False)
    x2_np[idx] = rng.uniform(-0.5, 0.5, (60, 2))
    res = two_view.reconstruct(x1, jnp.asarray(x2_np), jnp.ones(200, bool),
                               jax.random.PRNGKey(2))
    check_motion(res, R, t, atol_dir_deg=40.0)
    tri = np.asarray(res.is_triangulated)
    assert tri[idx].mean() < 0.2


def test_init_plus_ba_refines():
    """Two-view init followed by a two-camera BA (the reference's
    CreateInitialMapMonocular -> GlobalBundleAdjustemnt(20) pattern) reaches
    degree-level motion accuracy."""
    from rover_slam_tpu.optim import ba
    from rover_slam_tpu.geometry import cameras
    x1, x2, R, t, X = make_pair(M=150)
    res = two_view.reconstruct(x1, x2, jnp.ones(len(x1), bool),
                               jax.random.PRNGKey(0))
    assert bool(res.success)
    M = len(x1)
    tri = np.asarray(res.is_triangulated)
    cam = cameras.make_pinhole(1.0, 1.0, 0.0, 0.0)  # normalized coords
    prob = ba.BAProblem(
        R_cw=jnp.stack([jnp.eye(3), res.R_21]),
        t_cw=jnp.stack([jnp.zeros(3), res.t_21]),
        pose_opt_mask=jnp.asarray([False, True]),
        lm_pos=res.points3d, lm_opt_mask=jnp.asarray(tri),
        cam_params=cam,
        e_kf=jnp.asarray(np.concatenate([np.zeros(M), np.ones(M)]).astype(np.int32)),
        e_lm=jnp.asarray(np.tile(np.arange(M), 2).astype(np.int32)),
        e_uv=jnp.concatenate([x1, x2]),
        e_valid=jnp.asarray(np.tile(tri, 2)),
        e_info=jnp.full(2 * M, 1.0 / (0.001 ** 2), jnp.float32),
    )
    # chi2 in solve_ba is e^2 * info (already sigma-normalized) -> gate is 5.991.
    out = ba.solve_ba(prob, iters=15, cg_iters=30, chi2_th=5.991)
    dR = np.asarray(out.R_cw[1]) @ R.T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    t_hat = np.array(out.t_cw[1])
    t_hat /= np.linalg.norm(t_hat)
    cos = abs(np.dot(t_hat, t / np.linalg.norm(t)))
    dir_err = np.degrees(np.arccos(np.clip(cos, -1, 1)))
    assert ang < 0.5, ang
    # The ML optimum itself sits ~8.6 deg from truth at this t/z and noise
    # (verified by running the same BA from a ground-truth init: same basin,
    # same cost). Assert we reach the ML basin, not an impossible accuracy.
    assert dir_err < 12.0, dir_err
    s = 1.0 / np.linalg.norm(t)
    prob_gt = prob._replace(
        R_cw=jnp.stack([jnp.eye(3), jnp.asarray(R)]),
        t_cw=jnp.stack([jnp.zeros(3), jnp.asarray(t * s)]),
        lm_pos=jnp.asarray(X * s))
    out_gt = ba.solve_ba(prob_gt, iters=15, cg_iters=30, chi2_th=5.991)
    assert float(out.cost_history[-1]) <= float(out_gt.cost_history[-1]) * 1.05 + 1e-3


def test_pure_rotation_fails():
    # No translation -> should not report success (no parallax).
    x1, x2, R, t, X = make_pair(trans=(0.0, 0.0, 0.0), noise=0.0005)
    res = two_view.reconstruct(x1, x2, jnp.ones(len(x1), bool),
                               jax.random.PRNGKey(3))
    assert not bool(res.success)


def test_insufficient_matches_fail():
    x1, x2, R, t, X = make_pair(M=60)
    mask = jnp.asarray(np.arange(60) < 30)
    res = two_view.reconstruct(x1, x2, mask, jax.random.PRNGKey(4))
    assert not bool(res.success)
