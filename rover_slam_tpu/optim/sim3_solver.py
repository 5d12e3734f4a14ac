"""Sim(3) estimation: Horn closed-form + batched RANSAC.

TPU-native replacement for the reference's Sim3Solver
(reference: src/Sim3Solver.cc — Horn 1987 closed-form from 3 correspondences
ComputeSim3 :319, RANSAC iterate :221 with reprojection CheckInliers :423;
fixed-scale mode for stereo/inertial).

All RANSAC hypotheses are evaluated in one vmapped batch (the reference loops
up to 300 iterations on the host).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import cameras


def horn_sim3(P: jnp.ndarray, Q: jnp.ndarray, w: jnp.ndarray | None = None,
              fix_scale: bool = False):
    """Closed-form Sim3 (s, R, t) minimizing ||Q - (s R P + t)||^2.

    P, Q: [M,3] correspondences (P in frame 1, Q in frame 2), optional weights.
    Horn's quaternion method via the SVD formulation (batched-friendly).
    """
    if w is None:
        w = jnp.ones(P.shape[0], P.dtype)
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    mu_p = jnp.sum(P * w[:, None], axis=0) / wsum
    mu_q = jnp.sum(Q * w[:, None], axis=0) / wsum
    Pc = P - mu_p
    Qc = Q - mu_q
    W = jnp.einsum("mi,m,mj->ij", Qc, w, Pc)
    U, S, Vt = jnp.linalg.svd(W)
    d = jnp.sign(jnp.linalg.det(U @ Vt))
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0]) * jnp.array([1.0, 1.0, 1.0]))
    D = jnp.diag(jnp.concatenate([jnp.ones(2), d[None]]))
    R = U @ D @ Vt
    if fix_scale:
        s = jnp.ones(())
    else:
        var_p = jnp.sum(w[:, None] * Pc * Pc)
        s = jnp.sum(S * jnp.diag(D)) / jnp.maximum(var_p, 1e-12)
    t = mu_q - s * R @ mu_p
    return s, R, t


class Sim3Result(NamedTuple):
    success: jnp.ndarray
    s: jnp.ndarray
    R: jnp.ndarray
    t: jnp.ndarray
    inliers: jnp.ndarray
    n_inliers: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("n_hyp", "fix_scale", "cam_kind"))
def sim3_ransac(X1, X2, mask, uv1, uv2, cam_params, key,
                n_hyp: int = 300, min_inliers: int = 20,
                chi2_px: float = 9.21, fix_scale: bool = False,
                cam_kind: int = cameras.PINHOLE,
                has1=None, has2=None) -> Sim3Result:
    """RANSAC Sim3 from 3D-3D correspondences with image-space inlier checks.

    X1, X2: [M,3] matched map points in camera frames 1 and 2 (the reference
    works in camera frames); uv1, uv2: their pixel observations; mask: valid.
    Inlier check mirrors the reference: project S12*X2 into image 1 and
    S21*X1 into image 2, gate both reprojection errors (Sim3Solver.cc:423).

    has1/has2: optional [M] masks saying which side of each pair carries a
    REAL map point (the other side then only contributes its 2D observation).
    Horn hypotheses sample pairs with BOTH sides real; the inlier count
    additionally credits one-sided pairs through the single projection check
    that is defined for them. At product landmark density the both-sided pool
    is tiny (measured 3-12 pairs on true revisits — structurally below the
    reference's 20-inlier gate), while either-sided pools run 3-4x larger;
    the reference sidesteps this by matching hundreds of map-point pairs via
    SearchByBoWSP over full keypoint sets (src/LoopClosing.cc:1279)."""
    M = X1.shape[0]
    if has1 is None:
        has1 = jnp.ones((M,), bool)
    if has2 is None:
        has2 = jnp.ones((M,), bool)
    both = mask & has1 & has2
    p = both.astype(jnp.float32) / jnp.maximum(jnp.sum(both), 1)
    samples = jax.random.choice(key, M, shape=(n_hyp, 3), replace=True, p=p)

    def score(s21, R21, t21):
        s12 = 1.0 / jnp.maximum(s21, 1e-9)
        R12 = R21.T
        t12 = -s12 * (R12 @ t21)
        X2_in_1 = s12 * (X2 @ R12.T) + t12
        X1_in_2 = s21 * (X1 @ R21.T) + t21
        e1 = jnp.sum((cameras.project(cam_kind, cam_params,
                                      X2_in_1) - uv1) ** 2, -1)
        e2 = jnp.sum((cameras.project(cam_kind, cam_params,
                                      X1_in_2) - uv2) ** 2, -1)
        ok1 = (e1 < chi2_px) | ~has2    # e1 projects X2: defined iff has2
        ok2 = (e2 < chi2_px) | ~has1
        return ok1 & ok2 & mask & (has1 | has2)

    def hyp(sample):
        # Horn maps P=X1 -> Q=X2, i.e. returns S21.
        s, R, t = horn_sim3(X1[sample], X2[sample], fix_scale=fix_scale)
        inl = score(s, R, t)
        return jnp.sum(inl), s, R, t, inl

    n_inl, ss, Rs, ts, inls = jax.vmap(hyp)(samples)
    best = jnp.argmax(n_inl)
    # Refine on the winning inlier set (both-sided members only can vote in
    # the Horn refit; the one-sided ones still count as inliers).
    w = (inls[best] & both).astype(jnp.float32)
    s_r, R_r, t_r = horn_sim3(X1, X2, w, fix_scale=fix_scale)
    inl_r = score(s_r, R_r, t_r)
    better = jnp.sum(inl_r) >= n_inl[best]
    s_f = jnp.where(better, s_r, ss[best])
    R_f = jnp.where(better, R_r, Rs[best])
    t_f = jnp.where(better, t_r, ts[best])
    inl_f = jnp.where(better, inl_r, inls[best])
    n_f = jnp.sum(inl_f)
    return Sim3Result(success=n_f >= min_inliers, s=s_f, R=R_f, t=t_f,
                      inliers=inl_f, n_inliers=n_f)


def sim3_gn_refine(X, uv, w_mask, s0, R0, t0, cam_params,
                   cam_kind: int = cameras.PINHOLE, iters: int = 8,
                   fix_scale: bool = False, huber_px: float = 3.0,
                   chi2_px: float = 9.21, X_bwd=None, uv_bwd=None,
                   w_bwd=None, X_src3=None, X_dst3=None, w_3d=None):
    """Gauss-Newton refinement of a Sim3 on 3D->2D correspondences
    (reference Optimizer::OptimizeSim3 src/Optimizer.cc:1102 — g2o
    VertexSim3Expmap with BIDIRECTIONAL reprojection edges). Forward set: X
    are map points in the SOURCE camera frame, uv their matched observations
    in the TARGET image (the Sim3 maps source->target). Optional backward
    set: X_bwd are TARGET-frame map points observed at uv_bwd in the SOURCE
    image, constrained through the INVERSE Sim3 — without it, projection-
    only fitting can trade scale against z-translation on shallow scenes
    (measured: an oracle loop refined to s=2.12 one-directional; the
    reference's OptimizeSim3 carries both edge sets for the same reason).

    Optional 3D-3D set (X_src3, X_dst3, w_3d): matched DUPLICATED map-point
    pairs with residual s*R*X_src3 + t - X_dst3, weighted by w_3d (callers
    pass ~f/z so meters land in pixel units). On a loop revisit the two
    views look down nearly the SAME axis, so forward+backward projections
    share one scale/z-translation ambiguity valley and the GN can walk the
    scale far from truth while residuals stay flat (measured: an oracle
    loop refined to s=0.63 with 407 projection inliers, corrupting the
    correction); the matched landmark-pair cloud is what actually pins the
    map-to-map scale.

    Returns (s, R, t, n_inliers): the refined Sim3 and the count of FORWARD
    matches whose reprojection chi2 is under chi2_px after refinement (the
    acceptance statistic). Fixed-shape, jit-safe; w_mask masks valid
    matches. Robustness: Huber IRLS weights.
    """
    X = X.astype(jnp.float32)
    uv = uv.astype(jnp.float32)
    wm = w_mask.astype(jnp.float32)
    if X_bwd is not None:
        X_bwd = X_bwd.astype(jnp.float32)
        uv_bwd = uv_bwd.astype(jnp.float32)
    if X_src3 is not None:
        X_src3 = X_src3.astype(jnp.float32)
        X_dst3 = X_dst3.astype(jnp.float32)
        w_3d = w_3d.astype(jnp.float32)

    def transform(p, s, R, t):
        # Left-multiplicative update: S' = exp(p) * S with p = (omega, tau,
        # sigma): R' = exp(omega) R, s' = s exp(sigma), t' = exp(omega) t+tau
        from ..geometry import lie as _lie
        dR = _lie.so3_exp(p[:3])
        return s * jnp.exp(p[6]), dR @ R, dR @ t + p[3:6]

    def project_resid(p, s, R, t):
        s2, R2, t2 = transform(p, s, R, t)
        Xt = s2 * (X @ R2.T) + t2
        pred = cameras.project(cam_kind, cam_params, Xt)
        return (pred - uv), Xt

    def project_resid_bwd(p, s, R, t):
        s2, R2, t2 = transform(p, s, R, t)
        si = 1.0 / jnp.maximum(s2, 1e-9)
        Xs = si * (X_bwd @ R2) - si * (R2.T @ t2)   # inverse Sim3
        pred = cameras.project(cam_kind, cam_params, Xs)
        return (pred - uv_bwd), Xs

    def step(carry, _):
        s, R, t = carry
        p0 = jnp.zeros((7,), jnp.float32)
        r0, Xt = project_resid(p0, s, R, t)
        J = jax.jacfwd(lambda p: project_resid(p, s, R, t)[0])(p0)  # [M,2,7]
        e = jnp.linalg.norm(r0, axis=-1)
        w_huber = jnp.minimum(1.0, huber_px / jnp.maximum(e, 1e-6))
        w = wm * w_huber * (Xt[:, 2] > 0.05)   # behind-camera guard
        Jw = J * w[:, None, None]
        JTJ = jnp.einsum("mij,mik->jk", Jw, J)
        JTr = jnp.einsum("mij,mi->j", Jw, r0)
        if X_bwd is not None:
            rb, Xs = project_resid_bwd(p0, s, R, t)
            Jb = jax.jacfwd(
                lambda p: project_resid_bwd(p, s, R, t)[0])(p0)
            eb = jnp.linalg.norm(rb, axis=-1)
            wb = (w_bwd.astype(jnp.float32)
                  * jnp.minimum(1.0, huber_px / jnp.maximum(eb, 1e-6))
                  * (Xs[:, 2] > 0.05))
            Jbw = Jb * wb[:, None, None]
            JTJ = JTJ + jnp.einsum("mij,mik->jk", Jbw, Jb)
            JTr = JTr + jnp.einsum("mij,mi->j", Jbw, rb)
        if X_src3 is not None:
            def resid3(p):
                s2, R2, t2 = transform(p, s, R, t)
                return (s2 * (X_src3 @ R2.T) + t2 - X_dst3) * w_3d[:, None]
            r3 = resid3(p0)
            J3 = jax.jacfwd(resid3)(p0)                      # [M3,3,7]
            e3 = jnp.linalg.norm(r3, axis=-1)
            w3h = jnp.minimum(1.0, huber_px / jnp.maximum(e3, 1e-6))
            J3w = J3 * w3h[:, None, None]
            JTJ = JTJ + jnp.einsum("mij,mik->jk", J3w, J3)
            JTr = JTr + jnp.einsum("mij,mi->j", J3w, r3)
        if fix_scale:
            JTJ = JTJ.at[6, :].set(0.0).at[:, 6].set(0.0).at[6, 6].set(1.0)
            JTr = JTr.at[6].set(0.0)
        # RELATIVE Levenberg damping: JTJ entries run ~1e7 (pixel Jacobians
        # squared) and near-singular directions (scale vs z-translation on
        # shallow scenes) go slightly NEGATIVE under f32 roundoff — an
        # absolute 1e-4 floor cannot fix that and the solve emits +-inf.
        JTJ = JTJ + (1e-3 * jnp.diag(jnp.diag(JTJ)) + 1e-4 * jnp.eye(7))
        p = -jnp.linalg.solve(JTJ, JTr)
        # Trust region: one GN step never rotates >0.5 rad or rescales >e^0.3
        # (a wild step from a bad linearization would throw the projection
        # behind the camera and poison every later iteration).
        p = jnp.clip(p, -0.5, 0.5).at[6].set(jnp.clip(p[6], -0.3, 0.3))
        from ..geometry import lie as _lie
        dR = _lie.so3_exp(p[:3])
        return (s * jnp.exp(p[6]), dR @ R, dR @ t + p[3:6]), None

    (s, R, t), _ = jax.lax.scan(step, (s0, R0, t0), None, length=iters)
    r, Xt = project_resid(jnp.zeros((7,), jnp.float32), s, R, t)
    chi2 = jnp.sum(r * r, axis=-1)
    inl = (chi2 < chi2_px) & (w_mask) & (Xt[:, 2] > 0.05)
    return s, R, t, jnp.sum(inl)
