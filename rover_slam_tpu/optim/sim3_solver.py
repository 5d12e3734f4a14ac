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
                cam_kind: int = cameras.PINHOLE) -> Sim3Result:
    """RANSAC Sim3 from 3D-3D correspondences with image-space inlier checks.

    X1, X2: [M,3] matched map points in camera frames 1 and 2 (the reference
    works in camera frames); uv1, uv2: their pixel observations; mask: valid.
    Inlier check mirrors the reference: project S12*X2 into image 1 and
    S21*X1 into image 2, gate both reprojection errors (Sim3Solver.cc:423).
    """
    M = X1.shape[0]
    p = mask.astype(jnp.float32) / jnp.maximum(jnp.sum(mask), 1)
    samples = jax.random.choice(key, M, shape=(n_hyp, 3), replace=True, p=p)

    def hyp(sample):
        s, R, t = horn_sim3(X1[sample], X2[sample], fix_scale=fix_scale)
        # S21: X2 = s21 R21 X1 + t21  (Horn maps P=X1 -> Q=X2)
        s21, R21, t21 = s, R, t
        s12 = 1.0 / jnp.maximum(s21, 1e-9)
        R12 = R21.T
        t12 = -s12 * (R12 @ t21)
        X2_in_1 = s12 * (X2 @ R12.T) + t12
        X1_in_2 = s21 * (X1 @ R21.T) + t21
        e1 = jnp.sum((cameras.project(cam_kind, cam_params, X2_in_1) - uv1) ** 2, -1)
        e2 = jnp.sum((cameras.project(cam_kind, cam_params, X1_in_2) - uv2) ** 2, -1)
        inl = (e1 < chi2_px) & (e2 < chi2_px) & mask
        return jnp.sum(inl), s21, R21, t21, inl

    n_inl, ss, Rs, ts, inls = jax.vmap(hyp)(samples)
    best = jnp.argmax(n_inl)
    # Refine on the winning inlier set.
    w = inls[best].astype(jnp.float32)
    s_r, R_r, t_r = horn_sim3(X1, X2, w, fix_scale=fix_scale)
    s12 = 1.0 / jnp.maximum(s_r, 1e-9)
    X2_in_1 = s12 * (X2 @ R_r) - s12 * (R_r.T @ t_r)
    X1_in_2 = s_r * (X1 @ R_r.T) + t_r
    e1 = jnp.sum((cameras.project(cam_kind, cam_params, X2_in_1) - uv1) ** 2, -1)
    e2 = jnp.sum((cameras.project(cam_kind, cam_params, X1_in_2) - uv2) ** 2, -1)
    inl_r = (e1 < chi2_px) & (e2 < chi2_px) & mask
    better = jnp.sum(inl_r) >= n_inl[best]
    s_f = jnp.where(better, s_r, ss[best])
    R_f = jnp.where(better, R_r, Rs[best])
    t_f = jnp.where(better, t_r, ts[best])
    inl_f = jnp.where(better, inl_r, inls[best])
    n_f = jnp.sum(inl_f)
    return Sim3Result(success=n_f >= min_inliers, s=s_f, R=R_f, t=t_f,
                      inliers=inl_f, n_inliers=n_f)
