"""PnP RANSAC: camera pose from 3D-2D correspondences (relocalization).

TPU-native replacement for the reference's MLPnPsolver
(reference: src/MLPnPsolver.cpp (1745 LoC) — maximum-likelihood PnP with RANSAC,
min set 6, 300 iterations, used by Tracking::Relocalization
src/Tracking.cc:4507-4516; the EPnP variant src/PnPsolver.cc is dead code).

Design: every RANSAC hypothesis solves the 6-point DLT (P = [R|t] up to scale
from a [12] nullspace) — all 300 hypotheses batched in one vmap — followed by
orthogonal Procrustes projection onto SE(3) and a motion-only LM polish on the
winning consensus set (the reference polishes with PoseOptimization too).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import lie, cameras
from . import pose_opt, robust


class PnPResult(NamedTuple):
    success: jnp.ndarray
    R_cw: jnp.ndarray
    t_cw: jnp.ndarray
    inliers: jnp.ndarray
    n_inliers: jnp.ndarray


def _dlt_pose(X: jnp.ndarray, x_norm: jnp.ndarray):
    """6+ point DLT: solve P [3,4] from X [M,3] -> x_norm [M,2] (z=1 coords),
    then project onto SE(3)."""
    M = X.shape[0]
    Xh = jnp.concatenate([X, jnp.ones((M, 1))], axis=1)          # [M,4]
    zero = jnp.zeros((M, 4))
    u = x_norm[:, 0:1]
    v = x_norm[:, 1:2]
    rows_u = jnp.concatenate([Xh, zero, -u * Xh], axis=1)        # [M,12]
    rows_v = jnp.concatenate([zero, Xh, -v * Xh], axis=1)
    A = jnp.concatenate([rows_u, rows_v], axis=0)                # [2M,12]
    _, _, Vt = jnp.linalg.svd(A, full_matrices=False)
    P = Vt[11].reshape(3, 4)
    Rr = P[:, :3]
    # Procrustes onto SO(3); fix sign so depths are positive.
    U, S, Vt2 = jnp.linalg.svd(Rr)
    det = jnp.linalg.det(U @ Vt2)
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0]))
    R = U @ jnp.diag(jnp.array([1.0, 1.0, 1.0]).at[2].set(det)) @ Vt2
    scale = jnp.sum(S * jnp.array([1.0, 1.0, det])) / 3.0
    t = P[:, 3] / jnp.where(jnp.abs(scale) < 1e-12, 1e-12, scale)
    # Resolve the global sign with cheirality on the first point.
    z0 = (R @ X[0] + t)[2]
    flip = z0 < 0
    R = jnp.where(flip, -R, R)
    t = jnp.where(flip, -t, t)
    # -R is not a rotation (det=-1): re-project onto SO(3).
    R = lie.normalize_rotation(R)
    return R, t


@functools.partial(jax.jit, static_argnames=("cam_kind", "n_hyp"))
def pnp_ransac(Xw, uv, valid, cam_params, key,
               cam_kind: int = cameras.PINHOLE,
               n_hyp: int = 300, min_inliers: int = 10,
               chi2_px: float = robust.CHI2_MONO * 2) -> PnPResult:
    """RANSAC DLT-PnP + LM polish (reference protocol: 300 iters, min set 6,
    accept >= min inliers; Tracking then runs PoseOptimization)."""
    M = Xw.shape[0]
    p = valid.astype(jnp.float32) / jnp.maximum(jnp.sum(valid), 1)
    samples = jax.random.choice(key, M, shape=(n_hyp, 6), replace=True, p=p)

    # Normalized image coords for the DLT.
    rays = cameras.unproject(cam_kind, cam_params, uv)
    x_norm = rays[:, :2] / rays[:, 2:]

    def hyp(sample):
        R, t = _dlt_pose(Xw[sample], x_norm[sample])
        uv_hat = cameras.project(cam_kind, cam_params,
                                 lie.se3_apply(R, t, Xw))
        e2 = jnp.sum((uv_hat - uv) ** 2, axis=-1)
        depth = lie.se3_apply(R, t, Xw)[:, 2]
        inl = (e2 < chi2_px) & valid & (depth > 0.05)
        return jnp.sum(inl), R, t, inl

    n_inl, Rs, ts, inls = jax.vmap(hyp)(samples)
    best = jnp.argmax(n_inl)
    R0, t0 = Rs[best], ts[best]
    # LM polish on the full set gated by the consensus inliers.
    res = pose_opt.pose_optimization(R0, t0, Xw, uv, inls[best], cam_params,
                                     cam_kind=cam_kind)
    return PnPResult(success=res.n_inliers >= min_inliers,
                     R_cw=res.R_cw, t_cw=res.t_cw,
                     inliers=res.inliers, n_inliers=res.n_inliers)
