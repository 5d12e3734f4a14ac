"""Motion-only pose optimization: batched Levenberg-Marquardt on SE(3).

TPU-native replacement for Optimizer::PoseOptimization
(reference: src/Optimizer.cc:55-415 — g2o BlockSolver_6_3 + dense solve + LM;
4 rounds x 10 iterations with chi2 outlier re-classification between rounds,
Huber sqrt(5.991) mono, kernel disabled in the last round).

Here the whole thing is ONE jitted program: residuals/Jacobians for all M
correspondences are computed in parallel, the 6x6 normal equations are reduced
with one contraction, and rounds/iterations are `lax.fori_loop`s. Outliers are a
soft mask recomputed between rounds exactly like the reference.

Perturbation convention: left-multiplicative, T_cw <- exp([rho, phi]) * T_cw.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import lie, cameras
from . import robust
from .blockinv import solve6


class PoseOptResult(NamedTuple):
    R_cw: jnp.ndarray
    t_cw: jnp.ndarray
    inliers: jnp.ndarray   # [M] bool
    n_inliers: jnp.ndarray
    chi2: jnp.ndarray      # final per-edge chi2


def _residual_jac(R, t, cam_kind, cam_params, Xw, uv, invd=None, bf=None):
    """Per-edge residual e = uv - proj(Xc) and Jacobian wrt [rho, phi] (left
    pert). With stereo observations (invd [M] inverse depth, bf scalar) a
    third residual row is added — the reference's EdgeStereoSE3ProjectXYZ
    OnlyPose u_R component (include/G2oTypes.h:543; see optim.ba._edge_terms
    for the formulation) — masked to zero where invd<=0.

    Returns e [M,D], J [M,D,6], depth [M] (D=2 mono / 3 stereo).
    """
    Xc = lie.se3_apply(R, t, Xw)
    uv_hat = cameras.project(cam_kind, cam_params, Xc)
    e = uv - uv_hat
    Jproj = cameras.project_jac(cam_kind, cam_params, Xc)  # [M,2,3]
    G = -Jproj                                             # de/dXc
    if invd is not None and bf is not None:
        z = jnp.maximum(Xc[..., 2], 1e-6)
        has3 = (invd > 0).astype(jnp.float32)
        rect = 1.0 if cam_kind == cameras.PINHOLE else 0.0
        # r3 = u_R_meas - u_R_hat = e_u - bf*(invd - 1/z) (see ba._edge_terms)
        r3 = rect * e[:, 0] - bf * (invd - 1.0 / z)
        ez = jnp.zeros_like(G[:, :1, :]).at[:, 0, 2].set(bf / (z * z))
        G3 = rect * G[:, :1, :] - ez
        e = jnp.concatenate([e, (has3 * r3)[:, None]], axis=1)
        G = jnp.concatenate([G, has3[:, None, None] * G3], axis=1)
    # dXc/d(rho) = I ; dXc/d(phi) = -hat(Xc)
    hatX = lie.so3_hat(Xc)  # [M,3,3]
    J = jnp.concatenate([G, -jnp.einsum("mij,mjk->mik", G, hatX)], axis=-1)
    return e, J, Xc[..., 2]


@functools.partial(jax.jit, static_argnames=("cam_kind", "rounds",
                                             "iters_per_round", "check_cost"))
def pose_optimization(R_cw, t_cw, Xw, uv, valid, cam_params,
                      cam_kind: int = cameras.PINHOLE,
                      info: jnp.ndarray | None = None,
                      rounds: int = 4, iters_per_round: int = 10,
                      chi2_th: float = robust.CHI2_MONO,
                      check_cost: bool = True,
                      invd: jnp.ndarray | None = None,
                      bf: jnp.ndarray | None = None) -> PoseOptResult:
    """Optimize one camera pose against fixed landmarks.

    Xw [M,3], uv [M,2], valid [M] bool; info [M] inverse measurement variance
    (reference invSigma2; 1.0 at the single scale level used).
    check_cost=False runs plain damped GN (no accept/reject second evaluation)
    — half the residual evaluations; fine when the prior is good (per-frame
    tracking with a motion-model/IMU prediction).
    invd/bf: optional stereo observations — keypoints with invd>0 contribute
    3-dim stereo edges with the 7.815 chi2 gate (reference
    EdgeStereoSE3ProjectXYZOnlyPose, src/Optimizer.cc:160-230).
    """
    M = Xw.shape[0]
    if info is None:
        info = jnp.ones((M,), jnp.float32)

    # Huber delta^2 == chi2 gate, per edge when stereo rows are present
    # (reference uses sqrt(5.991) mono / sqrt(7.815) stereo).
    if invd is not None and bf is not None:
        delta2 = jnp.where(invd > 0, robust.CHI2_STEREO, chi2_th)
    else:
        delta2 = chi2_th

    def lm_round(carry, round_idx):
        R, t, inlier_mask = carry
        use_kernel = round_idx < rounds - 1  # kernel off in last round

        def lm_iter(carry2, _):
            R, t, lam = carry2
            e, J, depth = _residual_jac(R, t, cam_kind, cam_params, Xw, uv,
                                        invd, bf)
            chi2 = jnp.sum(e * e, axis=-1) * info
            w = jnp.where(use_kernel, robust.huber_weight(chi2, delta2), 1.0)
            w = w * info * inlier_mask * valid * (depth > 0)
            H = jnp.einsum("mki,m,mkj->ij", J, w, J)
            b = jnp.einsum("mki,m,mk->i", J, w, e)
            # note: e = uv - proj, J = d e / d xi, normal eq: H dx = -J^T W e_res
            # with our sign (e is residual, J its Jacobian): solve H dx = -b_grad
            # where gradient of 0.5 sum w e^2 is J^T w e = b. Step dx = -H^{-1} b.
            Hd = H + lam * jnp.diag(jnp.diag(H)) + 1e-9 * jnp.eye(6)
            # Closed-form 6x6 solve: jnp.linalg.solve lowers to a sequential
            # LAPACK loop on TPU — fatal inside this 40-iteration-per-frame
            # scan (blockinv.py).
            dx = -solve6(Hd, b)
            # A degenerate system (e.g. zero inliers while lost) must not
            # poison the pose with non-finite values — they would propagate
            # through the motion model into every subsequent prediction.
            dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
            dR, dt = lie.se3_exp(dx)
            R_new = lie.normalize_rotation(dR @ R)
            t_new = dR @ t + dt
            if check_cost:
                # Accept if cost decreased.
                e_new, _, d_new = _residual_jac(R_new, t_new, cam_kind,
                                                cam_params, Xw, uv, invd, bf)
                chi2_new = jnp.sum(e_new * e_new, axis=-1) * info
                mask_eff = inlier_mask * valid
                cost_old = jnp.sum(jnp.where(use_kernel,
                                             _huber_cost(chi2, delta2),
                                             chi2) * mask_eff)
                cost_new = jnp.sum(jnp.where(use_kernel,
                                             _huber_cost(chi2_new, delta2),
                                             chi2_new) * mask_eff)
                improved = cost_new < cost_old
                R = jnp.where(improved, R_new, R)
                t = jnp.where(improved, t_new, t)
                lam = jnp.where(improved, lam * 0.5, lam * 4.0)
                lam = jnp.clip(lam, 1e-8, 1e6)
            else:
                R, t = R_new, t_new
            return (R, t, lam), None

        (R, t, _), _ = jax.lax.scan(lm_iter, (R, t, jnp.float32(1e-3)),
                                    None, length=iters_per_round)
        # Re-classify inliers by chi2 (reference :306-410).
        e, _, depth = _residual_jac(R, t, cam_kind, cam_params, Xw, uv,
                                    invd, bf)
        chi2 = jnp.sum(e * e, axis=-1) * info
        inlier_mask = ((chi2 <= delta2) & (depth > 0)).astype(jnp.float32)
        return (R, t, inlier_mask), chi2

    init = (R_cw, t_cw, jnp.ones((M,), jnp.float32))
    (R, t, inlier_mask), chi2s = jax.lax.scan(lm_round, init, jnp.arange(rounds))
    inliers = (inlier_mask > 0) & valid
    return PoseOptResult(R_cw=R, t_cw=t, inliers=inliers,
                         n_inliers=jnp.sum(inliers.astype(jnp.int32)),
                         chi2=chi2s[-1])


def _huber_cost(chi2, delta2):
    delta = jnp.sqrt(delta2)
    r = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    return jnp.where(chi2 <= delta2, chi2, 2.0 * delta * r - delta2)
