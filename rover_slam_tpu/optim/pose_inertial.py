"""Motion-only visual-inertial pose optimization with a recursive marginal
prior — per-frame VI tracking.

TPU-native replacement for Optimizer::PoseInertialOptimizationLastKeyFrame
(src/Optimizer.cc:416) and ...LastFrame (:983) with the ConstraintPoseImu /
EdgePriorPoseImu 15-dim marginalized prior chain (include/G2oTypes.h:820-891).

The reference optimizes the current frame's 15-dof state [pose(6), v(3),
bg(3), ba(3)] against (a) monocular reprojection edges with FIXED landmarks
(EdgeMonoOnlyPose), (b) one EdgeInertial to an anchor (last KF or last frame),
(c) EdgeGyroRW/EdgeAccRW bias random-walk edges to the anchor, and (d) for the
LastFrame variant a 15-dim prior on the anchor from the previous frame's
marginalization. After convergence it builds the full Hessian and
Schur-marginalizes the anchor out, producing the prior for the next frame
(recursive frame-to-frame marginalization).

Here the whole thing is ONE jitted program: a 30-dim (anchor 15 + frame 15)
damped Gauss-Newton with all M reprojection edges evaluated in parallel,
4 rounds with the reference's escalating chi2 gates {12, 7.5, 5.991, 5.991}
(src/Optimizer.cc:692) re-classifying outliers between rounds, and a final
Schur marginalization returning the 15x15 prior Hessian.

State perturbation per node: x = [dtheta(3), dp(3), dv(3), dbg(3), dba(3)],
left-multiplicative on R (R <- exp(dtheta) R), matching optim.vi_ba.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import lie, cameras
from . import blockinv, robust
from .vi_ba import _inertial_residual, _huber

# Reference escalating mono chi2 gates per round (src/Optimizer.cc:692).
CHI2_ROUNDS = (12.0, 7.5, 5.991, 5.991)


class PoseInertialProblem(NamedTuple):
    # Anchor body state (last KF or last frame).
    R_wb0: jnp.ndarray   # [3,3]
    p_wb0: jnp.ndarray   # [3]
    v_wb0: jnp.ndarray   # [3]
    bg0: jnp.ndarray     # [3]
    ba0: jnp.ndarray     # [3]
    # Current frame body state (initial estimate, e.g. IMU prediction).
    R_wb1: jnp.ndarray
    p_wb1: jnp.ndarray
    v_wb1: jnp.ndarray
    bg1: jnp.ndarray
    ba1: jnp.ndarray
    # 15-dim prior on the ANCHOR (EdgePriorPoseImu). The anchor state above is
    # the prior mean, so the prior residual at x_a=0 is zero and J=I.
    prior_H: jnp.ndarray      # [15,15] information
    prior_valid: jnp.ndarray  # scalar bool
    # Preintegration anchor -> frame (EdgeInertial).
    imu_dR: jnp.ndarray   # [3,3]
    imu_dV: jnp.ndarray   # [3]
    imu_dP: jnp.ndarray
    imu_JRg: jnp.ndarray  # [3,3]
    imu_JVg: jnp.ndarray
    imu_JVa: jnp.ndarray
    imu_JPg: jnp.ndarray
    imu_JPa: jnp.ndarray
    imu_dt: jnp.ndarray   # scalar
    imu_bg0: jnp.ndarray  # [3] preintegration linearization biases
    imu_ba0: jnp.ndarray
    imu_info: jnp.ndarray  # [9,9]
    walk_info: jnp.ndarray  # [6] diag info of gyro+acc random walk over dt
    # Visual edges: FIXED landmarks observed by the current frame.
    Xw: jnp.ndarray       # [M,3]
    uv: jnp.ndarray       # [M,2]
    e_valid: jnp.ndarray  # [M] bool
    e_info: jnp.ndarray   # [M] inverse measurement variance
    # Extrinsics / intrinsics.
    R_cb: jnp.ndarray     # [3,3] body->camera
    t_cb: jnp.ndarray     # [3]
    cam_params: jnp.ndarray
    # Stereo observations (EdgeStereoOnlyPose, include/G2oTypes.h:543; see
    # optim.ba.BAProblem.e_invd for the residual form).
    invd: jnp.ndarray = None   # [M] inverse depth (<=0 = mono edge)
    bf: jnp.ndarray = None


class PoseInertialResult(NamedTuple):
    R_wb: jnp.ndarray
    p_wb: jnp.ndarray
    v_wb: jnp.ndarray
    bg: jnp.ndarray
    ba: jnp.ndarray
    # Updated anchor state (LastFrame mode moves the anchor; LastKeyFrame
    # mode returns it unchanged).
    R_wb0: jnp.ndarray
    p_wb0: jnp.ndarray
    v_wb0: jnp.ndarray
    bg0: jnp.ndarray
    ba0: jnp.ndarray
    inliers: jnp.ndarray    # [M] bool
    n_inliers: jnp.ndarray
    marg_H: jnp.ndarray     # [15,15] marginal prior for the NEXT frame
    # Camera pose of the optimized frame (T_cw), for convenience.
    R_cw: jnp.ndarray
    t_cw: jnp.ndarray


def _reproj_frame(prob: PoseInertialProblem, cam_kind, R_wb, p_wb):
    """Residual + Jacobian of all visual edges wrt the frame pose [th(3),p(3)]
    (EdgeMonoOnlyPose, include/G2oTypes.h:457 — landmarks are constants)."""
    y = prob.Xw - p_wb[None, :]
    Xb = jnp.einsum("ji,ej->ei", R_wb, y)
    Xc = jnp.einsum("ij,ej->ei", prob.R_cb, Xb) + prob.t_cb
    uv_hat = cameras.project(cam_kind, prob.cam_params, Xc)
    e = prob.uv - uv_hat
    Jp = cameras.project_jac(cam_kind, prob.cam_params, Xc)  # [M,2,3]
    G = -Jp                                                  # de/dXc
    if prob.invd is not None and prob.bf is not None:
        # Stereo third row (see optim.ba._edge_terms for the formulation).
        z = jnp.maximum(Xc[..., 2], 1e-6)
        has3 = (prob.invd > 0).astype(jnp.float32)
        rect = 1.0 if cam_kind == cameras.PINHOLE else 0.0
        # r3 = u_R_meas - u_R_hat = e_u - bf*(invd - 1/z) (see ba._edge_terms)
        r3 = rect * e[:, 0] - prob.bf * (prob.invd - 1.0 / z)
        ez = jnp.zeros_like(G[:, :1, :]).at[:, 0, 2].set(prob.bf / (z * z))
        G3 = rect * G[:, :1, :] - ez
        e = jnp.concatenate([e, (has3 * r3)[:, None]], axis=1)
        G = jnp.concatenate([G, has3[:, None, None] * G3], axis=1)
    M3 = prob.R_cb @ R_wb.T                                  # dXc/dXw
    # Left perturbation R <- exp(th) R: dXc/dth = M3 hat(y), dXc/dp = -M3.
    J_p = -jnp.einsum("eij,jk->eik", G, M3)                  # dr/dp
    J_th = jnp.einsum("eij,jk,ekl->eil", G, M3, lie.so3_hat(y))
    J6 = jnp.concatenate([J_th, J_p], axis=-1)               # [M,D,6]
    return e, J6, Xc[..., 2]


@functools.partial(jax.jit, static_argnames=("cam_kind", "anchor_fixed",
                                             "rounds", "iters_per_round"))
def solve_pose_inertial(prob: PoseInertialProblem,
                        cam_kind: int = cameras.PINHOLE,
                        anchor_fixed: bool = True,
                        rounds: int = 4, iters_per_round: int = 4,
                        ) -> PoseInertialResult:
    """anchor_fixed=True  -> PoseInertialOptimizationLastKeyFrame semantics
    (anchor KF fixed, no prior edge used).
    anchor_fixed=False -> ...LastFrame (anchor variable under prior_H,
    marginalized out at the end)."""
    M = prob.Xw.shape[0]
    D = 15
    zero15 = jnp.zeros(D)
    gates = jnp.asarray(CHI2_ROUNDS[:rounds] + CHI2_ROUNDS[-1:] *
                        max(0, rounds - len(CHI2_ROUNDS)), jnp.float32)

    imu_args = (prob.imu_dR, prob.imu_dV, prob.imu_dP, prob.imu_JRg,
                prob.imu_JVg, prob.imu_JVa, prob.imu_JPg, prob.imu_JPa,
                prob.imu_dt, prob.imu_bg0, prob.imu_ba0)

    def inertial_terms(Ra, pa, va, bga, baa, Rf, pf, vf):
        r = _inertial_residual(zero15, zero15, Ra, pa, va, bga, baa,
                               Rf, pf, vf, *imu_args)
        Ja = jax.jacfwd(_inertial_residual, argnums=0)(
            zero15, zero15, Ra, pa, va, bga, baa, Rf, pf, vf, *imu_args)
        Jf = jax.jacfwd(_inertial_residual, argnums=1)(
            zero15, zero15, Ra, pa, va, bga, baa, Rf, pf, vf, *imu_args)
        return r, Ja, Jf

    def linearize(x, inlier_mask, delta2, use_kernel):
        """Full 30x30 system at the current states. x = 10-tuple of states."""
        Ra, pa, va, bga, baa, Rf, pf, vf, bgf, baf = x
        H = jnp.zeros((2, D, 2, D))
        g = jnp.zeros((2, D))

        # Visual edges on the frame pose block [0:6] of node 1.
        e, J6, depth = _reproj_frame(prob, cam_kind, Rf, pf)
        chi2 = jnp.sum(e * e, axis=-1) * prob.e_info
        huber_d2 = robust.CHI2_MONO
        if prob.invd is not None:
            huber_d2 = jnp.where(prob.invd > 0, robust.CHI2_STEREO, huber_d2)
        w = jnp.where(use_kernel,
                      robust.huber_weight(chi2, huber_d2), 1.0)
        w = w * prob.e_info * inlier_mask * prob.e_valid * (depth > 0.05)
        Jv = jnp.concatenate([J6, jnp.zeros(J6.shape[:2] + (9,))], axis=-1)
        wJv = Jv * w[:, None, None]
        H = H.at[1, :, 1, :].add(jnp.einsum("eki,ekj->ij", wJv, Jv))
        g = g.at[1].add(jnp.einsum("eki,ek->i", wJv, e))

        # Inertial edge anchor(0) -> frame(1).
        ri, Ja, Jf = inertial_terms(Ra, pa, va, bga, baa, Rf, pf, vf)
        JaT_I = Ja.T @ prob.imu_info
        JfT_I = Jf.T @ prob.imu_info
        H = H.at[0, :, 0, :].add(JaT_I @ Ja)
        H = H.at[1, :, 1, :].add(JfT_I @ Jf)
        H = H.at[0, :, 1, :].add(JaT_I @ Jf)
        H = H.at[1, :, 0, :].add(JfT_I @ Ja)
        g = g.at[0].add(JaT_I @ ri)
        g = g.at[1].add(JfT_I @ ri)

        # Bias random walk anchor -> frame (EdgeGyroRW/EdgeAccRW).
        rb = jnp.concatenate([bgf - bga, baf - baa])
        Wb = jnp.diag(prob.walk_info)
        sl = slice(9, 15)
        H = H.at[0, sl, 0, sl].add(Wb)
        H = H.at[1, sl, 1, sl].add(Wb)
        H = H.at[0, sl, 1, sl].add(-Wb)
        H = H.at[1, sl, 0, sl].add(-Wb)
        g = g.at[0, sl].add(-prob.walk_info * rb)
        g = g.at[1, sl].add(prob.walk_info * rb)

        # Prior on the anchor (residual 0 at linearization, J = I).
        pw = jnp.where(prob.prior_valid, 1.0, 0.0)
        H = H.at[0, :, 0, :].add(pw * prob.prior_H)
        return H, g, chi2, depth

    def apply_step(x, dx):
        Ra, pa, va, bga, baa, Rf, pf, vf, bgf, baf = x
        da, df = dx[0], dx[1]
        Ra_ = lie.normalize_rotation(lie.so3_exp(da[0:3]) @ Ra)
        Rf_ = lie.normalize_rotation(lie.so3_exp(df[0:3]) @ Rf)
        return (Ra_, pa + da[3:6], va + da[6:9], bga + da[9:12],
                baa + da[12:15], Rf_, pf + df[3:6], vf + df[6:9],
                bgf + df[9:12], baf + df[12:15])

    def total_cost(x, inlier_mask, use_kernel):
        Ra, pa, va, bga, baa, Rf, pf, vf, bgf, baf = x
        e, _, depth = _reproj_frame(prob, cam_kind, Rf, pf)
        chi2 = jnp.sum(e * e, axis=-1) * prob.e_info
        m = inlier_mask * prob.e_valid * (depth > 0.05)
        c_vis = jnp.sum(jnp.where(use_kernel,
                                  _huber(chi2, robust.CHI2_MONO), chi2) * m)
        ri = _inertial_residual(zero15, zero15, Ra, pa, va, bga, baa,
                                Rf, pf, vf, *imu_args)
        c_imu = ri @ prob.imu_info @ ri
        rb = jnp.concatenate([bgf - bga, baf - baa])
        c_b = jnp.sum(prob.walk_info * rb * rb)
        return c_vis + c_imu + c_b

    def lm_round(carry, round_idx):
        x, inlier_mask = carry
        use_kernel = round_idx < rounds - 1
        delta2 = gates[round_idx]

        def lm_iter(carry2, _):
            x, lam = carry2
            H, g, _, _ = linearize(x, inlier_mask, delta2, use_kernel)
            Hm = H.reshape(2 * D, 2 * D)
            gm = g.reshape(2 * D)
            if anchor_fixed:
                fixm = jnp.arange(2 * D) < D
                Hm = jnp.where(fixm[:, None] | fixm[None, :], 0.0, Hm)
                Hm = Hm + jnp.diag(jnp.where(fixm, 1.0, 0.0))
                gm = jnp.where(fixm, 0.0, gm)
            dcc = jnp.diagonal(Hm)
            Hd = Hm + jnp.diag(lam * jnp.maximum(dcc, 1e-8)) \
                + 1e-8 * jnp.eye(2 * D)
            # Jacobi equilibration for the f32 solve (info scales span ~1e10).
            d_eq = jnp.sqrt(jnp.maximum(jnp.diagonal(Hd), 1e-12))
            # Closed-form recursive 30x30 solve (blockinv.py): this runs per
            # LM iteration per FRAME in inertial mode; jnp.linalg.solve is a
            # sequential LAPACK loop on TPU.
            y = blockinv.solven(Hd / d_eq[:, None] / d_eq[None, :],
                                -(gm / d_eq))
            dx = (y / d_eq).reshape(2, D)
            if anchor_fixed:
                dx = dx.at[0].set(0.0)
            x_new = apply_step(x, dx)
            c_old = total_cost(x, inlier_mask, use_kernel)
            c_new = total_cost(x_new, inlier_mask, use_kernel)
            ok = c_new < c_old
            x = jax.tree_util.tree_map(
                lambda n, o: jnp.where(ok, n, o), x_new, x)
            lam = jnp.clip(jnp.where(ok, lam * 0.3, lam * 5.0), 1e-8, 1e4)
            return (x, lam), None

        (x, _), _ = jax.lax.scan(lm_iter, (x, jnp.float32(1e-4)),
                                 None, length=iters_per_round)
        # Re-classify outliers with this round's chi2 gate (stereo edges get
        # the 3-dof gate scaled up, reference {15.6, 9.8, 7.815, 7.815}).
        Rf, pf = x[5], x[6]
        e, _, depth = _reproj_frame(prob, cam_kind, Rf, pf)
        chi2 = jnp.sum(e * e, axis=-1) * prob.e_info
        gate = delta2
        if prob.invd is not None:
            gate = delta2 * jnp.where(
                prob.invd > 0, robust.CHI2_STEREO / robust.CHI2_MONO, 1.0)
        inlier_mask = ((chi2 <= gate) & (depth > 0.05)).astype(jnp.float32)
        return (x, inlier_mask), None

    x0 = (prob.R_wb0, prob.p_wb0, prob.v_wb0, prob.bg0, prob.ba0,
          prob.R_wb1, prob.p_wb1, prob.v_wb1, prob.bg1, prob.ba1)
    (x, inlier_mask), _ = jax.lax.scan(lm_round, (x0, jnp.ones(M)),
                                       jnp.arange(rounds))

    # ---- marginalization: prior for the next frame ----
    # Kernel-off Hessian at the solution over the final inliers
    # (reference builds H from inlier edges after round 4, then
    # Marginalize(anchor) -> ConstraintPoseImu, src/Optimizer.cc:890-980).
    H, _, _, _ = linearize(x, inlier_mask, gates[-1], False)
    H_ff = H[1, :, 1, :]
    if anchor_fixed:
        marg = H_ff
    else:
        # Jacobi-equilibrate before the unpivoted recursive inverse: the
        # information scales here span ~1e10 (see gate weights above) and
        # invn loses significant digits on that spread without it — the
        # same treatment the LM-step path applies (advisor finding).
        H_aa = H[0, :, 0, :] + 1e-6 * jnp.eye(D)
        H_fa = H[1, :, 0, :]
        d_eq = jnp.sqrt(jnp.maximum(jnp.diagonal(H_aa), 1e-12))
        H_aa_e = H_aa / d_eq[:, None] / d_eq[None, :]
        H_fa_e = H_fa / d_eq[None, :]
        marg = H_ff - H_fa_e @ blockinv.invn(
            H_aa_e + 1e-9 * jnp.eye(D)) @ H_fa_e.T
    marg = 0.5 * (marg + marg.T)

    Ra, pa, va, bga, baa, Rf, pf, vf, bgf, baf = x
    inliers = (inlier_mask > 0) & prob.e_valid
    R_cw = prob.R_cb @ Rf.T
    t_cw = -R_cw @ pf + prob.t_cb
    return PoseInertialResult(
        R_wb=Rf, p_wb=pf, v_wb=vf, bg=bgf, ba=baf,
        R_wb0=Ra, p_wb0=pa, v_wb0=va, bg0=bga, ba0=baa,
        inliers=inliers, n_inliers=jnp.sum(inliers.astype(jnp.int32)),
        marg_H=marg, R_cw=R_cw, t_cw=t_cw)
