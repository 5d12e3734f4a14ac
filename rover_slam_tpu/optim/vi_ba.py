"""Visual-inertial bundle adjustment: body poses + velocities + biases +
landmarks with preintegrated IMU factors.

TPU-native replacement for Optimizer::LocalInertialBA / FullInertialBA
(reference: src/Optimizer.cc:2203-2812 — temporal window of VertexPose/
VertexVelocity/VertexGyroBias/VertexAccBias per KF, EdgeMono reprojection with
Tbc-composed projection, EdgeInertial 9-dim preintegration residual between
consecutive KFs, EdgeGyroRW/EdgeAccRW bias random-walk edges; G2oTypes.h:576
EdgeInertial::computeError for the exact residual).

State per keyframe: 15 dof [dtheta(3), dp(3), dv(3), dbg(3), dba(3)], left
perturbation R <- exp(dtheta) R. Landmarks are Schur-eliminated exactly as in
optim.ba; the reduced body system (15K x 15K, K <= ~25 for the reference's
temporal windows) is one dense Cholesky on the MXU. Inertial and bias-walk
edge Jacobians come from forward-mode autodiff of the residual (the blocks are
9x30 — tiny), reprojection Jacobians are analytic.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import lie, cameras
from ..imu import preintegration as preint
from . import blockinv, robust


class VIBAProblem(NamedTuple):
    # Body states (window of Kw keyframes, temporally ordered).
    R_wb: jnp.ndarray       # [Kw,3,3] body->world
    p_wb: jnp.ndarray       # [Kw,3]
    v_wb: jnp.ndarray       # [Kw,3]
    bg: jnp.ndarray         # [Kw,3]
    ba: jnp.ndarray         # [Kw,3]
    pose_opt_mask: jnp.ndarray  # [Kw]
    kf_valid: jnp.ndarray   # [Kw] real window slots
    # Camera extrinsics (body->camera) and intrinsics.
    R_cb: jnp.ndarray       # [3,3]
    t_cb: jnp.ndarray       # [3]
    cam_params: jnp.ndarray
    # Preintegration between consecutive window KFs (slot i links i -> i+1).
    imu_dR: jnp.ndarray     # [Kw,3,3]
    imu_dV: jnp.ndarray     # [Kw,3]
    imu_dP: jnp.ndarray     # [Kw,3]
    imu_JRg: jnp.ndarray    # [Kw,3,3]
    imu_JVg: jnp.ndarray
    imu_JVa: jnp.ndarray
    imu_JPg: jnp.ndarray
    imu_JPa: jnp.ndarray
    imu_dt: jnp.ndarray     # [Kw]
    imu_bg0: jnp.ndarray    # [Kw,3] linearization biases of the preintegration
    imu_ba0: jnp.ndarray
    imu_info: jnp.ndarray   # [Kw,9,9]
    imu_valid: jnp.ndarray  # [Kw] (last slot invalid)
    walk_info: jnp.ndarray  # [6] diagonal info of gyro+acc random walk
    # Landmarks + reprojection edges.
    lm_pos: jnp.ndarray     # [Lw,3]
    lm_opt_mask: jnp.ndarray
    e_kf: jnp.ndarray       # [E]
    e_lm: jnp.ndarray
    e_uv: jnp.ndarray
    e_valid: jnp.ndarray
    e_info: jnp.ndarray
    # Stereo observations (see optim.ba.BAProblem.e_invd): 3-dim stereo
    # reprojection edges with chi2 7.815 (reference EdgeStereo,
    # include/G2oTypes.h:497).
    e_invd: jnp.ndarray = None
    bf: jnp.ndarray = None


GRAVITY = preint.GRAVITY_VEC


def _inertial_residual(x_i, x_j, Ri, pi, vi, bgi, bai, Rj, pj, vj,
                       dR, dV, dP, JRg, JVg, JVa, JPg, JPa, dt, bg0, ba0):
    """9-dim preintegration residual with perturbations x = [th,p,v,bg,ba]
    applied to both endpoints (reference EdgeInertial::computeError,
    include/G2oTypes.h:576)."""
    thi, dpi, dvi, dbgi, dbai = (x_i[0:3], x_i[3:6], x_i[6:9], x_i[9:12],
                                 x_i[12:15])
    thj, dpj, dvj = x_j[0:3], x_j[3:6], x_j[6:9]
    Ri_ = lie.so3_exp(thi) @ Ri
    Rj_ = lie.so3_exp(thj) @ Rj
    pi_, pj_ = pi + dpi, pj + dpj
    vi_, vj_ = vi + dvi, vj + dvj
    bg = bgi + dbgi
    ba = bai + dbai

    dbg = bg - bg0
    dba = ba - ba0
    dR_c = dR @ lie.so3_exp(JRg @ dbg)
    dV_c = dV + JVg @ dbg + JVa @ dba
    dP_c = dP + JPg @ dbg + JPa @ dba

    g = GRAVITY
    er = lie.so3_log(dR_c.T @ Ri_.T @ Rj_)
    ev = Ri_.T @ (vj_ - vi_ - g * dt) - dV_c
    ep = Ri_.T @ (pj_ - pi_ - vi_ * dt - 0.5 * g * dt * dt) - dP_c
    return jnp.concatenate([er, ev, ep])


def _reproj_terms(prob: VIBAProblem, cam_kind, R_wb, p_wb, X):
    """Reprojection residual/Jacobians wrt body pose [th(3), p(3)] and landmark."""
    Rk = R_wb[prob.e_kf]
    pk = p_wb[prob.e_kf]
    Xe = X[prob.e_lm]
    # camera point: Xc = R_cb (R_wb^T (Xw - p_wb)) + t_cb
    Xb = jnp.einsum("eji,ej->ei", Rk, Xe - pk)
    Xc = jnp.einsum("ij,ej->ei", prob.R_cb, Xb) + prob.t_cb
    uv_hat = cameras.project(cam_kind, prob.cam_params, Xc)
    e = prob.e_uv - uv_hat
    Jp = cameras.project_jac(cam_kind, prob.cam_params, Xc)   # [E,2,3]
    G = -Jp                                                   # de/dXc
    if prob.e_invd is not None and prob.bf is not None:
        # Third (stereo) residual row — see optim.ba._edge_terms.
        z = jnp.maximum(Xc[..., 2], 1e-6)
        has3 = (prob.e_invd > 0).astype(jnp.float32)
        rect = 1.0 if cam_kind == cameras.PINHOLE else 0.0
        # r3 = u_R_meas - u_R_hat = e_u - bf*(invd - 1/z) (see ba._edge_terms)
        r3 = rect * e[:, 0] - prob.bf * (prob.e_invd - 1.0 / z)
        ez = jnp.zeros_like(G[:, :1, :]).at[:, 0, 2].set(prob.bf / (z * z))
        G3 = rect * G[:, :1, :] - ez
        e = jnp.concatenate([e, (has3 * r3)[:, None]], axis=1)
        G = jnp.concatenate([G, has3[:, None, None] * G3], axis=1)
    # dXc/dXw = R_cb R_wb^T ; dXc/dp = -R_cb R_wb^T
    # dXc/dth (left pert on R_wb: R<-exp(th)R): Xb = (exp(th)R)^T(X-p)
    #   = R^T exp(-th) (X-p) ~ R^T (I - hat(th)) (X-p)
    #   dXb/dth = R^T hat(X-p) ... d(-hat(th)(X-p))/dth = +hat(X-p)
    # With e = uv - proj(Xc): de/dq = -Jp dXc/dq.
    #   dXc/dXw = R_cb R_wb^T = M;  dXc/dp = -M
    #   dXc/dth (R_wb <- exp(th) R_wb): Xb = R^T exp(-th)(Xw-p)
    #     ~ R^T (y + hat(y) th), y = Xw - p  =>  dXc/dth = M hat(y)
    M = jnp.einsum("ij,ekj->eik", prob.R_cb, Rk)              # [E,3,3] R_cb R^T
    J_X = jnp.einsum("eij,ejk->eik", G, M)                    # dr/dXw
    J_p = -J_X                                                # dr/dp
    hat_d = lie.so3_hat(Xe - pk)
    J_th = jnp.einsum("eij,ejk,ekl->eil", G, M, hat_d)
    Jc = jnp.concatenate([J_th, J_p], axis=-1)                # [E,D,6]
    return e, Jc, J_X, Xc[..., 2]


@functools.partial(jax.jit, static_argnames=("cam_kind", "iters"))
def solve_vi_ba(prob: VIBAProblem, cam_kind: int = cameras.PINHOLE,
                iters: int = 8, chi2_th: float = robust.CHI2_MONO,
                lam0: float = 1e-3):
    """LM over [15*Kw body states + 3*Lw landmarks], landmarks Schur-eliminated."""
    Kw = prob.R_wb.shape[0]
    Lw = prob.lm_pos.shape[0]
    D = 15
    if prob.e_invd is not None:
        chi2_th = jnp.where(prob.e_invd > 0, robust.CHI2_STEREO, chi2_th)
    pmask = (prob.pose_opt_mask & prob.kf_valid).astype(jnp.float32)
    lmask = prob.lm_opt_mask.astype(jnp.float32)
    delta2 = chi2_th

    zero15 = jnp.zeros(D)
    imu_jac = jax.vmap(
        lambda Ri, pi, vi, bgi, bai, Rj, pj, vj, dR, dV, dP, JRg, JVg, JVa,
        JPg, JPa, dt, bg0, ba0: (
            _inertial_residual(zero15, zero15, Ri, pi, vi, bgi, bai, Rj, pj,
                               vj, dR, dV, dP, JRg, JVg, JVa, JPg, JPa, dt,
                               bg0, ba0),
            jax.jacfwd(_inertial_residual, argnums=0)(
                zero15, zero15, Ri, pi, vi, bgi, bai, Rj, pj, vj, dR, dV, dP,
                JRg, JVg, JVa, JPg, JPa, dt, bg0, ba0),
            jax.jacfwd(_inertial_residual, argnums=1)(
                zero15, zero15, Ri, pi, vi, bgi, bai, Rj, pj, vj, dR, dV, dP,
                JRg, JVg, JVa, JPg, JPa, dt, bg0, ba0),
        ))

    def lm_step(carry, _):
        R, p, v, bg, ba, X, lam, _ = carry

        # ---- reprojection terms ----
        e, Jc6, Jl, depth = _reproj_terms(prob, cam_kind, R, p, X)
        chi2 = jnp.sum(e * e, axis=-1) * prob.e_info
        w = (robust.huber_weight(chi2, delta2) * prob.e_info
             * prob.e_valid * (depth > 0.05))
        # Pad pose jacobian to 15 (zeros on v/bg/ba columns).
        Jc = jnp.concatenate([Jc6, jnp.zeros(Jc6.shape[:2] + (9,))], axis=-1)

        # ---- inertial terms (slot i links i -> i+1) ----
        idx_i = jnp.arange(Kw)
        idx_j = jnp.minimum(idx_i + 1, Kw - 1)
        ri, Ji, Jj = imu_jac(
            R[idx_i], p[idx_i], v[idx_i], bg[idx_i], ba[idx_i],
            R[idx_j], p[idx_j], v[idx_j],
            prob.imu_dR, prob.imu_dV, prob.imu_dP, prob.imu_JRg,
            prob.imu_JVg, prob.imu_JVa, prob.imu_JPg, prob.imu_JPa,
            prob.imu_dt, prob.imu_bg0, prob.imu_ba0)
        w_imu = prob.imu_valid.astype(jnp.float32)

        # ---- bias random walk (i -> i+1) ----
        rb = jnp.concatenate([bg[idx_j] - bg[idx_i], ba[idx_j] - ba[idx_i]],
                             axis=-1)                                # [Kw,6]

        # ---- assemble dense body system [Kw*15]^2 ----
        n = Kw * D
        H = jnp.zeros((Kw, D, Kw, D))
        g_vec = jnp.zeros((Kw, D))

        # reprojection into pose blocks
        wJc = Jc * w[:, None, None]
        H = H.at[prob.e_kf, :, prob.e_kf, :].add(
            jnp.einsum("eki,ekj->eij", wJc, Jc))
        g_vec = g_vec.at[prob.e_kf].add(jnp.einsum("eki,ek->ei", wJc, e))

        # inertial 9-dim edges
        info = prob.imu_info * w_imu[:, None, None]
        JiT_I = jnp.einsum("eki,ekl->eil", Ji, info)   # [Kw,15,9]
        JjT_I = jnp.einsum("eki,ekl->eil", Jj, info)
        H = H.at[idx_i, :, idx_i, :].add(jnp.einsum("eil,elj->eij", JiT_I, Ji))
        H = H.at[idx_j, :, idx_j, :].add(jnp.einsum("eil,elj->eij", JjT_I, Jj))
        H = H.at[idx_i, :, idx_j, :].add(jnp.einsum("eil,elj->eij", JiT_I, Jj))
        H = H.at[idx_j, :, idx_i, :].add(jnp.einsum("eil,elj->eij", JjT_I, Ji))
        g_vec = g_vec.at[idx_i].add(jnp.einsum("eil,el->ei", JiT_I, ri))
        g_vec = g_vec.at[idx_j].add(jnp.einsum("eil,el->ei", JjT_I, ri))

        # bias walk: J_i = -I on (bg,ba), J_j = +I
        wb = prob.walk_info[None, :] * w_imu[:, None]  # [Kw,6]
        Hbb = jax.vmap(jnp.diag)(wb)                   # [Kw,6,6]
        sl = slice(9, 15)
        H = H.at[idx_i, sl, idx_i, sl].add(Hbb)
        H = H.at[idx_j, sl, idx_j, sl].add(Hbb)
        H = H.at[idx_i, sl, idx_j, sl].add(-Hbb)
        H = H.at[idx_j, sl, idx_i, sl].add(-Hbb)
        g_vec = g_vec.at[idx_i, sl].add(-wb * rb)
        g_vec = g_vec.at[idx_j, sl].add(wb * rb)

        # ---- landmark Schur elimination ----
        wJl = Jl * w[:, None, None]
        Hll = jnp.zeros((Lw, 3, 3)).at[prob.e_lm].add(
            jnp.einsum("eki,ekj->eij", wJl, Jl))
        b_l = jnp.zeros((Lw, 3)).at[prob.e_lm].add(
            jnp.einsum("eki,ek->ei", wJl, e))
        dl = jnp.diagonal(Hll, axis1=-2, axis2=-1)
        Hll_d = Hll + jax.vmap(jnp.diag)(lam * jnp.maximum(dl, 1e-6))
        Hll_d = jnp.where(lmask[:, None, None] > 0, Hll_d, jnp.eye(3)[None])
        Hll_inv = blockinv.inv3(Hll_d + 1e-9 * jnp.eye(3)[None])

        Wt = jnp.zeros((Lw, Kw, D, 3)).at[prob.e_lm, prob.e_kf].add(
            jnp.einsum("eki,ekj->eij", wJc, Jl))
        Wt = Wt * lmask[:, None, None, None]
        S_red = -jnp.einsum("lkab,lbc,lqdc->kaqd", Wt, Hll_inv, Wt)
        H = H + S_red
        g_vec = g_vec - jnp.einsum("lkab,lbc,lc->ka", Wt, Hll_inv, b_l)

        # ---- damping + fixed poses + solve ----
        dcc = jnp.diagonal(H.reshape(n, n))
        Hm = H.reshape(n, n) + jnp.diag(lam * jnp.maximum(dcc, 1e-6))
        fixed = (pmask == 0)
        fixm = jnp.repeat(fixed, D)
        Hm = jnp.where(fixm[:, None] | fixm[None, :], 0.0, Hm)
        Hm = Hm + jnp.diag(jnp.where(fixm, 1.0, 0.0))
        g_flat = (g_vec * pmask[:, None]).reshape(n)
        # Jacobi equilibration: bias-walk information (~1/walk^2 ~ 1e10) and
        # reprojection blocks (~1e2) span 8+ orders of magnitude — an
        # unequilibrated f32 solve silently zeroes the weak (bias) directions.
        d_eq = jnp.sqrt(jnp.maximum(jnp.diagonal(Hm), 1e-12))
        Hs = Hm / d_eq[:, None] / d_eq[None, :]
        # Keyframe-rate path: keep the pivoted LAPACK solve — the welded-window
        # system is ill-conditioned enough (cond ~1e7 after equilibration) that
        # the closed-form recursive solve measurably slows LM convergence.
        y = jnp.linalg.solve(Hs + 1e-7 * jnp.eye(n), -(g_flat / d_eq))
        dx = (y / d_eq).reshape(Kw, D)
        dx = dx * pmask[:, None]
        dx_l = jnp.einsum("lbc,lc->lb", Hll_inv,
                          -b_l - jnp.einsum("lkab,ka->lb", Wt, dx)) * lmask[:, None]

        # ---- apply ----
        R_new = lie.normalize_rotation(
            jnp.einsum("kij,kjl->kil", lie.so3_exp(dx[:, 0:3]), R))
        p_new = p + dx[:, 3:6]
        v_new = v + dx[:, 6:9]
        bg_new = bg + dx[:, 9:12]
        ba_new = ba + dx[:, 12:15]
        X_new = X + dx_l
        R_new = jnp.where(pmask[:, None, None] > 0, R_new, R)
        p_new = jnp.where(pmask[:, None] > 0, p_new, p)
        v_new = jnp.where(pmask[:, None] > 0, v_new, v)
        bg_new = jnp.where(pmask[:, None] > 0, bg_new, bg)
        ba_new = jnp.where(pmask[:, None] > 0, ba_new, ba)
        X_new = jnp.where(lmask[:, None] > 0, X_new, X)

        # ---- accept/reject ----
        def total_cost(R_, p_, v_, bg_, ba_, X_):
            e_, _, _, d_ = _reproj_terms(prob, cam_kind, R_, p_, X_)
            c2 = jnp.sum(e_ * e_, axis=-1) * prob.e_info
            c_rep = jnp.sum(jnp.where(prob.e_valid,
                                      _huber(c2, delta2), 0.0))
            ri_, _, _ = imu_jac(
                R_[idx_i], p_[idx_i], v_[idx_i], bg_[idx_i], ba_[idx_i],
                R_[idx_j], p_[idx_j], v_[idx_j],
                prob.imu_dR, prob.imu_dV, prob.imu_dP, prob.imu_JRg,
                prob.imu_JVg, prob.imu_JVa, prob.imu_JPg, prob.imu_JPa,
                prob.imu_dt, prob.imu_bg0, prob.imu_ba0)
            c_imu = jnp.sum(w_imu * jnp.einsum("ei,eij,ej->e", ri_,
                                               prob.imu_info, ri_))
            rb_ = jnp.concatenate([bg_[idx_j] - bg_[idx_i],
                                   ba_[idx_j] - ba_[idx_i]], axis=-1)
            c_b = jnp.sum(w_imu[:, None] * prob.walk_info[None, :] * rb_ * rb_)
            return c_rep + c_imu + c_b

        c_old = total_cost(R, p, v, bg, ba, X)
        c_new = total_cost(R_new, p_new, v_new, bg_new, ba_new, X_new)
        ok = c_new < c_old
        out = tuple(jnp.where(ok, a, b) for a, b in
                    [(R_new, R), (p_new, p), (v_new, v), (bg_new, bg),
                     (ba_new, ba), (X_new, X)])
        lam_new = jnp.clip(jnp.where(ok, lam * 0.3, lam * 5.0), 1e-8, 1e4)
        return (*out, lam_new, jnp.where(ok, c_new, c_old)), c_old

    init = (prob.R_wb, prob.p_wb, prob.v_wb, prob.bg, prob.ba, prob.lm_pos,
            jnp.float32(lam0), jnp.float32(0))
    (R, p, v, bg, ba, X, _, _), costs = jax.lax.scan(lm_step, init, None,
                                                     length=iters)
    return R, p, v, bg, ba, X, costs


def merge_inertial_ba(prob: VIBAProblem, weld_slot,
                      cam_kind: int = cameras.PINHOLE, iters: int = 8,
                      chi2_th: float = robust.CHI2_MONO, lam0: float = 1e-3):
    """MergeInertialBA (reference Optimizer::MergeInertialBA
    src/Optimizer.cc:6017, called from MergeLocal2 src/LoopClosing.cc:2818):
    VI-BA over the two temporal sliding windows either side of a map weld
    (reference uses Nd=6 keyframes per side).

    `prob` is the concatenation [old-map window | active-map window],
    temporally ordered within each side, with `weld_slot` the first slot of
    the active side. No preintegration spans the weld — the IMU chain is
    broken at weld_slot-1 -> weld_slot — so the two windows are tied only
    through the fused landmarks' reprojection edges, exactly like the
    reference's merged-MP edges. The oldest keyframe of the old side is held
    fixed as the gauge/boundary anchor (the reference fixes the
    window-boundary keyframes)."""
    Kw = prob.R_wb.shape[0]
    idx = jnp.arange(Kw)
    prob = prob._replace(
        imu_valid=prob.imu_valid & (idx != weld_slot - 1),
        pose_opt_mask=prob.pose_opt_mask & (idx != 0))
    return solve_vi_ba(prob, cam_kind=cam_kind, iters=iters,
                       chi2_th=chi2_th, lam0=lam0)


def _huber(chi2, delta2):
    delta = jnp.sqrt(delta2)
    r = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    return jnp.where(chi2 <= delta2, chi2, 2.0 * delta * r - delta2)
