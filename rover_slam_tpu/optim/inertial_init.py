"""Inertial-only optimization: gravity direction, scale, biases, velocities.

TPU-native replacement for Optimizer::InertialOptimization (all three variants)
(reference: src/Optimizer.cc:3688 scale/gravity/bias/velocity with fixed poses
via EdgeInertialGS (include/G2oTypes.h:639), :3892 bias+velocity only, :4067
scale/gravity only; driven by LocalMapping::InitializeIMU's 3-stage prior
schedule src/LocalMapping.cc:1692-2033 — priors (1e2,1e10) -> (1,1e5) -> (0,0))
and ScaleRefinement (:2034).

Single dense Gauss-Newton: parameters x = [v(3K) | bg(3) | ba(3) | dtheta_g(2)
| log_s(1)], residuals are the 9-dim preintegration factors with
gravity-rotation and scale applied to the (fixed) visual poses, exactly
EdgeInertialGS::computeError. Jacobians via forward-mode autodiff (the
parameter count is tiny: 3K+9 <= ~100); Jacobi-equilibrated f32 solve.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import lie
from ..imu import preintegration as preint

G_MAG = preint.GRAVITY


class InertialInitProblem(NamedTuple):
    # Fixed visual poses (body frame), temporally ordered window of K KFs.
    R_wb: jnp.ndarray      # [K,3,3]
    p_wb: jnp.ndarray      # [K,3]
    kf_valid: jnp.ndarray  # [K]
    # Preintegration linking i -> i+1 (slot i), padded like vi_ba.
    imu_dR: jnp.ndarray
    imu_dV: jnp.ndarray
    imu_dP: jnp.ndarray
    imu_JRg: jnp.ndarray
    imu_JVg: jnp.ndarray
    imu_JVa: jnp.ndarray
    imu_JPg: jnp.ndarray
    imu_JPa: jnp.ndarray
    imu_dt: jnp.ndarray
    imu_bg0: jnp.ndarray
    imu_ba0: jnp.ndarray
    imu_info: jnp.ndarray  # [K,9,9]
    imu_valid: jnp.ndarray
    Rwg0: jnp.ndarray = None  # [3,3] gravity-direction bootstrap (optional)


class InertialInitResult(NamedTuple):
    v_wb: jnp.ndarray     # [K,3]
    bg: jnp.ndarray       # [3]
    ba: jnp.ndarray       # [3]
    Rwg: jnp.ndarray      # [3,3] gravity direction (g_world = Rwg * (0,0,-9.81))
    scale: jnp.ndarray    # scalar
    cost: jnp.ndarray


def _gs_residual(params, Ri, pi, Rj, pj, dR, dV, dP, JRg, JVg, JVa, JPg, JPa,
                 dt, bg0, ba0, K, slot_i, Rwg0):
    """EdgeInertialGS residual for one consecutive pair (fixed poses)."""
    v = params[:3 * K].reshape(K, 3)
    bg = params[3 * K:3 * K + 3]
    ba = params[3 * K + 3:3 * K + 6]
    thg = params[3 * K + 6:3 * K + 8]
    log_s = params[3 * K + 8]
    s = jnp.exp(log_s)
    Rwg = Rwg0 @ lie.so3_exp(jnp.concatenate([thg, jnp.zeros(1)]))
    g = Rwg @ jnp.array([0.0, 0.0, -G_MAG])

    vi = v[slot_i]
    vj = v[jnp.minimum(slot_i + 1, K - 1)]
    dbg = bg - bg0
    dba = ba - ba0
    dR_c = dR @ lie.so3_exp(JRg @ dbg)
    dV_c = dV + JVg @ dbg + JVa @ dba
    dP_c = dP + JPg @ dbg + JPa @ dba
    er = lie.so3_log(dR_c.T @ Ri.T @ Rj)
    ev = Ri.T @ (vj - vi - g * dt) - dV_c
    ep = Ri.T @ (s * (pj - pi) - vi * dt - 0.5 * g * dt * dt) - dP_c
    return jnp.concatenate([er, ev, ep])


@functools.partial(jax.jit, static_argnames=())
def _gyro_bias_only(prob: InertialInitProblem, iters: int = 5):
    """Stage 1: bg from rotation residuals alone — a 3-var GN on
    sum ||log(dR(bg)^T Ri^T Rj)||^2 (nearly quadratic, no couplings)."""
    K = prob.R_wb.shape[0]
    idx = jnp.arange(K)
    w_e = (prob.imu_valid & prob.kf_valid).astype(jnp.float32)

    def r_all(bg):
        def one(i):
            dbg = bg - prob.imu_bg0[i]
            dR_c = prob.imu_dR[i] @ lie.so3_exp(prob.imu_JRg[i] @ dbg)
            Rj = prob.R_wb[jnp.minimum(i + 1, K - 1)]
            return lie.so3_log(dR_c.T @ prob.R_wb[i].T @ Rj)
        return jax.vmap(one)(idx) * w_e[:, None]

    def step(bg, _):
        r = r_all(bg)
        J = jax.jacfwd(r_all)(bg)          # [K,3,3]
        H = jnp.einsum("eki,ekj->ij", J, J) + 1e-9 * jnp.eye(3)
        g = jnp.einsum("eki,ek->i", J, r)
        return bg - jnp.linalg.solve(H, g), None

    bg, _ = jax.lax.scan(step, jnp.zeros(3), None, length=iters)
    return bg


@functools.partial(jax.jit, static_argnames=("fix_scale",))
def _linear_vgs(prob: InertialInitProblem, bg, fix_scale: bool = False,
                sigma_vis: float = 0.01):
    """Stage 2: with bg fixed (ba~0), ev/ep are LINEAR in
    x = [v(3K), g(3), s]. One weighted least-squares solve — convex, global
    (the VINS-Mono-style linear alignment; avoids the GN local minima that a
    joint solve hits when gravity starts far off)."""
    K = prob.R_wb.shape[0]
    nv = 3 * K + 4
    idx = jnp.arange(K)
    w_e = (prob.imu_valid & prob.kf_valid).astype(jnp.float32)

    def rows(i):
        Ri = prob.R_wb[i]
        Rit = Ri.T
        j = jnp.minimum(i + 1, K - 1)
        dt = prob.imu_dt[i]
        dbg = bg - prob.imu_bg0[i]
        dV_c = prob.imu_dV[i] + prob.imu_JVg[i] @ dbg
        dP_c = prob.imu_dP[i] + prob.imu_JPg[i] @ dbg
        dp = prob.p_wb[j] - prob.p_wb[i]
        Z = jnp.zeros((3, 3))
        # ev = Rit( vj - vi - g dt ) - dV_c   (rows 0:3)
        # ep = Rit( s*dp - vi dt - 0.5 g dt^2 ) - dP_c  (rows 3:6)
        A = jnp.zeros((6, nv))
        # (i and j are traced: use dynamic_update_slice; j > i always for valid
        # edges, the padded last slot is masked out by Ws anyway)
        A = jax.lax.dynamic_update_slice(A, Rit, (0, 3 * j))
        A = jax.lax.dynamic_update_slice(A, -Rit, (0, 3 * i))
        A = jax.lax.dynamic_update_slice(A, -Rit * dt, (3, 3 * i))
        A = A.at[0:3, 3 * K:3 * K + 3].set(-Rit * dt)
        A = A.at[3:6, 3 * K:3 * K + 3].set(-0.5 * Rit * dt * dt)
        A = A.at[3:6, 3 * K + 3].set(Rit @ dp)
        b = jnp.concatenate([dV_c, dP_c])
        # Weight by the v/p information with a VISUAL-noise floor: the
        # residuals are dominated by keyframe-pose noise (mm-cm), not the tiny
        # preintegration covariance; pure-IMU weights amplify that noise and
        # bias the scale far along the weakly-observable (s,g,v0) direction.
        C6 = jnp.linalg.inv(prob.imu_info[i][3:9, 3:9]
                            + 1e-8 * jnp.eye(6)) + sigma_vis ** 2 * jnp.eye(6)
        W6 = jnp.linalg.inv(C6) * w_e[i]
        lam_, U = jnp.linalg.eigh(0.5 * (W6 + W6.T))
        Ws = U @ jnp.diag(jnp.sqrt(jnp.maximum(lam_, 0.0))) @ U.T
        return Ws @ A, Ws @ b

    As, bs = jax.vmap(rows)(idx)
    A = As.reshape(-1, nv)
    b = bs.reshape(-1)
    if fix_scale:
        # Drop the scale column; solve with s = 1.
        b = b - A[:, -1]
        A = A.at[:, -1].set(0.0)
    AtA = A.T @ A + 1e-6 * jnp.eye(nv)
    x = jnp.linalg.solve(AtA, A.T @ b)
    v = x[:3 * K].reshape(K, 3)
    g = x[3 * K:3 * K + 3]
    s = jnp.where(fix_scale, 1.0, x[3 * K + 3])
    if not fix_scale:
        # Gravity-magnitude-constrained refinement (the VINS-Mono
        # RefineGravity idea): with |g| free, gravity (quadratic-in-time) and
        # v0 (linear) can absorb most of the s*dp signal over short windows —
        # the free-|g| solution then collapses the scale toward zero
        # (observed on real-image maps: s came out ~1/200 of truth). Re-solve
        # with g = G*ghat + T@w (w in the 2-dof tangent plane), iterating the
        # linearization point; the scale snaps to the metrically-consistent
        # value.
        G = 9.81
        A_g = A[:, 3 * K:3 * K + 3]                    # [rows, 3]
        A_rest = jnp.concatenate([A[:, :3 * K], A[:, 3 * K + 3:]], axis=1)

        def refine_once(g_cur, _):
            ghat = g_cur / jnp.maximum(jnp.linalg.norm(g_cur), 1e-9)
            # tangent basis of ghat
            ref = jnp.where(jnp.abs(ghat[0]) < 0.9,
                            jnp.array([1.0, 0.0, 0.0]),
                            jnp.array([0.0, 1.0, 0.0]))
            t1 = jnp.cross(ghat, ref)
            t1 = t1 / jnp.maximum(jnp.linalg.norm(t1), 1e-9)
            t2 = jnp.cross(ghat, t1)
            T = jnp.stack([t1, t2], axis=1)            # [3,2]
            A2 = jnp.concatenate([A_rest, A_g @ T], axis=1)
            b2 = b - A_g @ (G * ghat)
            n2 = A2.shape[1]
            x2 = jnp.linalg.solve(A2.T @ A2 + 1e-6 * jnp.eye(n2), A2.T @ b2)
            w = x2[-2:]
            g_new = G * ghat + T @ w
            g_new = G * g_new / jnp.maximum(jnp.linalg.norm(g_new), 1e-9)
            return g_new, x2

        g_ref, xs = jax.lax.scan(refine_once, g, None, length=4)
        x2 = xs[-1]
        v = x2[:3 * K].reshape(K, 3)
        s = x2[3 * K]
        g = g_ref
    return v, g, s


@functools.partial(jax.jit, static_argnames=("iters", "fix_scale", "fix_gdir"))
def inertial_only_optimization(prob: InertialInitProblem,
                               prior_g: float = 1e2, prior_a: float = 1e6,
                               iters: int = 20, fix_scale: bool = False,
                               fix_gdir: bool = False) -> InertialInitResult:
    """Estimate velocities, biases, gravity direction and scale against fixed
    visual poses. prior_g/prior_a: bias priors (reference 3-stage schedule).

    Internally staged for global convergence: (1) gyro bias from rotations,
    (2) exact linear solve of velocities/gravity/scale, (3) joint GN refine
    with |g| = 9.81 enforced via the 2-dof gravity parameterization."""
    K = prob.R_wb.shape[0]
    n = 3 * K + 9
    idx = jnp.arange(K)

    # Visual-noise floor on the information (see _linear_vgs): rotation block
    # floored at (1e-3 rad)^2, velocity/position at sigma_vis^2.
    sigma_vis = 0.01
    floor = jnp.diag(jnp.concatenate([jnp.full(3, 1e-6),
                                      jnp.full(6, sigma_vis ** 2)]))
    info_eff = jax.vmap(
        lambda I9: jnp.linalg.inv(
            jnp.linalg.inv(I9 + 1e-6 * jnp.eye(9)) + floor))(prob.imu_info)
    prob = prob._replace(imu_info=info_eff)

    # --- stages 1+2: globally-convergent bootstrap ---
    bg_boot = _gyro_bias_only(prob)
    v_boot, g_boot, s_boot = _linear_vgs(prob, bg_boot, fix_scale=fix_scale,
                                         sigma_vis=sigma_vis)
    s_boot = jnp.clip(s_boot, 0.05, 50.0)
    # Gravity-rotation bootstrap from the linear solve's g estimate
    # (plays the role of the reference's dirG accumulation,
    # src/LocalMapping.cc:1764-1812, but from the globally-solved g).
    if prob.Rwg0 is not None:
        Rwg0 = prob.Rwg0
    else:
        dirG = g_boot / jnp.maximum(jnp.linalg.norm(g_boot), 1e-9)
        gI = jnp.array([0.0, 0.0, -1.0])
        vcross = jnp.cross(gI, dirG)
        sin_n = jnp.linalg.norm(vcross)
        cos_ = jnp.dot(gI, dirG)
        ang = jnp.arctan2(sin_n, cos_)
        axis = vcross / jnp.maximum(sin_n, 1e-9)
        Rwg0 = lie.so3_exp(axis * ang)
        Rwg0 = jnp.where(sin_n < 1e-6, jnp.eye(3), Rwg0)

    def residuals(params):
        f = lambda i: _gs_residual(
            params, prob.R_wb[i], prob.p_wb[i],
            prob.R_wb[jnp.minimum(i + 1, K - 1)],
            prob.p_wb[jnp.minimum(i + 1, K - 1)],
            prob.imu_dR[i], prob.imu_dV[i], prob.imu_dP[i], prob.imu_JRg[i],
            prob.imu_JVg[i], prob.imu_JVa[i], prob.imu_JPg[i], prob.imu_JPa[i],
            prob.imu_dt[i], prob.imu_bg0[i], prob.imu_ba0[i], K, i, Rwg0)
        return jax.vmap(f)(idx)                       # [K,9]

    w_edge = (prob.imu_valid & prob.kf_valid
              & jnp.roll(prob.kf_valid, -1)).astype(jnp.float32)

    def gn_step(params, _):
        r = residuals(params)
        J = jax.jacfwd(residuals)(params)             # [K,9,n]
        info = prob.imu_info * w_edge[:, None, None]
        H = jnp.einsum("eki,ekl,elj->ij", J, info, J)
        g_vec = jnp.einsum("eki,ekl,el->i", J, info, r)
        # Bias priors (reference: priorG * I, priorA * I).
        pr = jnp.zeros(n).at[3 * K:3 * K + 3].set(prior_g) \
            .at[3 * K + 3:3 * K + 6].set(prior_a)
        H = H + jnp.diag(pr)
        g_vec = g_vec + pr * params.at[:3 * K].set(0.0)  # prior pulls biases to 0
        if fix_scale:
            H = H.at[n - 1].set(0.0).at[:, n - 1].set(0.0).at[n - 1, n - 1].set(1.0)
            g_vec = g_vec.at[n - 1].set(0.0)
        if fix_gdir:
            sl = slice(3 * K + 6, 3 * K + 8)
            H = H.at[sl].set(0.0).at[:, sl].set(0.0)
            H = H.at[3 * K + 6, 3 * K + 6].set(1.0).at[3 * K + 7, 3 * K + 7].set(1.0)
            g_vec = g_vec.at[sl].set(0.0)
        d_eq = jnp.sqrt(jnp.maximum(jnp.diagonal(H), 1e-10))
        Hs = H / d_eq[:, None] / d_eq[None, :]
        dx = (jnp.linalg.solve(Hs + 1e-7 * jnp.eye(n), -(g_vec / d_eq)) / d_eq)
        # Trust region on the scale step: full Newton on log_s diverges from
        # far-off initializations (ep ~ e^{log_s} is exponential in the param).
        dx = dx.at[n - 1].set(jnp.clip(dx[n - 1], -0.5, 0.5))
        return dx

    def cost_of(params):
        r = residuals(params)
        info = prob.imu_info * w_edge[:, None, None]
        pr_g = prior_g * jnp.sum(params[3 * K:3 * K + 3] ** 2)
        pr_a = prior_a * jnp.sum(params[3 * K + 3:3 * K + 6] ** 2)
        return jnp.sum(jnp.einsum("ek,ekl,el->e", r, info, r)) + pr_g + pr_a

    def lm_iter(carry, _):
        params, _ = carry
        dx = gn_step(params, None)
        c0 = cost_of(params)
        cand1 = params + dx
        cand2 = params + 0.3 * dx
        c1 = cost_of(cand1)
        c2 = cost_of(cand2)
        best = jnp.argmin(jnp.stack([c0, c1, c2]))
        params = jnp.where(best == 1, cand1, jnp.where(best == 2, cand2, params))
        return (params, c0), c0

    params0 = jnp.concatenate([
        v_boot.reshape(-1), bg_boot, jnp.zeros(3), jnp.zeros(2),
        jnp.log(s_boot)[None]])
    (params, _), costs = jax.lax.scan(lm_iter, (params0, jnp.float32(0)),
                                      None, length=iters)
    v = params[:3 * K].reshape(K, 3)
    bg = params[3 * K:3 * K + 3]
    ba = params[3 * K + 3:3 * K + 6]
    thg = params[3 * K + 6:3 * K + 8]
    s = jnp.exp(params[3 * K + 8])
    Rwg = Rwg0 @ lie.so3_exp(jnp.concatenate([thg, jnp.zeros(1)]))
    return InertialInitResult(v_wb=v, bg=bg, ba=ba, Rwg=Rwg, scale=s,
                              cost=costs[-1])


def apply_scaled_rotation(R_wb, p_wb, v_wb, lm_pos, Rwg, scale):
    """Rotate the world so gravity is -z and apply the recovered scale
    (reference Map::ApplyScaledRotation include/Map.h:118 after IMU init:
    yaw-preserving gravity alignment + metric rescale)."""
    Rgw = Rwg.T
    R_new = jnp.einsum("ij,kjl->kil", Rgw, R_wb)
    p_new = scale * jnp.einsum("ij,kj->ki", Rgw, p_wb)
    v_new = scale * jnp.einsum("ij,kj->ki", Rgw, v_wb)
    lm_new = scale * jnp.einsum("ij,lj->li", Rgw, lm_pos)
    return R_new, p_new, v_new, lm_new
