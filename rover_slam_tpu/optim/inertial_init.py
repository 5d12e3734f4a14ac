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


class InertialInitResult(NamedTuple):
    v_wb: jnp.ndarray     # [K,3]
    bg: jnp.ndarray       # [3]
    ba: jnp.ndarray       # [3]
    Rwg: jnp.ndarray      # [3,3] gravity direction (g_world = Rwg * (0,0,-9.81))
    scale: jnp.ndarray    # scalar
    cost: jnp.ndarray


def _gs_residual(params, Ri, pi, Rj, pj, dR, dV, dP, JRg, JVg, JVa, JPg, JPa,
                 dt, bg0, ba0, K, slot_i):
    """EdgeInertialGS residual for one consecutive pair (fixed poses)."""
    v = params[:3 * K].reshape(K, 3)
    bg = params[3 * K:3 * K + 3]
    ba = params[3 * K + 3:3 * K + 6]
    thg = params[3 * K + 6:3 * K + 8]
    log_s = params[3 * K + 8]
    s = jnp.exp(log_s)
    Rwg = lie.so3_exp(jnp.concatenate([thg, jnp.zeros(1)]))
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


@functools.partial(jax.jit, static_argnames=("iters", "fix_scale", "fix_gdir"))
def inertial_only_optimization(prob: InertialInitProblem,
                               prior_g: float = 1e2, prior_a: float = 1e6,
                               iters: int = 20, fix_scale: bool = False,
                               fix_gdir: bool = False) -> InertialInitResult:
    """Estimate velocities, biases, gravity direction and scale against fixed
    visual poses. prior_g/prior_a: bias priors (reference 3-stage schedule)."""
    K = prob.R_wb.shape[0]
    n = 3 * K + 9
    idx = jnp.arange(K)

    def residuals(params):
        f = lambda i: _gs_residual(
            params, prob.R_wb[i], prob.p_wb[i],
            prob.R_wb[jnp.minimum(i + 1, K - 1)],
            prob.p_wb[jnp.minimum(i + 1, K - 1)],
            prob.imu_dR[i], prob.imu_dV[i], prob.imu_dP[i], prob.imu_JRg[i],
            prob.imu_JVg[i], prob.imu_JVa[i], prob.imu_JPg[i], prob.imu_JPa[i],
            prob.imu_dt[i], prob.imu_bg0[i], prob.imu_ba0[i], K, i)
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

    params0 = jnp.zeros(n)
    (params, _), costs = jax.lax.scan(lm_iter, (params0, jnp.float32(0)),
                                      None, length=iters)
    v = params[:3 * K].reshape(K, 3)
    bg = params[3 * K:3 * K + 3]
    ba = params[3 * K + 3:3 * K + 6]
    thg = params[3 * K + 6:3 * K + 8]
    s = jnp.exp(params[3 * K + 8])
    Rwg = lie.so3_exp(jnp.concatenate([thg, jnp.zeros(1)]))
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
