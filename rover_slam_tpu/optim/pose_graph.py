"""Pose-graph optimization: Sim(3) essential graph (and 4-DoF variant).

TPU-native replacement for Optimizer::OptimizeEssentialGraph
(reference: src/Optimizer.cc:4509-4851 — g2o BlockSolver_7_3, VertexSim3Expmap
per keyframe, EdgeSim3 over loop connections + spanning tree + covisibility
edges with weight >= 100, 20 iterations; Sim3->SE3 recovery divides t by s) and
OptimizeEssentialGraph4DoF (:4852).

Formulation: variables are per-keyframe Sim3 world->cam (s_i, R_i, t_i); each
edge (i, j) has a measured relative Sim3 S_ij and residual
  r_ij = log_sim3(S_ij * S_j * S_i^-1)  in R^7.
Gauss-Newton with Jacobians by forward-mode autodiff on the left-perturbation.

The linear solve is TPU-native: the dense GN system (7K x 7K) is solved with
block-Jacobi preconditioned CG — the matvec is ONE [n,n]x[n] MXU matmul and
the preconditioner is a batched closed-form 7x7 block inverse (blockinv.invn),
so nothing lowers to a sequential LAPACK loop (jnp.linalg.solve at this size
is milliseconds of pure serial latency per GN step on TPU — the exact
anti-pattern blockinv.py documents).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import lie
from .blockinv import invn as _invn


def _block_pcg(H, g, pmask_cols, iters: int):
    """Solve H x = g with block-Jacobi PCG. H: [K,D,K,D], g: [K,D].

    pmask_cols: [K] float mask of free variables (fixed rows/cols are
    identity in H and zero in g, so their solution stays zero)."""
    K, D = g.shape
    n = K * D
    Hm = H.reshape(n, n)
    diag = H[jnp.arange(K), :, jnp.arange(K), :]            # [K,D,D]
    Pb = _invn(diag + 1e-8 * jnp.eye(D)[None])

    def mv(v):
        return (Hm @ v.reshape(n)).reshape(K, D)

    def pc(r):
        return jnp.einsum("kij,kj->ki", Pb, r) * pmask_cols[:, None]

    b = g * pmask_cols[:, None]
    z0 = pc(b)
    rz0 = jnp.sum(b * z0)

    def body(carry, _):
        x, r, p, rz = carry
        Ap = mv(p)
        pAp = jnp.sum(p * Ap)
        alpha = rz / jnp.where(jnp.abs(pAp) < 1e-20, 1e-20, pAp)
        x = x + alpha * p
        r = r - alpha * Ap
        z = pc(r)
        rz_n = jnp.sum(r * z)
        beta = rz_n / jnp.where(jnp.abs(rz) < 1e-20, 1e-20, rz)
        return (x, r, z + beta * p, rz_n), None

    (x, *_), _ = jax.lax.scan(body, (jnp.zeros_like(b), b, z0, rz0), None,
                              length=iters)
    return x


class PoseGraphProblem(NamedTuple):
    s: jnp.ndarray          # [K] scales (world->cam)
    R: jnp.ndarray          # [K,3,3]
    t: jnp.ndarray          # [K,3]
    opt_mask: jnp.ndarray   # [K] False = fixed (loop KF / gauge)
    e_i: jnp.ndarray        # [E] edge endpoints
    e_j: jnp.ndarray
    e_s: jnp.ndarray        # [E] measured relative Sim3: S_ij maps j-frame -> i-frame
    e_R: jnp.ndarray        # [E,3,3]
    e_t: jnp.ndarray        # [E,3]
    e_valid: jnp.ndarray    # [E]
    e_weight: jnp.ndarray   # [E] information scale


def relative_sim3(s_i, R_i, t_i, s_j, R_j, t_j):
    """S_ij = S_i * S_j^-1 (maps j-camera frame into i-camera frame)."""
    sji, Rji, tji = lie.sim3_inverse(s_j, R_j, t_j)
    return lie.sim3_compose(s_i, R_i, t_i, sji, Rji, tji)


def _edge_residual(xi_i, xi_j, s_i, R_i, t_i, s_j, R_j, t_j,
                   s_m, R_m, t_m):
    """r = log( S_m * (exp(xi_j) S_j) * (exp(xi_i) S_i)^-1 ), 7-vector."""
    si, Ri, ti = lie.sim3_exp(xi_i)
    sj, Rj, tj = lie.sim3_exp(xi_j)
    s1, R1, t1 = lie.sim3_compose(si, Ri, ti, s_i, R_i, t_i)
    s2, R2, t2 = lie.sim3_compose(sj, Rj, tj, s_j, R_j, t_j)
    s1i, R1i, t1i = lie.sim3_inverse(s1, R1, t1)
    se, Re, te = lie.sim3_compose(s2, R2, t2, s1i, R1i, t1i)
    se, Re, te = lie.sim3_compose(s_m, R_m, t_m, se, Re, te)
    return lie.sim3_log(se, Re, te)


@functools.partial(jax.jit, static_argnames=("iters", "fix_scale",
                                             "pcg_iters"))
def optimize_essential_graph(prob: PoseGraphProblem, iters: int = 20,
                             lam: float = 1e-6, fix_scale: bool = False,
                             pcg_iters: int = 0):
    """Gauss-Newton over Sim3 poses. Returns (s, R, t, cost_history).

    fix_scale: lock every vertex's scale at its current value (the reference's
    bFixScale Sim3 vertices for stereo/RGBD systems, VertexSim3Expmap
    _fix_scale; src/Optimizer.cc:4509 callers)."""
    K = prob.s.shape[0]
    E = prob.e_i.shape[0]
    # Block-Jacobi PCG propagates information ~one graph hop per iteration;
    # on chain-dominated essential graphs the iteration budget must scale
    # with the graph size or loop corrections under-converge at large K
    # (48 is the small-graph floor; K is a static shape so this stays a
    # trace-time constant).
    if pcg_iters <= 0:
        pcg_iters = max(48, K // 2)
    pmask = prob.opt_mask.astype(jnp.float32)

    zero = jnp.zeros(7)
    res_and_jac = jax.vmap(
        lambda si, Ri, ti, sj, Rj, tj, sm, Rm, tm: (
            _edge_residual(zero, zero, si, Ri, ti, sj, Rj, tj, sm, Rm, tm),
            jax.jacfwd(_edge_residual, argnums=0)(
                zero, zero, si, Ri, ti, sj, Rj, tj, sm, Rm, tm),
            jax.jacfwd(_edge_residual, argnums=1)(
                zero, zero, si, Ri, ti, sj, Rj, tj, sm, Rm, tm),
        ))

    def gn_step(carry, _):
        s, R, t, prev = carry
        si, Ri, ti = s[prob.e_i], R[prob.e_i], t[prob.e_i]
        sj, Rj, tj = s[prob.e_j], R[prob.e_j], t[prob.e_j]
        r, Ji, Jj = res_and_jac(si, Ri, ti, sj, Rj, tj,
                                prob.e_s, prob.e_R, prob.e_t)
        w = prob.e_valid * prob.e_weight
        cost = jnp.sum(w * jnp.sum(r * r, axis=-1))

        # Assemble dense H (7K x 7K) and g by scatter of edge blocks.
        n = 7 * K
        JiT_w = Ji * w[:, None, None]
        Hii = jnp.einsum("eki,ekj->eij", JiT_w, Ji)
        Hjj = jnp.einsum("eki,ekj->eij", Jj * w[:, None, None], Jj)
        Hij = jnp.einsum("eki,ekj->eij", JiT_w, Jj)
        gi = jnp.einsum("eki,ek->ei", JiT_w, r)
        gj = jnp.einsum("eki,ek->ei", Jj * w[:, None, None], r)

        H = jnp.zeros((K, 7, K, 7))
        H = H.at[prob.e_i, :, prob.e_i, :].add(Hii)
        H = H.at[prob.e_j, :, prob.e_j, :].add(Hjj)
        H = H.at[prob.e_i, :, prob.e_j, :].add(Hij)
        H = H.at[prob.e_j, :, prob.e_i, :].add(jnp.swapaxes(Hij, -1, -2))
        g = jnp.zeros((K, 7)).at[prob.e_i].add(gi).at[prob.e_j].add(gj)

        # Fix masked poses: identity rows/cols.
        fixed = pmask == 0
        H = jnp.where(fixed[:, None, None, None] | fixed[None, None, :, None],
                      0.0, H)
        H = H.at[jnp.arange(K), :, jnp.arange(K), :].add(
            jnp.where(fixed[:, None, None], jnp.eye(7)[None],
                      lam * jnp.eye(7)[None]))
        g = g * pmask[:, None]

        if fix_scale:
            # Lock scale dofs (index 6 of the sim3 tangent): huge diagonal
            # penalty + zeroed update, so scales pass through unchanged.
            H = H.at[jnp.arange(K), 6, jnp.arange(K), 6].add(1e12)
        dx = -_block_pcg(H, g, pmask, iters=pcg_iters)
        dx = dx * pmask[:, None]
        if fix_scale:
            dx = dx.at[:, 6].set(0.0)
        ds, dR, dt = jax.vmap(lie.sim3_exp)(dx)
        s_new, R_new, t_new = jax.vmap(lie.sim3_compose)(ds, dR, dt, s, R, t)
        R_new = lie.normalize_rotation(R_new)
        # Keep fixed bit-exact.
        s_new = jnp.where(pmask > 0, s_new, s)
        R_new = jnp.where(pmask[:, None, None] > 0, R_new, R)
        t_new = jnp.where(pmask[:, None] > 0, t_new, t)
        return (s_new, R_new, t_new, cost), cost

    init = (prob.s, prob.R, prob.t, jnp.float32(0))
    (s, R, t, _), costs = jax.lax.scan(gn_step, init, None, length=iters)
    return s, R, t, costs


def _residual_4dof(x_i, x_j, R_i, t_i, R_j, t_j, R_m, t_m):
    """6-dim SE3 residual with 4-dof updates [dt(3), dyaw] per endpoint
    (reference Edge4DoF + VertexPose4DoF include/G2oTypes.h:166,950 — roll and
    pitch are gravity-locked after IMU alignment)."""
    def apply(x, R, t):
        yaw = x[3]
        Rz = lie.so3_exp(jnp.array([0.0, 0.0, 1.0]) * yaw)
        return Rz @ R, Rz @ t + x[:3]

    Ri_, ti_ = apply(x_i, R_i, t_i)
    Rj_, tj_ = apply(x_j, R_j, t_j)
    # rel = T_m * T_j * T_i^-1 should be identity.
    Rii, tii = lie.se3_inverse(Ri_, ti_)
    Rr, tr = lie.se3_compose(Rj_, tj_, Rii, tii)
    Rr, tr = lie.se3_compose(R_m, t_m, Rr, tr)
    return lie.se3_log(Rr, tr)


@functools.partial(jax.jit, static_argnames=("iters", "pcg_iters"))
def optimize_pose_graph_4dof(prob: PoseGraphProblem, iters: int = 20,
                             lam: float = 1e-6, pcg_iters: int = 0):
    """4-DoF (yaw + translation) pose graph for inertial maps
    (reference OptimizeEssentialGraph4DoF src/Optimizer.cc:4852). Uses the
    PoseGraphProblem edge measurements' (R, t) parts; scales are ignored."""
    K = prob.R.shape[0]
    if pcg_iters <= 0:
        pcg_iters = max(48, K // 2)   # see optimize_essential_graph
    pmask = prob.opt_mask.astype(jnp.float32)
    zero = jnp.zeros(4)

    res_jac = jax.vmap(
        lambda Ri, ti, Rj, tj, Rm, tm: (
            _residual_4dof(zero, zero, Ri, ti, Rj, tj, Rm, tm),
            jax.jacfwd(_residual_4dof, argnums=0)(zero, zero, Ri, ti, Rj, tj,
                                                  Rm, tm),
            jax.jacfwd(_residual_4dof, argnums=1)(zero, zero, Ri, ti, Rj, tj,
                                                  Rm, tm)))

    def gn_step(carry, _):
        R, t, prev = carry
        r, Ji, Jj = res_jac(R[prob.e_i], t[prob.e_i], R[prob.e_j],
                            t[prob.e_j], prob.e_R, prob.e_t)
        w = prob.e_valid * prob.e_weight
        cost = jnp.sum(w * jnp.sum(r * r, axis=-1))
        n = 4 * K
        H = jnp.zeros((K, 4, K, 4))
        JiT = Ji * w[:, None, None]
        JjT = Jj * w[:, None, None]
        H = H.at[prob.e_i, :, prob.e_i, :].add(jnp.einsum("eki,ekj->eij", JiT, Ji))
        H = H.at[prob.e_j, :, prob.e_j, :].add(jnp.einsum("eki,ekj->eij", JjT, Jj))
        H = H.at[prob.e_i, :, prob.e_j, :].add(jnp.einsum("eki,ekj->eij", JiT, Jj))
        H = H.at[prob.e_j, :, prob.e_i, :].add(jnp.einsum("eki,ekj->eij", JjT, Ji))
        g = jnp.zeros((K, 4)).at[prob.e_i].add(
            jnp.einsum("eki,ek->ei", JiT, r)).at[prob.e_j].add(
            jnp.einsum("eki,ek->ei", JjT, r))
        fixed = pmask == 0
        H = jnp.where(fixed[:, None, None, None] | fixed[None, None, :, None],
                      0.0, H)
        H = H.at[jnp.arange(K), :, jnp.arange(K), :].add(
            jnp.where(fixed[:, None, None], jnp.eye(4)[None],
                      lam * jnp.eye(4)[None]))
        g = g * pmask[:, None]
        dx = -_block_pcg(H, g, pmask, iters=pcg_iters) * pmask[:, None]
        Rz = lie.so3_exp(jnp.concatenate(
            [jnp.zeros((K, 2)), dx[:, 3:4]], axis=-1))
        R_new = lie.normalize_rotation(jnp.einsum("kij,kjl->kil", Rz, R))
        t_new = jnp.einsum("kij,kj->ki", Rz, t) + dx[:, :3]
        R_new = jnp.where(pmask[:, None, None] > 0, R_new, R)
        t_new = jnp.where(pmask[:, None] > 0, t_new, t)
        return (R_new, t_new, cost), cost

    (R, t, _), costs = jax.lax.scan(gn_step, (prob.R, prob.t, jnp.float32(0)),
                                    None, length=iters)
    return R, t, costs


def sim3_to_se3(s, R, t):
    """Recover SE3 camera poses: divide translation by scale
    (reference Optimizer.cc:4829-4833 Sim3->SE3 recovery)."""
    return R, t / jnp.maximum(s[..., None], 1e-12)


def correct_landmarks(lm_pos, lm_ref_kf, s_old, R_old, t_old, s_new, R_new,
                      t_new, lm_mask):
    """Transfer landmarks through their reference keyframe's Sim3 correction
    (reference Optimizer.cc:4836-4846: X_new = S_new^-1 * S_old * X_old)."""
    so, Ro, to = s_old[lm_ref_kf], R_old[lm_ref_kf], t_old[lm_ref_kf]
    sn, Rn, tn = s_new[lm_ref_kf], R_new[lm_ref_kf], t_new[lm_ref_kf]
    Xc = lie.sim3_apply(so, Ro, to, lm_pos)
    sni, Rni, tni = lie.sim3_inverse(sn, Rn, tn)
    Xw = lie.sim3_apply(sni, Rni, tni, Xc)
    return jnp.where(lm_mask[:, None], Xw, lm_pos)
