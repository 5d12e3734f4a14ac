"""Bundle adjustment: matrix-free Levenberg-Marquardt with block-Jacobi PCG.

TPU-native replacement for g2o's sparse BlockSolver + Schur complement used by
Optimizer::LocalBundleAdjustment / GlobalBundleAdjustment
(reference: src/Optimizer.cc:1740-2202, 2813-3236; g2o block_solver.h Schur path).

Why not a literal Schur complement: g2o eliminates landmark blocks then runs a
sparse Cholesky on the reduced camera system — a pointer-chasing sparse solver.
On TPU the natural formulation is matrix-free: the Gauss-Newton system
(J^T W J + lam D) dx = -J^T W e is solved by conjugate gradient where each
matvec is two batched per-edge [2x6]/[2x3] contractions plus segment-sums —
dense, static-shaped, MXU/VPU-friendly, and it shards over edges with a single
psum per matvec (the distributed path in parallel/sharded_ba.py).
Block-Jacobi preconditioning (inverted 6x6 pose / 3x3 landmark blocks) plays the
role of the Schur elimination for conditioning.

The edge list IS the observation table: all (window keyframe, keypoint slot)
pairs, padded and masked, so problem extraction from MapState needs no host
compaction.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import lie, cameras
from . import robust


class BAProblem(NamedTuple):
    R_cw: jnp.ndarray       # [Kw,3,3]
    t_cw: jnp.ndarray       # [Kw,3]
    pose_opt_mask: jnp.ndarray  # [Kw] bool: False = fixed pose
    lm_pos: jnp.ndarray     # [Lw,3]
    lm_opt_mask: jnp.ndarray    # [Lw] bool
    cam_params: jnp.ndarray
    e_kf: jnp.ndarray       # [E] int32 window-kf index per edge
    e_lm: jnp.ndarray       # [E] int32 window-landmark index per edge
    e_uv: jnp.ndarray       # [E,2] measured pixels
    e_valid: jnp.ndarray    # [E] bool
    e_info: jnp.ndarray     # [E] inverse measurement variance
    # Stereo observations (None = mono problem): per-edge measured inverse
    # depth (<=0 where the keypoint has no right-eye match) and bf =
    # baseline*fx. Edges with e_invd>0 become the reference's 3-dim
    # (u_L, v_L, u_R) stereo edges with chi2 gate 7.815
    # (EdgeStereoSE3ProjectXYZ, include/G2oTypes.h:497-575): for rectified
    # pinhole the third residual is exactly u_R - u_R_hat = r_u -
    # bf*(invd_meas - 1/z_hat); for fisheye (KB8) the rectified identity
    # does not hold and the third residual is the pure weighted
    # inverse-depth term bf*(invd_meas - 1/z_hat) (right-cam constraint in
    # disparity form — design-divergent from the reference's explicit
    # right-camera reprojection edges, same metric content).
    e_invd: jnp.ndarray = None   # [E] or None
    bf: jnp.ndarray = None       # scalar


# Closed-form small-block inverses (shared hot-path kernels; see blockinv.py
# for why jnp.linalg.inv/solve must not appear in jitted SLAM programs).
from .blockinv import inv3 as _inv3, inv6 as _inv6, chol3 as _chol3  # noqa: E402


class BAResult(NamedTuple):
    R_cw: jnp.ndarray
    t_cw: jnp.ndarray
    lm_pos: jnp.ndarray
    e_chi2: jnp.ndarray     # final per-edge chi2
    e_inlier: jnp.ndarray   # [E] bool (chi2 gate + positive depth)
    cost_history: jnp.ndarray


def _edge_terms(cam_kind, prob: BAProblem, R, t, X):
    """Residuals and Jacobians for every edge.
    Returns e [E,D], Jc [E,D,6], Jl [E,D,3], depth [E] — D=2 for mono
    problems, D=3 when the problem carries stereo observations (the third
    row is masked to zero for mono edges; see BAProblem.e_invd)."""
    Re = R[prob.e_kf]
    te = t[prob.e_kf]
    Xe = X[prob.e_lm]
    Xc = lie.se3_apply(Re, te, Xe)
    uv_hat = cameras.project(cam_kind, prob.cam_params, Xc)
    e = prob.e_uv - uv_hat
    Jproj = cameras.project_jac(cam_kind, prob.cam_params, Xc)
    G = -Jproj                                      # de/dXc  [E,2,3]
    if prob.e_invd is not None and prob.bf is not None:
        z = jnp.maximum(Xc[..., 2], 1e-6)
        has3 = (prob.e_invd > 0).astype(jnp.float32)
        rect = 1.0 if cam_kind == cameras.PINHOLE else 0.0
        # u_R_meas - u_R_hat = (u_L_meas - bf*invd) - (u_L_hat - bf/z)
        #                    = e_u - bf*(invd - 1/z)
        r3 = rect * e[:, 0] - prob.bf * (prob.e_invd - 1.0 / z)
        # dr3/dXc = rect*du-residual/dXc - [0,0,bf/z^2]
        ez = jnp.zeros_like(G[:, :1, :]).at[:, 0, 2].set(prob.bf / (z * z))
        G3 = rect * G[:, :1, :] - ez
        e = jnp.concatenate([e, (has3 * r3)[:, None]], axis=1)
        G = jnp.concatenate([G, has3[:, None, None] * G3], axis=1)
    hatX = lie.so3_hat(Xc)
    # For residual row r with dr/dXc = g: dr/drho = g, dr/dphi = -g @ hat(Xc).
    Jc = jnp.concatenate([G, -jnp.einsum("eij,ejk->eik", G, hatX)], axis=-1)
    Jl = jnp.einsum("eij,ejk->eik", G, Re)          # dr/dXw = G @ R
    return e, Jc, Jl, Xc[..., 2]


@functools.partial(jax.jit,
                   static_argnames=("cam_kind", "iters", "cg_iters", "phases",
                                    "solver", "lm_cap", "red_cg_iters",
                                    "red_solver", "kf_major"))
def solve_ba(prob: BAProblem, cam_kind: int = cameras.PINHOLE,
             iters: int = 10, cg_iters: int = 20,
             chi2_th: float = robust.CHI2_MONO,
             lam0: float = 1e-4, phases: int = 2,
             solver: str = "schur", lm_cap: int | None = None,
             red_cg_iters: int = 32, red_solver: str = "cg",
             kf_major: bool = False) -> BAResult:
    """`phases` > 1 reproduces the reference's two-phase local BA: optimize,
    hard-drop chi2 outlier edges, re-optimize (src/Optimizer.cc:2055-2130).

    solver:
      "schur" — exact landmark elimination with a dense [6Kw,6Kw] reduced camera
        solve (the g2o BlockSolver_6_3 equivalent). Materializes a [Lw,Kw,6,3]
        cross tensor: right for local windows (Kw <= ~64); exact solves matter in
        low-parallax geometry where block-Jacobi PCG stalls on the
        translation-vs-structure mode.
      "pcg" — matrix-free block-Jacobi PCG; O(E) memory, shards over edges
        (the global/distributed path).

    lm_cap: compact the landmark VARIABLES to a fixed capacity with a
      static-size nonzero gather (local windows optimize ~1-4k of the 8-16k
      table slots; running the Schur elimination over the full padded table
      wastes HBM bandwidth). Edges to landmarks beyond the cap (or outside
      lm_opt_mask) still constrain poses — those landmarks are just held
      fixed, exactly like lm_opt_mask=False today.

    kf_major: HARD CONTRACT, not a hint — the edge list must be laid out
      exactly keyframe-major: e_kf == repeat(arange(Kw), E // Kw) (the layout
      _ba_window_args and _build_global_problem produce; every keypoint slot
      of window keyframe k occupies edge rows [k*N, (k+1)*N)). Any permuted
      or differently-padded layout whose E happens to divide Kw computes
      WRONG pose reductions with no error (only E % Kw != 0 fails loudly at
      trace time). A caller building its own edge list must pass
      kf_major=False. Enables scatter-free segment sums:
      pose-side reductions become reshape-sums and landmark-side reductions
      become one-hot MXU contractions. XLA scatters cost ~0.3-1.5 ms EACH on
      TPU; with 5 per LM step they dominated the whole local BA.
    """
    Kw = prob.R_cw.shape[0]
    L_full = prob.lm_pos.shape[0]
    if lm_cap is not None and lm_cap < L_full:
        # Compact the landmark VARIABLES: residuals still gather from the full
        # table; only the Schur/variable-block arrays shrink to [C(+1)].
        C = lm_cap
        var_idx = jnp.nonzero(prob.lm_opt_mask, size=C, fill_value=L_full)[0]
        pad = var_idx >= L_full
        var_c = jnp.clip(var_idx, 0, L_full - 1)
        inv = jnp.full((L_full,), C, jnp.int32).at[var_c].set(
            jnp.where(pad, C, jnp.arange(C, dtype=jnp.int32)), mode="drop")
        e_lmv = inv[prob.e_lm]          # [E] in [0..C]; C = fixed/overflow
        lmask_c = prob.lm_opt_mask[var_c] & ~pad
    else:
        C = L_full
        var_c = jnp.arange(L_full)
        e_lmv = prob.e_lm
        lmask_c = prob.lm_opt_mask
    Lw = C
    pmask = prob.pose_opt_mask.astype(jnp.float32)[:, None]      # [Kw,1]
    lmask = lmask_c.astype(jnp.float32)[:, None]                 # [Lw,1]
    # Per-edge chi2 gate: stereo edges (3-dim) use the 3-dof 95% gate 7.815,
    # mono edges the 2-dof 5.991 (reference src/Optimizer.cc:105-107).
    if prob.e_invd is not None:
        delta2 = jnp.where(prob.e_invd > 0, robust.CHI2_STEREO, chi2_th)
    else:
        delta2 = chi2_th
    E = prob.e_kf.shape[0]

    # One-hot landmark segment sums only pay off while the [E, Lw+1] f32
    # matrix stays small (local windows: 8192x2050 = 67 MB). The global BA
    # (E ~ 41k, Lw ~ 8k) would need >1 GB — keep scatters there.
    use_onehot = kf_major and E * (Lw + 1) <= 32_000_000
    if kf_major:
        # Pose-side reductions are reshape-sums under the kf-major layout —
        # free either way (see docstring).
        Ne = E // Kw

        def seg_c(vals):  # [E,x] -> [Kw,x]
            return vals.reshape((Kw, Ne) + vals.shape[1:]).sum(axis=1)

        seg_cc = seg_c
    else:
        def seg_c(vals):  # [E,x] -> [Kw,x]
            return jnp.zeros((Kw,) + vals.shape[1:], vals.dtype
                             ).at[prob.e_kf].add(vals)

        seg_cc = seg_c
    if use_onehot:
        # Scatter-free landmark reductions (see docstring). The one-hot is
        # built ONCE and reused by every LM step / matvec: [E, Lw+1] f32
        # (last row = the fixed/overflow bucket). The package runs with
        # jax_default_matmul_precision=highest, so these f32 contractions
        # are exact segment sums.
        oh_l = (e_lmv[:, None]
                == jnp.arange(Lw + 1, dtype=e_lmv.dtype)[None, :]
                ).astype(jnp.float32)                            # [E, Lw+1]
        oh_l_k = oh_l.reshape(Kw, Ne, Lw + 1)

        def seg_l(vals):  # [E,x] -> [Lw,x]
            flat = vals.reshape(E, -1)
            return (oh_l.T @ flat)[:Lw].reshape((Lw,) + vals.shape[1:])

        seg_ll = seg_l

        def seg_cross(vals):  # [E,6,3] -> [Lw,Kw,6,3] (W^T blocks)
            v = vals.reshape(Kw, Ne, 18)
            out = jnp.einsum("knc,knx->ckx", oh_l_k, v)          # [Lw+1,Kw,18]
            return out[:Lw].reshape(Lw, Kw, 6, 3)
    else:
        def seg_l(vals):  # [E,x] -> [Lw,x] (row Lw = fixed/overflow bucket)
            return jnp.zeros((Lw + 1,) + vals.shape[1:], vals.dtype
                             ).at[e_lmv].add(vals)[:Lw]

        seg_ll = seg_l

        def seg_cross(vals):  # [E,6,3] -> [Lw,Kw,6,3]
            return jnp.zeros((Lw + 1, Kw, 6, 3)).at[
                e_lmv, prob.e_kf].add(vals)[:Lw]

    def lm_step(carry, _):
        R, t, X, lam, prev_cost = carry
        e, Jc, Jl, depth = _edge_terms(cam_kind, prob, R, t, X)
        chi2 = jnp.sum(e * e, axis=-1) * prob.e_info
        w_rob = robust.huber_weight(chi2, delta2)
        w = w_rob * prob.e_info * prob.e_valid * (depth > 0.05)

        # Gradient.
        we = w[:, None] * e                                      # [E,2]
        g_c = seg_c(jnp.einsum("eki,ek->ei", Jc, we)) * pmask    # [Kw,6]
        g_l = seg_l(jnp.einsum("eki,ek->ei", Jl, we)) * lmask    # [Lw,3]

        # Block-diagonal (for damping + preconditioner).
        Hcc = seg_cc(jnp.einsum("eki,e,ekj->eij", Jc, w, Jc))
        Hll = seg_ll(jnp.einsum("eki,e,ekj->eij", Jl, w, Jl))
        dc = jnp.diagonal(Hcc, axis1=-2, axis2=-1)               # [Kw,6]
        dl = jnp.diagonal(Hll, axis1=-2, axis2=-1)               # [Lw,3]

        # LM damping: additive lam * diag(H) per block.
        Hcc_d = Hcc + jax.vmap(jnp.diag)(lam * jnp.maximum(dc, 1e-6))
        Hll_d = Hll + jax.vmap(jnp.diag)(lam * jnp.maximum(dl, 1e-6))
        # Fixed variables: make their blocks identity so PCG leaves them at 0.
        Hcc_d = jnp.where(pmask[:, :, None] > 0, Hcc_d, jnp.eye(6)[None])
        Hll_d = jnp.where(lmask[:, :, None] > 0, Hll_d, jnp.eye(3)[None])
        Pc = _inv6(Hcc_d + 1e-9 * jnp.eye(6)[None])
        Pl = _inv3(Hll_d + 1e-9 * jnp.eye(3)[None])

        lam_dc = lam * jnp.maximum(dc, 1e-6)
        lam_dl = lam * jnp.maximum(dl, 1e-6)

        def matvec(v_c, v_l):
            v_c = v_c * pmask
            v_l = v_l * lmask
            v_lp = jnp.concatenate([v_l, jnp.zeros((1, 3), v_l.dtype)])
            u = (jnp.einsum("eki,ei->ek", Jc, v_c[prob.e_kf])
                 + jnp.einsum("eki,ei->ek", Jl, v_lp[e_lmv])) * w[:, None]
            out_c = seg_c(jnp.einsum("eki,ek->ei", Jc, u)) + lam_dc * v_c
            out_l = seg_l(jnp.einsum("eki,ek->ei", Jl, u)) + lam_dl * v_l
            return out_c * pmask, out_l * lmask

        def precond(r_c, r_l):
            return (jnp.einsum("kij,kj->ki", Pc, r_c) * pmask,
                    jnp.einsum("lij,lj->li", Pl, r_l) * lmask)

        b_c, b_l = -g_c, -g_l

        def schur_solve():
            """Exact: eliminate landmarks, dense reduced camera system.

            MXU formulation: with Pl = L L^T (3x3 Cholesky), the cross term
            sum_l W_l Pl W_l^T = B B^T with B = [W_l L]_l stacked — ONE
            [6Kw, 3Lw] x [3Lw, 6Kw] matmul instead of an awkward 5-way einsum.
            """
            n = 6 * Kw
            # Cross blocks W[l,k] = sum_e Jc^T w Jl for edges (k,l). [Lw,Kw,6,3]
            Wt = seg_cross(jnp.einsum("eki,e,ekj->eij", Jc, w, Jl))
            Wt = Wt * pmask[None, :, :, None] * lmask[:, None, :, None]
            Hll_inv = Pl  # damped+masked inverse of landmark blocks
            L3 = _chol3(Hll_inv)
            B = jnp.einsum("lkab,lbc->lkac", Wt, L3)          # [Lw,Kw,6,3]
            Bf = B.transpose(1, 2, 0, 3).reshape(n, Lw * 3)   # [6Kw, 3Lw]
            with jax.default_matmul_precision("highest"):
                S = -(Bf @ Bf.T)
            S = S.reshape(Kw, 6, Kw, 6)
            S = S.at[jnp.arange(Kw), :, jnp.arange(Kw), :].add(Hcc_d)
            # rhs: b_c - W Pl b_l = b_c - B (L^T b_l)
            Ltb = jnp.einsum("lij,li->lj", L3, b_l)           # [Lw,3]
            rhs = b_c - jnp.einsum("lkac,lc->ka", B, Ltb)
            # Reduced camera solve: the landmark elimination leaves a small
            # well-conditioned SPD system; block-Jacobi PCG converges in a few
            # dozen iterations of pure vector ops, where an LU/Cholesky lowers
            # to a sequential loop on TPU (~ms per LM step).
            Sm = S.reshape(n, n) + 1e-8 * jnp.eye(n)
            Sd = S[jnp.arange(Kw), :, jnp.arange(Kw), :]        # [Kw,6,6]
            Pr = _inv6(Sd + 1e-7 * jnp.eye(6)[None])

            def red_mv(v):
                return (Sm @ v.reshape(n)).reshape(Kw, 6)

            def red_pc(r):
                return jnp.einsum("kij,kj->ki", Pr, r)

            b_r = rhs * pmask
            if red_solver == "direct":
                # Closed-form recursive inverse of the [6Kw,6Kw] reduced
                # system (blockinv.py): O(log n) depth of vectorized matmuls
                # instead of red_cg_iters SEQUENTIAL CG iterations — the CG
                # loop is pure latency on TPU at this size. Jacobi-equilibrate
                # first (f32; the damped system spans wide scales).
                from .blockinv import invn
                d_eq = jnp.sqrt(jnp.maximum(jnp.diagonal(Sm), 1e-12))
                Se = Sm / d_eq[:, None] / d_eq[None, :]
                Sei = invn(Se + 1e-7 * jnp.eye(n))
                bv = b_r.reshape(n) / d_eq
                y = Sei @ bv
                # one refinement round recovers pivoted-solve accuracy
                y = y + Sei @ (bv - Se @ y)
                dx_c = (y / d_eq).reshape(Kw, 6) * pmask
                dx_l = jnp.einsum(
                    "lbc,lc->lb", Hll_inv,
                    b_l - jnp.einsum("lkab,ka->lb", Wt, dx_c)) * lmask
                return dx_c, dx_l
            z0 = red_pc(b_r)
            rz0 = jnp.sum(b_r * z0)

            def red_cg(carry, _):
                x, r, p_, rz = carry
                Ap = red_mv(p_)
                pAp = jnp.sum(p_ * Ap)
                alpha = rz / jnp.where(jnp.abs(pAp) < 1e-20, 1e-20, pAp)
                x = x + alpha * p_
                r = r - alpha * Ap
                z = red_pc(r)
                rz_n = jnp.sum(r * z)
                beta = rz_n / jnp.where(jnp.abs(rz) < 1e-20, 1e-20, rz)
                return (x, r, z + beta * p_, rz_n), None

            (dx_c, *_), _ = jax.lax.scan(
                red_cg, (jnp.zeros_like(b_r), b_r, z0, rz0), None,
                length=red_cg_iters)
            dx_c = dx_c * pmask
            dx_l = jnp.einsum("lbc,lc->lb",
                              Hll_inv,
                              b_l - jnp.einsum("lkab,ka->lb", Wt, dx_c)) * lmask
            return dx_c, dx_l

        def cg_body(carry, _):
            x_c, x_l, r_c, r_l, p_c, p_l, rz = carry
            Ap_c, Ap_l = matvec(p_c, p_l)
            pAp = jnp.sum(p_c * Ap_c) + jnp.sum(p_l * Ap_l)
            alpha = rz / jnp.where(jnp.abs(pAp) < 1e-20, 1e-20, pAp)
            x_c = x_c + alpha * p_c
            x_l = x_l + alpha * p_l
            r_c = r_c - alpha * Ap_c
            r_l = r_l - alpha * Ap_l
            z_c, z_l = precond(r_c, r_l)
            rz_new = jnp.sum(r_c * z_c) + jnp.sum(r_l * z_l)
            beta = rz_new / jnp.where(jnp.abs(rz) < 1e-20, 1e-20, rz)
            p_c = z_c + beta * p_c
            p_l = z_l + beta * p_l
            return (x_c, x_l, r_c, r_l, p_c, p_l, rz_new), None

        if solver == "schur":
            dx_c, dx_l = schur_solve()
        else:
            z0_c, z0_l = precond(b_c, b_l)
            rz0 = jnp.sum(b_c * z0_c) + jnp.sum(b_l * z0_l)
            cg0 = (jnp.zeros_like(b_c), jnp.zeros_like(b_l), b_c, b_l,
                   z0_c, z0_l, rz0)
            (dx_c, dx_l, *_), _ = jax.lax.scan(cg_body, cg0, None,
                                               length=cg_iters)

        # Apply update (left-multiplicative pose perturbation).
        dR, dt = lie.se3_exp(dx_c)
        R_new = lie.normalize_rotation(jnp.einsum("kij,kjl->kil", dR, R))
        t_new = jnp.einsum("kij,kj->ki", dR, t) + dt
        # Keep fixed variables bit-exact (SVD renormalization would jitter them).
        R_new = jnp.where(pmask[:, :, None] > 0, R_new, R)
        t_new = jnp.where(pmask > 0, t_new, t)
        X_new = X.at[var_c].add(jnp.where(lmask > 0, dx_l, 0.0))

        e_new, _, _, d_new = _edge_terms(cam_kind, prob, R_new, t_new, X_new)
        chi2_new = jnp.sum(e_new * e_new, axis=-1) * prob.e_info
        mask_e = prob.e_valid.astype(jnp.float32)
        cost_old = jnp.sum(_huber_cost(chi2, delta2) * mask_e)
        cost_new = jnp.sum(_huber_cost(chi2_new, delta2) * mask_e)
        improved = cost_new < cost_old
        R = jnp.where(improved, R_new, R)
        t = jnp.where(improved, t_new, t)
        X = jnp.where(improved, X_new, X)
        lam = jnp.clip(jnp.where(improved, lam * 0.3, lam * 5.0), 1e-8, 1e4)
        return (R, t, X, lam, jnp.where(improved, cost_new, cost_old)), cost_old

    R, t, X = prob.R_cw, prob.t_cw, prob.lm_pos
    cost_list = []
    for phase in range(phases):
        init = (R, t, X, jnp.float32(lam0), jnp.float32(jnp.inf))
        (R, t, X, _, _), costs = jax.lax.scan(lm_step, init, None, length=iters)
        cost_list.append(costs)
        if phase < phases - 1:
            # Hard-drop outlier edges for the next phase.
            e_p, _, _, depth_p = _edge_terms(cam_kind, prob, R, t, X)
            chi2_p = jnp.sum(e_p * e_p, axis=-1) * prob.e_info
            keep = (chi2_p <= delta2) & (depth_p > 0)
            prob = prob._replace(e_valid=prob.e_valid & keep)
    costs = jnp.concatenate(cost_list)

    e, _, _, depth = _edge_terms(cam_kind, prob, R, t, X)
    chi2 = jnp.sum(e * e, axis=-1) * prob.e_info
    inlier = (chi2 <= delta2) & (depth > 0) & prob.e_valid
    return BAResult(R_cw=R, t_cw=t, lm_pos=X, e_chi2=chi2, e_inlier=inlier,
                    cost_history=costs)


def _huber_cost(chi2, delta2):
    delta = jnp.sqrt(delta2)
    r = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    return jnp.where(chi2 <= delta2, chi2, 2.0 * delta * r - delta2)
