"""Distributed bundle adjustment: edges sharded over a device mesh.

This is the first-class distributed component the reference does not have
(SURVEY.md §2.3: the reference is single-process pthreads; the TPU-native
equivalent is pjit/shard_map over a Mesh with ICI collectives).

Decomposition: BA edges (observations) are sharded across devices; pose and
landmark variable blocks are replicated. Every Gauss-Newton matvec is then
  local per-edge contraction -> psum over the edge axis,
i.e. the reduced-system assembly rides the ICI with exactly one all-reduce per
matvec (the "Schur via psum" design from BASELINE.json). Landmark blocks
(H_ll, preconditioner) are computed shard-locally and psum-merged once per
iteration — landmark marginalization stays cheap because segment-sums over a
shard's edges only touch the landmarks that shard observes.

Scaling: with E edges and D devices each matvec does O(E/D) work + one psum of
the (small) variable vector — near-linear until the replicated variable vector
dominates. For keyframe counts beyond one chip's HBM the same code shards
landmarks too (future: reduce_scatter on the landmark axis).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..geometry import lie, cameras
from ..optim import ba as ba_mod
from ..optim import blockinv, robust


def pad_edges_to(prob: ba_mod.BAProblem, multiple: int) -> ba_mod.BAProblem:
    """Pad the edge arrays so they divide evenly across mesh shards."""
    E = prob.e_kf.shape[0]
    pad = (-E) % multiple
    if pad == 0:
        return prob
    return prob._replace(
        e_kf=jnp.pad(prob.e_kf, (0, pad)),
        e_lm=jnp.pad(prob.e_lm, (0, pad)),
        e_uv=jnp.pad(prob.e_uv, ((0, pad), (0, 0))),
        e_valid=jnp.pad(prob.e_valid, (0, pad)),
        e_info=jnp.pad(prob.e_info, (0, pad)),
    )


def _strip_stereo_rows(prob: ba_mod.BAProblem) -> ba_mod.BAProblem:
    """The sharded kernels carry 2-dim mono rows only; surface the drop —
    a stereo system running post-loop global BA through this path loses its
    metric scale constraint for that pass (route stereo GBA to the
    single-chip optim.ba.solve_ba to keep it)."""
    if prob.e_invd is not None:
        import warnings
        warnings.warn(
            "sharded BA: stereo (3-dim) rows stripped — metric scale is "
            "unconstrained in this distributed pass; use the single-chip "
            "solver for stereo global BA.", stacklevel=3)
    return prob._replace(e_invd=None, bf=None)


def solve_ba_sharded(prob: ba_mod.BAProblem, mesh: Mesh,
                     cam_kind: int = cameras.PINHOLE,
                     iters: int = 10, cg_iters: int = 20,
                     chi2_th: float = robust.CHI2_MONO,
                     lam0: float = 1e-4):
    """LM + block-Jacobi PCG with edges sharded over mesh axis 'edges'.

    Returns (R_cw, t_cw, lm_pos, cost_history). Numerics match
    optim.ba.solve_ba(solver='pcg') up to reduction order.
    """
    # Distributed solves run the 2-dim mono rows only for now: strip the
    # optional stereo extension (single-chip solve_ba carries it).
    prob = _strip_stereo_rows(prob)
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    prob = pad_edges_to(prob, n_dev)
    Kw = prob.R_cw.shape[0]
    Lw = prob.lm_pos.shape[0]
    pmask = prob.pose_opt_mask.astype(jnp.float32)[:, None]
    lmask = prob.lm_opt_mask.astype(jnp.float32)[:, None]
    delta2 = chi2_th

    edge_spec = ba_mod.BAProblem(
        R_cw=P(), t_cw=P(), pose_opt_mask=P(), lm_pos=P(), lm_opt_mask=P(),
        cam_params=P(),
        e_kf=P(axis), e_lm=P(axis), e_uv=P(axis), e_valid=P(axis),
        e_info=P(axis))

    def shard_fn(sp: ba_mod.BAProblem):
        """Runs per-device on its edge shard; variables replicated."""

        def seg_c(vals):
            return jax.lax.psum(
                jnp.zeros((Kw, 6), vals.dtype).at[sp.e_kf].add(vals), axis)

        def seg_l(vals):
            return jax.lax.psum(
                jnp.zeros((Lw, 3), vals.dtype).at[sp.e_lm].add(vals), axis)

        def edge_terms(R, t, X):
            Re, te, Xe = R[sp.e_kf], t[sp.e_kf], X[sp.e_lm]
            Xc = lie.se3_apply(Re, te, Xe)
            uv_hat = cameras.project(cam_kind, sp.cam_params, Xc)
            e = sp.e_uv - uv_hat
            Jp = cameras.project_jac(cam_kind, sp.cam_params, Xc)
            hatX = lie.so3_hat(Xc)
            Jc = jnp.concatenate([-Jp, jnp.einsum("eij,ejk->eik", Jp, hatX)],
                                 axis=-1)
            Jl = -jnp.einsum("eij,ejk->eik", Jp, Re)
            return e, Jc, Jl, Xc[..., 2]

        def lm_step(carry, _):
            R, t, X, lam, _ = carry
            e, Jc, Jl, depth = edge_terms(R, t, X)
            chi2 = jnp.sum(e * e, axis=-1) * sp.e_info
            w = (robust.huber_weight(chi2, delta2) * sp.e_info
                 * sp.e_valid * (depth > 0.05))

            we = w[:, None] * e
            g_c = seg_c(jnp.einsum("eki,ek->ei", Jc, we)) * pmask
            g_l = seg_l(jnp.einsum("eki,ek->ei", Jl, we)) * lmask

            Hcc = jax.lax.psum(
                jnp.zeros((Kw, 6, 6)).at[sp.e_kf].add(
                    jnp.einsum("eki,e,ekj->eij", Jc, w, Jc)), axis)
            Hll = jax.lax.psum(
                jnp.zeros((Lw, 3, 3)).at[sp.e_lm].add(
                    jnp.einsum("eki,e,ekj->eij", Jl, w, Jl)), axis)
            dc = jnp.diagonal(Hcc, axis1=-2, axis2=-1)
            dl = jnp.diagonal(Hll, axis1=-2, axis2=-1)
            lam_dc = lam * jnp.maximum(dc, 1e-6)
            lam_dl = lam * jnp.maximum(dl, 1e-6)
            Hcc_d = Hcc + jax.vmap(jnp.diag)(lam_dc)
            Hll_d = Hll + jax.vmap(jnp.diag)(lam_dl)
            Hcc_d = jnp.where(pmask[:, :, None] > 0, Hcc_d, jnp.eye(6)[None])
            Hll_d = jnp.where(lmask[:, :, None] > 0, Hll_d, jnp.eye(3)[None])
            # Closed-form batched block inverses (optim/blockinv.py):
            # jnp.linalg.inv on [K,6,6]/[L,3,3] stacks is a sequential loop
            # on TPU and this runs once per LM step per shard.
            Pc = blockinv.inv6(Hcc_d + 1e-9 * jnp.eye(6)[None])
            Pl = blockinv.inv3(Hll_d + 1e-9 * jnp.eye(3)[None])

            def matvec(v_c, v_l):
                v_c = v_c * pmask
                v_l = v_l * lmask
                u = (jnp.einsum("eki,ei->ek", Jc, v_c[sp.e_kf])
                     + jnp.einsum("eki,ei->ek", Jl, v_l[sp.e_lm])) * w[:, None]
                out_c = seg_c(jnp.einsum("eki,ek->ei", Jc, u)) + lam_dc * v_c
                out_l = seg_l(jnp.einsum("eki,ek->ei", Jl, u)) + lam_dl * v_l
                return out_c * pmask, out_l * lmask

            def precond(r_c, r_l):
                return (jnp.einsum("kij,kj->ki", Pc, r_c) * pmask,
                        jnp.einsum("lij,lj->li", Pl, r_l) * lmask)

            b_c, b_l = -g_c, -g_l

            def cg_body(c, _):
                x_c, x_l, r_c, r_l, p_c, p_l, rz = c
                Ap_c, Ap_l = matvec(p_c, p_l)
                pAp = jnp.sum(p_c * Ap_c) + jnp.sum(p_l * Ap_l)
                alpha = rz / jnp.where(jnp.abs(pAp) < 1e-20, 1e-20, pAp)
                x_c += alpha * p_c; x_l += alpha * p_l
                r_c -= alpha * Ap_c; r_l -= alpha * Ap_l
                z_c, z_l = precond(r_c, r_l)
                rz_new = jnp.sum(r_c * z_c) + jnp.sum(r_l * z_l)
                beta = rz_new / jnp.where(jnp.abs(rz) < 1e-20, 1e-20, rz)
                return (x_c, x_l, r_c, r_l, z_c + beta * p_c, z_l + beta * p_l,
                        rz_new), None

            z0c, z0l = precond(b_c, b_l)
            rz0 = jnp.sum(b_c * z0c) + jnp.sum(b_l * z0l)
            (dx_c, dx_l, *_), _ = jax.lax.scan(
                cg_body, (jnp.zeros_like(b_c), jnp.zeros_like(b_l),
                          b_c, b_l, z0c, z0l, rz0), None, length=cg_iters)

            dR, dt = lie.se3_exp(dx_c)
            R_new = lie.normalize_rotation(jnp.einsum("kij,kjl->kil", dR, R))
            t_new = jnp.einsum("kij,kj->ki", dR, t) + dt
            R_new = jnp.where(pmask[:, :, None] > 0, R_new, R)
            t_new = jnp.where(pmask > 0, t_new, t)
            X_new = jnp.where(lmask > 0, X + dx_l, X)

            e_new, _, _, _ = edge_terms(R_new, t_new, X_new)
            chi2_new = jnp.sum(e_new * e_new, axis=-1) * sp.e_info
            me = sp.e_valid.astype(jnp.float32)
            cost_old = jax.lax.psum(jnp.sum(ba_mod._huber_cost(chi2, delta2) * me), axis)
            cost_new = jax.lax.psum(jnp.sum(ba_mod._huber_cost(chi2_new, delta2) * me), axis)
            improved = cost_new < cost_old
            R = jnp.where(improved, R_new, R)
            t = jnp.where(improved, t_new, t)
            X = jnp.where(improved, X_new, X)
            lam = jnp.clip(jnp.where(improved, lam * 0.3, lam * 5.0), 1e-8, 1e4)
            return (R, t, X, lam, cost_old), cost_old

        init = (sp.R_cw, sp.t_cw, sp.lm_pos, jnp.float32(lam0), jnp.float32(0))
        (R, t, X, _, _), costs = jax.lax.scan(lm_step, init, None, length=iters)
        return R, t, X, costs

    fn = jax.shard_map(shard_fn, mesh=mesh, in_specs=(edge_spec,),
                       out_specs=(P(), P(), P(), P()))
    return jax.jit(fn)(prob)


def make_mesh(n_devices: int | None = None, axis: str = "edges") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]).reshape(n), (axis,))


# ---------------------------------------------------------------------------
# Landmark-sharded BA: variables sharded too (SURVEY.md §7 step 8 — "landmark
# marginalization stays shard-local; landmarks assigned by anchor KF").
# ---------------------------------------------------------------------------

def partition_by_landmark(prob: ba_mod.BAProblem, n_shards: int):
    """Host-side partitioning: landmarks into `n_shards` contiguous blocks,
    every edge onto the shard owning its landmark (so ALL landmark math is
    shard-local). Returns (prob', Ls) where prob' has lm arrays padded to
    n_shards*Ls, e_lm rewritten to SHARD-LOCAL indices, and edges grouped by
    shard with per-shard padding to a common count.
    """
    L = int(prob.lm_pos.shape[0])
    Ls = -(-L // n_shards)
    pad_l = n_shards * Ls - L
    lm_pos = np.asarray(prob.lm_pos)
    lm_opt = np.asarray(prob.lm_opt_mask)
    if pad_l:
        lm_pos = np.concatenate([lm_pos, np.zeros((pad_l, 3), lm_pos.dtype)])
        lm_opt = np.concatenate([lm_opt, np.zeros(pad_l, bool)])

    e_lm = np.asarray(prob.e_lm)
    e_valid = np.asarray(prob.e_valid)
    shard_of = e_lm // Ls                       # [E]
    E = len(e_lm)
    counts = np.bincount(shard_of, minlength=n_shards)
    Es = int(counts.max()) if E else 1
    # Group edges by shard, pad each group to Es with invalid edges.
    order = np.argsort(shard_of, kind="stable")
    idx_grouped = np.full((n_shards, Es), 0, np.int64)
    val_grouped = np.zeros((n_shards, Es), bool)
    off = 0
    for s in range(n_shards):
        c = counts[s]
        idx_grouped[s, :c] = order[off:off + c]
        val_grouped[s, :c] = True
        off += c
    sel = idx_grouped.reshape(-1)
    prob2 = prob._replace(
        lm_pos=jnp.asarray(lm_pos), lm_opt_mask=jnp.asarray(lm_opt),
        e_kf=jnp.asarray(np.asarray(prob.e_kf)[sel]),
        e_lm=jnp.asarray(e_lm[sel] % Ls),       # shard-LOCAL landmark index
        e_uv=jnp.asarray(np.asarray(prob.e_uv)[sel]),
        e_valid=jnp.asarray(e_valid[sel] & val_grouped.reshape(-1)),
        e_info=jnp.asarray(np.asarray(prob.e_info)[sel]),
    )
    return prob2, Ls


def solve_ba_sharded_lm(prob: ba_mod.BAProblem, mesh: Mesh,
                        cam_kind: int = cameras.PINHOLE,
                        iters: int = 10, cg_iters: int = 20,
                        chi2_th: float = robust.CHI2_MONO,
                        lam0: float = 1e-4):
    """LM + block-Jacobi PCG with LANDMARK VARIABLES sharded (not just edges).

    vs solve_ba_sharded: there the whole variable vector (6K poses + 3L
    landmarks) is replicated and every matvec psums 3L floats per device —
    fine for local windows, but at map scale (10^5-10^6 landmarks) the
    collective dominates. Here landmarks and their edges live on one shard
    (contiguous blocks via partition_by_landmark), so the landmark half of
    every matvec is shard-local with NO collective; only the small pose
    vector (6K floats) rides the ICI psum. CG inner products add one scalar
    psum. Per-matvec collective volume drops from O(K+L) to O(K).

    Returns (R_cw, t_cw, lm_pos [padded to shards*Ls], cost_history).
    """
    # Distributed solves run the 2-dim mono rows only for now: strip the
    # optional stereo extension (single-chip solve_ba carries it).
    prob = _strip_stereo_rows(prob)
    prob, Ls = partition_by_landmark(prob, mesh.devices.size)
    return _solve_partitioned_lm(prob, mesh, Ls, cam_kind=cam_kind,
                                 iters=iters, cg_iters=cg_iters,
                                 chi2_th=chi2_th, lam0=lam0)


def _solve_partitioned_lm(prob: ba_mod.BAProblem, mesh: Mesh, Ls: int,
                          cam_kind: int = cameras.PINHOLE,
                          iters: int = 10, cg_iters: int = 20,
                          chi2_th: float = robust.CHI2_MONO,
                          lam0: float = 1e-4):
    """Solve an ALREADY-partitioned problem (see partition_by_landmark);
    multihost callers partition host-side before building global arrays."""
    axis = mesh.axis_names[0]
    Kw = prob.R_cw.shape[0]
    pmask = prob.pose_opt_mask.astype(jnp.float32)[:, None]
    delta2 = chi2_th

    spec = ba_mod.BAProblem(
        R_cw=P(), t_cw=P(), pose_opt_mask=P(),
        lm_pos=P(axis), lm_opt_mask=P(axis), cam_params=P(),
        e_kf=P(axis), e_lm=P(axis), e_uv=P(axis), e_valid=P(axis),
        e_info=P(axis))

    def shard_fn(sp: ba_mod.BAProblem):
        # sp.lm_* are the LOCAL landmark block [Ls]; sp.e_lm indexes it.
        lmask = sp.lm_opt_mask.astype(jnp.float32)[:, None]

        def seg_c(vals):   # pose segments need the cross-shard reduction
            return jax.lax.psum(
                jnp.zeros((Kw, 6), vals.dtype).at[sp.e_kf].add(vals), axis)

        def seg_l(vals):   # landmark segments are shard-local: NO collective
            return jnp.zeros((Ls, 3), vals.dtype).at[sp.e_lm].add(vals)

        def edge_terms(R, t, X):
            Re, te, Xe = R[sp.e_kf], t[sp.e_kf], X[sp.e_lm]
            Xc = lie.se3_apply(Re, te, Xe)
            uv_hat = cameras.project(cam_kind, sp.cam_params, Xc)
            e = sp.e_uv - uv_hat
            Jp = cameras.project_jac(cam_kind, sp.cam_params, Xc)
            hatX = lie.so3_hat(Xc)
            Jc = jnp.concatenate([-Jp, jnp.einsum("eij,ejk->eik", Jp, hatX)],
                                 axis=-1)
            Jl = -jnp.einsum("eij,ejk->eik", Jp, Re)
            return e, Jc, Jl, Xc[..., 2]

        def lm_step(carry, _):
            R, t, X, lam, _ = carry
            e, Jc, Jl, depth = edge_terms(R, t, X)
            chi2 = jnp.sum(e * e, axis=-1) * sp.e_info
            w = (robust.huber_weight(chi2, delta2) * sp.e_info
                 * sp.e_valid * (depth > 0.05))

            we = w[:, None] * e
            g_c = seg_c(jnp.einsum("eki,ek->ei", Jc, we)) * pmask
            g_l = seg_l(jnp.einsum("eki,ek->ei", Jl, we)) * lmask

            Hcc = jax.lax.psum(
                jnp.zeros((Kw, 6, 6)).at[sp.e_kf].add(
                    jnp.einsum("eki,e,ekj->eij", Jc, w, Jc)), axis)
            Hll = jnp.zeros((Ls, 3, 3)).at[sp.e_lm].add(
                jnp.einsum("eki,e,ekj->eij", Jl, w, Jl))
            dc = jnp.diagonal(Hcc, axis1=-2, axis2=-1)
            dl = jnp.diagonal(Hll, axis1=-2, axis2=-1)
            lam_dc = lam * jnp.maximum(dc, 1e-6)
            lam_dl = lam * jnp.maximum(dl, 1e-6)
            Hcc_d = Hcc + jax.vmap(jnp.diag)(lam_dc)
            Hll_d = Hll + jax.vmap(jnp.diag)(lam_dl)
            Hcc_d = jnp.where(pmask[:, :, None] > 0, Hcc_d, jnp.eye(6)[None])
            Hll_d = jnp.where(lmask[:, :, None] > 0, Hll_d, jnp.eye(3)[None])
            Pc = ba_mod._inv6(Hcc_d + 1e-9 * jnp.eye(6)[None])
            Pl = ba_mod._inv3(Hll_d + 1e-9 * jnp.eye(3)[None])

            def matvec(v_c, v_l):
                v_c = v_c * pmask
                v_l = v_l * lmask
                u = (jnp.einsum("eki,ei->ek", Jc, v_c[sp.e_kf])
                     + jnp.einsum("eki,ei->ek", Jl, v_l[sp.e_lm])) * w[:, None]
                out_c = seg_c(jnp.einsum("eki,ek->ei", Jc, u)) + lam_dc * v_c
                out_l = seg_l(jnp.einsum("eki,ek->ei", Jl, u)) + lam_dl * v_l
                return out_c * pmask, out_l * lmask

            def precond(r_c, r_l):
                return (jnp.einsum("kij,kj->ki", Pc, r_c) * pmask,
                        jnp.einsum("lij,lj->li", Pl, r_l) * lmask)

            def dot(a_c, a_l, b_c, b_l):
                # Pose halves are replicated (identical on every shard);
                # landmark halves are disjoint shards -> one scalar psum.
                return (jnp.sum(a_c * b_c)
                        + jax.lax.psum(jnp.sum(a_l * b_l), axis))

            b_c, b_l = -g_c, -g_l

            def cg_body(c, _):
                x_c, x_l, r_c, r_l, p_c, p_l, rz = c
                Ap_c, Ap_l = matvec(p_c, p_l)
                pAp = dot(p_c, p_l, Ap_c, Ap_l)
                alpha = rz / jnp.where(jnp.abs(pAp) < 1e-20, 1e-20, pAp)
                x_c += alpha * p_c; x_l += alpha * p_l
                r_c -= alpha * Ap_c; r_l -= alpha * Ap_l
                z_c, z_l = precond(r_c, r_l)
                rz_new = dot(r_c, r_l, z_c, z_l)
                beta = rz_new / jnp.where(jnp.abs(rz) < 1e-20, 1e-20, rz)
                return (x_c, x_l, r_c, r_l, z_c + beta * p_c,
                        z_l + beta * p_l, rz_new), None

            z0c, z0l = precond(b_c, b_l)
            rz0 = dot(b_c, b_l, z0c, z0l)
            (dx_c, dx_l, *_), _ = jax.lax.scan(
                cg_body, (jnp.zeros_like(b_c), jnp.zeros_like(b_l),
                          b_c, b_l, z0c, z0l, rz0), None, length=cg_iters)

            dR, dt = lie.se3_exp(dx_c)
            R_new = lie.normalize_rotation(jnp.einsum("kij,kjl->kil", dR, R))
            t_new = jnp.einsum("kij,kj->ki", dR, t) + dt
            R_new = jnp.where(pmask[:, :, None] > 0, R_new, R)
            t_new = jnp.where(pmask > 0, t_new, t)
            X_new = jnp.where(lmask > 0, X + dx_l, X)

            e_new, _, _, _ = edge_terms(R_new, t_new, X_new)
            chi2_new = jnp.sum(e_new * e_new, axis=-1) * sp.e_info
            me = sp.e_valid.astype(jnp.float32)
            cost_old = jax.lax.psum(
                jnp.sum(ba_mod._huber_cost(chi2, delta2) * me), axis)
            cost_new = jax.lax.psum(
                jnp.sum(ba_mod._huber_cost(chi2_new, delta2) * me), axis)
            improved = cost_new < cost_old
            R = jnp.where(improved, R_new, R)
            t = jnp.where(improved, t_new, t)
            X = jnp.where(improved, X_new, X)
            lam = jnp.clip(jnp.where(improved, lam * 0.3, lam * 5.0),
                           1e-8, 1e4)
            return (R, t, X, lam, cost_old), cost_old

        init = (sp.R_cw, sp.t_cw, sp.lm_pos, jnp.float32(lam0),
                jnp.float32(0))
        (R, t, X, _, _), costs = jax.lax.scan(lm_step, init, None,
                                              length=iters)
        return R, t, X, costs

    fn = jax.shard_map(shard_fn, mesh=mesh, in_specs=(spec,),
                       out_specs=(P(), P(), P(axis), P()))
    return jax.jit(fn)(prob)
