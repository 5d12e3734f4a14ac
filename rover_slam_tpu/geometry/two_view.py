"""Monocular two-view initialization: all-hypotheses-batched RANSAC of
essential (fundamental in normalized coords) and homography models.

TPU-native replacement for the reference's TwoViewReconstruction
(reference: src/TwoViewReconstruction.cc:49-158 — 200 RANSAC iterations of H and F
in two parallel host threads, model selection SH/(SH+SF), ReconstructH Faugeras
8-motion / ReconstructF 4-motion disambiguation, cheirality+parallax checks).

Here the two "threads" become two vmapped hypothesis batches evaluated in one
program: 200 x (8-point E, 4-point H) minimal solves are batched linear algebra,
scoring is a [hyp, M] broadcast, and motion disambiguation triangulates all
candidate motions at once. Works on bearing coordinates (z=1 plane), so the
fundamental matrix specializes to the essential matrix and no intrinsics appear.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import lie, triangulation

# Score thresholds (reference TwoViewReconstruction: sigma-based chi2 gates,
# 3.841 for F, 5.991 for H, in *pixels*). We work in normalized coords; callers
# pass sigma_n ~= sigma_px / focal.
CHI2_F = 3.841
CHI2_H = 5.991


class TwoViewResult(NamedTuple):
    success: jnp.ndarray     # bool
    R_21: jnp.ndarray        # [3,3] rotation cam1->cam2 (x2 = R x1 + t)
    t_21: jnp.ndarray        # [3] (unit scale)
    points3d: jnp.ndarray    # [M,3] in cam1 frame
    is_triangulated: jnp.ndarray  # [M] bool
    used_homography: jnp.ndarray  # bool


def _hartley_T(x, w):
    """Normalization transform: center + isotropic scale to RMS sqrt(2)."""
    wsum = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(x * w[:, None], axis=0) / wsum
    d = jnp.sqrt(jnp.sum((x - mean) ** 2, axis=1))
    rms = jnp.sum(d * w) / wsum
    s = jnp.sqrt(2.0) / jnp.maximum(rms, 1e-9)
    T = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    T = T.at[0, 0].set(s).at[1, 1].set(s)
    T = T.at[0, 2].set(-s * mean[0]).at[1, 2].set(-s * mean[1])
    return T, (x - mean) * s


def _eight_point_E(x1, x2, w=None):
    """(Weighted) 8-point algorithm with Hartley normalization.
    x1,x2: [M,2] z=1-plane coords -> E [3,3]. With w (mask/weights [M]) this
    doubles as the all-inlier refinement fit (f32 needs the normalization)."""
    if w is None:
        w = jnp.ones(x1.shape[0], x1.dtype)
    T1, x1n = _hartley_T(x1, w)
    T2, x2n = _hartley_T(x2, w)
    u1, v1 = x1n[:, 0], x1n[:, 1]
    u2, v2 = x2n[:, 0], x2n[:, 1]
    A = jnp.stack([u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1,
                   jnp.ones_like(u1)], axis=1)
    A = A * w[:, None]
    _, _, Vt = jnp.linalg.svd(A, full_matrices=False)
    En = Vt[8].reshape(3, 3)
    E = T2.T @ En @ T1
    # Enforce rank-2 with equal singular values (essential constraint).
    U, S, Vt2 = jnp.linalg.svd(E)
    s = (S[0] + S[1]) / 2.0
    return U @ jnp.diag(jnp.array([s, s, 0.0])) @ Vt2


def _four_point_H(x1, x2):
    """DLT homography from 4 points. x1,x2: [4,2] -> H [3,3] with x2 ~ H x1."""
    def rows(p1, p2):
        x, y = p1[0], p1[1]
        u, v = p2[0], p2[1]
        r1 = jnp.array([-x, -y, -1.0, 0.0, 0.0, 0.0, u * x, u * y, u])
        r2 = jnp.array([0.0, 0.0, 0.0, -x, -y, -1.0, v * x, v * y, v])
        return jnp.stack([r1, r2])

    A = jnp.concatenate([rows(x1[i], x2[i]) for i in range(4)], axis=0)  # [8,9]
    # Solve via SVD of the 8x9 system.
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    H = Vt[8].reshape(3, 3)
    return H / jnp.where(jnp.abs(H[2, 2]) < 1e-9, 1e-9, H[2, 2])


def _epi_chi2(E, x1, x2, sigma2):
    """Symmetric epipolar chi2 per point (reference CheckFundamental)."""
    ones = jnp.ones_like(x1[:, :1])
    p1 = jnp.concatenate([x1, ones], axis=1)  # [M,3]
    p2 = jnp.concatenate([x2, ones], axis=1)
    l2 = p1 @ E.T        # epiline in image 2
    l1 = p2 @ E          # epiline in image 1
    d2 = jnp.sum(p2 * l2, axis=1) ** 2 / jnp.maximum(l2[:, 0] ** 2 + l2[:, 1] ** 2, 1e-12)
    d1 = jnp.sum(p1 * l1, axis=1) ** 2 / jnp.maximum(l1[:, 0] ** 2 + l1[:, 1] ** 2, 1e-12)
    return d1 / sigma2, d2 / sigma2


def _h_chi2(H, x1, x2, sigma2):
    """Symmetric transfer chi2 for homography (reference CheckHomography)."""
    ones = jnp.ones_like(x1[:, :1])
    p1 = jnp.concatenate([x1, ones], axis=1)
    p2 = jnp.concatenate([x2, ones], axis=1)
    Hp1 = p1 @ H.T
    Hinv = jnp.linalg.inv(H + 1e-12 * jnp.eye(3))
    Hp2 = p2 @ Hinv.T
    e12 = jnp.sum((x2 - Hp1[:, :2] / jnp.maximum(jnp.abs(Hp1[:, 2:]), 1e-9)
                   * jnp.sign(Hp1[:, 2:] + 1e-30)) ** 2, axis=1)
    e21 = jnp.sum((x1 - Hp2[:, :2] / jnp.maximum(jnp.abs(Hp2[:, 2:]), 1e-9)
                   * jnp.sign(Hp2[:, 2:] + 1e-30)) ** 2, axis=1)
    return e21 / sigma2, e12 / sigma2


def _decompose_E(E):
    """E -> 4 candidate (R, t)."""
    U, _, Vt = jnp.linalg.svd(E)
    # Ensure proper rotations.
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
    Rs = jnp.stack([R1, R1, R2, R2])
    ts = jnp.stack([t, -t, t, -t])
    return Rs, ts


def _decompose_H(H):
    """Faugeras SVD decomposition of a homography into 8 candidate motions
    (reference ReconstructH, src/TwoViewReconstruction.cc:569+)."""
    U, S, Vt = jnp.linalg.svd(H)
    d1, d2, d3 = S[0], S[1], S[2]
    s = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    V = Vt.T

    d2s = jnp.maximum(d2, 1e-9)
    aux1 = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) / jnp.maximum(d1 * d1 - d3 * d3, 1e-12), 0.0))
    aux3 = jnp.sqrt(jnp.maximum((d2 * d2 - d3 * d3) / jnp.maximum(d1 * d1 - d3 * d3, 1e-12), 0.0))
    x1s = jnp.array([aux1, aux1, -aux1, -aux1])
    x3s = jnp.array([aux3, -aux3, aux3, -aux3])

    # d' = d2 case (4 solutions)
    aux_st = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)) \
        / jnp.maximum((d1 + d3) * d2, 1e-12)
    ct = (d2 * d2 + d1 * d3) / jnp.maximum((d1 + d3) * d2, 1e-12)
    st = jnp.array([aux_st, -aux_st, -aux_st, aux_st])

    def make_pos(i):
        Rp = jnp.array([[ct, 0.0, -st[i]], [0.0, 1.0, 0.0], [st[i], 0.0, ct]])
        R = s * U @ Rp @ Vt
        tp = jnp.array([x1s[i], 0.0, -x3s[i]]) * (d1 - d3)
        t = U @ tp
        return R, t / jnp.maximum(jnp.linalg.norm(t), 1e-12)

    # d' = -d2 case (4 solutions)
    aux_sp = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)) \
        / jnp.maximum((d1 - d3) * d2, 1e-12)
    cp = (d1 * d3 - d2 * d2) / jnp.maximum((d1 - d3) * d2, 1e-12)
    sp = jnp.array([aux_sp, -aux_sp, -aux_sp, aux_sp])

    def make_neg(i):
        Rp = jnp.array([[cp, 0.0, sp[i]], [0.0, -1.0, 0.0], [sp[i], 0.0, -cp]])
        R = s * U @ Rp @ Vt
        tp = jnp.array([x1s[i], 0.0, x3s[i]]) * (d1 + d3)
        t = U @ tp
        return R, t / jnp.maximum(jnp.linalg.norm(t), 1e-12)

    Rs, ts = [], []
    for i in range(4):
        R, t = make_pos(i); Rs.append(R); ts.append(t)
    for i in range(4):
        R, t = make_neg(i); Rs.append(R); ts.append(t)
    return jnp.stack(Rs), jnp.stack(ts)


def _score_motion(R, t, x1, x2, mask, sigma2, min_parallax_cos=0.99998):
    """Triangulate all points under motion (R,t) and count good points
    (reference CheckRT)."""
    ones = jnp.ones_like(x1[:, :1])
    ray1 = jnp.concatenate([x1, ones], axis=1)
    ray2 = jnp.concatenate([x2, ones], axis=1)
    # cam1 at identity (world = cam1), cam2 pose: x2cam = R x1cam + t
    R1w = jnp.eye(3); t1w = jnp.zeros(3)
    Xw, valid = triangulation.triangulate_and_check(
        ray1, ray2, R1w, t1w, R, t, min_parallax_cos=1.1)  # parallax handled below
    # Reprojection chi2 in both views.
    z1 = Xw[:, 2]
    uv1 = Xw[:, :2] / jnp.where(jnp.abs(z1[:, None]) < 1e-9, 1e-9, z1[:, None])
    Xc2 = (R @ Xw.T).T + t
    z2 = Xc2[:, 2]
    uv2 = Xc2[:, :2] / jnp.where(jnp.abs(z2[:, None]) < 1e-9, 1e-9, z2[:, None])
    e1 = jnp.sum((uv1 - x1) ** 2, axis=1) / sigma2
    e2 = jnp.sum((uv2 - x2) ** 2, axis=1) / sigma2
    # Parallax.
    c2_in_1 = -R.T @ t
    n1 = Xw
    n2 = Xw - c2_in_1
    cosp = jnp.sum(n1 * n2, axis=1) / jnp.maximum(
        jnp.linalg.norm(n1, axis=1) * jnp.linalg.norm(n2, axis=1), 1e-12)
    good = (mask & valid & (z1 > 0) & (z2 > 0)
            & (e1 < 4.0 * CHI2_F) & (e2 < 4.0 * CHI2_F))
    parallax_ok = cosp < min_parallax_cos
    ok = good & parallax_ok
    n_good = jnp.sum(ok)
    # Parallax gate statistic: the reference (CheckRT) sorts the good points'
    # parallax cosines ascending and takes index min(50, n-1) — i.e. the
    # 50th-LARGEST-parallax point decides, not the median.
    cos_sorted = jnp.sort(jnp.where(ok, cosp, 2.0))
    idx50 = jnp.clip(jnp.minimum(n_good - 1, 50), 0, cosp.shape[0] - 1)
    med_cos = cos_sorted[idx50]
    return n_good, Xw, ok, med_cos


@functools.partial(jax.jit, static_argnames=("n_hyp",))
def reconstruct(x1, x2, mask, key, sigma_n: float = 0.0022,
                n_hyp: int = 400, min_inliers: int = 50,
                h_ratio: float = 0.45):
    """Full two-view reconstruction: batched RANSAC + model select + motion
    disambiguation.

    x1, x2: [M,2] matched z=1-plane coordinates; mask: [M] valid matches.
    sigma_n: measurement sigma in normalized units (~1px/focal).
    """
    M = x1.shape[0]
    sigma2 = sigma_n * sigma_n
    n_valid = jnp.sum(mask)

    # --- sample hypothesis sets (random among valid; rejection-free via
    # weighted choice over valid indices) ---
    key, k1 = jax.random.split(key)
    p = mask.astype(jnp.float32) / jnp.maximum(n_valid, 1)
    samples = jax.random.choice(k1, M, shape=(n_hyp, 8), replace=True, p=p)

    xs1 = x1[samples]   # [n_hyp, 8, 2]
    xs2 = x2[samples]

    # --- essential hypotheses ---
    Es = jax.vmap(_eight_point_E)(xs1, xs2)
    e1, e2 = jax.vmap(lambda E: _epi_chi2(E, x1, x2, sigma2))(Es)  # [n_hyp, M]
    score_pt_F = (jnp.where(e1 < CHI2_F, CHI2_H - e1, 0.0)
                  + jnp.where(e2 < CHI2_F, CHI2_H - e2, 0.0)) * mask
    inl_F = (e1 < CHI2_F) & (e2 < CHI2_F) & mask
    scores_F = jnp.sum(score_pt_F, axis=1)
    best_F = jnp.argmax(scores_F)
    SF = scores_F[best_F]

    # --- homography hypotheses ---
    Hs = jax.vmap(_four_point_H)(xs1[:, :4], xs2[:, :4])
    h1, h2 = jax.vmap(lambda H: _h_chi2(H, x1, x2, sigma2))(Hs)
    score_pt_H = (jnp.where(h1 < CHI2_H, CHI2_H - h1, 0.0)
                  + jnp.where(h2 < CHI2_H, CHI2_H - h2, 0.0)) * mask
    scores_H = jnp.sum(score_pt_H, axis=1)
    best_H = jnp.argmax(scores_H)
    SH = scores_H[best_H]

    # Model selection. The reference fork uses RH>0.50 (:140-149) but its own
    # comments note ORB-SLAM2's 0.40; epiline error is 1-D vs the 2-D transfer
    # error, so SF is systematically inflated and 0.50 practically never picks
    # H. We use the midpoint (exposed as h_ratio).
    use_H = SH / jnp.maximum(SH + SF, 1e-9) > h_ratio

    # --- LO-RANSAC on the top-k hypotheses: minimal 8-point fits are weak in
    # low-parallax geometry and a bogus sample can out-score a clean one on the
    # truncated epiline metric; refitting several leaders on their consensus
    # sets and re-ranking by inlier count recovers the true model ---
    TOPK = 8
    _, top_idx = jax.lax.top_k(scores_F, TOPK)

    def lo_refit(E0, inl0):
        E_b, inl_b = E0, inl0
        for _ in range(3):
            E_r = _eight_point_E(x1, x2, inl_b.astype(jnp.float32))
            e1r, e2r = _epi_chi2(E_r, x1, x2, sigma2)
            inl_r = (e1r < CHI2_F) & (e2r < CHI2_F) & mask
            better = jnp.sum(inl_r) >= jnp.sum(inl_b)
            E_b = jnp.where(better, E_r, E_b)
            inl_b = jnp.where(better, inl_r, inl_b)
        return E_b, inl_b, jnp.sum(inl_b)

    E_cand, inl_cand, n_cand = jax.vmap(lo_refit)(Es[top_idx], inl_F[top_idx])
    best_lo = jnp.argmax(n_cand)
    E_best = E_cand[best_lo]
    inl_F_best = inl_cand[best_lo]

    # --- candidate motions from both models; evaluate all 12, pick by gate ---
    Rs_E, ts_E = _decompose_E(E_best)
    Rs_H, ts_H = _decompose_H(Hs[best_H])
    Rs = jnp.concatenate([Rs_E, Rs_H])   # [12,3,3]
    ts = jnp.concatenate([ts_E, ts_H])
    model_mask_E = jnp.arange(12) < 4
    model_sel = jnp.where(use_H, ~model_mask_E, model_mask_E)

    inlier_mask = jnp.where(use_H,
                            (h1[best_H] < CHI2_H) & (h2[best_H] < CHI2_H) & mask,
                            inl_F_best)

    n_goods, Xws, goods, med_cos = jax.vmap(
        lambda R, t: _score_motion(R, t, x1, x2, inlier_mask, sigma2))(Rs, ts)
    n_goods = jnp.where(model_sel, n_goods, -1)
    best_m = jnp.argmax(n_goods)
    n_best = n_goods[best_m]
    # Reference success gate (ReconstructF src/TwoViewReconstruction.cc):
    # >=90% of model inliers reconstruct, exactly one motion close to best
    # (nsimilar==1), and median parallax of the winner > 1 degree.
    n_similar = jnp.sum(n_goods > 0.7 * n_best)
    parallax_ok = med_cos[best_m] < jnp.cos(jnp.deg2rad(1.0))
    success = ((n_best >= min_inliers)
               & (n_best >= 0.8 * jnp.sum(inlier_mask))
               & (n_similar == 1)
               & parallax_ok)

    return TwoViewResult(
        success=success,
        R_21=Rs[best_m], t_21=ts[best_m],
        points3d=Xws[best_m],
        is_triangulated=goods[best_m] & success,
        used_homography=use_H,
    )
