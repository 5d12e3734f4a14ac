"""Trajectory IO and ATE evaluation.

Replicates the reference's evaluation protocol
(reference: evaluation/evaluate_ate_scale.py — Horn alignment with optimal scale
for monocular, ATE RMSE; System::SaveTrajectoryTUM/SaveTrajectoryEuRoC
src/System.cc:637-1332 write `t tx ty tz qx qy qz qw`).
"""
from __future__ import annotations

import numpy as np


def rot_to_quat(R: np.ndarray) -> np.ndarray:
    """[3,3] -> (qx, qy, qz, qw)."""
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        qw = 0.25 * s
        qx = (R[2, 1] - R[1, 2]) / s
        qy = (R[0, 2] - R[2, 0]) / s
        qz = (R[1, 0] - R[0, 1]) / s
    else:
        i = int(np.argmax(np.diag(R)))
        j, k = (i + 1) % 3, (i + 2) % 3
        s = np.sqrt(max(R[i, i] - R[j, j] - R[k, k] + 1.0, 1e-12)) * 2
        q = np.zeros(4)
        q[i] = 0.25 * s
        q[3] = (R[k, j] - R[j, k]) / s
        q[j] = (R[j, i] + R[i, j]) / s
        q[k] = (R[k, i] + R[i, k]) / s
        qx, qy, qz, qw = q
    return np.array([qx, qy, qz, qw])


def quat_to_rot(q: np.ndarray) -> np.ndarray:
    """(qx, qy, qz, qw) -> [3,3]."""
    x, y, z, w = q / np.linalg.norm(q)
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ])


def save_tum(path: str, times, R_cw, t_cw):
    """Write TUM-format camera trajectory (world-frame poses Twc)."""
    with open(path, "w") as f:
        for i in range(len(times)):
            R_wc = np.asarray(R_cw[i]).T
            p = -R_wc @ np.asarray(t_cw[i])
            q = rot_to_quat(R_wc)
            f.write(f"{times[i]:.6f} {p[0]:.7f} {p[1]:.7f} {p[2]:.7f} "
                    f"{q[0]:.7f} {q[1]:.7f} {q[2]:.7f} {q[3]:.7f}\n")


def load_tum(path: str):
    data = np.loadtxt(path)
    return data[:, 0], data[:, 1:4], data[:, 4:8]


def horn_align(model: np.ndarray, data: np.ndarray, with_scale: bool = True):
    """Align `model` [N,3] to `data` [N,3]: find s, R, t minimizing
    ||data - (s R model + t)||. Same math as evaluate_ate_scale.py (Horn 1987
    closed form with Umeyama scale)."""
    mu_m = model.mean(0)
    mu_d = data.mean(0)
    mc = model - mu_m
    dc = data - mu_d
    W = dc.T @ mc
    U, S, Vt = np.linalg.svd(W)
    D = np.eye(3)
    D[2, 2] = np.sign(np.linalg.det(U @ Vt))
    R = U @ D @ Vt
    if with_scale:
        var_m = (mc ** 2).sum()
        s = (S * np.diag(D)).sum() / max(var_m, 1e-12)
    else:
        s = 1.0
    t = mu_d - s * R @ mu_m
    return s, R, t


def ate_rmse(est_pos: np.ndarray, gt_pos: np.ndarray, with_scale: bool = True):
    """ATE RMSE after (scaled) Horn alignment. Returns (rmse, aligned_est)."""
    s, R, t = horn_align(est_pos, gt_pos, with_scale)
    aligned = (s * (R @ est_pos.T)).T + t
    err = np.linalg.norm(aligned - gt_pos, axis=1)
    return float(np.sqrt((err ** 2).mean())), aligned


def save_kitti(path: str, R_cw, t_cw):
    """Write KITTI-format trajectory: 12 numbers per line, the row-major
    3x4 world pose [R_wc | p_wc] of each frame, no timestamps (reference:
    System::SaveTrajectoryKITTI semantics — the mono_kitti example's output
    format)."""
    with open(path, "w") as f:
        for i in range(len(R_cw)):
            R_wc = np.asarray(R_cw[i]).T
            p = -R_wc @ np.asarray(t_cw[i])
            M = np.concatenate([R_wc, p[:, None]], axis=1).reshape(-1)
            f.write(" ".join(f"{v:.9e}" for v in M) + "\n")


def load_kitti(path: str):
    """Read KITTI-format trajectory -> (R_wc [N,3,3], p_wc [N,3])."""
    data = np.loadtxt(path).reshape(-1, 3, 4)
    return data[:, :, :3], data[:, :, 3]


def rpe_rmse(est_R_wc, est_p_wc, gt_R_wc, gt_p_wc, delta: int = 1):
    """Relative Pose Error over a fixed frame delta (TUM RGB-D benchmark
    protocol, the drift companion to ATE). For each i the error motion is
    E = (Qi^-1 Q(i+d))^-1 (Pi^-1 P(i+d)); returns (trans_rmse [m],
    rot_rmse [rad]). No global alignment — RPE is alignment-invariant."""
    n = len(est_p_wc) - delta
    if n <= 0:
        # Not computable — never report perfect drift for insufficient data.
        return float("nan"), float("nan")
    terr = np.zeros(n)
    rerr = np.zeros(n)
    for i in range(n):
        dR_e = np.asarray(est_R_wc[i]).T @ np.asarray(est_R_wc[i + delta])
        dp_e = np.asarray(est_R_wc[i]).T @ (
            np.asarray(est_p_wc[i + delta]) - np.asarray(est_p_wc[i]))
        dR_g = np.asarray(gt_R_wc[i]).T @ np.asarray(gt_R_wc[i + delta])
        dp_g = np.asarray(gt_R_wc[i]).T @ (
            np.asarray(gt_p_wc[i + delta]) - np.asarray(gt_p_wc[i]))
        E_R = dR_g.T @ dR_e
        terr[i] = np.linalg.norm(dR_g.T @ (dp_e - dp_g))
        c = np.clip((np.trace(E_R) - 1.0) / 2.0, -1.0, 1.0)
        rerr[i] = np.arccos(c)
    return float(np.sqrt((terr ** 2).mean())), \
        float(np.sqrt((rerr ** 2).mean()))


def associate_by_time(t_est, t_gt, max_dt=0.02):
    """Greedy timestamp association (reference evaluation/associate.py)."""
    pairs = []
    j = 0
    for i, te in enumerate(t_est):
        while j + 1 < len(t_gt) and abs(t_gt[j + 1] - te) <= abs(t_gt[j] - te):
            j += 1
        if abs(t_gt[j] - te) <= max_dt:
            pairs.append((i, j))
    return pairs
