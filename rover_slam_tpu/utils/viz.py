"""Headless map/trajectory visualization.

TPU-native stand-in for the reference's Pangolin viewer stack
(reference: src/Viewer.cc, FrameDrawer.cc (tracked-point overlay),
MapDrawer.cc (map points + keyframe frusta)). Live GUI rendering is
host-environment-dependent; this module renders the same content to image
files / arrays so headless runs (the normal TPU deployment) keep the
observability: trajectory + map point cloud + per-frame tracking overlay.
"""
from __future__ import annotations

import numpy as np


def _plt():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def plot_map(state, out_path: str, trajectory=None, gt=None, title=""):
    """Top-down (x-z) map points + keyframe positions + optional trajectory
    (reference MapDrawer::DrawMapPoints/DrawKeyFrames)."""
    plt = _plt()
    lm = np.asarray(state.lm_pos)
    lm_ok = np.asarray(state.lm_active)
    kfa = np.asarray(state.kf_active)
    R = np.asarray(state.kf_R_cw)
    t = np.asarray(state.kf_t_cw)
    centers = np.stack([-R[i].T @ t[i] for i in range(len(t))])

    fig, ax = plt.subplots(figsize=(8, 8))
    ax.scatter(lm[lm_ok, 0], lm[lm_ok, 2], s=1, c="#999999", label="landmarks")
    ax.scatter(centers[kfa, 0], centers[kfa, 2], s=12, c="#1f77b4",
               label="keyframes")
    if trajectory is not None:
        tr = np.asarray(trajectory)
        ax.plot(tr[:, 0], tr[:, 2], "-", c="#2ca02c", lw=1, label="trajectory")
    if gt is not None:
        g = np.asarray(gt)
        ax.plot(g[:, 0], g[:, 2], "--", c="#d62728", lw=1, label="ground truth")
    ax.set_xlabel("x [m]"); ax.set_ylabel("z [m]")
    ax.set_aspect("equal"); ax.legend(loc="best"); ax.set_title(title)
    fig.savefig(out_path, dpi=110, bbox_inches="tight")
    plt.close(fig)
    return out_path


def draw_frame_overlay(image: np.ndarray, kpts: np.ndarray,
                       landmark_idx: np.ndarray, out_path: str | None = None):
    """Tracked-point overlay (reference FrameDrawer::DrawFrame: green = tracked
    map point, blue = unmatched keypoint). Returns an RGB array."""
    plt = _plt()
    h, w = image.shape[:2]
    fig, ax = plt.subplots(figsize=(w / 100, h / 100))
    ax.imshow(image, cmap="gray", vmin=0, vmax=1)
    k = np.asarray(kpts)
    tracked = np.asarray(landmark_idx) >= 0
    ax.scatter(k[~tracked, 0], k[~tracked, 1], s=4, c="#1f77b4", marker="o")
    ax.scatter(k[tracked, 0], k[tracked, 1], s=6, c="#2ca02c", marker="o")
    ax.set_xlim(0, w); ax.set_ylim(h, 0); ax.axis("off")
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
    if out_path:
        fig.savefig(out_path, dpi=100, bbox_inches="tight", pad_inches=0)
    plt.close(fig)
    return buf
