"""Stereo rectification: raw (distorted, non-coplanar) pairs -> row-aligned
rectified pairs.

TPU-native replacement for the reference's rectification path
(reference: src/Settings.cc:560-575 builds cv::stereoRectify +
initUndistortRectifyMap maps when Camera.type is "Rectified" with raw input;
src/System.cc:292-299 remaps both images before TrackStereo). The reference
leans on OpenCV; here the map construction is plain numpy at build time and
the per-frame remap is ONE jitted bilinear gather.

Two consumption modes:
- remap(img, map_xy): image-space rectification before feature extraction
  (what the reference does);
- rectify_points(kpts, ...): feature-space rectification of raw keypoint
  coordinates (cheaper when the extractor runs on the raw image and only
  the geometry needs rectified coordinates).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from . import lie


class StereoRectification(NamedTuple):
    """Everything a driver needs to rectify one stereo rig: per-eye remap
    grids (image path), per-eye rectifying rotations (feature path), the
    common rectified intrinsics, and baseline*fx."""
    map1: np.ndarray     # [H, W, 2] raw source px per rectified px, left
    map2: np.ndarray     # right
    K_new: np.ndarray    # (fx, fy, cx, cy) of both rectified views
    bf_px: float         # fx_new * baseline (the reference's mbf)
    R1: np.ndarray       # rectifying rotation, left (x_rect = R1 x_raw)
    R2: np.ndarray       # right


def radtan_distort(xy, dist):
    """Apply radial-tangential distortion to normalized coords.

    xy [..., 2] on the z=1 plane; dist = (k1, k2, p1, p2) (the reference's
    EuRoC calibration model, src/Settings.cc readPinHole distortion path).
    """
    k1, k2, p1, p2 = [dist[i] for i in range(4)]
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    rad = 1.0 + k1 * r2 + k2 * r2 * r2
    xd = x * rad + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * rad + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return np.stack([xd, yd], axis=-1) if isinstance(x, np.ndarray) \
        else jnp.stack([xd, yd], axis=-1)


def radtan_undistort(xy, dist, iters: int = 8):
    """Invert radtan distortion by fixed-point iteration (the standard
    undistortPoints scheme; converges in <8 iters for EuRoC-class coeffs)."""
    out = xy
    for _ in range(iters):
        d = radtan_distort(out, dist) - out   # distortion displacement
        out = xy - d
    return out


def stereo_rectify_maps(K1, D1, K2, D2, R_21, t_21, image_hw
                        ) -> StereoRectification:
    """Bouguet stereo rectification (cv::stereoRectify semantics, alpha=0
    crop skipped): map_i [H, W, 2] gives, for every RECTIFIED pixel, the RAW
    source pixel to sample, K_new = (fx, fy, cx, cy) of both rectified
    views, and bf_px = fx_new * baseline.

    K_i = (fx, fy, cx, cy); D_i = (k1, k2, p1, p2); x_2 = R_21 x_1 + t_21.
    All numpy at build time (runs once per rig, reference builds its maps in
    the Settings constructor the same way)."""
    K1 = np.asarray(K1, np.float64)
    K2 = np.asarray(K2, np.float64)
    R_21 = np.asarray(R_21, np.float64)
    t_21 = np.asarray(t_21, np.float64)
    H, W = image_hw

    om = np.asarray(lie.so3_log(jnp.asarray(R_21)), np.float64)
    r_half = np.asarray(lie.so3_exp(jnp.asarray(-0.5 * om)), np.float64)
    t = r_half @ t_21
    # Baseline axis -> rectified x-axis (horizontal rig assumed, like the
    # reference's EuRoC/TUM-VI configs).
    e1 = t / np.linalg.norm(t)
    e2 = np.array([-t[1], t[0], 0.0])
    n2 = np.linalg.norm(e2)
    e2 = e2 / n2 if n2 > 1e-12 else np.array([0.0, 1.0, 0.0])
    e3 = np.cross(e1, e2)
    ww = np.stack([e1, e2, e3])          # rows
    # Keep rectified axes right-handed and roughly aligned with the originals
    # (t may point in -x for right-to-left rigs).
    if ww[0, 0] < 0:
        ww[0] *= -1.0
        ww[1] *= -1.0
    R1 = ww @ r_half.T
    R2 = ww @ r_half
    fn = 0.5 * (K1[0] + K2[0])
    K_new = np.array([fn, fn, W / 2.0, H / 2.0])
    bf_px = fn * np.linalg.norm(t_21)

    def build_map(K, D, R_rect):
        u, v = np.meshgrid(np.arange(W, dtype=np.float64),
                           np.arange(H, dtype=np.float64))
        xn = (u - K_new[2]) / K_new[0]
        yn = (v - K_new[3]) / K_new[1]
        rays = np.stack([xn, yn, np.ones_like(xn)], axis=-1)
        raw = rays @ R_rect                       # = R_rect^T @ ray per pixel
        raw = raw[..., :2] / np.maximum(raw[..., 2:3], 1e-9)
        rawd = radtan_distort(raw, np.asarray(D, np.float64))
        px = np.stack([rawd[..., 0] * K[0] + K[2],
                       rawd[..., 1] * K[1] + K[3]], axis=-1)
        return px.astype(np.float32)

    return StereoRectification(
        build_map(K1, D1, R1), build_map(K2, D2, R2),
        K_new.astype(np.float32), float(bf_px),
        R1.astype(np.float32), R2.astype(np.float32))


@jax.jit
def remap(img: jnp.ndarray, map_xy: jnp.ndarray) -> jnp.ndarray:
    """Bilinear remap (cv::remap semantics, zero border): img [H, W] (or
    [H, W, C]), map_xy [H', W', 2] raw (x, y) source per target pixel."""
    H, W = img.shape[:2]
    x = map_xy[..., 0]
    y = map_xy[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi):
        inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        val = img[jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1)]
        if img.ndim == 3:
            return jnp.where(inb[..., None], val, 0.0)
        return jnp.where(inb, val, 0.0)

    w00 = (1 - fx) * (1 - fy)
    w01 = fx * (1 - fy)
    w10 = (1 - fx) * fy
    w11 = fx * fy
    if img.ndim == 3:
        w00, w01, w10, w11 = (w[..., None] for w in (w00, w01, w10, w11))
    return (w00 * tap(y0i, x0i) + w01 * tap(y0i, x0i + 1)
            + w10 * tap(y0i + 1, x0i) + w11 * tap(y0i + 1, x0i + 1))


@functools.partial(jax.jit, static_argnames=())
def rectify_points(kpts, K_raw, D_raw, R_rect, K_new):
    """Map RAW pixel keypoints into the rectified view (feature-space
    rectification): undistort -> rotate by R_rect -> project with K_new.
    kpts [N, 2]; returns [N, 2]."""
    xn = jnp.stack([(kpts[..., 0] - K_raw[2]) / K_raw[0],
                    (kpts[..., 1] - K_raw[3]) / K_raw[1]], axis=-1)
    out = xn
    for _ in range(8):
        d = radtan_distort(out, D_raw) - out
        out = xn - d
    rays = jnp.concatenate([out, jnp.ones_like(out[..., :1])], axis=-1)
    rot = rays @ R_rect.T
    xy = rot[..., :2] / jnp.maximum(rot[..., 2:3], 1e-9)
    return jnp.stack([xy[..., 0] * K_new[0] + K_new[2],
                      xy[..., 1] * K_new[1] + K_new[3]], axis=-1)
