"""Batched two-view triangulation and depth/parallax checks.

TPU-native replacement for the reference's per-point DLT triangulation
(reference: src/GeometricTools.cc Triangulate, used by LocalMapping::CreateNewMapPoints
src/LocalMapping.cc:640-955 and GeometricCamera::matchAndtriangulate). Everything is
batched over N candidate pairs at once; validity is reported as a mask instead of
early-exits, so the whole triangulation pass is one jitted program.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import lie


def triangulate_dlt(ray0: jnp.ndarray, ray1: jnp.ndarray,
                    R01: jnp.ndarray, t01: jnp.ndarray) -> jnp.ndarray:
    """DLT triangulation of bearing-ray pairs.

    ray0: [..., 3] bearings in cam0 frame (z=1 normalized or unit — any scale).
    ray1: [..., 3] bearings in cam1 frame.
    R01, t01: pose of cam1 in cam0 frame? No — convention: x0 = R01 x1 + t01 maps
      cam1-frame points to cam0 frame. Returns points in cam0 frame [..., 3].

    Builds the standard 4x4 DLT system from the two projective constraints and
    solves via SVD (smallest singular vector), batched.
    """
    # Projection matrices: P0 = [I | 0] (cam0), P1 = [R10 | t10] with
    # x1 = R10 x0 + t10 where R10 = R01^T, t10 = -R01^T t01.
    R10 = jnp.swapaxes(R01, -1, -2)
    t10 = -jnp.einsum("...ij,...j->...i", R10, t01)

    batch = ray0.shape[:-1]
    P0 = jnp.broadcast_to(
        jnp.concatenate([jnp.eye(3, dtype=ray0.dtype), jnp.zeros((3, 1), ray0.dtype)], axis=1),
        batch + (3, 4),
    )
    P1 = jnp.concatenate([R10, t10[..., :, None]], axis=-1)
    P1 = jnp.broadcast_to(P1, batch + (3, 4))

    def two_rows(P, ray):
        x, y, z = ray[..., 0:1], ray[..., 1:2], ray[..., 2:3]
        r0 = x * P[..., 2, :] - z * P[..., 0, :]
        r1 = y * P[..., 2, :] - z * P[..., 1, :]
        return r0, r1

    a0, a1 = two_rows(P0, ray0)
    a2, a3 = two_rows(P1, ray1)
    A = jnp.stack([a0, a1, a2, a3], axis=-2)  # [..., 4, 4]

    # Inhomogeneous solve (w = 1): A[:, :3] X = -A[:, 3] via 3x3 normal
    # equations. Equivalent to the SVD nullspace for finite points and ~100x
    # faster on TPU (batched tiny SVDs are pathological there); points at
    # infinity fail the cheirality/parallax gates downstream anyway.
    A3 = A[..., :3]
    b = -A[..., 3]
    AtA = jnp.einsum("...ki,...kj->...ij", A3, A3)
    Atb = jnp.einsum("...ki,...k->...i", A3, b)
    AtA = AtA + 1e-9 * jnp.eye(3, dtype=A.dtype)
    # Closed-form batched 3x3 solve (blockinv.py): jnp.linalg.solve on [N,3,3]
    # stacks is a sequential loop on TPU and this runs inside the fused
    # keyframe-insertion program.
    from ..optim.blockinv import solve3
    return solve3(AtA, Atb)


def parallax_cos(ray0: jnp.ndarray, ray1_in0: jnp.ndarray) -> jnp.ndarray:
    """Cosine of the angle between two bearing rays expressed in the same frame.

    The reference gates triangulation on cosParallax < 0.9998 (0.9996 with IMU)
    (src/LocalMapping.cc:788-792)."""
    n0 = ray0 / jnp.maximum(jnp.linalg.norm(ray0, axis=-1, keepdims=True), 1e-12)
    n1 = ray1_in0 / jnp.maximum(jnp.linalg.norm(ray1_in0, axis=-1, keepdims=True), 1e-12)
    return jnp.sum(n0 * n1, axis=-1)


def triangulate_and_check(ray0, ray1, R0w, t0w, R1w, t1w,
                          min_parallax_cos: float = 0.9998):
    """Triangulate in world frame with cheirality + parallax validity mask.

    R0w,t0w / R1w,t1w: world->camera transforms (Tcw convention like the reference).
    Returns (Xw[..., 3], valid[...]).
    """
    # Relative pose: cam1 -> cam0: x0 = R0w Rw1 x1 + (R0w tw1 + t0w)... easier via
    # compose: T0w * T1w^{-1} maps cam1-frame to cam0-frame.
    R1w_inv, t1w_inv = lie.se3_inverse(R1w, t1w)
    R01, t01 = lie.se3_compose(R0w, t0w, R1w_inv, t1w_inv)

    Xc0 = triangulate_dlt(ray0, ray1, R01, t01)
    # world point: Xw = T0w^{-1} Xc0
    R0w_inv, t0w_inv = lie.se3_inverse(R0w, t0w)
    Xw = lie.se3_apply(R0w_inv, t0w_inv, Xc0)

    # Cheirality: positive depth *along the observed bearing* in both cameras
    # (z>0 is wrong for wide-FOV fisheye where bearings can have z<=0).
    z0 = jnp.sum(ray0 * Xc0, axis=-1)
    Xc1 = lie.se3_apply(R1w, t1w, Xw)
    z1 = jnp.sum(ray1 * Xc1, axis=-1)

    # Parallax between the two observation rays expressed in cam0 frame.
    ray1_in0 = jnp.einsum("...ij,...j->...i", R01, ray1)
    cosp = parallax_cos(ray0, ray1_in0)

    valid = (z0 > 0) & (z1 > 0) & (cosp < min_parallax_cos) & (cosp > -0.5)
    return Xw, valid


def reprojection_error2(params_project, Xc: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Squared pixel reprojection error given a projection closure."""
    duv = params_project(Xc) - uv
    return jnp.sum(duv * duv, axis=-1)
