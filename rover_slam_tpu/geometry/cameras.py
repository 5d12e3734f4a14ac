"""Batched camera models: Pinhole and KannalaBrandt8 (equidistant fisheye).

TPU-native replacement for the reference's GeometricCamera hierarchy
(reference: include/CameraModels/GeometricCamera.h:60-95,
src/CameraModels/Pinhole.cpp:36-256, src/CameraModels/KannalaBrandt8.cpp:40-228).

Instead of virtual dispatch we use a static `kind` and pure functions over parameter
vectors, so every projection in a bundle-adjustment edge batch is a vmapped closed-form
expression with analytic Jacobians (reference projectJac: Pinhole.cpp:101,
KannalaBrandt8.cpp:229). The KB8 unprojection replaces the reference's scalar
Newton loop (KannalaBrandt8.cpp:142-228) with a fixed-iteration `lax.scan`-free
unrolled Newton that is branch-free and batched.

Parameter layout (`params`, f32[8]):
  Pinhole:        [fx, fy, cx, cy, 0, 0, 0, 0]
  KannalaBrandt8: [fx, fy, cx, cy, k1, k2, k3, k4]  (r(th)=th+k1 th^3+k2 th^5+k3 th^7+k4 th^9)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

PINHOLE = 0
KANNALA_BRANDT8 = 1

_NEWTON_ITERS = 10


# ---------------------------------------------------------------------------
# Pinhole
# ---------------------------------------------------------------------------

def pinhole_project(params: jnp.ndarray, X: jnp.ndarray) -> jnp.ndarray:
    """Project camera-frame points X[..., 3] -> pixels [..., 2]."""
    fx, fy, cx, cy = params[..., 0], params[..., 1], params[..., 2], params[..., 3]
    z = X[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = fx * X[..., 0] / z_safe + cx
    v = fy * X[..., 1] / z_safe + cy
    return jnp.stack([u, v], axis=-1)


def pinhole_unproject(params: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Pixels -> unit-depth bearing rays [..., 3] with z=1."""
    fx, fy, cx, cy = params[..., 0], params[..., 1], params[..., 2], params[..., 3]
    x = (uv[..., 0] - cx) / fx
    y = (uv[..., 1] - cy) / fy
    return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)


def pinhole_project_jac(params: jnp.ndarray, X: jnp.ndarray) -> jnp.ndarray:
    """d(uv)/dX, [..., 2, 3] (reference Pinhole.cpp:101 projectJac)."""
    fx, fy = params[..., 0], params[..., 1]
    x, y, z = X[..., 0], X[..., 1], X[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    iz = 1.0 / z_safe
    iz2 = iz * iz
    zero = jnp.zeros_like(x)
    row0 = jnp.stack([fx * iz, zero, -fx * x * iz2], axis=-1)
    row1 = jnp.stack([zero, fy * iz, -fy * y * iz2], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


# ---------------------------------------------------------------------------
# Kannala-Brandt 8 (equidistant fisheye, 4 distortion coefficients)
# ---------------------------------------------------------------------------

def kb8_project(params: jnp.ndarray, X: jnp.ndarray) -> jnp.ndarray:
    """Equidistant projection r(theta) = theta + k1 th^3 + k2 th^5 + k3 th^7 + k4 th^9
    (reference KannalaBrandt8.cpp:40-137)."""
    fx, fy, cx, cy = params[..., 0], params[..., 1], params[..., 2], params[..., 3]
    k1, k2, k3, k4 = params[..., 4], params[..., 5], params[..., 6], params[..., 7]
    x, y, z = X[..., 0], X[..., 1], X[..., 2]
    r2 = x * x + y * y
    r = jnp.sqrt(jnp.maximum(r2, 1e-18))
    theta = jnp.arctan2(r, z)
    th2 = theta * theta
    r_th = theta * (1.0 + th2 * (k1 + th2 * (k2 + th2 * (k3 + th2 * k4))))
    scale = jnp.where(r2 < 1e-18, jnp.zeros_like(r), r_th / r)
    u = fx * scale * x + cx
    v = fy * scale * y + cy
    return jnp.stack([u, v], axis=-1)


def kb8_unproject(params: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Invert r(theta) with fixed-iteration Newton; returns unit-depth ray z=1
    (reference KannalaBrandt8.cpp:142-228 uses a scalar while-loop; here it is a
    branch-free unrolled Newton, identical fixed point)."""
    fx, fy, cx, cy = params[..., 0], params[..., 1], params[..., 2], params[..., 3]
    k1, k2, k3, k4 = params[..., 4], params[..., 5], params[..., 6], params[..., 7]
    mx = (uv[..., 0] - cx) / fx
    my = (uv[..., 1] - cy) / fy
    r_d = jnp.sqrt(mx * mx + my * my)
    r_d = jnp.minimum(r_d, jnp.pi)  # clamp like the reference (theta_d bound)

    theta = r_d  # init
    for _ in range(_NEWTON_ITERS):
        th2 = theta * theta
        f = theta * (1.0 + th2 * (k1 + th2 * (k2 + th2 * (k3 + th2 * k4)))) - r_d
        fp = 1.0 + th2 * (3.0 * k1 + th2 * (5.0 * k2 + th2 * (7.0 * k3 + th2 * 9.0 * k4)))
        theta = theta - f / jnp.where(jnp.abs(fp) < 1e-9, 1e-9, fp)

    scale = jnp.where(r_d < 1e-9, jnp.ones_like(r_d), jnp.tan(theta) / jnp.maximum(r_d, 1e-12))
    return jnp.stack([mx * scale, my * scale, jnp.ones_like(mx)], axis=-1)


def kb8_project_jac(params: jnp.ndarray, X: jnp.ndarray) -> jnp.ndarray:
    """Analytic d(uv)/dX via jacfwd on the closed-form projection (matches the
    reference's hand-derived KannalaBrandt8.cpp:229 projectJac)."""
    flat_X = X.reshape(-1, 3)
    flat_p = jnp.broadcast_to(params, flat_X.shape[:1] + params.shape[-1:]) \
        if params.ndim == 1 else params.reshape(-1, params.shape[-1])
    J = jax.vmap(jax.jacfwd(kb8_project, argnums=1), in_axes=(0, 0))(flat_p, flat_X)
    return J.reshape(X.shape[:-1] + (2, 3))


# ---------------------------------------------------------------------------
# Dispatch (static kind — resolved at trace time, no runtime branching)
# ---------------------------------------------------------------------------

def project(kind: int, params: jnp.ndarray, X: jnp.ndarray) -> jnp.ndarray:
    if kind == PINHOLE:
        return pinhole_project(params, X)
    elif kind == KANNALA_BRANDT8:
        return kb8_project(params, X)
    raise ValueError(f"unknown camera kind {kind}")


def unproject(kind: int, params: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    if kind == PINHOLE:
        return pinhole_unproject(params, uv)
    elif kind == KANNALA_BRANDT8:
        return kb8_unproject(params, uv)
    raise ValueError(f"unknown camera kind {kind}")


# Jitted form for per-frame host loops: the eager op-by-op dispatch of
# unproject costs ~4 ms/frame through a tunneled TPU; one compiled program
# costs ~0.1 ms (kind is static — one cache entry per camera model).
unproject_jit = jax.jit(unproject, static_argnums=0)


def project_jac(kind: int, params: jnp.ndarray, X: jnp.ndarray) -> jnp.ndarray:
    if kind == PINHOLE:
        return pinhole_project_jac(params, X)
    elif kind == KANNALA_BRANDT8:
        return kb8_project_jac(params, X)
    raise ValueError(f"unknown camera kind {kind}")


def make_pinhole(fx, fy, cx, cy) -> jnp.ndarray:
    return jnp.array([fx, fy, cx, cy, 0.0, 0.0, 0.0, 0.0], dtype=jnp.float32)


def make_kb8(fx, fy, cx, cy, k1, k2, k3, k4) -> jnp.ndarray:
    return jnp.array([fx, fy, cx, cy, k1, k2, k3, k4], dtype=jnp.float32)
