"""Batched Lie groups for TPU SLAM: SO(3), SE(3), Sim(3).

TPU-native replacement for the reference's header-only Sophus dependency
(reference: Thirdparty/Sophus/sophus/{so3,se3,sim3}.hpp) and the ad-hoc Lie helpers in
the IMU code (reference: src/ImuTypes.cc:247-324, RightJacobianSO3/NormalizeRotation).

Everything here is pure-functional jnp on arrays with arbitrary leading batch
dimensions, so it vmaps/jits/shards cleanly. Rotations are 3x3 matrices (MXU-friendly:
pose chains become batched matmuls), translations are 3-vectors, Sim(3) carries an
explicit scalar scale. Small-angle branches use `jnp.where` with safe denominators so
gradients are finite everywhere (no data-dependent control flow inside jit).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


# ---------------------------------------------------------------------------
# SO(3)
# ---------------------------------------------------------------------------

def so3_hat(w: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix of w[..., 3] -> [..., 3, 3]."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def so3_vee(W: jnp.ndarray) -> jnp.ndarray:
    """Inverse of so3_hat: [..., 3, 3] -> [..., 3]."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _sinc_coeffs(theta2: jnp.ndarray):
    """Return (A, B, C) = (sin t / t, (1-cos t)/t^2, (t - sin t)/t^3), Taylor-safe.

    theta2 is the *squared* angle so callers never take sqrt of a negative/zero
    without protection.
    """
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    small = theta2 < 1e-8
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    C = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / (theta2 * theta))
    return A, B, C


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Exponential map R = exp(hat(w)) via Rodrigues. w[..., 3] -> [..., 3, 3]."""
    theta2 = jnp.sum(w * w, axis=-1)
    A, B, _ = _sinc_coeffs(theta2)
    W = so3_hat(w)
    W2 = W @ W
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I + A[..., None, None] * W + B[..., None, None] * W2


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """Logarithm map [..., 3, 3] -> [..., 3]. Accurate up to theta < pi - eps."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    # Clip strictly inside (-1, 1): d(arccos) is infinite at the endpoints and
    # would poison autodiff (jacfwd through pose-graph residuals at identity).
    # Values are unaffected: both endpoints are handled by dedicated branches
    # whose formulas do not use theta's exact endpoint value.
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0 + 1e-7, 1.0 - 1e-7)
    theta = jnp.arccos(cos_t)
    w_skew = so3_vee(R - jnp.swapaxes(R, -1, -2)) * 0.5  # = sin(theta) * axis
    sin_t = jnp.sin(theta)  # theta in [0, pi] so sin_t >= 0
    # Generic branch: w = theta / sin(theta) * vee(R - R^T)/2
    w_generic = w_skew * (theta / jnp.maximum(sin_t, 1e-12))[..., None]
    # Small angle: w ~ vee(R - R^T)/2 * (1 + theta^2/6)
    w_small = w_skew * (1.0 + theta[..., None] ** 2 / 6.0)
    # Near pi: use diagonal formula. R = I + 2 B (ww^T/t^2 - I)-ish; axis from largest diagonal.
    #   R + I = 2 (axis axis^T) * (1 - cos) + ... at theta=pi: R + I = 2 axis axis^T.
    Rp = R + jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), R.shape)
    diag = jnp.stack([Rp[..., 0, 0], Rp[..., 1, 1], Rp[..., 2, 2]], axis=-1)
    k = jnp.argmax(diag, axis=-1)
    col = jnp.take_along_axis(Rp, k[..., None, None].repeat(3, axis=-2), axis=-1)[..., 0]
    axis = col / jnp.maximum(jnp.linalg.norm(col, axis=-1, keepdims=True), 1e-12)
    # Fix sign to agree with w_skew direction when possible.
    sgn = jnp.sign(jnp.sum(axis * w_skew, axis=-1, keepdims=True))
    sgn = jnp.where(sgn == 0.0, 1.0, sgn)
    w_pi = axis * sgn * theta[..., None]

    small = (theta < 1e-5)[..., None]
    near_pi = (theta > jnp.pi - 1e-3)[..., None]
    return jnp.where(small, w_small, jnp.where(near_pi, w_pi, w_generic))


def so3_right_jacobian(w: jnp.ndarray) -> jnp.ndarray:
    """Right Jacobian Jr(w): exp(w + dw) ~ exp(w) exp(Jr(w) dw).

    Matches reference src/ImuTypes.cc RightJacobianSO3 semantics.
    """
    theta2 = jnp.sum(w * w, axis=-1)
    _, B, C = _sinc_coeffs(theta2)
    W = so3_hat(w)
    W2 = W @ W
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I - B[..., None, None] * W + C[..., None, None] * W2


def so3_right_jacobian_inv(w: jnp.ndarray) -> jnp.ndarray:
    """Inverse right Jacobian (reference src/ImuTypes.cc InverseRightJacobianSO3)."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    W = so3_hat(w)
    W2 = W @ W
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    small = theta2 < 1e-8
    coef = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 / theta2) - (1.0 + jnp.cos(theta)) / (2.0 * theta * jnp.sin(theta) + _EPS),
    )
    return I + 0.5 * W + coef[..., None, None] * W2


def so3_left_jacobian(w: jnp.ndarray) -> jnp.ndarray:
    """Left Jacobian Jl(w) = Jr(-w)."""
    return so3_right_jacobian(-w)


def so3_left_jacobian_inv(w: jnp.ndarray) -> jnp.ndarray:
    return so3_right_jacobian_inv(-w)


def normalize_rotation(R: jnp.ndarray) -> jnp.ndarray:
    """Project a near-rotation onto SO(3) via SVD (reference NormalizeRotation,
    src/ImuTypes.cc:254-260 uses quaternion normalize; SVD is the batched analog)."""
    U, _, Vt = jnp.linalg.svd(R)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.concatenate(
        [jnp.ones_like(det)[..., None], jnp.ones_like(det)[..., None], det[..., None]],
        axis=-1,
    )
    return (U * D[..., None, :]) @ Vt


# ---------------------------------------------------------------------------
# SE(3): represented as (R[..., 3, 3], t[..., 3])
# ---------------------------------------------------------------------------

def se3_exp(xi: jnp.ndarray):
    """xi = [rho(3), phi(3)] -> (R, t) with t = Jl(phi) rho (Sophus convention:
    translation first is *not* Sophus; we use [upsilon, omega] ordering like
    Sophus::SE3::exp: xi[:3]=translation part, xi[3:]=rotation part)."""
    rho, phi = xi[..., :3], xi[..., 3:6]
    R = so3_exp(phi)
    V = so3_left_jacobian(phi)
    t = jnp.einsum("...ij,...j->...i", V, rho)
    return R, t


def se3_log(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    phi = so3_log(R)
    Vinv = so3_left_jacobian_inv(phi)
    rho = jnp.einsum("...ij,...j->...i", Vinv, t)
    return jnp.concatenate([rho, phi], axis=-1)


def se3_inverse(R: jnp.ndarray, t: jnp.ndarray):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -jnp.einsum("...ij,...j->...i", Rt, t)


def se3_compose(Ra, ta, Rb, tb):
    """(Ra,ta) * (Rb,tb): first apply b, then a."""
    R = Ra @ Rb
    t = jnp.einsum("...ij,...j->...i", Ra, tb) + ta
    return R, t


def se3_apply(R, t, X):
    """Transform points X[..., 3]."""
    return jnp.einsum("...ij,...j->...i", R, X) + t


def se3_matrix(R, t):
    """(R, t) -> [..., 4, 4] homogeneous matrix."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    bottom = jnp.broadcast_to(jnp.array([0.0, 0.0, 0.0, 1.0], R.dtype), batch + (1, 4))
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


# ---------------------------------------------------------------------------
# Sim(3): (s scalar, R, t). Acts as X -> s R X + t.
# ---------------------------------------------------------------------------

def sim3_exp(xi: jnp.ndarray):
    """xi = [rho(3), phi(3), sigma(1)] -> (s, R, t). s = exp(sigma)."""
    rho, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    s = jnp.exp(sigma)
    R = so3_exp(phi)
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    W = so3_hat(phi)
    W2 = W @ W
    I = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)

    # W(sigma, theta) per Sophus sim3.hpp calcW: coefficients for I, W, W^2.
    small_sigma = jnp.abs(sigma) < 1e-5
    small_theta = theta < 1e-5
    sigma_safe = jnp.where(small_sigma, 1.0, sigma)
    theta_safe = jnp.where(small_theta, 1.0, theta)

    # c0: coefficient of I
    c0 = jnp.where(small_sigma, 1.0, (s - 1.0) / sigma_safe)

    # a = s*sin(theta), b = s*cos(theta)
    a_ = s * jnp.sin(theta)
    b_ = s * jnp.cos(theta)
    denom = sigma_safe * sigma_safe + theta_safe * theta_safe

    # generic c1 (coef of W), c2 (coef of W2):
    c1_gen = (sigma_safe * a_ + (1.0 - b_) * theta_safe) / (theta_safe * denom)
    c2_gen = (c0 - ((b_ - 1.0) * sigma_safe + a_ * theta_safe) / denom) / (theta_safe * theta_safe)
    # sigma -> 0 limits: c1 = (1-cos)/theta^2, c2 = (theta - sin)/theta^3
    A0, B0, C0 = _sinc_coeffs(theta2)
    c1_sig0 = B0
    c2_sig0 = C0
    # theta -> 0 limits (sigma generic): c1 = ((sigma-1)s+1)/sigma^2, c2 = (s(0.5 sigma^2 - sigma + 1) - 1)/sigma^3
    c1_th0 = jnp.where(
        small_sigma, 0.5, ((sigma_safe - 1.0) * s + 1.0) / (sigma_safe * sigma_safe)
    )
    c2_th0 = jnp.where(
        small_sigma,
        1.0 / 6.0,
        (s * (0.5 * sigma_safe * sigma_safe - sigma_safe + 1.0) - 1.0) / (sigma_safe ** 3),
    )

    c1 = jnp.where(small_sigma, c1_sig0, jnp.where(small_theta, c1_th0, c1_gen))
    c2 = jnp.where(small_sigma, c2_sig0, jnp.where(small_theta, c2_th0, c2_gen))

    Wmat = c0[..., None, None] * I + c1[..., None, None] * W + c2[..., None, None] * W2
    t = jnp.einsum("...ij,...j->...i", Wmat, rho)
    return s, R, t


def sim3_log(s, R, t):
    """Inverse of sim3_exp. Uses a solve against the computed W matrix."""
    phi = so3_log(R)
    sigma = jnp.log(s)
    # Build W explicitly by pushing basis vectors through sim3_exp's translation
    # part, then solve W rho = t.
    def w_times(rho):
        xi = jnp.concatenate([rho, phi, sigma[..., None]], axis=-1)
        _, _, tt = sim3_exp(xi)
        return tt

    e = jnp.eye(3, dtype=phi.dtype)
    cols = [w_times(jnp.broadcast_to(e[i], phi.shape)) for i in range(3)]
    W = jnp.stack(cols, axis=-1)  # [..., 3, 3]
    rho = jnp.linalg.solve(W, t[..., None])[..., 0]
    return jnp.concatenate([rho, phi, sigma[..., None]], axis=-1)


def sim3_inverse(s, R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    s_inv = 1.0 / s
    return s_inv, Rt, -s_inv[..., None] * jnp.einsum("...ij,...j->...i", Rt, t)


def sim3_compose(sa, Ra, ta, sb, Rb, tb):
    """(sa,Ra,ta) * (sb,Rb,tb): X -> sa Ra (sb Rb X + tb) + ta."""
    return sa * sb, Ra @ Rb, sa[..., None] * jnp.einsum("...ij,...j->...i", Ra, tb) + ta


def sim3_apply(s, R, t, X):
    return s[..., None] * jnp.einsum("...ij,...j->...i", R, X) + t


__all__ = [n for n in dir() if n.startswith(("so3_", "se3_", "sim3_", "normalize_"))]
