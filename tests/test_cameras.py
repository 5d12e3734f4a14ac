"""Camera model round-trip and Jacobian tests (reference: src/CameraModels/)."""
import numpy as np
import jax
import jax.numpy as jnp

from rover_slam_tpu.geometry import cameras

RNG = np.random.default_rng(1)

# EuRoC-like pinhole and TUM-VI-like KB8 intrinsics.
PINHOLE = cameras.make_pinhole(458.654, 457.296, 367.215, 248.375)
KB8 = cameras.make_kb8(190.978, 190.973, 254.932, 256.897,
                       0.00348238, 0.000715034, -0.00205323, 0.000202936)


def rand_points(n=64, fov_limit=0.8):
    d = RNG.uniform(0.5, 20.0, size=(n, 1))
    xy = RNG.uniform(-fov_limit, fov_limit, size=(n, 2)) * d
    return jnp.asarray(np.concatenate([xy, d], axis=1), dtype=jnp.float32)


class TestPinhole:
    def test_project_center(self):
        uv = cameras.pinhole_project(PINHOLE, jnp.array([0.0, 0.0, 1.0]))
        np.testing.assert_allclose(uv, [367.215, 248.375], atol=1e-4)

    def test_roundtrip(self):
        X = rand_points()
        uv = cameras.pinhole_project(PINHOLE, X)
        rays = cameras.pinhole_unproject(PINHOLE, uv)
        # Rays should be parallel to X (same direction).
        Xn = X / jnp.linalg.norm(X, axis=-1, keepdims=True)
        rn = rays / jnp.linalg.norm(rays, axis=-1, keepdims=True)
        np.testing.assert_allclose(Xn, rn, atol=1e-5)

    def test_jacobian_vs_autodiff(self):
        X = rand_points(16)
        J = cameras.pinhole_project_jac(PINHOLE, X)
        J_ad = jax.vmap(jax.jacfwd(cameras.pinhole_project, argnums=1), in_axes=(None, 0))(PINHOLE, X)
        np.testing.assert_allclose(J, J_ad, atol=1e-3)


class TestKB8:
    def test_project_center(self):
        uv = cameras.kb8_project(KB8, jnp.array([0.0, 0.0, 1.0]))
        np.testing.assert_allclose(uv, [254.932, 256.897], atol=1e-4)

    def test_roundtrip(self):
        # Wide FOV points (fisheye) — up to ~80 deg off-axis.
        X = rand_points(64, fov_limit=3.0)
        uv = cameras.kb8_project(KB8, X)
        rays = cameras.kb8_unproject(KB8, uv)
        Xn = X / jnp.linalg.norm(X, axis=-1, keepdims=True)
        rn = rays / jnp.linalg.norm(rays, axis=-1, keepdims=True)
        np.testing.assert_allclose(Xn, rn, atol=1e-4)

    def test_equidistant_property(self):
        # With zero distortion coeffs, r = f * theta.
        cam = cameras.make_kb8(100.0, 100.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
        theta = 0.5
        X = jnp.array([np.sin(theta), 0.0, np.cos(theta)])
        uv = cameras.kb8_project(cam, X)
        np.testing.assert_allclose(uv[0], 100.0 * theta, atol=1e-4)
        np.testing.assert_allclose(uv[1], 0.0, atol=1e-6)

    def test_jacobian_finite(self):
        X = rand_points(8, fov_limit=2.0)
        J = cameras.kb8_project_jac(KB8, X)
        assert J.shape == (8, 2, 3)
        assert np.all(np.isfinite(np.asarray(J)))
        # Finite-difference check on one point.
        x0 = np.asarray(X[0])
        eps = 1e-3
        for i in range(3):
            dx = np.zeros(3); dx[i] = eps
            fd = (np.asarray(cameras.kb8_project(KB8, jnp.asarray(x0 + dx)))
                  - np.asarray(cameras.kb8_project(KB8, jnp.asarray(x0 - dx)))) / (2 * eps)
            np.testing.assert_allclose(J[0, :, i], fd, rtol=2e-2, atol=2e-2)


def test_dispatch():
    X = rand_points(4)
    np.testing.assert_allclose(
        cameras.project(cameras.PINHOLE, PINHOLE, X),
        cameras.pinhole_project(PINHOLE, X))
    np.testing.assert_allclose(
        cameras.project(cameras.KANNALA_BRANDT8, KB8, X),
        cameras.kb8_project(KB8, X))
