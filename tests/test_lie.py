"""Unit tests for Lie groups vs. analytic values and numerical Jacobians.

Mirrors the test style of the reference's Sophus suite
(reference: Thirdparty/Sophus/test/core/test_se3.cpp, test_sim3.cpp) which the main
build never runs; here they are first-class.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rover_slam_tpu.geometry import lie

RNG = np.random.default_rng(0)


def rand_w(n=8, scale=1.0):
    """Random axis-angle vectors with norm clamped below pi (log is only the
    inverse of exp on that ball)."""
    w = RNG.normal(size=(n, 3)) * scale
    norms = np.linalg.norm(w, axis=1, keepdims=True)
    w = np.where(norms > 3.0, w / norms * 3.0, w)
    return jnp.asarray(w, dtype=jnp.float32)


class TestSO3:
    def test_exp_identity(self):
        R = lie.so3_exp(jnp.zeros((3,)))
        np.testing.assert_allclose(R, np.eye(3), atol=1e-6)

    def test_exp_axis_angle(self):
        # 90 deg about z
        w = jnp.array([0.0, 0.0, np.pi / 2])
        R = lie.so3_exp(w)
        expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], dtype=np.float32)
        np.testing.assert_allclose(R, expected, atol=1e-6)

    def test_exp_log_roundtrip(self):
        w = rand_w(16, 1.5)
        w2 = lie.so3_log(lie.so3_exp(w))
        np.testing.assert_allclose(w, w2, atol=1e-4)

    def test_exp_log_exp_consistency_large_angle(self):
        # For |w| > pi, log returns the equivalent <= pi vector; exp must agree.
        w = jnp.asarray(RNG.normal(size=(16, 3)) * 3.0, dtype=jnp.float32)
        R = lie.so3_exp(w)
        R2 = lie.so3_exp(lie.so3_log(R))
        np.testing.assert_allclose(R, R2, atol=1e-3)

    def test_log_small_angle(self):
        w = rand_w(8, 1e-6)
        w2 = lie.so3_log(lie.so3_exp(w))
        np.testing.assert_allclose(w, w2, atol=1e-9)

    def test_log_near_pi(self):
        axis = np.array([1.0, 2.0, -0.5])
        axis /= np.linalg.norm(axis)
        w = jnp.asarray(axis * (np.pi - 1e-4), dtype=jnp.float32)
        w2 = lie.so3_log(lie.so3_exp(w))
        np.testing.assert_allclose(w, w2, atol=1e-2)

    def test_orthonormal(self):
        R = lie.so3_exp(rand_w(8))
        eye = jnp.broadcast_to(jnp.eye(3), R.shape)
        np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), eye, atol=1e-5)
        np.testing.assert_allclose(jnp.linalg.det(R), 1.0, atol=1e-5)

    def test_right_jacobian_numerical(self):
        # exp(w + dw) ~ exp(w) exp(Jr dw)
        w = np.asarray(rand_w(1, 1.0))[0]
        Jr = np.asarray(lie.so3_right_jacobian(jnp.asarray(w)))
        eps = 1e-4
        for i in range(3):
            dw = np.zeros(3)
            dw[i] = eps
            lhs = np.asarray(lie.so3_exp(jnp.asarray(w + dw)))
            rhs = np.asarray(lie.so3_exp(jnp.asarray(w))) @ np.asarray(
                lie.so3_exp(jnp.asarray(Jr @ dw))
            )
            np.testing.assert_allclose(lhs, rhs, atol=1e-6)

    def test_right_jacobian_inverse(self):
        w = rand_w(8, 1.0)
        J = lie.so3_right_jacobian(w)
        Jinv = lie.so3_right_jacobian_inv(w)
        eye = jnp.broadcast_to(jnp.eye(3), J.shape)
        np.testing.assert_allclose(J @ Jinv, eye, atol=1e-4)

    def test_normalize_rotation(self):
        R = lie.so3_exp(rand_w(4))
        noisy = R + 0.01 * jnp.asarray(RNG.normal(size=R.shape), dtype=jnp.float32)
        Rn = lie.normalize_rotation(noisy)
        eye = jnp.broadcast_to(jnp.eye(3), R.shape)
        np.testing.assert_allclose(Rn @ jnp.swapaxes(Rn, -1, -2), eye, atol=1e-5)


class TestSE3:
    def test_exp_log_roundtrip(self):
        xi = jnp.asarray(RNG.normal(size=(16, 6)), dtype=jnp.float32)
        R, t = lie.se3_exp(xi)
        xi2 = lie.se3_log(R, t)
        np.testing.assert_allclose(xi, xi2, atol=1e-4)

    def test_pure_translation(self):
        xi = jnp.array([1.0, 2.0, 3.0, 0.0, 0.0, 0.0])
        R, t = lie.se3_exp(xi)
        np.testing.assert_allclose(R, np.eye(3), atol=1e-6)
        np.testing.assert_allclose(t, [1.0, 2.0, 3.0], atol=1e-6)

    def test_compose_inverse(self):
        xi = jnp.asarray(RNG.normal(size=(8, 6)), dtype=jnp.float32)
        R, t = lie.se3_exp(xi)
        Ri, ti = lie.se3_inverse(R, t)
        Rc, tc = lie.se3_compose(R, t, Ri, ti)
        eye = jnp.broadcast_to(jnp.eye(3), R.shape)
        np.testing.assert_allclose(Rc, eye, atol=1e-5)
        np.testing.assert_allclose(tc, np.zeros((8, 3)), atol=1e-5)

    def test_apply_matches_matrix(self):
        xi = jnp.asarray(RNG.normal(size=(6,)), dtype=jnp.float32)
        R, t = lie.se3_exp(xi)
        X = jnp.asarray(RNG.normal(size=(5, 3)), dtype=jnp.float32)
        Y = lie.se3_apply(R, t, X)
        T = np.asarray(lie.se3_matrix(R, t))
        Xh = np.concatenate([np.asarray(X), np.ones((5, 1))], axis=1)
        np.testing.assert_allclose(Y, (T @ Xh.T).T[:, :3], atol=1e-5)


class TestSim3:
    def test_exp_log_roundtrip(self):
        xi = jnp.asarray(RNG.normal(size=(16, 7)) * 0.7, dtype=jnp.float32)
        s, R, t = lie.sim3_exp(xi)
        xi2 = lie.sim3_log(s, R, t)
        np.testing.assert_allclose(xi, xi2, atol=2e-4)

    def test_identity(self):
        s, R, t = lie.sim3_exp(jnp.zeros((7,)))
        assert np.allclose(s, 1.0)
        np.testing.assert_allclose(R, np.eye(3), atol=1e-6)
        np.testing.assert_allclose(t, np.zeros(3), atol=1e-6)

    def test_scale_only(self):
        xi = jnp.array([0.0] * 6 + [np.log(2.0)], dtype=jnp.float32)
        s, R, t = lie.sim3_exp(xi)
        np.testing.assert_allclose(s, 2.0, rtol=1e-5)

    def test_compose_inverse(self):
        xi = jnp.asarray(RNG.normal(size=(8, 7)) * 0.5, dtype=jnp.float32)
        s, R, t = lie.sim3_exp(xi)
        si, Ri, ti = lie.sim3_inverse(s, R, t)
        sc, Rc, tc = lie.sim3_compose(s, R, t, si, Ri, ti)
        eye = jnp.broadcast_to(jnp.eye(3), R.shape)
        np.testing.assert_allclose(sc, np.ones(8), atol=1e-5)
        np.testing.assert_allclose(Rc, eye, atol=1e-5)
        np.testing.assert_allclose(tc, np.zeros((8, 3)), atol=2e-5)

    def test_apply(self):
        # Known transform: scale 2, rotate 90deg about z, translate [1,0,0]
        s = jnp.array(2.0)
        R = lie.so3_exp(jnp.array([0.0, 0.0, np.pi / 2]))
        t = jnp.array([1.0, 0.0, 0.0])
        X = jnp.array([1.0, 0.0, 0.0])
        Y = lie.sim3_apply(s, R, t, X)
        np.testing.assert_allclose(Y, [1.0, 2.0, 0.0], atol=1e-5)

    def test_sim3_reduces_to_se3(self):
        xi7 = jnp.asarray(RNG.normal(size=(8, 7)), dtype=jnp.float32)
        xi7 = xi7.at[:, 6].set(0.0)
        s, R, t = lie.sim3_exp(xi7)
        R2, t2 = lie.se3_exp(xi7[:, :6])
        np.testing.assert_allclose(s, np.ones(8), atol=1e-6)
        np.testing.assert_allclose(R, R2, atol=1e-5)
        np.testing.assert_allclose(t, t2, atol=1e-5)


def test_jit_and_vmap():
    f = jax.jit(lambda w: lie.so3_log(lie.so3_exp(w)))
    w = rand_w(4)
    np.testing.assert_allclose(f(w), w, atol=1e-4)
    g = jax.vmap(lie.se3_exp)
    xi = jnp.asarray(RNG.normal(size=(4, 6)), dtype=jnp.float32)
    R, t = g(xi)
    assert R.shape == (4, 3, 3) and t.shape == (4, 3)
