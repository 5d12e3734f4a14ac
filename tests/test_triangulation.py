"""Triangulation tests on synthetic geometry (reference: src/GeometricTools.cc)."""
import numpy as np
import jax.numpy as jnp

from rover_slam_tpu.geometry import lie, triangulation

RNG = np.random.default_rng(2)


def make_scene(n=32):
    """Two cameras with 0.5m baseline looking at points 5-15m away."""
    Xw = np.stack([
        RNG.uniform(-3, 3, n), RNG.uniform(-2, 2, n), RNG.uniform(5, 15, n)
    ], axis=1).astype(np.float32)
    # Cam0 at origin; cam1 translated +x 0.5m, small rotation.
    R0w = np.eye(3, dtype=np.float32)
    t0w = np.zeros(3, dtype=np.float32)
    R1w = np.asarray(lie.so3_exp(jnp.array([0.0, 0.02, 0.0])), dtype=np.float32)
    t1w = -R1w @ np.array([0.5, 0.0, 0.0], dtype=np.float32)  # Tcw convention
    return Xw, (R0w, t0w), (R1w, t1w)


def test_triangulate_exact():
    Xw, (R0w, t0w), (R1w, t1w) = make_scene()
    ray0 = Xw  # cam0 at identity: camera frame == world
    Xc1 = (R1w @ Xw.T).T + t1w
    Xw_hat, valid = triangulation.triangulate_and_check(
        jnp.asarray(ray0), jnp.asarray(Xc1),
        jnp.asarray(R0w), jnp.asarray(t0w), jnp.asarray(R1w), jnp.asarray(t1w),
        min_parallax_cos=1.0,  # disable parallax gate: some points are far
    )
    np.testing.assert_allclose(np.asarray(Xw_hat), Xw, atol=1e-2, rtol=1e-3)
    assert np.all(np.asarray(valid))


def test_cheirality_rejects_behind():
    # Point behind cam0.
    R0w = jnp.eye(3); t0w = jnp.zeros(3)
    R1w = jnp.eye(3); t1w = jnp.array([-0.5, 0.0, 0.0])
    ray0 = jnp.array([[0.0, 0.0, -1.0]])
    ray1 = jnp.array([[0.05, 0.0, -1.0]])
    _, valid = triangulation.triangulate_and_check(ray0, ray1, R0w, t0w, R1w, t1w)
    assert not bool(valid[0])


def test_low_parallax_rejected():
    # Nearly identical cameras -> no parallax.
    R0w = jnp.eye(3); t0w = jnp.zeros(3)
    R1w = jnp.eye(3); t1w = jnp.array([-1e-5, 0.0, 0.0])
    ray0 = jnp.array([[0.1, 0.1, 1.0]])
    ray1 = jnp.array([[0.1, 0.1, 1.0]])
    _, valid = triangulation.triangulate_and_check(ray0, ray1, R0w, t0w, R1w, t1w)
    assert not bool(valid[0])


def test_noise_robustness():
    Xw, (R0w, t0w), (R1w, t1w) = make_scene(64)
    ray0 = Xw + RNG.normal(0, 0.002, Xw.shape).astype(np.float32) * Xw[:, 2:3]
    Xc1 = (R1w @ Xw.T).T + t1w
    ray1 = Xc1 + RNG.normal(0, 0.002, Xc1.shape).astype(np.float32) * Xc1[:, 2:3]
    Xw_hat, valid = triangulation.triangulate_and_check(
        jnp.asarray(ray0), jnp.asarray(ray1),
        jnp.asarray(R0w), jnp.asarray(t0w), jnp.asarray(R1w), jnp.asarray(t1w),
        min_parallax_cos=1.0)
    err = np.linalg.norm(np.asarray(Xw_hat) - Xw, axis=1)
    assert np.median(err[np.asarray(valid)]) < 1.5
