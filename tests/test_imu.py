"""IMU preintegration tests vs. closed-form constant-motion solutions
(reference semantics: src/ImuTypes.cc:247-324 IntegrateNewMeasurement)."""
import numpy as np
import jax.numpy as jnp

from rover_slam_tpu.geometry import lie
from rover_slam_tpu.imu import preintegration as pre

CALIB = pre.ImuCalib(
    Rbc=jnp.eye(3), tbc=jnp.zeros(3),
    sigma_g=jnp.float32(1.7e-4 * np.sqrt(200.0)),
    sigma_a=jnp.float32(2e-3 * np.sqrt(200.0)),
    walk_g=jnp.float32(1.9e-5 / np.sqrt(200.0)),
    walk_a=jnp.float32(3e-3 / np.sqrt(200.0)),
)

DT = 1.0 / 200.0
G = pre.GRAVITY_VEC


def integrate_const(acc, gyro, n=200, bg=None, ba=None):
    accs = jnp.tile(jnp.asarray(acc, jnp.float32)[None], (n, 1))
    gyros = jnp.tile(jnp.asarray(gyro, jnp.float32)[None], (n, 1))
    dts = jnp.full((n,), DT, jnp.float32)
    mask = jnp.ones((n,), bool)
    return pre.integrate(accs, gyros, dts, mask, CALIB, bg=bg, ba=ba)


def test_stationary_cancels_gravity():
    # Body at rest, measuring reaction to gravity: specific force = +9.81 z.
    st = integrate_const([0.0, 0.0, pre.GRAVITY], [0.0, 0.0, 0.0])
    R0, p0, v0 = jnp.eye(3), jnp.zeros(3), jnp.zeros(3)
    R1, p1, v1 = pre.predict_state(R0, p0, v0, st, jnp.zeros(3), jnp.zeros(3))
    np.testing.assert_allclose(v1, np.zeros(3), atol=1e-4)
    np.testing.assert_allclose(p1, np.zeros(3), atol=1e-4)
    np.testing.assert_allclose(R1, np.eye(3), atol=1e-5)
    np.testing.assert_allclose(st.dt, 1.0, atol=1e-6)


def test_constant_rotation():
    w = np.array([0.0, 0.0, 0.7])
    st = integrate_const([0.0, 0.0, 0.0], w)
    expected = np.asarray(lie.so3_exp(jnp.asarray(w * 1.0, jnp.float32)))
    np.testing.assert_allclose(st.dR, expected, atol=1e-4)


def test_constant_world_acceleration():
    # No rotation; body frame == world frame. Specific force = a_w - g_w.
    a_w = np.array([0.5, -0.3, 0.2])
    f = a_w - np.asarray(G)
    st = integrate_const(f, [0.0, 0.0, 0.0])
    R0, p0, v0 = jnp.eye(3), jnp.zeros(3), jnp.asarray([0.1, 0.0, 0.0], jnp.float32)
    R1, p1, v1 = pre.predict_state(R0, p0, v0, st, jnp.zeros(3), jnp.zeros(3))
    t = 1.0
    np.testing.assert_allclose(v1, np.asarray(v0) + a_w * t, atol=1e-3)
    np.testing.assert_allclose(p1, np.asarray(v0) * t + 0.5 * a_w * t * t, atol=1e-3)


def test_rotation_plus_acceleration_vs_numerical():
    """Midpoint preintegration vs. fine-grained numerical integration."""
    rng = np.random.default_rng(3)
    n = 100
    accs = rng.normal(0, 2.0, (n, 3)).astype(np.float32)
    gyros = rng.normal(0, 0.8, (n, 3)).astype(np.float32)
    st = pre.integrate(jnp.asarray(accs), jnp.asarray(gyros),
                       jnp.full((n,), DT, jnp.float32), jnp.ones((n,), bool), CALIB)
    # Numerical: same Euler scheme in float64.
    R = np.eye(3); V = np.zeros(3); P = np.zeros(3)
    for i in range(n):
        a, w = accs[i].astype(np.float64), gyros[i].astype(np.float64)
        P = P + V * DT + 0.5 * (R @ a) * DT * DT
        V = V + (R @ a) * DT
        R = R @ np.asarray(lie.so3_exp(jnp.asarray(w * DT)), dtype=np.float64)
    np.testing.assert_allclose(st.dR, R, atol=1e-4)
    np.testing.assert_allclose(st.dV, V, atol=1e-3)
    np.testing.assert_allclose(st.dP, P, atol=1e-3)


def test_mask_padding_ignored():
    n = 50
    accs = np.zeros((n, 3), np.float32); accs[:, 2] = 9.81
    accs[30:] = 999.0  # garbage in padded region
    gyros = np.zeros((n, 3), np.float32); gyros[30:] = 999.0
    dts = np.full((n,), DT, np.float32)
    mask = np.arange(n) < 30
    st = pre.integrate(jnp.asarray(accs), jnp.asarray(gyros), jnp.asarray(dts),
                       jnp.asarray(mask), CALIB)
    st_ref = pre.integrate(jnp.asarray(accs[:30]), jnp.asarray(gyros[:30]),
                           jnp.asarray(dts[:30]), jnp.ones((30,), bool), CALIB)
    np.testing.assert_allclose(st.dt, st_ref.dt, atol=1e-7)
    np.testing.assert_allclose(st.dV, st_ref.dV, atol=1e-6)
    np.testing.assert_allclose(st.dR, st_ref.dR, atol=1e-6)


def test_bias_jacobian_first_order():
    """GetDeltaRotation/Velocity/Position(b) must match re-integration with the
    shifted bias to first order (reference include/ImuTypes.h:200-230)."""
    rng = np.random.default_rng(4)
    n = 100
    accs = jnp.asarray(rng.normal(0, 2.0, (n, 3)), jnp.float32)
    gyros = jnp.asarray(rng.normal(0, 0.5, (n, 3)), jnp.float32)
    dts = jnp.full((n,), DT, jnp.float32)
    mask = jnp.ones((n,), bool)

    st0 = pre.integrate(accs, gyros, dts, mask, CALIB)
    dbg = jnp.asarray([0.002, -0.001, 0.003], jnp.float32)
    dba = jnp.asarray([-0.01, 0.02, 0.005], jnp.float32)

    # Corrected getters at the shifted bias.
    dR_corr = pre.delta_rotation(st0, dbg)
    dV_corr = pre.delta_velocity(st0, dbg, dba)
    dP_corr = pre.delta_position(st0, dbg, dba)

    # Ground truth: re-integrate with bias-corrected measurements.
    st1 = pre.integrate(accs, gyros, dts, mask, CALIB, bg=dbg, ba=dba)
    np.testing.assert_allclose(dR_corr, st1.dR, atol=5e-4)
    np.testing.assert_allclose(dV_corr, st1.dV, atol=5e-3)
    np.testing.assert_allclose(dP_corr, st1.dP, atol=5e-3)


def test_covariance_psd_and_grows():
    st100 = integrate_const([0.0, 0.0, 9.81], [0.1, 0.0, 0.0], n=100)
    st200 = integrate_const([0.0, 0.0, 9.81], [0.1, 0.0, 0.0], n=200)
    C100 = np.asarray(st100.C)
    C200 = np.asarray(st200.C)
    eig100 = np.linalg.eigvalsh(0.5 * (C100 + C100.T))
    assert eig100.min() >= -1e-10
    assert np.trace(C200) > np.trace(C100)
    info = np.asarray(pre.information_9(st100))
    assert np.all(np.isfinite(info))


def test_merge_matches_full():
    rng = np.random.default_rng(5)
    n = 80
    accs = jnp.asarray(rng.normal(0, 1.5, (n, 3)), jnp.float32)
    gyros = jnp.asarray(rng.normal(0, 0.3, (n, 3)), jnp.float32)
    dts = jnp.full((n,), DT, jnp.float32)
    ones = jnp.ones((n // 2,), bool)
    st_a = pre.integrate(accs[:n // 2], gyros[:n // 2], dts[:n // 2], ones, CALIB)
    st_b = pre.integrate(accs[n // 2:], gyros[n // 2:], dts[n // 2:], ones, CALIB)
    st_m = pre.merge(st_a, st_b)
    st_full = pre.integrate(accs, gyros, dts, jnp.ones((n,), bool), CALIB)
    np.testing.assert_allclose(st_m.dR, st_full.dR, atol=1e-5)
    np.testing.assert_allclose(st_m.dV, st_full.dV, atol=1e-4)
    np.testing.assert_allclose(st_m.dP, st_full.dP, atol=1e-4)
    np.testing.assert_allclose(st_m.dt, st_full.dt, atol=1e-6)
    # Exact composition extends to bias Jacobians and the covariance.
    for f in ["JRg", "JVg", "JVa", "JPg", "JPa"]:
        np.testing.assert_allclose(getattr(st_m, f), getattr(st_full, f),
                                   atol=1e-5)
    np.testing.assert_allclose(np.asarray(st_m.C), np.asarray(st_full.C),
                               rtol=1e-4, atol=1e-12)
