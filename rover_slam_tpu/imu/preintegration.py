"""IMU preintegration as a `lax.scan` over measurements.

TPU-native replacement for the reference's IMU::Preintegrated
(reference: src/ImuTypes.cc:247-324 IntegrateNewMeasurement — Forster et al. midpoint
preintegration with 15x15 covariance propagation and bias Jacobians;
include/ImuTypes.h:143-251 for the state and bias-corrected getters).

Design: the preintegration state is a flat pytree `PreintState`; integrating a window
of measurements is ONE `lax.scan` over fixed-length padded measurement arrays with a
validity mask, so per-frame preintegration is a single jitted program regardless of
how many IMU samples landed between frames (the reference loops on the host,
src/Tracking.cc:1780-1931).

State ordering for the covariance C (15x15), matching the reference:
  [dR(0:3), dV(3:6), dP(6:9), bg(9:12), ba(12:15)]
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import lie

GRAVITY = 9.81  # reference include/ImuTypes.h:43
GRAVITY_VEC = jnp.array([0.0, 0.0, -GRAVITY], dtype=jnp.float32)


class ImuCalib(NamedTuple):
    """Noise densities already scaled to per-sample sigmas (reference scales YAML
    noise by sqrt(freq) and walk by 1/sqrt(freq), src/Tracking.cc:665-672)."""
    Rbc: jnp.ndarray      # [3,3] camera-to-body rotation (Tbc)
    tbc: jnp.ndarray      # [3]
    sigma_g: jnp.ndarray  # gyro noise (rad/s/sqrt(Hz) * sqrt(freq))
    sigma_a: jnp.ndarray  # accel noise
    walk_g: jnp.ndarray   # gyro bias random walk per sample
    walk_a: jnp.ndarray


class PreintState(NamedTuple):
    dR: jnp.ndarray   # [3,3]
    dV: jnp.ndarray   # [3]
    dP: jnp.ndarray   # [3]
    C: jnp.ndarray    # [15,15] covariance (dR,dV,dP,bg,ba)
    JRg: jnp.ndarray  # [3,3] d(dR)/d(bg)
    JVg: jnp.ndarray  # [3,3]
    JVa: jnp.ndarray  # [3,3]
    JPg: jnp.ndarray  # [3,3]
    JPa: jnp.ndarray  # [3,3]
    dt: jnp.ndarray   # scalar total time
    bg: jnp.ndarray   # [3] linearization gyro bias
    ba: jnp.ndarray   # [3] linearization accel bias


def init_state(bg: jnp.ndarray | None = None, ba: jnp.ndarray | None = None,
               dtype=jnp.float32) -> PreintState:
    z3 = jnp.zeros(3, dtype)
    return PreintState(
        dR=jnp.eye(3, dtype=dtype), dV=z3, dP=z3,
        C=jnp.zeros((15, 15), dtype),
        JRg=jnp.zeros((3, 3), dtype), JVg=jnp.zeros((3, 3), dtype),
        JVa=jnp.zeros((3, 3), dtype), JPg=jnp.zeros((3, 3), dtype),
        JPa=jnp.zeros((3, 3), dtype),
        dt=jnp.zeros((), dtype),
        bg=bg if bg is not None else z3, ba=ba if ba is not None else z3,
    )


def _integrate_one(state: PreintState, acc: jnp.ndarray, gyro: jnp.ndarray,
                   dt: jnp.ndarray, calib: ImuCalib) -> PreintState:
    """One midpoint step (reference src/ImuTypes.cc:247-324 semantics)."""
    a = acc - state.ba
    w = gyro - state.bg

    # Position/velocity update with the *old* dR (reference updates P,V first).
    dP = state.dP + state.dV * dt + 0.5 * (state.dR @ a) * dt * dt
    dV = state.dV + (state.dR @ a) * dt

    a_hat = lie.so3_hat(a)
    dRa = state.dR @ a_hat

    # Jacobians w.r.t. biases (before rotation update, same order as reference).
    JPa = state.JPa + state.JVa * dt - 0.5 * state.dR * dt * dt
    JPg = state.JPg + state.JVg * dt - 0.5 * dRa @ state.JRg * dt * dt
    JVa = state.JVa - state.dR * dt
    JVg = state.JVg - dRa @ state.JRg * dt

    # Rotation increment.
    phi = w * dt
    dRi = lie.so3_exp(phi)
    Jr = lie.so3_right_jacobian(phi)
    dR = lie.normalize_rotation(state.dR @ dRi)

    # Covariance propagation: x' = A x + B n, noise n = [ng(3), na(3)] per-sample.
    I3 = jnp.eye(3, dtype=dP.dtype)
    A = jnp.zeros((9, 9), dP.dtype)
    A = A.at[0:3, 0:3].set(dRi.T)
    A = A.at[3:6, 0:3].set(-dRa * dt)
    A = A.at[3:6, 3:6].set(I3)
    A = A.at[6:9, 0:3].set(-0.5 * dRa * dt * dt)
    A = A.at[6:9, 3:6].set(I3 * dt)
    A = A.at[6:9, 6:9].set(I3)
    B = jnp.zeros((9, 6), dP.dtype)
    B = B.at[0:3, 0:3].set(Jr * dt)
    B = B.at[3:6, 3:6].set(state.dR * dt)
    B = B.at[6:9, 3:6].set(0.5 * state.dR * dt * dt)

    Nga = jnp.zeros((6, 6), dP.dtype)
    Nga = Nga.at[0:3, 0:3].set((calib.sigma_g ** 2) * I3)
    Nga = Nga.at[3:6, 3:6].set((calib.sigma_a ** 2) * I3)

    C = state.C
    C9 = A @ C[:9, :9] @ A.T + B @ Nga @ B.T
    C = C.at[:9, :9].set(C9)
    # Bias random walk accumulates in the lower-right block.
    walk = jnp.zeros((6, 6), dP.dtype)
    walk = walk.at[0:3, 0:3].set((calib.walk_g ** 2) * I3)
    walk = walk.at[3:6, 3:6].set((calib.walk_a ** 2) * I3)
    C = C.at[9:15, 9:15].set(C[9:15, 9:15] + walk * dt)

    JRg = dRi.T @ state.JRg - Jr * dt

    return PreintState(dR=dR, dV=dV, dP=dP, C=C,
                       JRg=JRg, JVg=JVg, JVa=JVa, JPg=JPg, JPa=JPa,
                       dt=state.dt + dt, bg=state.bg, ba=state.ba)


def integrate(measurements_acc: jnp.ndarray, measurements_gyro: jnp.ndarray,
              dts: jnp.ndarray, mask: jnp.ndarray, calib: ImuCalib,
              bg: jnp.ndarray | None = None, ba: jnp.ndarray | None = None
              ) -> PreintState:
    """Preintegrate a padded window of measurements.

    measurements_acc/gyro: [N, 3]; dts: [N]; mask: [N] bool (True = real sample).
    Returns the final PreintState. Masked-out steps are identity (dt=0).
    """
    state0 = init_state(bg, ba, dtype=measurements_acc.dtype)

    def step(state, inp):
        acc, gyro, dt, m = inp
        new = _integrate_one(state, acc, gyro, dt, calib)
        out = jax.tree_util.tree_map(
            lambda n, o: jnp.where(m, n, o), new, state)
        return out, None

    final, _ = jax.lax.scan(step, state0,
                            (measurements_acc, measurements_gyro, dts, mask))
    return final


# ---------------------------------------------------------------------------
# Bias-corrected getters (reference include/ImuTypes.h GetDeltaRotation(b) etc.)
# ---------------------------------------------------------------------------

def delta_rotation(state: PreintState, bg: jnp.ndarray) -> jnp.ndarray:
    dbg = bg - state.bg
    return lie.normalize_rotation(state.dR @ lie.so3_exp(state.JRg @ dbg))


def delta_velocity(state: PreintState, bg: jnp.ndarray, ba: jnp.ndarray) -> jnp.ndarray:
    dbg, dba = bg - state.bg, ba - state.ba
    return state.dV + state.JVg @ dbg + state.JVa @ dba


def delta_position(state: PreintState, bg: jnp.ndarray, ba: jnp.ndarray) -> jnp.ndarray:
    dbg, dba = bg - state.bg, ba - state.ba
    return state.dP + state.JPg @ dbg + state.JPa @ dba


def predict_state(Rwb0: jnp.ndarray, pwb0: jnp.ndarray, vwb0: jnp.ndarray,
                  state: PreintState, bg: jnp.ndarray, ba: jnp.ndarray):
    """Propagate body state through the preintegrated delta
    (reference Tracking::PredictStateIMU src/Tracking.cc:1933-1997)."""
    t = state.dt
    g = GRAVITY_VEC.astype(Rwb0.dtype)
    dR = delta_rotation(state, bg)
    dV = delta_velocity(state, bg, ba)
    dP = delta_position(state, bg, ba)
    Rwb1 = lie.normalize_rotation(Rwb0 @ dR)
    vwb1 = vwb0 + g * t + Rwb0 @ dV
    pwb1 = pwb0 + vwb0 * t + 0.5 * g * t * t + Rwb0 @ dP
    return Rwb1, pwb1, vwb1


def merge(first: PreintState, second: PreintState) -> PreintState:
    """Exact concatenation of two preintegrated segments sharing the same
    linearization bias (reference Preintegrated::MergePrevious semantics).

    Composition: dR = dRa dRb; dV = dVa + dRa dVb;
                 dP = dPa + dVa*dtb + dRa dPb.
    Bias Jacobians follow by product rule, including the rotation cross-terms
    (-dRa hat(x) JRga); the 9x9 covariance propagates through the
    linearized concatenation maps F (first-segment error) and G (second)."""
    dta, dtb = first.dt, second.dt
    dRa, dRb = first.dR, second.dR
    dt = dta + dtb
    dR = lie.normalize_rotation(dRa @ dRb)
    dV = first.dV + dRa @ second.dV
    dP = first.dP + first.dV * dtb + dRa @ second.dP

    hat_dVb = lie.so3_hat(second.dV)
    hat_dPb = lie.so3_hat(second.dP)
    JRg = dRb.T @ first.JRg + second.JRg
    JVg = first.JVg - dRa @ hat_dVb @ first.JRg + dRa @ second.JVg
    JVa = first.JVa + dRa @ second.JVa
    JPg = (first.JPg + first.JVg * dtb - dRa @ hat_dPb @ first.JRg
           + dRa @ second.JPg)
    JPa = first.JPa + first.JVa * dtb + dRa @ second.JPa

    I3 = jnp.eye(3, dtype=dV.dtype)
    Z3 = jnp.zeros((3, 3), dV.dtype)
    F9 = jnp.block([
        [dRb.T, Z3, Z3],
        [-dRa @ hat_dVb, I3, Z3],
        [-dRa @ hat_dPb, I3 * dtb, I3],
    ])
    G9 = jnp.block([
        [I3, Z3, Z3],
        [Z3, dRa, Z3],
        [Z3, Z3, dRa],
    ])
    C = jnp.zeros((15, 15), dV.dtype)
    C = C.at[:9, :9].set(F9 @ first.C[:9, :9] @ F9.T
                         + G9 @ second.C[:9, :9] @ G9.T)
    C = C.at[9:15, 9:15].set(first.C[9:15, 9:15] + second.C[9:15, 9:15])
    return PreintState(dR=dR, dV=dV, dP=dP, C=C, JRg=JRg, JVg=JVg, JVa=JVa,
                       JPg=JPg, JPa=JPa, dt=dt, bg=first.bg, ba=first.ba)


def information_9(state: PreintState, eps: float = 1e-9) -> jnp.ndarray:
    """9x9 information matrix of the (dR,dV,dP) residual = inverse of C[:9,:9],
    symmetrized (reference EdgeInertial uses C.block<9,9>(0,0).inverse())."""
    C9 = state.C[:9, :9]
    C9 = 0.5 * (C9 + C9.T) + eps * jnp.eye(9, dtype=C9.dtype)
    return jnp.linalg.inv(C9)
