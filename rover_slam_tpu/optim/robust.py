"""Robust-kernel weights and chi2 gates for the factor-graph optimizers.

(reference: g2o RobustKernelHuber used throughout src/Optimizer.cc with deltas
sqrt(5.991) mono / sqrt(7.815) stereo — SURVEY.md Appendix A/B.)

In g2o the kernel rescales the error; in an IRLS/LM formulation that is a per-edge
weight w = rho'(chi2). All functions are elementwise-batched.
"""
from __future__ import annotations

import jax.numpy as jnp

# chi-square 95% gates (reference src/Optimizer.cc:105-107 and Appendix B)
CHI2_MONO = 5.991
CHI2_STEREO = 7.815
CHI2_SIM3 = 10.0
CHI2_INERTIAL_RECOVERY = 16.92


def huber_weight(chi2: jnp.ndarray, delta2: float) -> jnp.ndarray:
    """IRLS weight of the Huber kernel with squared threshold delta2.

    w = 1 for chi2 <= delta2, else delta/sqrt(chi2).
    """
    safe = jnp.maximum(chi2, 1e-12)
    return jnp.where(chi2 <= delta2, 1.0, jnp.sqrt(delta2 / safe))


def cauchy_weight(chi2: jnp.ndarray, delta2: float) -> jnp.ndarray:
    return 1.0 / (1.0 + chi2 / delta2)
