"""Closed-form batched small-block inverses/solves (3x3, 6x6).

TPU-critical: `jnp.linalg.solve`/`inv` on small matrices lower to sequential
LAPACK-style loops on TPU (~0.1-1 ms per call even for a single 6x6). The SLAM
hot paths solve thousands of tiny SPD systems per frame — per-landmark 3x3
Schur blocks, per-pose 6x6 normal equations (reference g2o solves the same
blocks with Eigen dense inverses, Thirdparty/g2o block_solver.h) — so every one
of them goes through these closed-form vectorized kernels instead.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def inv3(A):
    """Batched 3x3 inverse via the adjugate. A: [..., 3, 3]."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    A11 = e * i - f * h
    A12 = c * h - b * i
    A13 = b * f - c * e
    A21 = f * g - d * i
    A22 = a * i - c * g
    A23 = c * d - a * f
    A31 = d * h - e * g
    A32 = b * g - a * h
    A33 = a * e - b * d
    det = a * A11 + b * A21 + c * A31
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    inv = jnp.stack([
        jnp.stack([A11, A12, A13], -1),
        jnp.stack([A21, A22, A23], -1),
        jnp.stack([A31, A32, A33], -1),
    ], -2)
    return inv / det[..., None, None]


def inv6(M):
    """Batched 6x6 inverse via 3x3 block Schur complement. M: [..., 6, 6].

    Requires the blocks to be SPD-ish (LM damping guarantees that in the
    solver paths that use this)."""
    A = M[..., 0:3, 0:3]
    B = M[..., 0:3, 3:6]
    C = M[..., 3:6, 0:3]
    D = M[..., 3:6, 3:6]
    Ai = inv3(A)
    AiB = Ai @ B
    S = D - C @ AiB
    Si = inv3(S)
    CAi = C @ Ai
    top_left = Ai + AiB @ Si @ CAi
    top_right = -AiB @ Si
    bot_left = -Si @ CAi
    top = jnp.concatenate([top_left, top_right], axis=-1)
    bot = jnp.concatenate([bot_left, Si], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def chol3(A):
    """Batched lower Cholesky of SPD 3x3 blocks (closed form)."""
    eps = 1e-12
    l11 = jnp.sqrt(jnp.maximum(A[..., 0, 0], eps))
    l21 = A[..., 1, 0] / l11
    l31 = A[..., 2, 0] / l11
    l22 = jnp.sqrt(jnp.maximum(A[..., 1, 1] - l21 * l21, eps))
    l32 = (A[..., 2, 1] - l31 * l21) / l22
    l33 = jnp.sqrt(jnp.maximum(A[..., 2, 2] - l31 * l31 - l32 * l32, eps))
    z = jnp.zeros_like(l11)
    return jnp.stack([
        jnp.stack([l11, z, z], -1),
        jnp.stack([l21, l22, z], -1),
        jnp.stack([l31, l32, l33], -1),
    ], -2)


def _inv2(A):
    a, b = A[..., 0, 0], A[..., 0, 1]
    c, d = A[..., 1, 0], A[..., 1, 1]
    det = a * d - b * c
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    row0 = jnp.stack([d, -b], -1)
    row1 = jnp.stack([-c, a], -1)
    return jnp.stack([row0, row1], -2) / det[..., None, None]


def invn(M):
    """Batched inverse of small SPD-ish [..., n, n] blocks for any static n,
    via recursive 2-way block Schur complements bottoming out in the closed
    3x3/2x2/1x1 forms. Depth is O(log n) of fully vectorized ops — no
    sequential LAPACK loop. Intended for n up to a few dozen (the 9-dim
    preintegration covariance, the 15-dim VI pose-state blocks)."""
    n = M.shape[-1]
    if n == 1:
        return 1.0 / jnp.where(jnp.abs(M) < 1e-12, 1e-12, M)
    if n == 2:
        return _inv2(M)
    if n == 3:
        return inv3(M)
    k = (n // 2 + 2) // 3 * 3 if n > 4 else n // 2   # split at a multiple of 3
    k = min(max(k, 1), n - 1)
    A = M[..., :k, :k]
    B = M[..., :k, k:]
    C = M[..., k:, :k]
    D = M[..., k:, k:]
    Ai = invn(A)
    AiB = Ai @ B
    S = D - C @ AiB
    Si = invn(S)
    CAi = C @ Ai
    top = jnp.concatenate([Ai + AiB @ Si @ CAi, -AiB @ Si], axis=-1)
    bot = jnp.concatenate([-Si @ CAi, Si], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def solven(A, b, refine: int = 2):
    """Batched solve for small SPD-ish systems of any static size (see invn).

    `refine` rounds of iterative refinement (x += A⁻¹(b - Ax), reusing the
    computed inverse) recover LU-level accuracy on mildly ill-conditioned
    systems at the cost of two matvecs per round — still fully vectorized."""
    Ai = invn(A)
    x = jnp.einsum("...ij,...j->...i", Ai, b)
    for _ in range(refine):
        r = b - jnp.einsum("...ij,...j->...i", A, x)
        x = x + jnp.einsum("...ij,...j->...i", Ai, r)
    return x


def solve3(A, b):
    """Batched solve of 3x3 systems. A: [..., 3, 3], b: [..., 3]."""
    return jnp.einsum("...ij,...j->...i", inv3(A), b)


def solve6(A, b):
    """Batched solve of 6x6 SPD-ish systems. A: [..., 6, 6], b: [..., 6]."""
    return jnp.einsum("...ij,...j->...i", inv6(A), b)
