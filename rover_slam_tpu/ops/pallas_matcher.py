"""Pallas TPU kernel: fused masked nearest-neighbor descriptor matching.

The jnp path (ops/association.py) materializes the full [N0, N1] distance
matrix in HBM, then reduces it. This kernel fuses distance computation
(bf16 MXU matmul per tile) with the running row-wise best/second-best
reduction in VMEM, so the score matrix never leaves the chip: HBM traffic
drops from O(N0*N1) to O((N0+N1)*D) — the difference matters at the
8k-16k-keypoint scales the SURVEY's §5 sequence-scaling plan anticipates
(reference SPmatcher is a CPU loop; nothing to port).

Exposes `nn_reduce(desc0, desc1, valid1)` -> (best d^2 [N0], argmin [N0],
second-best d^2 [N0]); `mutual_nn_match_pallas` wraps two passes + the
mutual/ratio gates, drop-in compatible with assoc.mutual_nn_match.

Verified bit-compatible with the jnp path on TPU v5e (1024x256: 100% match
agreement). At N=1k both paths are dispatch-latency-bound in this environment;
the kernel's HBM-traffic advantage appears at the larger N it exists for.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e9  # python scalar: jnp constants cannot be captured by pallas kernels
TM = 128   # row tile
TN = 128   # col tile


def _nn_kernel(d0_ref, d1_ref, v1_ref, best_ref, idx_ref, second_ref):
    """Per-row best/second state lives in full-array [1, M0] VMEM outputs
    (index_map constant: the block persists across grid steps — the standard
    accumulator pattern); the row window is addressed with pl.ds. Mosaic
    requires 2-D operands with lane-dim 128 or full-dim blocks, hence the
    [1, M] shapes."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    sl = pl.ds(i * TM, TM)

    with jax.default_matmul_precision("default"):
        cos = jnp.dot(d0_ref[:], d1_ref[:].T,
                      preferred_element_type=jnp.float32)
    scores = 2.0 - 2.0 * cos                                   # [TM, TN] L2^2
    valid = v1_ref[0, pl.ds(j * TN, TN)] > 0
    scores = jnp.where(valid[None, :], scores, BIG)

    tile_best = jnp.min(scores, axis=1)                        # [TM]
    tile_arg = jnp.argmin(scores, axis=1).astype(jnp.int32)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    masked = jnp.where(col_ids == tile_arg[:, None], BIG, scores)
    tile_second = jnp.min(masked, axis=1)
    tile_arg = tile_arg + j * TN

    @pl.when(j == 0)
    def _():
        best_ref[0, sl] = tile_best
        idx_ref[0, sl] = tile_arg
        second_ref[0, sl] = tile_second

    @pl.when(j > 0)
    def _():
        old_best = best_ref[0, sl]
        old_idx = idx_ref[0, sl]
        old_second = second_ref[0, sl]
        # Merge {old_best, old_second} with {tile_best, tile_second}.
        new_best = jnp.minimum(old_best, tile_best)
        new_idx = jnp.where(tile_best < old_best, tile_arg, old_idx)
        # Second best = min of the losers.
        loser = jnp.where(tile_best < old_best, old_best, tile_best)
        new_second = jnp.minimum(jnp.minimum(old_second, tile_second), loser)
        best_ref[0, sl] = new_best
        idx_ref[0, sl] = new_idx
        second_ref[0, sl] = new_second


@functools.partial(jax.jit, static_argnames=())
def nn_reduce(desc0: jnp.ndarray, desc1: jnp.ndarray, valid1: jnp.ndarray):
    """Row-wise nearest + second-nearest neighbor of desc0 in desc1.

    desc0 [N0, D], desc1 [N1, D] unit-norm; valid1 [N1] bool.
    N0/N1 padded internally to tile multiples.
    """
    N0, D = desc0.shape
    N1 = desc1.shape[0]
    P0 = (-N0) % TM
    P1 = (-N1) % TN
    d0 = jnp.pad(desc0, ((0, P0), (0, 0))).astype(jnp.bfloat16)
    d1 = jnp.pad(desc1, ((0, P1), (0, 0))).astype(jnp.bfloat16)
    M0, M1 = N0 + P0, N1 + P1
    v1 = jnp.pad(valid1.astype(jnp.float32), (0, P1)).reshape(1, M1)

    grid = (M0 // TM, M1 // TN)
    full = lambda i, j: (0, 0)
    best, idx, second = pl.pallas_call(
        _nn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TM, D), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, D), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M1), full, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, M0), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M0), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M0), full, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, M0), jnp.float32),
            jax.ShapeDtypeStruct((1, M0), jnp.int32),
            jax.ShapeDtypeStruct((1, M0), jnp.float32),
        ),
    )(d0, d1, v1)
    return best[0, :N0], idx[0, :N0], second[0, :N0]


def mutual_nn_match_pallas(desc0, valid0, desc1, valid1,
                           th_desc2: float = 1.4 ** 2,
                           ratio: float | None = None):
    """Drop-in replacement for assoc.mutual_nn_match backed by the fused
    kernel. Returns (matches0 [N0] int32 (-1 unmatched), best d^2 [N0])."""
    d_best, best1, d_second = nn_reduce(desc0, desc1, valid1)
    d_best_r, best0, _ = nn_reduce(desc1, desc0, valid0)
    N0 = desc0.shape[0]
    mutual = best0[jnp.clip(best1, 0, desc1.shape[0] - 1)] == jnp.arange(N0)
    ok = mutual & (d_best <= th_desc2) & valid0 & valid1[jnp.clip(
        best1, 0, desc1.shape[0] - 1)]
    if ratio is not None:
        ok = ok & (d_best <= ratio * ratio * d_second)
    return jnp.where(ok, best1, -1).astype(jnp.int32), d_best
