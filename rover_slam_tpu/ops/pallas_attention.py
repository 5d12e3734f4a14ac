"""Fused masked (flash) attention in Pallas for the LightGlue transformer.

Flash-attention tiling: the kv axis is processed in VMEM-sized chunks with an
online (running max / running sum) softmax, so the [Nq, Nk] logits matrix
never exists in HBM at ANY size — the XLA fallback materializes it, which is
fine at SLAM's 512 keypoints but becomes the memory bottleneck when keypoint
counts scale (SURVEY.md §5: blockwise/ring attention inside the LightGlue
kernel is the designed-in sequence-scaling axis; the hot path issues 36
attention calls per matched pair — 9 layers x (2 self + 2 cross)).

Mosaic conventions (same as ops/pallas_matcher.py): 2-D operands with
lane-dim 128 — head_dim is zero-padded 64 -> 128 (zeros are inert in both
matmuls). Falls back to plain jnp on non-TPU backends; parity and the
VMEM-bound scaling are asserted in tests/test_pallas_attention.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9
LANE = 128
TQ = 512     # query rows per kernel instance
TK = 512     # kv rows per online-softmax chunk


def _flash_kernel(q_ref, k_ref, v_ref, m_ref, o_ref, acc, m_run, l_run):
    kidx = pl.program_id(2)

    @pl.when(kidx == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)
        m_run[:] = jnp.full_like(m_run, -1e30)
        l_run[:] = jnp.zeros_like(l_run)

    q = q_ref[:]                                     # [TQ, 128]
    k = k_ref[:]                                     # [TK, 128]
    v = v_ref[:]                                     # [TK, 128]
    mask = m_ref[0]                                  # [TK] f32, 1=valid
    with jax.default_matmul_precision("default"):
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # [TQ, TK]
    s = jnp.where(mask[None, :] > 0, s, NEG_INF)

    m_prev = m_run[:, 0:1]                           # [TQ, 1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)                           # [TQ, TK]
    alpha = jnp.exp(m_prev - m_new)                  # [TQ, 1]
    l_new = alpha * l_run[:, 0:1] + jnp.sum(p, axis=-1, keepdims=True)
    with jax.default_matmul_precision("default"):
        pv = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    acc[:] = acc[:] * alpha + pv
    m_run[:] = jnp.broadcast_to(m_new, m_run.shape)
    l_run[:] = jnp.broadcast_to(l_new, l_run.shape)

    @pl.when(kidx == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = (acc[:] / jnp.maximum(l_run[:, 0:1], 1e-20)) \
            .astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("force_xla",))
def masked_attention(q, k, v, mask_kv, force_xla: bool = False):
    """softmax(q k^T / sqrt(Dh), masked over kv) @ v.

    q: [B,Nq,H,Dh], k/v: [B,Nk,H,Dh], mask_kv: [B,Nk] bool.
    Returns [B,Nq,H,Dh] in q.dtype. The 1/sqrt(Dh) scale is folded into q.
    """
    B, Nq, H, Dh = q.shape
    Nk = k.shape[1]
    q = q / jnp.sqrt(Dh).astype(q.dtype)
    if force_xla or jax.default_backend() != "tpu" or Dh > LANE:
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k)
        s = jnp.where(mask_kv[:, None, None, :], s.astype(jnp.float32),
                      NEG_INF)
        p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", p, v)

    tq, tk = min(TQ, Nq), min(TK, Nk)
    pq, pk, pd = (-Nq) % tq, (-Nk) % tk, LANE - Dh
    Mq, Mk = Nq + pq, Nk + pk

    def flat(x, n, p_n):
        x = x.transpose(0, 2, 1, 3).reshape(B * H, n, Dh)
        return jnp.pad(x, ((0, 0), (0, p_n), (0, pd))).reshape(
            B * H * (n + p_n), LANE)
    qt = flat(q, Nq, pq)
    kt = flat(k, Nk, pk)
    vt = flat(v, Nk, pk)
    # Padded kv rows masked out; sublane-dim tiled 8x for Mosaic (the kernel
    # reads row 0 of its block).
    m = jnp.pad(mask_kv.astype(jnp.float32), ((0, 0), (0, pk)))
    m = jnp.repeat(m, H * 8, axis=0)                  # [B*H*8, Mk]

    nq_t, nk_t = Mq // tq, Mk // tk
    out = pl.pallas_call(
        _flash_kernel,
        grid=(B * H, nq_t, nk_t),
        in_specs=[
            pl.BlockSpec((tq, LANE), lambda i, jq, jk: (i * nq_t + jq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, LANE), lambda i, jq, jk: (i * nk_t + jk, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, LANE), lambda i, jq, jk: (i * nk_t + jk, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tk), lambda i, jq, jk: (i, jk),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tq, LANE), lambda i, jq, jk: (i * nq_t + jq, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H * Mq, LANE), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((tq, LANE), jnp.float32),      # acc
            pltpu.VMEM((tq, LANE), jnp.float32),      # running max
            pltpu.VMEM((tq, LANE), jnp.float32),      # running sum
        ],
    )(qt, kt, vt, m)
    out = out.reshape(B, H, Mq, LANE)[:, :, :Nq, :Dh].transpose(0, 2, 1, 3)
    return out
