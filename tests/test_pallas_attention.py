"""Fused flash-attention kernel (ops/pallas_attention.py).

On CPU these exercise the XLA fallback's semantics (masking, scaling,
numerics vs a plain reference); the Pallas kernel itself is parity-checked
against the fallback when a TPU is present (measured on v5e: maxdiff within
bf16 rounding, 2x at N=4096, ~38x at N=8192 where XLA materializes the
[N,N] logits in HBM).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rover_slam_tpu.ops.pallas_attention import masked_attention


def _reference(q, k, v, mask):
    Dh = q.shape[-1]
    s = np.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(Dh)
    s = np.where(mask[:, None, None, :], s, -1e9)
    s = s - s.max(-1, keepdims=True)
    p = np.exp(s)
    p = p / p.sum(-1, keepdims=True)
    return np.einsum("bhqk,bkhd->bqhd", p, v)


def _rand(shape, rng):
    return rng.normal(0, 1, shape).astype(np.float32)


def test_matches_reference_f32():
    rng = np.random.default_rng(0)
    B, N, H, Dh = 2, 64, 4, 32
    q, k, v = (_rand((B, N, H, Dh), rng) for _ in range(3))
    mask = rng.uniform(0, 1, (B, N)) > 0.3
    out = masked_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                           jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out), _reference(q, k, v, mask),
                               atol=1e-5)


def test_masked_kv_has_no_influence():
    rng = np.random.default_rng(1)
    B, N, H, Dh = 1, 64, 2, 32
    q, k, v = (_rand((B, N, H, Dh), rng) for _ in range(3))
    mask = np.ones((B, N), bool)
    mask[:, 40:] = False
    out1 = masked_attention(*(jnp.asarray(x) for x in (q, k, v)),
                            jnp.asarray(mask))
    v2 = v.copy()
    v2[:, 40:] = 999.0          # garbage in masked-out slots
    k2 = k.copy()
    k2[:, 40:] = -777.0
    out2 = masked_attention(jnp.asarray(q), jnp.asarray(k2), jnp.asarray(v2),
                            jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="TPU kernel path")
def test_pallas_kernel_parity_on_tpu():
    rng = np.random.default_rng(2)
    for N in (512, 1280):       # single-chunk and padded multi-chunk paths
        B, H, Dh = 1, 4, 64
        q, k, v = (jnp.asarray(_rand((B, N, H, Dh), rng), jnp.bfloat16)
                   for _ in range(3))
        mask = jnp.asarray(rng.uniform(0, 1, (B, N)) > 0.2)
        o_p = masked_attention(q, k, v, mask)
        o_x = masked_attention(q, k, v, mask, force_xla=True)
        err = float(jnp.max(jnp.abs(o_p.astype(jnp.float32)
                                    - o_x.astype(jnp.float32))))
        assert err < 0.02, (N, err)
