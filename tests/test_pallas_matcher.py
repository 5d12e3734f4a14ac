"""Pallas fused NN matcher vs the jnp reference (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rover_slam_tpu.ops import association as assoc


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    """CPU tests run the kernel in the Pallas interpreter."""
    from jax.experimental import pallas as pl
    orig = pl.pallas_call

    def patched(*args, **kw):
        kw.setdefault("interpret", jax.default_backend() == "cpu")
        return orig(*args, **kw)

    monkeypatch.setattr(pl, "pallas_call", patched)
    # re-import with patched pallas_call
    import importlib
    from rover_slam_tpu.ops import pallas_matcher
    importlib.reload(pallas_matcher)
    yield pallas_matcher
    importlib.reload(pallas_matcher)


def unit_desc(rng, n, d=64):
    v = rng.normal(size=(n, d)).astype(np.float32)
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def test_matches_jnp_reference(interpret_mode):
    pm = interpret_mode
    rng = np.random.default_rng(0)
    N0, N1 = 200, 180     # non-multiples of the tile: padding path
    d0 = unit_desc(rng, N0)
    perm = rng.permutation(N0)[:N1]
    d1 = d0[perm] + rng.normal(0, 0.05, (N1, 64)).astype(np.float32)
    d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
    v0 = np.ones(N0, bool); v0[190:] = False
    v1 = np.ones(N1, bool); v1[170:] = False

    m_ref, dist_ref = assoc.mutual_nn_match(
        jnp.asarray(d0), jnp.asarray(v0), jnp.asarray(d1), jnp.asarray(v1),
        ratio=0.8)
    m_pal, dist_pal = pm.mutual_nn_match_pallas(
        jnp.asarray(d0), jnp.asarray(v0), jnp.asarray(d1), jnp.asarray(v1),
        ratio=0.8)
    m_ref, m_pal = np.asarray(m_ref), np.asarray(m_pal)
    # bf16 tie-breaks can differ on a few borderline pairs; demand 95% identical
    agree = (m_ref == m_pal).mean()
    assert agree > 0.95, agree
    matched = (m_pal >= 0) & (m_ref >= 0)
    assert (m_pal[matched] == m_ref[matched]).mean() > 0.98


def test_nn_reduce_values(interpret_mode):
    pm = interpret_mode
    rng = np.random.default_rng(1)
    d0 = unit_desc(rng, 130)
    d1 = unit_desc(rng, 150)
    best, idx, second = pm.nn_reduce(jnp.asarray(d0), jnp.asarray(d1),
                                     jnp.ones(150, bool))
    ref = ((d0[:, None] - d1[None]) ** 2).sum(-1)
    np.testing.assert_allclose(np.asarray(best), ref.min(1), atol=3e-2)
    # argmin agreement (allow bf16 near-ties)
    agree = (np.asarray(idx) == ref.argmin(1)).mean()
    assert agree > 0.95
    second_ref = np.sort(ref, axis=1)[:, 1]
    np.testing.assert_allclose(np.asarray(second), second_ref, atol=3e-2)


def test_invalid_cols_excluded(interpret_mode):
    pm = interpret_mode
    rng = np.random.default_rng(2)
    d0 = unit_desc(rng, 64)
    d1 = np.concatenate([d0, unit_desc(rng, 64)])   # identical first half
    v1 = np.zeros(128, bool); v1[64:] = True        # but masked out!
    best, idx, _ = pm.nn_reduce(jnp.asarray(d0), jnp.asarray(d1),
                                jnp.asarray(v1))
    assert (np.asarray(idx) >= 64).all()
