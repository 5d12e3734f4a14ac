"""LightGlue matcher structural tests (reference: src/Matchers/lightglue_onnx.cpp)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rover_slam_tpu.models import lightglue as lg


@pytest.fixture(scope="module")
def matcher():
    return lg.LightGlueMatcher(num_kpts=64, num_layers=2, dtype=jnp.float32)


def rand_inputs(rng, B=1, N=64):
    kpts = jnp.asarray(rng.uniform(-1, 1, (B, N, 2)), jnp.float32)
    desc = rng.normal(size=(B, N, 256)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
    return kpts, jnp.asarray(desc), jnp.ones((B, N), bool)


def test_normalize_keypoints():
    k = jnp.asarray([[[0.0, 0.0], [640.0, 480.0], [320.0, 240.0]]])
    n = lg.normalize_keypoints(k, (480, 640))
    np.testing.assert_allclose(np.asarray(n[0, 2]), [0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(n[0, 0]), [-1.0, -0.75], atol=1e-6)


def test_output_contract(matcher):
    rng = np.random.default_rng(8)
    k0, d0, m0 = rand_inputs(rng)
    k1, d1, m1 = rand_inputs(rng)
    out = matcher(k0, d0, m0, k1, d1, m1)
    assert out["matches0"].shape == (1, 64)
    assert out["mscores0"].shape == (1, 64)
    m = np.asarray(out["matches0"][0])
    assert ((m >= -1) & (m < 64)).all()
    # Matches must be injective (mutual argmax): no duplicate targets.
    tgt = m[m >= 0]
    assert len(tgt) == len(set(tgt.tolist()))


def test_identical_descriptors_match(matcher):
    """Same keypoints+descriptors in both images should produce many
    self-consistent matches even with random weights."""
    rng = np.random.default_rng(9)
    k0, d0, m0 = rand_inputs(rng)
    out = matcher(k0, d0, m0, k0, d0, m0)
    m = np.asarray(out["matches0"][0])
    matched = m >= 0
    # identity matching dominates
    frac_id = (m[matched] == np.arange(64)[matched]).mean() if matched.any() else 0.0
    assert matched.sum() > 10
    assert frac_id > 0.8


def test_mask_excludes_padding(matcher):
    rng = np.random.default_rng(10)
    k0, d0, m0 = rand_inputs(rng)
    k1, d1, m1 = rand_inputs(rng)
    m0 = m0.at[0, 32:].set(False)
    m1 = m1.at[0, 48:].set(False)
    out = matcher(k0, d0, m0, k1, d1, m1)
    m = np.asarray(out["matches0"][0])
    assert (m[32:] == -1).all()           # padded queries unmatched
    assert (m[m >= 0] < 48).all()          # no match into padded keys


def test_log_assignment_is_distribution(matcher):
    rng = np.random.default_rng(11)
    k0, d0, m0 = rand_inputs(rng)
    k1, d1, m1 = rand_inputs(rng)
    la, z0, z1 = matcher._forward({"params": matcher.params}, k0, d0, m0, k1, d1, m1)
    P = np.exp(np.asarray(la[0, :64, :64]))
    assert (P >= 0).all() and (P <= 1 + 1e-5).all()
    # Row mass = P(match) + P(unmatched) should be ~sigmoid decomposition <= 1.
    row_mass = P.sum(1)
    assert (row_mass <= 1.0 + 1e-4).all()
    assert np.isfinite(np.asarray(z0)).all() and np.isfinite(np.asarray(z1)).all()


def test_batched_pairs(matcher):
    rng = np.random.default_rng(12)
    k0, d0, m0 = rand_inputs(rng, B=3)
    k1, d1, m1 = rand_inputs(rng, B=3)
    out = matcher(k0, d0, m0, k1, d1, m1)
    out1 = matcher(k0[1:2], d0[1:2], m0[1:2], k1[1:2], d1[1:2], m1[1:2])
    np.testing.assert_allclose(np.asarray(out["matches0"][1]),
                               np.asarray(out1["matches0"][0]))
