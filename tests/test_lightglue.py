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
    la, z0, z1 = matcher.model.apply({"params": matcher.params},
                                     k0, d0, m0, k1, d1, m1)
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


def test_torch_checkpoint_conversion(tmp_path):
    """load_torch_weights maps a state dict in the official LightGlue layout
    onto the Flax tree, and the converted params run (cross q==k shared)."""
    import torch
    import numpy as np
    from rover_slam_tpu.models.lightglue import (LightGlue, LightGlueMatcher,
                                                 load_torch_weights)
    D, L = 64, 2
    rng = np.random.default_rng(0)

    def lin(o, i):
        return (torch.tensor(rng.normal(0, 0.02, (o, i)).astype(np.float32)),
                torch.tensor(rng.normal(0, 0.02, o).astype(np.float32)))

    sd = {}
    w, b = lin(D, 256); sd["input_proj.weight"], sd["input_proj.bias"] = w, b
    sd["posenc.Wr.weight"] = torch.tensor(
        rng.normal(0, 1, (D // 4 // 2, 2)).astype(np.float32))
    for i in range(L):
        p = f"transformers.{i}"
        w, b = lin(3 * D, D)
        sd[f"{p}.self_attn.Wqkv.weight"], sd[f"{p}.self_attn.Wqkv.bias"] = w, b
        w, b = lin(D, D)
        sd[f"{p}.self_attn.out_proj.weight"], sd[f"{p}.self_attn.out_proj.bias"] = w, b
        w, b = lin(D, D)
        sd[f"{p}.cross_attn.to_qk.weight"], sd[f"{p}.cross_attn.to_qk.bias"] = w, b
        w, b = lin(D, D)
        sd[f"{p}.cross_attn.to_v.weight"], sd[f"{p}.cross_attn.to_v.bias"] = w, b
        w, b = lin(D, D)
        sd[f"{p}.cross_attn.to_out.weight"], sd[f"{p}.cross_attn.to_out.bias"] = w, b
        for blk in ("self_attn", "cross_attn"):
            w, b = lin(2 * D, 2 * D)
            sd[f"{p}.{blk}.ffn.0.weight"], sd[f"{p}.{blk}.ffn.0.bias"] = w, b
            sd[f"{p}.{blk}.ffn.1.weight"] = torch.ones(2 * D)
            sd[f"{p}.{blk}.ffn.1.bias"] = torch.zeros(2 * D)
            w, b = lin(D, 2 * D)
            sd[f"{p}.{blk}.ffn.3.weight"], sd[f"{p}.{blk}.ffn.3.bias"] = w, b
    w, b = lin(D, D)
    sd[f"log_assignment.{L-1}.final_proj.weight"] = w
    sd[f"log_assignment.{L-1}.final_proj.bias"] = b
    w, b = lin(1, D)
    sd[f"log_assignment.{L-1}.matchability.weight"] = w
    sd[f"log_assignment.{L-1}.matchability.bias"] = b

    path = str(tmp_path / "lg.pth")
    torch.save(sd, path)
    params = load_torch_weights(path, num_layers=L, dim=D)
    # Cross-attention q/k share the official to_qk weights.
    np.testing.assert_array_equal(
        np.asarray(params["layer_0"]["cross_attn"]["to_q"]["kernel"]),
        np.asarray(params["layer_0"]["cross_attn"]["to_k"]["kernel"]))
    # Structure matches the model's init tree and the params actually run.
    m = LightGlueMatcher(params=params, num_kpts=32, num_layers=L, dim=D)
    N = 32
    k = jnp.asarray(rng.uniform(-1, 1, (1, N, 2)).astype(np.float32))
    d = jnp.asarray(rng.normal(0, 1, (1, N, 256)).astype(np.float32))
    mask = jnp.ones((1, N), bool)
    out = m(k, d, mask, k, d, mask)
    assert out["matches0"].shape == (1, N)
