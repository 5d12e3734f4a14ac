"""SuperPoint structural/invariant tests (reference: src/Extractors/superpoint_onnx.cc).

With no public checkpoint on disk, these validate the contract the SLAM pipeline
depends on: shapes, NMS spacing, descriptor normalization, batching, determinism.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rover_slam_tpu.models import superpoint as sp


@pytest.fixture(scope="module")
def extractor():
    return sp.SuperPointExtractor(image_hw=(120, 160), max_keypoints=256,
                                  dtype=jnp.float32)


def checkerboard(h=120, w=160, cell=16):
    yy, xx = np.mgrid[0:h, 0:w]
    img = (((yy // cell) + (xx // cell)) % 2).astype(np.float32)
    return img


def test_output_contract(extractor):
    imgs = jnp.asarray(np.stack([checkerboard(), checkerboard()]))
    out = extractor(imgs)
    assert out["keypoints"].shape == (2, 256, 2)
    assert out["scores"].shape == (2, 256)
    assert out["descriptors"].shape == (2, 256, sp.DESC_DIM)
    assert out["valid"].shape == (2, 256)
    # Descriptors unit-norm (reference consumes L2-normalized 256-D f32,
    # SPmatcher.cc DescriptorDistance_sp).
    norms = jnp.linalg.norm(out["descriptors"], axis=-1)
    np.testing.assert_allclose(np.asarray(norms), 1.0, atol=1e-3)
    # Scores sorted descending (top_k contract).
    s = np.asarray(out["scores"][0])
    assert np.all(np.diff(s) <= 1e-6)


def test_nms_spacing(extractor):
    imgs = jnp.asarray(checkerboard()[None])
    out = extractor(imgs)
    k = np.asarray(out["keypoints"][0])[np.asarray(out["valid"][0])]
    if len(k) > 1:
        from scipy.spatial.distance import pdist
        assert pdist(k).min() > extractor.nms_radius


def test_nms_kernel_exact():
    scores = jnp.zeros((1, 32, 32)).at[0, 10, 10].set(1.0).at[0, 10, 12].set(0.5) \
        .at[0, 20, 20].set(0.8)
    out = sp.simple_nms(scores, radius=4)
    assert out[0, 10, 10] == 1.0
    assert out[0, 10, 12] == 0.0  # suppressed by stronger neighbor within radius
    assert out[0, 20, 20] == 0.8


def test_descriptor_sampling_interpolates():
    # Coarse desc with a gradient along x; sampling mid-cell must interpolate.
    Hc, Wc, D = 4, 4, 8
    desc = np.zeros((1, Hc, Wc, D), np.float32)
    desc[0, :, :, 0] = np.arange(Wc)[None, :]
    kpts = jnp.asarray([[[3.5 + 8 * 1, 3.5], [3.5 + 8 * 1.5, 3.5]]])  # grid x=1 and x=1.5
    d = sp.sample_descriptors(jnp.asarray(desc), kpts)
    # Normalized, but ratio structure preserved: second sample between cells 1,2.
    assert d.shape == (1, 2, D)
    assert np.isfinite(np.asarray(d)).all()


def test_batch_equals_single(extractor):
    rng = np.random.default_rng(6)
    imgs = rng.uniform(0, 1, (3, 120, 160)).astype(np.float32)
    out_b = extractor(jnp.asarray(imgs))
    out_1 = extractor(jnp.asarray(imgs[1:2]))
    np.testing.assert_allclose(np.asarray(out_b["keypoints"][1]),
                               np.asarray(out_1["keypoints"][0]), atol=0)
    np.testing.assert_allclose(np.asarray(out_b["descriptors"][1]),
                               np.asarray(out_1["descriptors"][0]), atol=1e-5)


def test_border_suppression(extractor):
    rng = np.random.default_rng(7)
    imgs = jnp.asarray(rng.uniform(0, 1, (1, 120, 160)).astype(np.float32))
    out = extractor(imgs)
    k = np.asarray(out["keypoints"][0])[np.asarray(out["valid"][0])]
    assert (k[:, 0] >= 4).all() and (k[:, 0] < 156).all()
    assert (k[:, 1] >= 4).all() and (k[:, 1] < 116).all()
