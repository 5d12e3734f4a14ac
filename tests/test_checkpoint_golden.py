"""Golden tests against the PUBLIC checkpoints (run when the assets exist).

This environment has no network egress, so the official weights
(magicleap SuperPoint `superpoint_v1.pth`, cvg/LightGlue
`superpoint_lightglue.pth`) cannot be fetched here; the converters are
validated structurally elsewhere. When the files are placed under
$ROVER_SLAM_CKPTS (default /root/checkpoints), these tests load them through
the converters and check real-weight behavior: detector responses
concentrate on structure, descriptors are unit-norm, matching is
self-consistent and equivariant. This is the round-2 quality gate
(STATUS.md) — extend with ONNX-output parity once the reference's .onnx
files are also available.
"""
import os

import numpy as np
import pytest

CKPT_DIR = os.environ.get("ROVER_SLAM_CKPTS", "/root/checkpoints")
SP_CKPT = os.path.join(CKPT_DIR, "superpoint_v1.pth")
LG_CKPT = os.path.join(CKPT_DIR, "superpoint_lightglue.pth")


def _checkerboard(h, w, cell=32):
    y, x = np.mgrid[0:h, 0:w]
    img = (((y // cell) + (x // cell)) % 2).astype(np.float32)
    return img * 0.8 + 0.1


@pytest.mark.skipif(not os.path.exists(SP_CKPT),
                    reason=f"no SuperPoint checkpoint at {SP_CKPT}")
def test_superpoint_real_weights():
    import jax.numpy as jnp
    from rover_slam_tpu.models.superpoint import (SuperPointExtractor,
                                                  load_torch_weights)
    params = load_torch_weights(SP_CKPT)
    ext = SuperPointExtractor(params=params, image_hw=(480, 640),
                              max_keypoints=512)
    img = _checkerboard(480, 640)
    out = ext(jnp.asarray(img[None]))
    assert int(out["valid"].sum()) > 100
    # Descriptors unit-norm.
    d = np.asarray(out["descriptors"][0])[np.asarray(out["valid"][0])]
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-3)
    # Corners of a checkerboard: keypoints should cluster near cell corners.
    k = np.asarray(out["keypoints"][0])[np.asarray(out["valid"][0])]
    off = np.minimum(k % 32, 32 - (k % 32)).max(axis=1)
    assert np.median(off) < 8.0, "keypoints not on checkerboard corners"


@pytest.mark.skipif(not (os.path.exists(SP_CKPT) and os.path.exists(LG_CKPT)),
                    reason=f"need both checkpoints under {CKPT_DIR}")
def test_lightglue_real_weights_match_shifted_image():
    import jax.numpy as jnp
    from rover_slam_tpu.models.superpoint import (SuperPointExtractor,
                                                  load_torch_weights as sp_w)
    from rover_slam_tpu.models.lightglue import (LightGlueMatcher,
                                                 load_torch_weights as lg_w,
                                                 normalize_keypoints)
    ext = SuperPointExtractor(params=sp_w(SP_CKPT), image_hw=(480, 640),
                              max_keypoints=512)
    matcher = LightGlueMatcher(params=lg_w(LG_CKPT), num_kpts=512)
    rng = np.random.default_rng(0)
    img = _checkerboard(480, 640) + rng.normal(0, 0.03, (480, 640)) \
        .astype(np.float32)
    shift = 12
    img2 = np.roll(img, shift, axis=1)
    o1 = ext(jnp.asarray(img[None]))
    o2 = ext(jnp.asarray(img2[None]))
    k1 = normalize_keypoints(o1["keypoints"], (480, 640))
    k2 = normalize_keypoints(o2["keypoints"], (480, 640))
    out = matcher(k1, o1["descriptors"], o1["valid"],
                  k2, o2["descriptors"], o2["valid"])
    m = np.asarray(out["matches0"][0])
    ok = m >= 0
    assert ok.sum() > 50, f"only {ok.sum()} LightGlue matches"
    # Matched keypoints should differ by ~the shift in x.
    p1 = np.asarray(o1["keypoints"][0])[ok]
    p2 = np.asarray(o2["keypoints"][0])[m[ok]]
    dx = p2[:, 0] - p1[:, 0]
    good = np.abs(dx - shift) < 2.0
    assert good.mean() > 0.8, f"only {good.mean():.0%} consistent with shift"
