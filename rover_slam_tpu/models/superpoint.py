"""SuperPoint keypoint detector + descriptor in Flax, batched and fixed-K.

TPU-native replacement for the reference's ONNX-Runtime SuperPoint session
(reference: src/Extractors/superpoint_onnx.cc:88-255 — input f32 [1,1,H,W], outputs
keypoints i64 [1,N,2], scores f32 [1,N], descriptors f32 [1,N,256]; score threshold 0,
keep-all, src/Extractors/superpoint_onnx.cc:190-217).

Differences by design (TPU-first):
- Batched over images (the reference runs one image per session call; we extract
  stereo pairs / pyramids / whole eval batches in one program — SURVEY.md §2.3).
- Fixed-K output with a validity mask instead of dynamic N: `top_k` over the
  NMS-suppressed score map, so every downstream shape is static.
- Compute in bfloat16 on the MXU (params f32), final descriptors f32 — geometry
  modules keep f32 (package default precision is 'highest'; convs opt back in).

Architecture (public SuperPoint, DeTone et al. 2018):
  VGG encoder 64-64-p-64-64-p-128-128-p-128-128, detector head 256->65 cell softmax
  + depth-to-space, descriptor head 256->256 + bicubic upsample (here: bilinear
  sample at keypoints directly, which is what the reference consumes).
Weights load from the public `superpoint_v1.pth` layout via `load_torch_weights`.
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

DESC_DIM = 256
CELL = 8  # encoder stride


class VGGBlock(nn.Module):
    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv")(x)
        return nn.relu(x)


class SuperPoint(nn.Module):
    """Returns dense score map [B,H,W] and coarse descriptors [B,H/8,W/8,256]."""
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, image, return_logits: bool = False):
        """image: [B, H, W, 1] float32 in [0,1].

        return_logits=True additionally returns the raw [B,Hc,Wc,65]
        detector logits (training needs the dustbin; see
        training/superpoint_train.py)."""
        x = image.astype(self.dtype)
        # Encoder
        x = VGGBlock(64, self.dtype, name="conv1a")(x)
        x = VGGBlock(64, self.dtype, name="conv1b")(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = VGGBlock(64, self.dtype, name="conv2a")(x)
        x = VGGBlock(64, self.dtype, name="conv2b")(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = VGGBlock(128, self.dtype, name="conv3a")(x)
        x = VGGBlock(128, self.dtype, name="conv3b")(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = VGGBlock(128, self.dtype, name="conv4a")(x)
        x = VGGBlock(128, self.dtype, name="conv4b")(x)

        # Detector head: 65 = 8x8 cell pixels + dustbin.
        d = VGGBlock(256, self.dtype, name="convPa")(x)
        logits = nn.Conv(65, (1, 1), dtype=self.dtype, name="convPb")(d)
        prob = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[..., :64]
        B, Hc, Wc, _ = prob.shape
        # depth-to-space: [B,Hc,Wc,64] -> [B,Hc*8,Wc*8]
        prob = prob.reshape(B, Hc, Wc, CELL, CELL)
        prob = prob.transpose(0, 1, 3, 2, 4).reshape(B, Hc * CELL, Wc * CELL)

        # Descriptor head.
        e = VGGBlock(256, self.dtype, name="convDa")(x)
        desc = nn.Conv(DESC_DIM, (1, 1), dtype=self.dtype, name="convDb")(e)
        desc = desc.astype(jnp.float32)
        desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8)
        if return_logits:
            return prob, desc, logits.astype(jnp.float32)
        return prob, desc


def simple_nms(scores: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Fast NMS: keep scores that equal their local max in a (2r+1)^2 window.
    scores: [B, H, W]."""
    window = 2 * radius + 1
    pooled = jax.lax.reduce_window(
        scores, -jnp.inf, jax.lax.max,
        window_dimensions=(1, window, window),
        window_strides=(1, 1, 1), padding="SAME")
    return jnp.where(scores == pooled, scores, 0.0)


def sample_descriptors(desc_coarse: jnp.ndarray, kpts: jnp.ndarray) -> jnp.ndarray:
    """Bilinear-sample L2-normalized descriptors at keypoint pixel locations.

    desc_coarse: [B, Hc, Wc, D] (stride-8 grid); kpts: [B, K, 2] (x, y) pixels.
    """
    B, Hc, Wc, D = desc_coarse.shape
    # Map pixel coords to coarse-grid coords (cell centers at 8i+3.5).
    gx = (kpts[..., 0] - (CELL - 1) / 2.0) / CELL
    gy = (kpts[..., 1] - (CELL - 1) / 2.0) / CELL
    gx = jnp.clip(gx, 0.0, Wc - 1.0)
    gy = jnp.clip(gy, 0.0, Hc - 1.0)
    x0 = jnp.floor(gx).astype(jnp.int32)
    y0 = jnp.floor(gy).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, Wc - 1)
    y1 = jnp.minimum(y0 + 1, Hc - 1)
    wx = gx - x0
    wy = gy - y0

    def gather(ix, iy):
        # [B, K, D] gather from [B, Hc, Wc, D]
        flat = desc_coarse.reshape(B, Hc * Wc, D)
        idx = iy * Wc + ix
        return jnp.take_along_axis(flat, idx[..., None], axis=1)

    d = (gather(x0, y0) * ((1 - wx) * (1 - wy))[..., None]
         + gather(x1, y0) * (wx * (1 - wy))[..., None]
         + gather(x0, y1) * ((1 - wx) * wy)[..., None]
         + gather(x1, y1) * (wx * wy)[..., None])
    return d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-8)


@functools.partial(jax.jit, static_argnames=("max_keypoints", "nms_radius", "border"))
def extract_keypoints(prob: jnp.ndarray, desc_coarse: jnp.ndarray,
                      max_keypoints: int = 1024, nms_radius: int = 4,
                      score_threshold: float = 0.0005, border: int = 4):
    """NMS + fixed-K top-K + descriptor sampling.

    Returns dict: kpts [B,K,2] f32 (x,y), scores [B,K], desc [B,K,256], valid [B,K].
    The reference keeps every keypoint with score > 0 (superpoint_onnx.cc:190-217);
    we expose the threshold but default it near-zero with fixed K capacity.
    """
    B, H, W = prob.shape
    nms = simple_nms(prob, nms_radius)
    # Zero out borders (reference crops border keypoints during undistort/grid).
    ys = jnp.arange(H)[None, :, None]
    xs = jnp.arange(W)[None, None, :]
    in_border = (ys >= border) & (ys < H - border) & (xs >= border) & (xs < W - border)
    nms = jnp.where(in_border, nms, 0.0)

    flat = nms.reshape(B, H * W)
    scores, idx = jax.lax.top_k(flat, max_keypoints)
    kx = (idx % W).astype(jnp.float32)
    ky = (idx // W).astype(jnp.float32)
    kpts = jnp.stack([kx, ky], axis=-1)
    valid = scores > score_threshold
    desc = sample_descriptors(desc_coarse, kpts)
    return {"keypoints": kpts, "scores": scores, "descriptors": desc, "valid": valid}


class SuperPointExtractor:
    """Convenience wrapper: init params (or load torch weights) + jitted extract.

    Plays the role of the reference's SPextractor + SuperPointOnnxRunner pair
    (src/Extractors/SPextractor.cc:516-617) — single-scale path, which is the
    reference's effective configuration (its multi-level inference is dead code,
    SPextractor.cc:619-653).
    """

    def __init__(self, params=None, rng=None, image_hw=(480, 640),
                 max_keypoints: int = 1024, nms_radius: int = 4,
                 score_threshold: float = 0.0005, dtype=jnp.bfloat16):
        self.model = SuperPoint(dtype=dtype)
        self.max_keypoints = max_keypoints
        self.nms_radius = nms_radius
        self.score_threshold = score_threshold
        if params is None:
            rng = rng if rng is not None else jax.random.PRNGKey(0)
            dummy = jnp.zeros((1, image_hw[0], image_hw[1], 1), jnp.float32)
            params = self.model.init(rng, dummy)["params"]
        self.params = params

        # ONE jitted program: VGG forward + NMS/top-K/descriptor sampling —
        # the eager post-process cost more host dispatch time than the whole
        # net's device time (see models/lightglue.py for the same fix).
        def _fwd(params, images):
            prob, desc_coarse = self.model.apply({"params": params}, images)
            return extract_keypoints(prob, desc_coarse,
                                     max_keypoints=self.max_keypoints,
                                     nms_radius=self.nms_radius,
                                     score_threshold=self.score_threshold)

        self._forward = jax.jit(_fwd)

    def __call__(self, images: jnp.ndarray):
        """images: [B,H,W] or [B,H,W,1] grayscale in [0,1]."""
        if images.ndim == 3:
            images = images[..., None]
        return self._forward(self.params, images)


# ---------------------------------------------------------------------------
# Public-checkpoint loading (magicleap superpoint_v1.pth layout)
# ---------------------------------------------------------------------------

_TORCH_LAYERS = [
    "conv1a", "conv1b", "conv2a", "conv2b", "conv3a", "conv3b", "conv4a", "conv4b",
    "convPa", "convPb", "convDa", "convDb",
]


def load_torch_weights(path: str):
    """Convert the public `superpoint_v1.pth` state dict to our Flax params.

    Torch conv weight [out, in, kh, kw] -> Flax [kh, kw, in, out].
    """
    import torch  # CPU torch is available in the image

    sd = torch.load(path, map_location="cpu")
    params = {}
    for name in _TORCH_LAYERS:
        w = jnp.asarray(sd[f"{name}.weight"].numpy()).transpose(2, 3, 1, 0)
        b = jnp.asarray(sd[f"{name}.bias"].numpy())
        leaf = {"kernel": w, "bias": b}
        if name in ("convPb", "convDb"):
            params[name] = leaf
        else:
            params[name] = {"conv": leaf}
    return params
