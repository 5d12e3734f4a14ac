"""LightGlue feature matcher in Flax: rotary-position transformer + double-softmax
assignment with matchability dustbin.

TPU-native replacement for the reference's ONNX LightGlue session
(reference: src/Matchers/lightglue_onnx.cpp:162-330 Matcher_Inference — inputs
kpts0/kpts1 f32 [1,N,2] normalized to [-1,1] by image center / half-max-dim
(src/Matchers/transform.cpp NormalizeKeypoints), desc0/desc1 f32 [1,N,256]; outputs
matches0 i64 [M,2], mscores0 f32 [M]; post-process keeps score > 0
lightglue_onnx.cpp:396-482).

TPU-first differences:
- Batched over pairs: one program matches B pairs at once (the reference issues
  one ORT call per pair — up to ~10 calls per keyframe in triangulation,
  SURVEY.md §3 hot loops).
- Fixed-N padded keypoints with attention masking; outputs are fixed-shape
  [B, N] match indices with -1 for unmatched instead of dynamic [M, 2].
- bfloat16 attention on the MXU (wrapped in `default_matmul_precision`), f32
  softmax/assignment.

Architecture follows Lindenberger et al., "LightGlue: Local Feature Matching at
Light Speed" (ICCV 2023): L=9 layers of self-attention (2D rotary positional
encoding) + cross-attention, 4 heads, dim 256; per-point matchability sigma and
double-softmax log-assignment.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

NEG_INF = -1e9
FLASH_MIN_N = 2048   # kv size at which the Pallas flash kernel beats inline XLA


def normalize_keypoints(kpts: jnp.ndarray, image_hw) -> jnp.ndarray:
    """Map pixel coords to [-1, 1] by image center and half-max-dim
    (reference src/Matchers/transform.cpp NormalizeKeypoints)."""
    h, w = image_hw
    center = jnp.array([w / 2.0, h / 2.0], kpts.dtype)
    scale = max(h, w) / 2.0
    return (kpts - center) / scale


class LearnableFourierPE(nn.Module):
    """Positions [B,N,2] -> rotary cos/sin [B,N,head_dim] each."""
    head_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pos):
        f = nn.Dense(self.head_dim // 2, use_bias=False, dtype=self.dtype,
                     name="Wr")(pos)
        cos = jnp.cos(f)
        sin = jnp.sin(f)
        # interleave-free layout: repeat each frequency twice (rotate-pairs form)
        return (jnp.repeat(cos, 2, axis=-1), jnp.repeat(sin, 2, axis=-1))


def rotate_half(x):
    x1, x2 = x[..., 0::2], x[..., 1::2]
    return jnp.stack([-x2, x1], axis=-1).reshape(x.shape)


def apply_rotary(x, cos, sin):
    """x: [B,N,H,Dh], cos/sin: [B,N,Dh]."""
    return x * cos[:, :, None, :] + rotate_half(x) * sin[:, :, None, :]


class Attention(nn.Module):
    dim: int
    num_heads: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x_q, x_kv, mask_kv, rope_q=None, rope_k=None):
        """x_q: [B,Nq,D], x_kv: [B,Nk,D], mask_kv: [B,Nk] bool."""
        H, Dh = self.num_heads, self.dim // self.num_heads
        qkv_q = nn.Dense(self.dim, dtype=self.dtype, name="to_q")(x_q)
        k = nn.Dense(self.dim, dtype=self.dtype, name="to_k")(x_kv)
        v = nn.Dense(self.dim, dtype=self.dtype, name="to_v")(x_kv)
        B, Nq, _ = x_q.shape
        Nk = x_kv.shape[1]
        q = qkv_q.reshape(B, Nq, H, Dh)
        k = k.reshape(B, Nk, H, Dh)
        v = v.reshape(B, Nk, H, Dh)
        if rope_q is not None:
            q = apply_rotary(q, *rope_q)
            k = apply_rotary(k, *rope_k)
        if Nk >= FLASH_MIN_N:
            # Fused flash-attention kernel (ops/pallas_attention.py): the
            # [Nq,Nk] logits never hit HBM, online softmax bounds VMEM at any
            # N — the sequence-scaling path (2x at N=4096, ~38x at N=8192 on
            # v5e). Below the threshold the inline math wins: XLA fuses it
            # into the surrounding ops and the kernel's layout glue costs
            # more than it saves.
            from ..ops.pallas_attention import masked_attention
            with jax.default_matmul_precision("default"):
                out = masked_attention(q, k, v, mask_kv)
        else:
            with jax.default_matmul_precision("default"):
                logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) \
                    / jnp.sqrt(Dh).astype(q.dtype)
                logits = jnp.where(mask_kv[:, None, None, :],
                                   logits.astype(jnp.float32), NEG_INF)
                attn = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
                out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
        out = out.reshape(B, Nq, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="to_out")(out)


class ConcatFFN(nn.Module):
    """LightGlue state update: x + MLP([x, message])."""
    dim: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, message):
        y = jnp.concatenate([x, message], axis=-1)
        y = nn.Dense(2 * self.dim, dtype=self.dtype, name="fc1")(y)
        y = nn.LayerNorm(dtype=self.dtype, name="ln")(y)
        y = nn.gelu(y)
        y = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(y)
        return x + y


class TransformerLayer(nn.Module):
    """One LightGlue layer: self-attention (rotary) then cross-attention, each
    followed by a concat-FFN update. Weights are shared across the two images
    (same as the public LightGlue)."""
    dim: int
    num_heads: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, d0, d1, rope0, rope1, m0, m1):
        # Self attention within each image.
        self_attn = Attention(self.dim, self.num_heads, self.dtype, name="self_attn")
        self_ffn = ConcatFFN(self.dim, self.dtype, name="self_ffn")
        s0 = self_attn(d0, d0, m0, rope_q=rope0, rope_k=rope0)
        s1 = self_attn(d1, d1, m1, rope_q=rope1, rope_k=rope1)
        d0 = self_ffn(d0, s0)
        d1 = self_ffn(d1, s1)
        # Cross attention between images (shared weights, both directions).
        cross_attn = Attention(self.dim, self.num_heads, self.dtype, name="cross_attn")
        cross_ffn = ConcatFFN(self.dim, self.dtype, name="cross_ffn")
        c0 = cross_attn(d0, d1, m1)
        c1 = cross_attn(d1, d0, m0)
        d0 = cross_ffn(d0, c0)
        d1 = cross_ffn(d1, c1)
        return d0, d1


class LightGlue(nn.Module):
    dim: int = 256
    num_heads: int = 4
    num_layers: int = 9
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, kpts0, desc0, mask0, kpts1, desc1, mask1):
        """kpts*: [B,N,2] normalized to [-1,1]; desc*: [B,N,256]; mask*: [B,N].

        Returns (log_assignment [B,N0+1,N1+1], matchability0 [B,N0], matchability1).
        """
        head_dim = self.dim // self.num_heads
        input_proj = nn.Dense(self.dim, dtype=self.dtype, name="input_proj")
        d0 = input_proj(desc0.astype(self.dtype))
        d1 = input_proj(desc1.astype(self.dtype))
        pe = LearnableFourierPE(head_dim, name="posenc")
        rope0 = pe(kpts0.astype(jnp.float32))
        rope1 = pe(kpts1.astype(jnp.float32))
        rope0 = tuple(r.astype(self.dtype) for r in rope0)
        rope1 = tuple(r.astype(self.dtype) for r in rope1)

        for i in range(self.num_layers):
            d0, d1 = TransformerLayer(self.dim, self.num_heads, self.dtype,
                                      name=f"layer_{i}")(d0, d1, rope0, rope1, mask0, mask1)

        # Assignment head.
        final_proj = nn.Dense(self.dim, dtype=jnp.float32, name="final_proj")
        md0 = final_proj(d0.astype(jnp.float32))
        md1 = final_proj(d1.astype(jnp.float32))
        scale = float(self.dim) ** 0.25
        md0, md1 = md0 / scale, md1 / scale
        sim = jnp.einsum("bmd,bnd->bmn", md0, md1)
        sim = jnp.where(mask0[:, :, None] & mask1[:, None, :], sim, NEG_INF)

        matchability = nn.Dense(1, dtype=jnp.float32, name="matchability")
        z0 = matchability(d0.astype(jnp.float32))[..., 0]
        z1 = matchability(d1.astype(jnp.float32))[..., 0]

        scores0 = jax.nn.log_softmax(sim, axis=2)
        scores1 = jax.nn.log_softmax(sim, axis=1)
        certainties = jax.nn.log_sigmoid(z0)[:, :, None] + jax.nn.log_sigmoid(z1)[:, None, :]
        B, N0, N1 = sim.shape
        la = jnp.full((B, N0 + 1, N1 + 1), 0.0, jnp.float32)
        la = la.at[:, :N0, :N1].set(scores0 + scores1 + certainties)
        la = la.at[:, :N0, N1].set(jax.nn.log_sigmoid(-z0))
        la = la.at[:, N0, :N1].set(jax.nn.log_sigmoid(-z1))
        return la, jax.nn.sigmoid(z0), jax.nn.sigmoid(z1)


def extract_matches(log_assignment: jnp.ndarray, mask0, mask1,
                    threshold: float = 0.0):
    """Mutual-argmax matches from the log-assignment.

    Returns dict: matches0 [B,N0] int32 (index into image1 or -1),
    mscores0 [B,N0] f32. The reference keeps matches with score > matchThresh=0.0
    (lightglue_onnx.cpp:396-482, include/Matchers/lightglue_onnx.h:31).
    """
    B, N0p, N1p = log_assignment.shape
    N0, N1 = N0p - 1, N1p - 1
    scores = jnp.exp(log_assignment[:, :N0, :N1])
    scores = jnp.where(mask0[:, :, None] & mask1[:, None, :], scores, 0.0)
    best1 = jnp.argmax(scores, axis=2)          # [B, N0]
    best0 = jnp.argmax(scores, axis=1)          # [B, N1]
    sc = jnp.take_along_axis(scores, best1[:, :, None], axis=2)[..., 0]
    mutual = jnp.take_along_axis(best0, best1, axis=1) == jnp.arange(N0)[None, :]
    ok = mutual & (sc > threshold) & mask0
    matches0 = jnp.where(ok, best1, -1)
    return {"matches0": matches0.astype(jnp.int32),
            "mscores0": jnp.where(ok, sc, 0.0)}


# ---------------------------------------------------------------------------
# Public-checkpoint loading (official lightglue `superpoint_lightglue.pth`)
# ---------------------------------------------------------------------------

def load_torch_weights(path: str, num_layers: int = 9, dim: int = 256):
    """Convert the official LightGlue checkpoint (Lindenberger et al.,
    github.com/cvg/LightGlue `superpoint_lightglue.pth` state-dict layout,
    weights under `transformers.{i}.self_attn/cross_attn`) into this module's
    Flax param tree.

    Mapping notes:
    - the official SelfBlock fuses q/k/v into one `Wqkv` [3D, D]; split into
      our to_q/to_k/to_v thirds.
    - the official CrossBlock SHARES the q/k projection (`to_qk`): mapped to
      both to_q and to_k (functionally identical).
    - each block's `ffn` is Sequential(Linear 2D->2D, LayerNorm, GELU,
      Linear 2D->D) == our ConcatFFN fc1/ln/fc2.
    - only the LAST layer's `log_assignment` head is used (no early exit).

    This environment has no network egress so conversion is validated
    structurally (see tests/test_lightglue.py); run a golden-output
    comparison against the ONNX reference when the real checkpoint is
    available.
    """
    import numpy as np
    import torch

    sd = torch.load(path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()

    def t(name):   # torch Linear weight [out,in] -> flax kernel [in,out]
        return jnp.asarray(np.asarray(sd[name], np.float32).T)

    def v(name):
        return jnp.asarray(np.asarray(sd[name], np.float32))

    params = {
        "input_proj": {"kernel": t("input_proj.weight"),
                       "bias": v("input_proj.bias")},
        "posenc": {"Wr": {"kernel": t("posenc.Wr.weight")}},
        "final_proj": {
            "kernel": t(f"log_assignment.{num_layers - 1}.final_proj.weight"),
            "bias": v(f"log_assignment.{num_layers - 1}.final_proj.bias")},
        "matchability": {
            "kernel": t(f"log_assignment.{num_layers - 1}.matchability.weight"),
            "bias": v(f"log_assignment.{num_layers - 1}.matchability.bias")},
    }
    for i in range(num_layers):
        p = f"transformers.{i}"
        Wqkv = t(f"{p}.self_attn.Wqkv.weight")        # [D, 3D] after .T
        bqkv = v(f"{p}.self_attn.Wqkv.bias")          # [3D]
        qk = t(f"{p}.cross_attn.to_qk.weight")
        bqk = v(f"{p}.cross_attn.to_qk.bias")

        def ffn(prefix):
            return {
                "fc1": {"kernel": t(f"{prefix}.ffn.0.weight"),
                        "bias": v(f"{prefix}.ffn.0.bias")},
                "ln": {"scale": v(f"{prefix}.ffn.1.weight"),
                       "bias": v(f"{prefix}.ffn.1.bias")},
                "fc2": {"kernel": t(f"{prefix}.ffn.3.weight"),
                        "bias": v(f"{prefix}.ffn.3.bias")},
            }

        params[f"layer_{i}"] = {
            "self_attn": {
                "to_q": {"kernel": Wqkv[:, 0:dim], "bias": bqkv[0:dim]},
                "to_k": {"kernel": Wqkv[:, dim:2 * dim],
                         "bias": bqkv[dim:2 * dim]},
                "to_v": {"kernel": Wqkv[:, 2 * dim:3 * dim],
                         "bias": bqkv[2 * dim:3 * dim]},
                "to_out": {"kernel": t(f"{p}.self_attn.out_proj.weight"),
                           "bias": v(f"{p}.self_attn.out_proj.bias")},
            },
            "self_ffn": ffn(f"{p}.self_attn"),
            "cross_attn": {
                "to_q": {"kernel": qk, "bias": bqk},
                "to_k": {"kernel": qk, "bias": bqk},
                "to_v": {"kernel": t(f"{p}.cross_attn.to_v.weight"),
                         "bias": v(f"{p}.cross_attn.to_v.bias")},
                "to_out": {"kernel": t(f"{p}.cross_attn.to_out.weight"),
                           "bias": v(f"{p}.cross_attn.to_out.bias")},
            },
            "cross_ffn": ffn(f"{p}.cross_attn"),
        }
    return params


class LightGlueMatcher:
    """Wrapper playing the role of the reference's LightGlueDecoupleOnnxRunner
    (src/Matchers/lightglue_onnx.cpp): init params once, jitted batched matching."""

    def __init__(self, params=None, rng=None, num_kpts: int = 1024,
                 num_layers: int = 9, dim: int = 256, threshold: float = 0.0,
                 dtype=jnp.bfloat16):
        self.model = LightGlue(dim=dim, num_layers=num_layers, dtype=dtype)
        self.threshold = threshold
        if params is None:
            rng = rng if rng is not None else jax.random.PRNGKey(1)
            N = num_kpts
            dummy_k = jnp.zeros((1, N, 2), jnp.float32)
            dummy_d = jnp.zeros((1, N, 256), jnp.float32)
            dummy_m = jnp.ones((1, N), bool)
            params = self.model.init(rng, dummy_k, dummy_d, dummy_m,
                                     dummy_k, dummy_d, dummy_m)["params"]
        self.params = params

        # ONE jitted program: transformer forward + mutual-argmax extraction.
        # Running extract_matches eagerly cost ~15 per-call op dispatches —
        # measured 41 ms/call host-side at N=1024 where the fused program's
        # device time is ~2 ms.
        def _fwd(params, kpts0, desc0, mask0, kpts1, desc1, mask1):
            la, _, _ = self.model.apply({"params": params}, kpts0, desc0,
                                        mask0, kpts1, desc1, mask1)
            return extract_matches(la, mask0, mask1, self.threshold)

        self._forward = jax.jit(_fwd)

    def __call__(self, kpts0, desc0, mask0, kpts1, desc1, mask1):
        return self._forward(self.params, kpts0, desc0, mask0,
                             kpts1, desc1, mask1)


class LightGlueFrameMatcher:
    """Adapter: LightGlue as the SLAM tracker's frame-to-frame matcher (the
    reference's SPmatcher::SearchBySP LightGlue path,
    src/Matchers/SPmatcher.cc:1050-1080). Plugs into
    slam.system.MonocularSLAM(matcher=...): called with unbatched pixel
    keypoints + descriptors + valid masks of two frames, returns [N] int32
    prev->cur match indices (-1 = unmatched). Dispatch is async — the SLAM
    loop chains it in front of the tracking kernel without a host sync."""

    def __init__(self, matcher: LightGlueMatcher, image_hw):
        self.matcher = matcher
        self.image_hw = tuple(image_hw)
        hw = self.image_hw

        # ONE jitted program per call shape: keypoint normalization + the
        # transformer + match extraction. The eager normalize ops in front
        # of the jitted model were ~6 extra device programs per frame —
        # pure dispatch overhead on a tunneled TPU (~0.3 ms each), riding
        # the hottest per-frame path.
        def _pair(params, kpts0, desc0, valid0, kpts1, desc1, valid1):
            k0 = normalize_keypoints(kpts0, hw)[None]
            k1 = normalize_keypoints(kpts1, hw)[None]
            out = matcher._forward(params, k0, desc0[None], valid0[None],
                                   k1, desc1[None], valid1[None])
            return out["matches0"][0]

        def _batch(params, kpts0, desc0, valid0, kpts1, desc1, valid1):
            k0 = normalize_keypoints(kpts0, hw)
            k1 = normalize_keypoints(kpts1, hw)
            out = matcher._forward(params, k0, desc0, valid0,
                                   k1, desc1, valid1)
            return out["matches0"]

        self._pair = jax.jit(_pair)
        self._batch = jax.jit(_batch)

    def __call__(self, kpts0, desc0, valid0, kpts1, desc1, valid1):
        return self._pair(self.matcher.params, kpts0, desc0, valid0,
                          kpts1, desc1, valid1)

    def match_batch(self, kpts0, desc0, valid0, kpts1, desc1, valid1):
        """Batched pair matching: [B,N,...] inputs -> [B,N] int32 matches
        (0->1). One LightGlue dispatch covers all B pairs — the batching win
        over the reference's per-pair ONNX sessions (SPmatcher calls
        LightGlue once per covisible neighbor in SearchForTriangulation,
        src/Matchers/SPmatcher.cc:1355-1399, and once per candidate window
        keyframe in SearchByBoWSP, :1670-1734)."""
        return self._batch(self.matcher.params, kpts0, desc0, valid0,
                           kpts1, desc1, valid1)
