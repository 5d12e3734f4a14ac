"""Reference-keyframe tracking fallback: when the motion-model stage has no
candidates (e.g. the previous frame lost its landmark associations), the fused
track kernel must recover by matching against the reference keyframe's
landmark-bearing keypoints (reference TrackReferenceKeyFrame,
src/Tracking.cc:3245-3315; VERDICT round-1 missing #6)."""
import numpy as np
import jax.numpy as jnp
import pytest

from rover_slam_tpu.geometry import cameras
from rover_slam_tpu.map import map_state as ms
from rover_slam_tpu.slam import tracking as T

CAM = jnp.asarray(cameras.make_pinhole(300.0, 300.0, 160.0, 120.0))
HW = (240, 320)


def _make_scene(n_lm=64, n_kpt=64, d=16, seed=0):
    rng = np.random.default_rng(seed)
    X = np.stack([rng.uniform(-2, 2, n_lm), rng.uniform(-1.5, 1.5, n_lm),
                  rng.uniform(4, 9, n_lm)], 1).astype(np.float32)
    desc = rng.normal(size=(n_lm, d)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    return X, desc


def _project(X, R, t):
    Xc = (R @ X.T).T + t
    uv = np.asarray(cameras.project(cameras.PINHOLE, CAM, jnp.asarray(Xc)))
    return uv, Xc[:, 2]


def test_ref_kf_fallback_recovers_pose():
    X, desc = _make_scene()
    n = len(X)
    st = ms.empty_map(K=4, N=n, L=128, D=16)
    st, _ = ms.add_landmarks(st, jnp.asarray(X), jnp.asarray(desc),
                             jnp.zeros((n, 3)), jnp.zeros(n, jnp.int32),
                             jnp.ones(n, bool))
    # Reference keyframe at identity observing every landmark.
    uv0, _ = _project(X, np.eye(3), np.zeros(3))
    st, kf0 = ms.add_keyframe(st, jnp.eye(3), jnp.zeros(3),
                              jnp.asarray(uv0),
                              jnp.ones((n, 3)), jnp.asarray(desc),
                              jnp.ones(n, bool),
                              jnp.arange(n, dtype=jnp.int32), 0.0)
    # Current frame: small translation; true pose to recover.
    t_true = np.array([0.12, -0.05, 0.08], np.float32)
    uv1, z1 = _project(X, np.eye(3), t_true)
    valid = (z1 > 0.1)
    # Previous frame carries NO landmark associations -> motion stage starves.
    prev_lidx = jnp.full((n,), -1, jnp.int32)
    prev_desc = jnp.asarray(desc)          # (matches exist but no landmarks)
    R2, t2, cur_lm, flags = T._track_step_kernel(
        st, prev_desc, jnp.ones(n, bool), prev_lidx,
        jnp.asarray(uv1), jnp.asarray(desc), jnp.asarray(valid),
        jnp.eye(3), jnp.zeros(3),
        CAM, cameras.PINHOLE, HW,
        jnp.asarray(10), jnp.asarray(8), jnp.asarray(15),
        jnp.asarray(15.0), jnp.asarray(1.96),
        ref_kf=jnp.asarray(0, jnp.int32))
    flags = np.asarray(flags)
    assert flags[0] == 1, flags            # tracked
    assert flags[2] == 1, flags            # via stage-1 (ref-KF fallback)
    err = np.linalg.norm(np.asarray(t2) - t_true)
    assert err < 0.02, (np.asarray(t2), t_true)
