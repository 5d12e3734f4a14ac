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


def test_reloc_guided_expansion_recovers():
    """Two-stage relocalization (reference Relocalization guided expansion,
    src/Tracking.cc:4620-4672): when most landmark descriptors are globally
    AMBIGUOUS (duplicate groups -> the ratio test kills their direct
    matches), the wide->narrow projection passes after PnP must recover them
    spatially. Direct matching alone cannot exceed the unique fraction."""
    import jax
    rng = np.random.default_rng(3)
    n = 96
    X = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                  rng.uniform(4, 9, n)], 1).astype(np.float32)
    # 75% of landmarks live in descriptor-duplicate groups of 4: their
    # global mutual-NN matches fail the 0.8 ratio test; only ~25% are
    # directly matchable.
    d = 32
    desc = np.empty((n, d), np.float32)
    desc[:n // 4] = rng.normal(size=(n // 4, d))       # unique
    n_grp = (n - n // 4 + 3) // 4
    grp = rng.normal(size=(n_grp, d))
    for i in range(n // 4, n):
        desc[i] = grp[(i - n // 4) // 4] + 0.02 * rng.normal(size=d)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)

    st = ms.empty_map(K=4, N=n, L=256, D=d)
    st, _ = ms.add_landmarks(st, jnp.asarray(X), jnp.asarray(desc),
                             jnp.zeros((n, 3)), jnp.zeros(n, jnp.int32),
                             jnp.ones(n, bool))
    t_true = np.array([0.25, -0.1, 0.2], np.float32)
    uv1, z1 = _project(X, np.eye(3), t_true)
    valid = z1 > 0.1
    frame_desc = desc + 0.02 * rng.normal(size=desc.shape).astype(np.float32)
    frame_desc /= np.linalg.norm(frame_desc, axis=1, keepdims=True)

    R, t, lm, ok, n_inl = T._relocalize_kernel(
        st, jnp.asarray(uv1), jnp.asarray(frame_desc), jnp.asarray(valid),
        CAM, jax.random.PRNGKey(1), cameras.PINHOLE)
    assert bool(ok)
    # Direct matching tops out around the unique fraction (~24 + strays);
    # guided expansion must recover well past half the landmarks.
    assert int(n_inl) > n // 2, int(n_inl)
    assert np.linalg.norm(np.asarray(t) - t_true) < 0.02


def test_adaptive_search_rejects_depth_aliases():
    """Scale/view-adaptive projection gating (reference PredictScale +
    min/max view distance, src/MapPoint.cc:568-689): a repeated-texture
    scene places IDENTICAL descriptors at 5x the depth on the same line of
    sight, anchored at a keyframe that saw them up close. Without the
    distance-band gate the far aliases win the descriptor comparison and
    hijack the association; with it they are excluded."""
    rng = np.random.default_rng(7)
    n = 48
    d = 32
    # Cluster A: true landmarks at z~5, anchored at KF0 (origin).
    XA = np.stack([rng.uniform(-1.5, 1.5, n), rng.uniform(-1, 1, n),
                   rng.uniform(4.5, 5.5, n)], 1).astype(np.float32)
    # Cluster B: same descriptors, 5x along the SAME rays (identical uv from
    # the origin), anchored at KF1 sitting at z=22 (d_a ~ 3).
    XB = (XA * 5.0).astype(np.float32)
    descA = rng.normal(size=(n, d)).astype(np.float32)
    descA /= np.linalg.norm(descA, axis=1, keepdims=True)
    frame_desc = descA.copy()                     # frame sees B's exact desc
    descA_noisy = descA + 0.05 * rng.normal(size=descA.shape).astype(np.float32)
    descA_noisy /= np.linalg.norm(descA_noisy, axis=1, keepdims=True)

    st = ms.empty_map(K=4, N=n, L=256, D=d)
    st, slotsA = ms.add_landmarks(st, jnp.asarray(XA),
                                  jnp.asarray(descA_noisy),
                                  jnp.zeros((n, 3)), jnp.zeros(n, jnp.int32),
                                  jnp.ones(n, bool))
    st, slotsB = ms.add_landmarks(st, jnp.asarray(XB), jnp.asarray(frame_desc),
                                  jnp.zeros((n, 3)),
                                  jnp.ones(n, jnp.int32) * 1,
                                  jnp.ones(n, bool))
    uv0, _ = _project(XA, np.eye(3), np.zeros(3))
    # KF0 at origin anchors A (no landmark associations needed for the test:
    # prev frame supplies stage-1 associations below). KF1 near cluster B.
    st, _ = ms.add_keyframe(st, jnp.eye(3), jnp.zeros(3), jnp.asarray(uv0),
                            jnp.ones((n, 3)), jnp.asarray(descA_noisy),
                            jnp.ones(n, bool),
                            jnp.asarray(np.asarray(slotsA)), 0.0)
    t_kf1 = np.array([0.0, 0.0, -22.0], np.float32)   # center at z=+22
    st, _ = ms.add_keyframe(st, jnp.eye(3), jnp.asarray(t_kf1),
                            jnp.asarray(uv0), jnp.ones((n, 3)),
                            jnp.asarray(frame_desc), jnp.ones(n, bool),
                            jnp.full((n,), -1, jnp.int32), 1.0)

    # Current frame at the origin, looking at both clusters down the same
    # rays; keypoints = the shared projections, descriptors = B's (the
    # adversarial alias: descriptor distance alone prefers B).
    t_true = np.zeros(3, np.float32)
    prev_lidx = jnp.full((n,), -1, jnp.int32)
    import jax
    R2, t2, cur_lm, flags = T._track_step_kernel(
        st, jnp.asarray(frame_desc), jnp.ones(n, bool), prev_lidx,
        jnp.asarray(uv0), jnp.asarray(frame_desc), jnp.ones(n, bool),
        jnp.eye(3), jnp.zeros(3),
        CAM, cameras.PINHOLE, HW,
        jnp.asarray(10), jnp.asarray(8), jnp.asarray(15),
        jnp.asarray(15.0), jnp.asarray(1.96),
        ref_kf=jnp.asarray(0, jnp.int32))
    cur_lm = np.asarray(cur_lm)
    sB = set(np.asarray(slotsB).tolist())
    n_alias = sum(1 for s in cur_lm if s in sB)
    n_true = sum(1 for s in cur_lm if s in set(np.asarray(slotsA).tolist()))
    # The far duplicates are outside their anchor's distance band (viewed at
    # 25 vs minted at ~3): the adaptive gate must exclude them.
    assert n_alias == 0, f"{n_alias} alias matches accepted"
    assert n_true > n // 2, f"only {n_true} true matches"
