"""Data-association op tests (reference: SPmatcher::SearchByProjection1/Fuse)."""
import numpy as np
import jax.numpy as jnp

from rover_slam_tpu.geometry import lie, cameras
from rover_slam_tpu.ops import association as assoc

RNG = np.random.default_rng(50)


def unit_desc(n, d=32, seed_base=0):
    v = RNG.normal(size=(n, d)).astype(np.float32)
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def test_desc_dist2_matches_numpy():
    a = unit_desc(10)
    b = unit_desc(12)
    d2 = np.asarray(assoc.desc_dist2(jnp.asarray(a), jnp.asarray(b)))
    ref = ((a[:, None] - b[None]) ** 2).sum(-1)
    np.testing.assert_allclose(d2, ref, atol=2e-2)  # bf16 matmul tolerance


def test_project_landmarks_frustum():
    lm = jnp.asarray([[0.0, 0.0, 5.0], [0.0, 0.0, -5.0], [100.0, 0.0, 5.0]])
    cam = cameras.make_pinhole(400.0, 400.0, 320.0, 240.0)
    uv, depth, vis = assoc.project_landmarks(
        lm, jnp.ones(3, bool), jnp.eye(3), jnp.zeros(3), cam)
    v = np.asarray(vis)
    assert v[0] and not v[1] and not v[2]
    np.testing.assert_allclose(np.asarray(uv[0]), [320, 240], atol=1e-4)


def test_projection_match_finds_correspondences():
    L, N = 40, 30
    desc = unit_desc(L)
    # Frame sees landmarks 0..19 at known pixels; 10 spurious keypoints.
    lm_uv = RNG.uniform(50, 400, (L, 2)).astype(np.float32)
    f_kpts = np.concatenate([lm_uv[:20] + RNG.normal(0, 1, (20, 2)),
                             RNG.uniform(50, 400, (10, 2))]).astype(np.float32)
    f_desc = np.concatenate([desc[:20], unit_desc(10)]).astype(np.float32)
    kpt_lm, lm_matched = assoc.projection_match(
        jnp.asarray(lm_uv), jnp.asarray(desc), jnp.ones(L, bool),
        jnp.asarray(f_kpts), jnp.asarray(f_desc), jnp.ones(N, bool),
        radius=10.0)
    k = np.asarray(kpt_lm)
    # Most of the 20 planted correspondences are found exactly.
    assert (k[:20] == np.arange(20)).mean() > 0.9
    # note: spurious keypoints may collide randomly but descriptor gate blocks them
    assert (k[20:] == -1).mean() > 0.8


def test_projection_match_radius_gate():
    desc = unit_desc(5)
    lm_uv = np.zeros((5, 2), np.float32)
    f_kpts = np.asarray([[100.0, 100.0]] * 5, np.float32)  # far away
    kpt_lm, _ = assoc.projection_match(
        jnp.asarray(lm_uv), jnp.asarray(desc), jnp.ones(5, bool),
        jnp.asarray(f_kpts), jnp.asarray(desc), jnp.ones(5, bool), radius=10.0)
    assert (np.asarray(kpt_lm) == -1).all()


def test_mutual_nn_match():
    d0 = unit_desc(20)
    perm = RNG.permutation(20)
    noise = RNG.normal(0, 0.05, (20, 32)).astype(np.float32)
    d1 = d0[perm] + noise
    d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
    m, _ = assoc.mutual_nn_match(jnp.asarray(d0), jnp.ones(20, bool),
                                 jnp.asarray(d1), jnp.ones(20, bool))
    m = np.asarray(m)
    inv = np.empty(20, int); inv[perm] = np.arange(20)
    matched = m >= 0
    assert matched.sum() > 15
    assert (m[matched] == inv[np.arange(20)][matched]).all()


def test_epipolar_gate():
    # cam1 translated along x; correspondences from real 3D points pass, random fail.
    X = np.stack([RNG.uniform(-2, 2, 30), RNG.uniform(-2, 2, 30),
                  RNG.uniform(4, 10, 30)], 1).astype(np.float32)
    R01 = np.eye(3, dtype=np.float32)
    t01 = np.array([0.5, 0.0, 0.0], np.float32)  # cam1 at +x in cam0 frame
    rays0 = X
    X1 = (X - t01)  # cam1 frame (R=I)
    rays1 = X1
    matches = jnp.arange(30, dtype=jnp.int32)
    ok = assoc.epipolar_gate(jnp.asarray(rays0), jnp.asarray(rays1), matches,
                             jnp.asarray(R01), jnp.asarray(t01))
    assert (np.asarray(ok) >= 0).all()
    # Scramble: shifted correspondence should mostly fail.
    bad = assoc.epipolar_gate(jnp.asarray(rays0),
                              jnp.asarray(np.roll(rays1, 3, axis=0)), matches,
                              jnp.asarray(R01), jnp.asarray(t01))
    assert (np.asarray(bad) == -1).mean() > 0.7
