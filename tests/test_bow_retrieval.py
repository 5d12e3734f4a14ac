"""Place-recognition retrieval quality (round-3 verdict weak #6): the
random-projection BoW vocabulary claims reference-class retrieval
(map/keyframe_database.py) — MEASURE recall@4 of revisit detection on a ring
scene against perceptually-aliased distractors instead of asserting it.

Protocol mirrors the reference's loop-detection query (DetectNBestCandidates,
/root/reference/src/KeyFrameDatabase.cc:658-830): lap 1 fills the database,
lap 2 re-observes the same viewpoints with fresh noise and queries; a hit is
the true viewpoint (or an immediate ring neighbor) inside the top-4.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rover_slam_tpu.map import keyframe_database as kdb
from rover_slam_tpu.utils import synthetic

N_VIEWS = 24


def _ring_frames(desc_dim, seed, desc_noise, alias_groups=0):
    """Render two laps of the same N_VIEWS ring viewpoints (oracle
    descriptors). alias_groups>0 duplicates landmark descriptors in that many
    groups — deliberate perceptual aliasing (repeated texture)."""
    world = synthetic.ring_world(n_landmarks=4000, desc_dim=desc_dim,
                                 seed=seed)
    if alias_groups:
        desc = np.asarray(world.desc)
        rng = np.random.default_rng(seed + 1)
        proto = rng.normal(size=(alias_groups, desc_dim)).astype(np.float32)
        proto /= np.linalg.norm(proto, axis=1, keepdims=True)
        # Half the landmarks snap to one of the alias prototypes.
        pick = rng.integers(0, alias_groups, len(desc))
        mask = rng.random(len(desc)) < 0.5
        desc[mask] = proto[pick[mask]]
        world = world._replace(desc=jnp.asarray(desc))
    laps = []
    for lap in range(2):
        R, t, times = synthetic.orbit_trajectory(n_frames=N_VIEWS, revs=1.0,
                                                 seed=lap)
        laps.append(synthetic.render_sequence(world, R, t, times,
                                              n_kpts=512, pix_noise=0.5,
                                              desc_noise=desc_noise))
    return laps


def _recall_at4(laps, desc_dim):
    lap1, lap2 = laps
    db = kdb.empty_db(desc_dim, K=N_VIEWS + 1, n_words=2048, seed=3)
    for i, f in enumerate(lap1):
        db = kdb.db_add(db, i, f.desc.astype(jnp.float32), f.valid)
    hits = 0
    for i, f in enumerate(lap2):
        tf = kdb.bow_transform(db.vocab, f.desc.astype(jnp.float32), f.valid)
        none_conn = jnp.zeros((N_VIEWS + 1,), bool)
        ids, _ = kdb.detect_candidates(db, tf, N_VIEWS, none_conn,
                                       n_best=4)
        ids = np.asarray(ids)
        ok = any(abs(int(j) - i) <= 1 or abs(int(j) - i) >= N_VIEWS - 1
                 for j in ids if j >= 0)
        hits += ok
    return hits / len(lap2)


def test_recall_oracle_64d():
    r = _recall_at4(_ring_frames(64, seed=0, desc_noise=0.05), 64)
    assert r >= 0.85, f"recall@4 {r:.2f}"


def test_recall_oracle_aliased():
    """Half the landmarks share one of 8 alias prototypes (repeated
    texture): retrieval must still find the revisit through the remaining
    distinctive words."""
    r = _recall_at4(_ring_frames(64, seed=0, desc_noise=0.05,
                                 alias_groups=8), 64)
    assert r >= 0.7, f"recall@4 under aliasing {r:.2f}"


@pytest.mark.slow
def test_recall_trained_superpoint():
    """Recall@4 with the in-env-trained SuperPoint descriptors on rendered
    photo-world images — the configuration the integrated bench runs."""
    import os
    path = os.path.join(os.path.dirname(__file__), "..", "rover_slam_tpu",
                        "assets", "superpoint_synth.npz")
    if not os.path.exists(path):
        pytest.skip("no trained SuperPoint asset")
    from rover_slam_tpu.models.superpoint import SuperPointExtractor
    from rover_slam_tpu.training import checkpoints
    H, W = 240, 320
    ext = SuperPointExtractor(params=checkpoints.load_params(path),
                              image_hw=(H, W), max_keypoints=512)
    world = synthetic.make_photo_world(n_sprites=1000, patch=13, seed=0,
                                       image_hw=(H, W), layout="ring",
                                       ring_orbit_radius=5.0)
    db = kdb.empty_db(256, K=N_VIEWS + 1, n_words=2048, seed=3)
    feats = []
    for lap in range(2):
        R, t, _ = synthetic.orbit_trajectory(n_frames=N_VIEWS, revs=1.0,
                                             orbit_radius=5.0, seed=lap)
        fs = []
        for i in range(N_VIEWS):
            img = synthetic.render_photo_frame(world, R[i], t[i])
            out = ext(jnp.asarray(img[None].astype(np.float32) / 255.0))
            fs.append((out["descriptors"][0], out["valid"][0]))
        feats.append(fs)
    for i, (d, v) in enumerate(feats[0]):
        db = kdb.db_add(db, i, d, v)
    hits = 0
    for i, (d, v) in enumerate(feats[1]):
        tf = kdb.bow_transform(db.vocab, d, v)
        ids, _ = kdb.detect_candidates(
            db, tf, N_VIEWS, jnp.zeros((N_VIEWS + 1,), bool), n_best=4)
        ok = any(abs(int(j) - i) <= 1 or abs(int(j) - i) >= N_VIEWS - 1
                 for j in np.asarray(ids) if j >= 0)
        hits += ok
    r = hits / N_VIEWS
    assert r >= 0.6, f"trained-SP recall@4 {r:.2f}"
