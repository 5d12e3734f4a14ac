"""Map slot lifecycle: culling deactivates, compaction recycles.

The reference recycles map capacity by deleting objects (KeyFrame::SetBadFlag
/root/reference/src/KeyFrame.cc:719, MapPoint erase in MapPointCulling
/root/reference/src/LocalMapping.cc:462-505); the fixed-shape device tables
recycle by periodic order-preserving compaction (map_state.compact_map). These
tests pin: (a) the compaction remap algebra, (b) that a LONG sequence — more
keyframes than the table holds — runs at full quality with zero silently
dropped landmarks, (c) trajectory reconstitution through cull-time redirects.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rover_slam_tpu.map import map_state as ms, maintenance
from rover_slam_tpu.slam.system import MonocularSLAM
from rover_slam_tpu.slam import tracking as T
from rover_slam_tpu.slam.tracking import TrackerConfig
from rover_slam_tpu.utils import synthetic, trajectory


def _tiny_map(K=8, N=4, L=16, D=8, n_kf=4):
    st = ms.empty_map(K=K, N=N, L=L, D=D)
    kpts = jnp.zeros((N, 2))
    rays = jnp.ones((N, 3))
    desc = jnp.zeros((N, D))
    valid = jnp.ones((N,), bool)
    # landmarks 0..2*n_kf-1, two per keyframe, keyframes chained by parents
    nl = 2 * n_kf
    st, slots = ms.add_landmarks(
        st, jnp.arange(nl * 3, dtype=jnp.float32).reshape(nl, 3),
        jnp.zeros((nl, D)), jnp.zeros((nl, 3)),
        jnp.zeros((nl,), jnp.int32), jnp.ones((nl,), bool))
    for k in range(n_kf):
        lidx = jnp.asarray([2 * k, 2 * k + 1, -1, -1], jnp.int32)
        st, _ = ms.add_keyframe(st, jnp.eye(3), jnp.full((3,), float(k)),
                                kpts, rays, desc, valid, lidx,
                                jnp.asarray(float(k)),
                                parent=jnp.asarray(k - 1, jnp.int32))
    return st


def test_compact_map_remaps_indices():
    st = _tiny_map()
    # Cull keyframe 1 and landmark 2: compaction must renumber 2,3 -> 1,2 and
    # remap every reference.
    st = st.replace(kf_active=st.kf_active.at[1].set(False),
                    kf_landmark_idx=jnp.where(
                        jnp.arange(st.K)[:, None] == 1, -1,
                        st.kf_landmark_idx))
    st = ms.remove_landmarks(st, jnp.arange(st.L) == 2)
    # keyframe 2's parent was 1: point it at 0 (what cull surgery would do)
    st = st.replace(kf_parent=st.kf_parent.at[2].set(0))
    new, kf_o2n, lm_o2n = ms.compact_map(st)
    kf_o2n = np.asarray(kf_o2n)
    lm_o2n = np.asarray(lm_o2n)
    assert kf_o2n.tolist()[:4] == [0, -1, 1, 2]
    assert int(new.n_kf) == 3
    assert int(new.n_lm) == 7           # landmark 2 dropped
    assert lm_o2n[2] == -1
    # keyframe 2 (now slot 1) kept its pose/time and remapped landmarks
    assert float(new.kf_time[1]) == 2.0
    li = np.asarray(new.kf_landmark_idx[1])
    assert li[0] == lm_o2n[4] and li[1] == lm_o2n[5]
    # parent chain: slot 1 (old 2) -> slot 0 (old 0)
    assert int(new.kf_parent[1]) == 0
    # landmark anchors remapped (all anchored at kf 0 -> slot 0)
    assert np.all(np.asarray(new.lm_anchor_kf)[:7] == 0)
    # old landmark 3 moved to slot lm_o2n[3]; position preserved
    np.testing.assert_allclose(np.asarray(new.lm_pos[lm_o2n[3]]),
                               [9.0, 10.0, 11.0])


def test_compact_map_drops_orphan_landmarks():
    st = _tiny_map()
    # Deactivate every keyframe observing landmarks 0,1 (kf 0) -> orphans.
    st = st.replace(kf_active=st.kf_active.at[0].set(False),
                    kf_landmark_idx=jnp.where(
                        jnp.arange(st.K)[:, None] == 0, -1,
                        st.kf_landmark_idx))
    new, _, lm_o2n = ms.compact_map(st)
    lm_o2n = np.asarray(lm_o2n)
    # anchored at kf0 but unobserved now -> dropped
    assert lm_o2n[0] == -1 and lm_o2n[1] == -1
    assert int(new.n_lm) == 6


def test_cull_redirect_record():
    """cull_keyframes_ex returns the frozen relative pose to the surviving
    ancestor (reference mTcp at SetBadFlag)."""
    st = _tiny_map(n_kf=6)
    # Make mid keyframes redundant: one shared landmark set observed by all
    # (slots 0,1 and the two newest are protected; 2..3 become cullable).
    lidx_all = jnp.tile(jnp.asarray([4, 5, -1, -1], jnp.int32)[None], (6, 1))
    st = st.replace(kf_landmark_idx=st.kf_landmark_idx.at[:6].set(lidx_all))
    st2, n, (cull, surv, R_cp, t_cp) = maintenance.cull_keyframes_ex(st)
    cull = np.asarray(cull)
    assert int(n) >= 1
    k = int(np.nonzero(cull)[0][0])
    p = int(np.asarray(surv)[k])
    assert p >= 0 and not cull[p]
    # T_cp * T_pw == T_cw (frozen at cull time)
    Rc = np.asarray(st.kf_R_cw[k]); tc = np.asarray(st.kf_t_cw[k])
    Rp = np.asarray(st.kf_R_cw[p]); tp = np.asarray(st.kf_t_cw[p])
    Rcp = np.asarray(R_cp)[k]; tcp = np.asarray(t_cp)[k]
    np.testing.assert_allclose(Rcp @ Rp, Rc, atol=1e-5)
    np.testing.assert_allclose(Rcp @ tp + tcp, tc, atol=1e-5)


@pytest.mark.slow
def test_long_sequence_survives_capacity():
    """A long orbit creating several times more keyframes than the table
    holds: culling + compaction keep the active set bounded, tracking never
    degrades, no landmark is silently dropped, and ATE stays flat (the
    round-2 verdict's structural flaw: append-only tables hard-stopped
    mapping at K and drifted unbounded for the rest of the sequence)."""
    world = synthetic.ring_world(n_landmarks=4000, desc_dim=64, seed=0)
    R_gt, t_gt, times = synthetic.orbit_trajectory(
        n_frames=400, orbit_radius=5.0, revs=3.2, dt=0.1)
    frames = synthetic.render_sequence(world, R_gt, t_gt, times, n_kpts=512,
                                       pix_noise=0.4, desc_noise=0.05)
    cfg = TrackerConfig(kf_cull_every=3, kf_max_interval=4)
    slam = MonocularSLAM(world.cam_params, config=cfg,
                         map_capacity=(24, 512, 3072), desc_dim=64)
    infos = [slam.track_frame(f.kpts, f.rays, f.desc, f.valid, f.time)
             for f in frames]
    states = [i["state"] for i in infos]
    first_ok = states.index(T.OK)
    assert all(s == T.OK for s in states[first_ok:]), "tracking lost"
    # More keyframes were CREATED than the table can hold concurrently.
    assert slam._next_uid > 24, slam._next_uid
    assert slam.n_kf <= 24
    assert len(slam._kf_redirect) > 0
    # Zero silent landmark drops; occupancy below capacity after compactions.
    assert int(slam.state.lm_dropped) == 0
    assert int(slam.state.n_lm) < 3072
    # ATE flat over the whole run (scale-aligned): the second half must not
    # be categorically worse than the run as a whole (drift bounded even
    # after multiple full table turnovers).
    est_t, est_R, est_tcw = slam.get_trajectory()
    est_pos = np.stack([-est_R[i].T @ est_tcw[i] for i in range(len(est_t))])
    gt_pos = np.stack([-R_gt[i].T @ t_gt[i] for i in range(len(times))])
    pairs = trajectory.associate_by_time(est_t, times)
    e = np.stack([est_pos[i] for i, _ in pairs])
    g = np.stack([gt_pos[j] for _, j in pairs])
    rmse_all, _ = trajectory.ate_rmse(e, g, with_scale=True)
    h = len(pairs) // 2
    rmse_2nd, _ = trajectory.ate_rmse(e[h:], g[h:], with_scale=True)
    assert rmse_all < 0.20, f"ATE {rmse_all:.3f}"
    assert rmse_2nd < 0.30, f"second-half ATE {rmse_2nd:.3f} (drift unbounded)"


@pytest.mark.slow
def test_landmark_table_compaction_trigger():
    """Landmark-side compaction: a small L table forces the n_lm counter past
    the headroom threshold; compaction must free culled landmarks' slots
    instead of silently dropping new ones."""
    world = synthetic.make_world(n_landmarks=3000, desc_dim=64, seed=1)
    R_gt, t_gt, times = synthetic.forward_trajectory(
        n_frames=120, dt=0.1, speed=0.6, yaw_rate=0.04)
    frames = synthetic.render_sequence(world, R_gt, t_gt, times, n_kpts=256,
                                       pix_noise=0.4, desc_noise=0.05)
    cfg = TrackerConfig(kf_cull_every=3, kf_max_interval=4,
                        min_init_matches=50, min_inliers_local_map=12)
    # L=1280 with N=256 -> headroom threshold 1280-832=448: trips repeatedly.
    slam = MonocularSLAM(world.cam_params, config=cfg,
                         map_capacity=(24, 256, 1280), desc_dim=64)
    for f in frames:
        slam.track_frame(f.kpts, f.rays, f.desc, f.valid, f.time)
    assert slam.tracking_state == T.OK
    assert int(slam.state.lm_dropped) == 0, "landmarks silently dropped"
    assert int(slam.state.n_lm) < 1280
