"""Stereo, map maintenance, atlas tests."""
import numpy as np
import jax.numpy as jnp
import pytest

from rover_slam_tpu.geometry import lie, cameras
from rover_slam_tpu.map import map_state as ms, maintenance, atlas
from rover_slam_tpu.slam import stereo as stereo_mod
from rover_slam_tpu.slam import tracking as T
from rover_slam_tpu.utils import synthetic

RNG = np.random.default_rng(90)


class TestStereoMatch:
    def test_rectified_depth(self):
        fx, baseline = 458.654, 0.11
        N = 64
        depth_true = RNG.uniform(2, 20, N).astype(np.float32)
        xl = RNG.uniform(100, 500, N).astype(np.float32)
        y = RNG.uniform(50, 430, N).astype(np.float32)
        disp = fx * baseline / depth_true
        kpts_l = np.stack([xl, y], 1)
        kpts_r = np.stack([xl - disp, y], 1)
        desc = RNG.normal(size=(N, 32)).astype(np.float32)
        desc /= np.linalg.norm(desc, axis=1, keepdims=True)
        m, depth, d = stereo_mod.stereo_match_kernel(
            jnp.asarray(kpts_l), jnp.asarray(desc), jnp.ones(N, bool),
            jnp.asarray(kpts_r), jnp.asarray(desc), jnp.ones(N, bool),
            jnp.asarray(fx * baseline, jnp.float32))
        m = np.asarray(m)
        ok = m == np.arange(N)
        assert ok.mean() > 0.9
        np.testing.assert_allclose(np.asarray(depth)[ok], depth_true[ok],
                                   rtol=0.02)

    def test_row_gate(self):
        # Right kpts on different rows never match.
        N = 16
        kpts_l = np.stack([np.full(N, 300.0), np.arange(N) * 20.0], 1).astype(np.float32)
        kpts_r = kpts_l.copy(); kpts_r[:, 1] += 8.0; kpts_r[:, 0] -= 20.0
        desc = RNG.normal(size=(N, 32)).astype(np.float32)
        desc /= np.linalg.norm(desc, axis=1, keepdims=True)
        m, depth, _ = stereo_mod.stereo_match_kernel(
            jnp.asarray(kpts_l), jnp.asarray(desc), jnp.ones(N, bool),
            jnp.asarray(kpts_r), jnp.asarray(desc), jnp.ones(N, bool),
            jnp.asarray(50.0, jnp.float32))
        assert (np.asarray(m) == -1).all()


class TestStereoSLAM:
    def test_metric_from_first_frame(self):
        """Stereo SLAM produces a metric trajectory with NO scale alignment."""
        world = synthetic.make_world(n_landmarks=4000, desc_dim=64, seed=3)
        R_gt, t_gt, times = synthetic.forward_trajectory(n_frames=25, dt=0.1,
                                                         speed=0.5)
        frames = synthetic.render_sequence(world, R_gt, t_gt, times,
                                           n_kpts=512, pix_noise=0.4,
                                           desc_noise=0.05)
        baseline = 0.11
        fx = float(np.asarray(world.cam_params)[0])
        slam = stereo_mod.StereoSLAM(world.cam_params, baseline,
                                     map_capacity=(48, 512, 8192), desc_dim=64)
        for i, f in enumerate(frames):
            # Synthesize the right view: true depth -> disparity shift.
            Xc = (f.R_cw @ world.landmarks[np.maximum(f.lm_id, 0)].T).T + f.t_cw
            depth_true = np.where(f.lm_id >= 0, Xc[:, 2], -1.0)
            disp = np.where(depth_true > 0, fx * baseline / np.maximum(depth_true, 1e-3), 0)
            kpts_r = f.kpts.copy()
            kpts_r[:, 0] -= disp
            slam.track_stereo_frame(f.kpts, f.rays, f.desc, f.valid,
                                    kpts_r, f.desc, f.valid, f.time)
        assert slam.tracking_state == T.OK
        est_t, est_R, est_tcw = slam.get_trajectory()
        est_pos = np.stack([-est_R[i].T @ est_tcw[i] for i in range(len(est_t))])
        gt_pos = np.stack([-R_gt[i].T @ t_gt[i] for i in range(len(times))])
        # Metric: compare path lengths directly (no alignment).
        L_est = np.linalg.norm(np.diff(est_pos, axis=0), axis=1).sum()
        L_gt = np.linalg.norm(np.diff(gt_pos[-len(est_pos):], axis=0), axis=1).sum()
        assert abs(L_est - L_gt) / L_gt < 0.08, (L_est, L_gt)


class TestMaintenance:
    def _map_with_weak_lms(self):
        st = ms.empty_map(K=8, N=32, L=64, D=16)
        st, _ = ms.add_landmarks(st, jnp.zeros((10, 3)), jnp.zeros((10, 16)),
                                 jnp.zeros((10, 3)), jnp.zeros(10, jnp.int32),
                                 jnp.ones(10, bool))
        st = st.replace(n_kf=jnp.asarray(5, jnp.int32),
                        lm_first_kf=st.lm_first_kf.at[:10].set(0))
        return st

    def test_cull_low_found_ratio(self):
        st = self._map_with_weak_lms()
        st = st.replace(lm_visible=st.lm_visible.at[0].set(100),
                        lm_found=st.lm_found.at[0].set(1),
                        lm_n_obs=st.lm_n_obs.at[:10].set(10))
        out = maintenance.cull_landmarks(st)
        assert not bool(out.lm_active[0])     # found ratio 0.01 < 0.05
        assert bool(out.lm_active[1])

    def test_cull_few_obs(self):
        st = self._map_with_weak_lms()
        st = st.replace(lm_n_obs=st.lm_n_obs.at[:10].set(10).at[3].set(1))
        out = maintenance.cull_landmarks(st)
        assert not bool(out.lm_active[3])
        assert bool(out.lm_active[4])

    def test_cull_redundant_keyframes(self):
        st = ms.empty_map(K=8, N=16, L=64, D=16)
        st, _ = ms.add_landmarks(st, jnp.zeros((12, 3)), jnp.zeros((12, 16)),
                                 jnp.zeros((12, 3)), jnp.zeros(12, jnp.int32),
                                 jnp.ones(12, bool))
        lidx = np.full(16, -1); lidx[:12] = np.arange(12)
        for k in range(6):  # 6 KFs all seeing the same 12 landmarks
            st, _ = ms.add_keyframe(st, jnp.eye(3), jnp.zeros(3),
                                    jnp.zeros((16, 2)), jnp.ones((16, 3)),
                                    jnp.zeros((16, 16)),
                                    jnp.asarray(np.arange(16) < 12),
                                    jnp.asarray(lidx, jnp.int32), float(k))
        st2, n = maintenance.cull_keyframes(st)
        assert int(n) >= 2      # middle keyframes are redundant
        assert bool(st2.kf_active[0]) and bool(st2.kf_active[1])  # protected

    def test_cull_spanning_tree_surgery(self):
        """Culling must re-parent spanning-tree children to the culled
        keyframe's own (surviving) ancestor — even across culled CHAINS —
        so the essential graph stays connected (reference KeyFrame::SetBadFlag
        graph surgery, src/KeyFrame.cc:719-963; VERDICT round-1 missing #4)."""
        st = ms.empty_map(K=8, N=16, L=64, D=16)
        st, _ = ms.add_landmarks(st, jnp.zeros((12, 3)), jnp.zeros((12, 16)),
                                 jnp.zeros((12, 3)), jnp.zeros(12, jnp.int32),
                                 jnp.ones(12, bool))
        lidx = np.full(16, -1); lidx[:12] = np.arange(12)
        for k in range(6):
            st, _ = ms.add_keyframe(st, jnp.eye(3), jnp.zeros(3),
                                    jnp.zeros((16, 2)), jnp.ones((16, 3)),
                                    jnp.zeros((16, 16)),
                                    jnp.asarray(np.arange(16) < 12),
                                    jnp.asarray(lidx, jnp.int32), float(k),
                                    parent=jnp.asarray(k - 1, jnp.int32))
        st2, n = maintenance.cull_keyframes(st)
        assert int(n) >= 2
        culled = ~np.asarray(st2.kf_active)[: int(st.n_kf)]
        parent = np.asarray(st2.kf_parent)[: int(st.n_kf)]
        active = np.asarray(st2.kf_active)
        for j in range(int(st.n_kf)):
            if culled[j]:
                assert parent[j] == -1      # culled KFs leave the tree
            else:
                # surviving KFs point at a surviving ancestor (or root -1)
                assert parent[j] == -1 or active[parent[j]], \
                    (j, parent[j], culled)

    def test_loop_edge_protects_from_cull(self):
        """Loop-edge endpoints are not erasable (reference mspLoopEdges /
        SetNotErase, src/KeyFrame.cc:719-745)."""
        st = ms.empty_map(K=8, N=16, L=64, D=16)
        st, _ = ms.add_landmarks(st, jnp.zeros((12, 3)), jnp.zeros((12, 16)),
                                 jnp.zeros((12, 3)), jnp.zeros(12, jnp.int32),
                                 jnp.ones(12, bool))
        lidx = np.full(16, -1); lidx[:12] = np.arange(12)
        for k in range(6):
            st, _ = ms.add_keyframe(st, jnp.eye(3), jnp.zeros(3),
                                    jnp.zeros((16, 2)), jnp.ones((16, 3)),
                                    jnp.zeros((16, 16)),
                                    jnp.asarray(np.arange(16) < 12),
                                    jnp.asarray(lidx, jnp.int32), float(k))
        st = st.replace(kf_loop_edges=st.kf_loop_edges.at[2, 3].set(True)
                        .at[3, 2].set(True))
        st2, _ = maintenance.cull_keyframes(st)
        assert bool(st2.kf_active[2]) and bool(st2.kf_active[3])


class TestAtlas:
    def test_create_and_merge(self):
        st = ms.empty_map(K=4, N=8, L=16, D=8)
        st, _ = ms.add_keyframe(st, jnp.eye(3), jnp.zeros(3),
                                jnp.zeros((8, 2)), jnp.ones((8, 3)),
                                jnp.zeros((8, 8)), jnp.ones(8, bool),
                                jnp.full((8,), -1, jnp.int32), 0.0)
        st = atlas.create_new_map(st)
        assert int(st.active_map_id) == 1
        st, _ = ms.add_keyframe(st, jnp.eye(3), jnp.ones(3),
                                jnp.zeros((8, 2)), jnp.ones((8, 3)),
                                jnp.zeros((8, 8)), jnp.ones(8, bool),
                                jnp.full((8,), -1, jnp.int32), 1.0)
        assert int(st.kf_map_id[0]) == 0 and int(st.kf_map_id[1]) == 1
        kf_mask, _ = atlas.active_map_masks(st)
        assert not bool(kf_mask[0]) and bool(kf_mask[1])
        st = atlas.merge_maps(st, keep_id=0, absorb_id=1)
        assert int(st.kf_map_id[1]) == 0

    def test_save_load_roundtrip(self, tmp_path):
        st = ms.empty_map(K=4, N=8, L=16, D=8)
        st, _ = ms.add_keyframe(st, jnp.eye(3), jnp.arange(3, dtype=jnp.float32),
                                jnp.zeros((8, 2)), jnp.ones((8, 3)),
                                jnp.zeros((8, 8)), jnp.ones(8, bool),
                                jnp.full((8,), -1, jnp.int32), 2.5)
        p = str(tmp_path / "atlas.npz")
        atlas.save_atlas(st, p, metadata={"seq": "test"})
        st2 = atlas.load_atlas(p)
        np.testing.assert_allclose(np.asarray(st2.kf_t_cw), np.asarray(st.kf_t_cw))
        assert int(st2.n_kf) == 1

    def test_checksum_detects_corruption(self, tmp_path):
        st = ms.empty_map(K=4, N=8, L=16, D=8)
        p = str(tmp_path / "atlas.npz")
        atlas.save_atlas(st, p)
        with open(p, "r+b") as f:
            f.seek(100)
            f.write(b"XXXX")
        with pytest.raises(ValueError, match="checksum"):
            atlas.load_atlas(p)


class TestRGBD:
    def test_metric_tracking(self):
        world = synthetic.make_world(n_landmarks=4000, desc_dim=64, seed=4)
        R_gt, t_gt, times = synthetic.forward_trajectory(n_frames=20, dt=0.1,
                                                         speed=0.5)
        frames = synthetic.render_sequence(world, R_gt, t_gt, times,
                                           n_kpts=512, pix_noise=0.4,
                                           desc_noise=0.05)
        slam = stereo_mod.RGBDSLAM(world.cam_params, depth_factor=1.0,
                                   map_capacity=(48, 512, 8192), desc_dim=64)
        for f in frames:
            Xc = (f.R_cw @ world.landmarks[np.maximum(f.lm_id, 0)].T).T + f.t_cw
            depth = np.where(f.lm_id >= 0, Xc[:, 2], -1.0).astype(np.float32)
            depth += np.random.default_rng(1).normal(0, 0.01, depth.shape)
            slam.track_rgbd_frame(f.kpts, f.rays, f.desc, f.valid, depth,
                                  f.time)
        assert slam.tracking_state == T.OK
        est_t, est_R, est_tcw = slam.get_trajectory()
        est_pos = np.stack([-est_R[i].T @ est_tcw[i] for i in range(len(est_t))])
        gt_pos = np.stack([-R_gt[i].T @ t_gt[i] for i in range(len(times))])
        L_est = np.linalg.norm(np.diff(est_pos, axis=0), axis=1).sum()
        L_gt = np.linalg.norm(np.diff(gt_pos[-len(est_pos):], axis=0), axis=1).sum()
        assert abs(L_est - L_gt) / L_gt < 0.08


class TestFuseIntoKeyframe:
    """Per-KF neighborhood fusion (reference SearchInNeighbors + Fuse)."""

    def _scene(self):
        cam = cameras.make_pinhole(100.0, 100.0, 100.0, 100.0)
        st = ms.empty_map(K=8, N=32, L=64, D=16)
        rng = np.random.default_rng(7)
        pos = np.stack([rng.uniform(-2, 2, 11), rng.uniform(-2, 2, 11),
                        rng.uniform(5, 9, 11)], 1).astype(np.float32)
        pos[10] = pos[3]                      # lm 10 duplicates lm 3
        desc = np.zeros((11, 16), np.float32)
        desc[np.arange(11), np.arange(11) % 16] = 1.0
        desc[10] = desc[3]
        st, slots = ms.add_landmarks(st, jnp.asarray(pos), jnp.asarray(desc),
                                     jnp.zeros((11, 3)),
                                     jnp.zeros(11, jnp.int32),
                                     jnp.ones(11, bool))
        uv = np.asarray(cameras.project(cameras.PINHOLE, cam,
                                        jnp.asarray(pos)))
        kpts = np.zeros((32, 2), np.float32)
        kpts[:11] = uv
        descs = np.zeros((32, 16), np.float32)
        descs[:11] = desc
        valid = jnp.asarray(np.arange(32) < 11)

        def add(li):
            nonlocal st
            lidx = np.full(32, -1, np.int32)
            lidx[:len(li)] = li
            st, _ = ms.add_keyframe(st, jnp.eye(3), jnp.zeros(3),
                                    jnp.asarray(kpts), jnp.ones((32, 3)),
                                    jnp.asarray(descs), valid,
                                    jnp.asarray(lidx), 0.0)

        add(list(range(10)) + [-1])           # KF0 observes lm 0..9
        add(list(range(10)) + [-1])           # KF1 observes lm 0..9
        # KF2: slots 0-2 correct, slot 3 holds the DUPLICATE lm 10,
        # slots 4..9 empty (fusion should add those observations).
        add([0, 1, 2, 10] + [-1] * 7)
        return cam, st

    def test_duplicate_replaced_and_obs_added(self):
        cam, st = self._scene()
        st2, n_fused, n_added = maintenance.fuse_into_keyframe(
            st, jnp.asarray(2, jnp.int32), cam)
        assert int(n_fused) == 1
        # lm 10 loses (1 obs vs 2): killed, its slot re-pointed at lm 3.
        assert not bool(st2.lm_active[10])
        li2 = np.asarray(st2.kf_landmark_idx[2])
        assert li2[3] == 3
        # Empty slots gained the neighbor landmarks.
        assert int(n_added) >= 6
        assert (li2[4:10] == np.arange(4, 10)).all()
        # Observation counts refreshed (lm 3 now seen by KF0, KF1, KF2).
        assert int(st2.lm_n_obs[3]) == 3

    def test_more_observed_projected_wins(self):
        cam, st = self._scene()
        # Flip: make the duplicate the strong one (3 obs) by attaching it to
        # KF0/KF1 as well, and the true lm 3 weak (only KF2).
        li = np.array(st.kf_landmark_idx)
        li[0][3] = 10
        li[1][3] = 10
        li[2][3] = 3
        st = st.replace(kf_landmark_idx=jnp.asarray(li))
        st = st.replace(lm_n_obs=jnp.sum(ms.observation_matrix(st),
                                         axis=0).astype(jnp.int32))
        st2, n_fused, _ = maintenance.fuse_into_keyframe(
            st, jnp.asarray(2, jnp.int32), cam)
        assert int(n_fused) == 1
        assert not bool(st2.lm_active[3])
        assert bool(st2.lm_active[10])
        assert np.asarray(st2.kf_landmark_idx[2])[3] == 10


def test_kf_cull_cadence_wired():
    """kf_cull_every triggers KeyFrameCulling during a run; redundant
    keyframes get deactivated while tracking stays healthy."""
    from rover_slam_tpu.slam.tracking import TrackerConfig
    world = synthetic.make_world(n_landmarks=3000, desc_dim=64, seed=9)
    # Forced dense keyframe insertion -> consecutive keyframes redundant.
    R_gt, t_gt, times = synthetic.forward_trajectory(n_frames=24, dt=0.1,
                                                     speed=0.5)
    frames = synthetic.render_sequence(world, R_gt, t_gt, times, n_kpts=512,
                                       pix_noise=0.4, desc_noise=0.05)
    from rover_slam_tpu.slam.system import MonocularSLAM
    slam = MonocularSLAM(world.cam_params, map_capacity=(48, 512, 8192),
                         desc_dim=64,
                         config=TrackerConfig(kf_cull_every=4,
                                              kf_min_interval=0,
                                              kf_tracked_ratio=1.0,
                                              kf_max_interval=1))
    for f in frames:
        slam.track_frame(f.kpts, f.rays, f.desc, f.valid, f.time)
    assert slam.tracking_state == T.OK
    n_active = int(jnp.sum(slam.state.kf_active))
    assert n_active < slam.n_kf, "culling never deactivated a keyframe"


def test_distinctive_descriptor_recompute():
    """Landmark descriptor becomes the min-median-L2 observation descriptor
    (reference MapPoint::ComputeDistinctiveDescriptors): with observations
    {a, a+eps, outlier}, one of the two consistent ones must win."""
    st = ms.empty_map(K=8, N=16, L=32, D=16)
    rng = np.random.default_rng(11)
    a = rng.normal(size=16).astype(np.float32)
    a /= np.linalg.norm(a)
    eps = a + 0.05 * rng.normal(size=16).astype(np.float32)
    eps /= np.linalg.norm(eps)
    outlier = rng.normal(size=16).astype(np.float32)
    outlier /= np.linalg.norm(outlier)
    # Landmark 0 created with the OUTLIER as its stored descriptor.
    st, _ = ms.add_landmarks(st, jnp.zeros((1, 3)),
                             jnp.asarray(outlier[None]),
                             jnp.zeros((1, 3)), jnp.zeros(1, jnp.int32),
                             jnp.ones(1, bool))
    lidx = np.full(16, -1, np.int32); lidx[0] = 0
    for d in (a, eps, outlier):
        descs = np.zeros((16, 16), np.float32)
        descs[0] = d
        st, _ = ms.add_keyframe(st, jnp.eye(3), jnp.zeros(3),
                                jnp.zeros((16, 2)), jnp.ones((16, 3)),
                                jnp.asarray(descs),
                                jnp.asarray(np.arange(16) < 1),
                                jnp.asarray(lidx), 0.0)
    st2 = maintenance.update_distinctive_descriptors(
        st, jnp.asarray(2, jnp.int32))
    new = np.asarray(st2.lm_desc[0], np.float32)
    d_a = min(np.linalg.norm(new - a), np.linalg.norm(new - eps))
    d_out = np.linalg.norm(new - outlier)
    assert d_a < 1e-5, "descriptor is not one of the consistent observations"
    assert d_out > 0.1


def test_device_trace_writes_profile(tmp_path):
    """utils.profiling.device_trace captures an xprof trace (SURVEY §5: the
    jax.profiler side of the REGISTER_TIMES observability parity)."""
    import glob
    import jax.numpy as jnp
    from rover_slam_tpu.utils.profiling import device_trace, annotate

    logdir = str(tmp_path / "trace")
    with device_trace(logdir):
        with annotate("unit-test-span"):
            jnp.ones((8, 8)).sum().block_until_ready()
    assert glob.glob(logdir + "/plugins/profile/*/*.xplane.pb")


def test_global_ba_edge_compaction_parity():
    """Compacted global BA (edge nonzero-gather + lm_cap,
    maintenance.GBA_LEVELS) must match the full padded solve: the padded
    [K*N] edge set runs ~30x more slots than live observations and cost
    ~1.2 s per chunk on-chip (round-5 tail fix)."""
    from rover_slam_tpu.map import maintenance
    from rover_slam_tpu.slam.system import MonocularSLAM
    from rover_slam_tpu.slam.tracking import TrackerConfig
    world = synthetic.make_world(n_landmarks=1500, desc_dim=32, seed=2)
    R_gt, t_gt, times = synthetic.forward_trajectory(n_frames=14, dt=0.1,
                                                     speed=0.6, yaw_rate=0.04)
    frames = synthetic.render_sequence(world, R_gt, t_gt, times, n_kpts=256,
                                       pix_noise=0.5, desc_noise=0.05)
    slam = MonocularSLAM(world.cam_params, map_capacity=(32, 256, 4096),
                         desc_dim=32,
                         config=TrackerConfig(min_init_matches=30,
                                              kf_min_interval=0,
                                              kf_tracked_ratio=1.0,
                                              kf_max_interval=2))
    for f in frames:
        slam.track_frame(f.kpts, f.rays, f.desc, f.valid, f.time)
    st = slam.state
    n_e = maintenance.count_global_edges(st)
    assert n_e > 100
    lvl = maintenance.gba_level_for(n_e)
    out_full = maintenance.global_ba(st, slam.cam_params, iters=4)
    out_cmp = maintenance.global_ba(st, slam.cam_params, iters=4, level=lvl)
    act = np.asarray(st.kf_active)
    dt = np.abs(np.asarray(out_full.kf_t_cw)
                - np.asarray(out_cmp.kf_t_cw))[act]
    assert dt.max() < 5e-3, dt.max()
    lact = np.asarray(st.lm_active)
    dl = np.abs(np.asarray(out_full.lm_pos) - np.asarray(out_cmp.lm_pos))[lact]
    assert np.median(dl) < 5e-3
