"""Profile each device program in the bench hot path at bench shapes.

Times (device-inclusive, block_until_ready) for: SuperPoint, LightGlue pair,
fused track+map kernel (no-insert vs insert frames), loop-closer detect
kernel, match_batch(4 candidates), sim3-candidates kernel.
"""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import time
import numpy as np
import jax
import jax.numpy as jnp


def t_it(fn, *args, warmup=2, reps=10):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1000


def main():
    from rover_slam_tpu.models.superpoint import SuperPointExtractor
    from rover_slam_tpu.models.lightglue import (LightGlueMatcher,
                                                 LightGlueFrameMatcher)
    from rover_slam_tpu.slam.system import MonocularSLAM
    from rover_slam_tpu.slam import tracking as T
    from rover_slam_tpu.slam.tracking import TrackerConfig
    from rover_slam_tpu.slam.loop_closing import (LoopConfig,
                                                  _detect_and_add_kernel,
                                                  _sim3_candidates_kernel)
    from rover_slam_tpu.geometry import cameras
    from rover_slam_tpu.utils import synthetic
    from rover_slam_tpu.training import checkpoints as ckpt

    H, W, NK, D = 480, 640, 1024, 256
    FX = 458.0
    cam = np.asarray(cameras.make_pinhole(FX, FX, W / 2.0, H / 2.0))
    world = synthetic.make_photo_world(n_sprites=1400, patch=17, seed=0,
                                       image_hw=(H, W), layout="ring",
                                       ring_orbit_radius=5.0)
    world = world._replace(cam_params=cam)
    F = 60
    R_gt, t_gt, times = synthetic.orbit_trajectory(
        n_frames=F, orbit_radius=5.0, revs=0.4, dt=1.0 / 30.0)
    imgs = [jax.device_put(jnp.asarray(
        synthetic.render_photo_frame(world, R_gt[i], t_gt[i])[None]
        .astype(np.float32) / 255.0)) for i in range(F)]

    base = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "rover_slam_tpu", "assets")
    sp_params = ckpt.load_params(os.path.join(base, "superpoint_synth.npz"))
    lg_params = ckpt.load_params(os.path.join(base, "lightglue_synth.npz"))
    ext = SuperPointExtractor(params=sp_params, image_hw=(H, W),
                              max_keypoints=NK)
    lg = LightGlueMatcher(params=lg_params, num_kpts=NK, num_layers=9,
                          threshold=0.1)
    matcher = LightGlueFrameMatcher(lg, (H, W))

    print("superpoint_ms", round(t_it(lambda x: ext(x), imgs[0]), 2))
    o0, o1 = ext(imgs[0]), ext(imgs[1])
    print("lightglue_pair_ms", round(t_it(
        lambda: matcher(o0["keypoints"][0], o0["descriptors"][0],
                        o0["valid"][0], o1["keypoints"][0],
                        o1["descriptors"][0], o1["valid"][0])), 2))

    cfg = TrackerConfig(image_hw=(H, W), local_map_only=True, kf_cull_every=0,
                        min_init_matches=40, min_inliers_local_map=20)
    slam = MonocularSLAM(cam, config=cfg, map_capacity=(512, NK, 16384),
                         desc_dim=D, enable_loop_closing=True,
                         loop_config=LoopConfig(min_covis_weight=30),
                         pipeline=4, matcher=matcher)
    camj = jnp.asarray(cam)

    def step(i):
        out = ext(imgs[i])
        kpts = out["keypoints"][0]
        rays = cameras.unproject_jit(cameras.PINHOLE, camj, kpts)
        return slam.track_frame(kpts, rays, out["descriptors"][0],
                                out["valid"][0], times[i])

    for i in range(F):
        step(i)
    slam.flush()
    print("n_kf after run:", slam.n_kf)

    st = slam.state
    prev = slam.last_frame
    prev_lidx = prev.landmark_idx

    # fused kernel: donated args -> copy state fresh each call; time both
    # policy settings (fs high => insert likely; fs=0 => no insert).
    import dataclasses

    def run_fused(policy_fs):
        pol = jnp.asarray([policy_fs, 200.0, 0.0], jnp.float32)
        mask = st.lm_active.copy()
        stc = jax.tree.map(lambda x: x.copy() if hasattr(x, "copy") else x, st)
        outs = T._track_and_map_kernel(
            stc, pol, mask, prev.desc, prev.valid, prev_lidx,
            prev.kpts, prev.rays, prev.desc, prev.valid,
            prev.R_cw, prev.t_cw, jnp.asarray(0.0, jnp.float32),
            slam.cam_params, cfg.cam_kind, cfg.image_hw,
            cfg.min_matches_motion, cfg.min_inliers_track,
            cfg.min_inliers_local_map, cfg.proj_radius, cfg.desc_th2,
            jnp.asarray(cfg.kf_tracked_ratio, jnp.float32),
            jnp.asarray(cfg.kf_min_interval, jnp.float32),
            jnp.asarray(cfg.kf_max_interval, jnp.float32),
            cfg.local_window, cfg.fixed_window, cfg.ba_iters,
            local_map_only=cfg.local_map_only, ext_matches=None,
            max_depth=jnp.asarray(cfg.th_far_points, jnp.float32),
            min_matches_ref_kf=cfg.min_matches_ref_kf,
            motion_rounds=cfg.motion_rounds, motion_iters=cfg.motion_iters,
            local_rounds=cfg.local_rounds, local_iters=cfg.local_iters,
            min_inliers_weak=cfg.min_inliers_weak)
        return outs[6]

    # warmup + timing with fresh copies (copies add noise; subtract nothing,
    # just compare the two)
    for name, fs in [("fused_noinsert_ms", 0.0), ("fused_insert_ms", 99.0)]:
        for _ in range(2):
            f = jax.block_until_ready(run_fused(fs))
        t0 = time.perf_counter()
        for _ in range(5):
            f = run_fused(fs)
        jax.block_until_ready(f)
        print(name, round((time.perf_counter() - t0) / 5 * 1000, 2),
              "did_insert=", int(np.asarray(f)[5]))

    lc = slam.loop_closer
    kf_id = jnp.asarray(slam.n_kf - 1, jnp.int32)
    print("detect_add_ms", round(t_it(
        lambda: _detect_and_add_kernel(st, lc.db, kf_id, lc.cfg.n_candidates,
                                       lc.cfg.min_recent_kfs_gap,
                                       jnp.asarray(lc.cfg.min_recent_time_s,
                                                   jnp.float32))[2]), 2))
    _, ids, _, _ = _detect_and_add_kernel(st, lc.db, kf_id, lc.cfg.n_candidates,
                                       lc.cfg.min_recent_kfs_gap,
                                       jnp.asarray(lc.cfg.min_recent_time_s,
                                                   jnp.float32))
    B = int(ids.shape[0])
    jc = jnp.clip(ids, 0, st.K - 1)
    q = jnp.clip(kf_id, 0, st.K - 1)
    qk, qd, qv = st.kf_kpts[q], st.kf_desc[q].astype(jnp.float32), \
        st.kf_kpt_valid[q]
    print("match_batch%d_ms" % B, round(t_it(
        lambda: matcher.match_batch(
            jnp.broadcast_to(qk[None], (B,) + qk.shape),
            jnp.broadcast_to(qd[None], (B,) + qd.shape),
            jnp.broadcast_to(qv[None], (B,) + qv.shape),
            st.kf_kpts[jc], st.kf_desc[jc].astype(jnp.float32),
            st.kf_kpt_valid[jc])), 2))
    key = jax.random.PRNGKey(0)
    ext_m = matcher.match_batch(
        jnp.broadcast_to(qk[None], (B,) + qk.shape),
        jnp.broadcast_to(qd[None], (B,) + qd.shape),
        jnp.broadcast_to(qv[None], (B,) + qv.shape),
        st.kf_kpts[jc], st.kf_desc[jc].astype(jnp.float32),
        st.kf_kpt_valid[jc])
    print("sim3_candidates_ms(ext)", round(t_it(
        lambda: _sim3_candidates_kernel(st, kf_id, ids, lc.cam_params, key,
                                        lc.cfg.cam_kind, lc.cfg.fix_scale,
                                        ext_matches=ext_m)[2]), 2))
    print("sim3_candidates_ms(nn)", round(t_it(
        lambda: _sim3_candidates_kernel(st, kf_id, ids, lc.cam_params, key,
                                        lc.cfg.cam_kind, lc.cfg.fix_scale,
                                        ext_matches=None)[2]), 2))


if __name__ == "__main__":
    main()
