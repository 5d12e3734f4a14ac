"""Sweep pose-opt iteration counts in the fused track+map kernel: time vs
configuration, to pick the cheapest schedule that holds bench ATE."""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import time
import numpy as np
import jax
import jax.numpy as jnp


def main():
    from rover_slam_tpu.models.superpoint import SuperPointExtractor
    from rover_slam_tpu.models.lightglue import (LightGlueMatcher,
                                                 LightGlueFrameMatcher)
    from rover_slam_tpu.slam.system import MonocularSLAM
    from rover_slam_tpu.slam import tracking as T
    from rover_slam_tpu.slam.tracking import TrackerConfig
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
    F = 50
    R_gt, t_gt, times = synthetic.orbit_trajectory(
        n_frames=F, orbit_radius=5.0, revs=0.33, dt=1.0 / 30.0)
    imgs = [jax.device_put(jnp.asarray(
        synthetic.render_photo_frame(world, R_gt[i], t_gt[i])[None]
        .astype(np.float32) / 255.0)) for i in range(F)]

    base = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "rover_slam_tpu", "assets")
    sp_params = ckpt.load_params(os.path.join(base, "superpoint_synth.npz"))
    lg_params = ckpt.load_params(os.path.join(base, "lightglue_synth.npz"))
    ext = SuperPointExtractor(params=sp_params, image_hw=(H, W),
                              max_keypoints=NK)
    matcher = LightGlueFrameMatcher(
        LightGlueMatcher(params=lg_params, num_kpts=NK, num_layers=9,
                         threshold=0.1), (H, W))
    cfg = TrackerConfig(image_hw=(H, W), local_map_only=True, kf_cull_every=0,
                        min_init_matches=40, min_inliers_local_map=20)
    slam = MonocularSLAM(cam, config=cfg, map_capacity=(512, NK, 16384),
                         desc_dim=D, enable_loop_closing=False,
                         pipeline=4, matcher=matcher)
    camj = jnp.asarray(cam)
    for i in range(F):
        out = ext(imgs[i])
        kpts = out["keypoints"][0]
        rays = cameras.unproject_jit(cameras.PINHOLE, camj, kpts)
        slam.track_frame(kpts, rays, out["descriptors"][0],
                         out["valid"][0], times[i])
    slam.flush()
    print("n_kf:", slam.n_kf)

    st = slam.state
    prev = slam.last_frame
    prev_lidx = prev.landmark_idx

    def run_fused(mr, mi, lr, li, fs, ba_iters):
        pol = jnp.asarray([fs, 200.0], jnp.float32)
        mask = st.lm_active.copy()
        stc = jax.tree.map(lambda x: x.copy() if hasattr(x, "copy") else x,
                           st)
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
            cfg.local_window, cfg.fixed_window, ba_iters,
            local_map_only=cfg.local_map_only, ext_matches=None,
            max_depth=jnp.asarray(cfg.th_far_points, jnp.float32),
            min_matches_ref_kf=cfg.min_matches_ref_kf,
            motion_rounds=mr, motion_iters=mi,
            local_rounds=lr, local_iters=li,
            min_inliers_weak=cfg.min_inliers_weak)
        return outs[6]

    for (mr, mi, lr, li) in [(2, 5, 2, 6), (1, 4, 2, 4), (1, 3, 2, 3),
                             (1, 3, 1, 4)]:
        for tag, fs, ba in [("track", 0.0, cfg.ba_iters),
                            ("insert", 99.0, cfg.ba_iters),
                            ("insert_ba1", 99.0, 1)]:
            for _ in range(2):
                f = jax.block_until_ready(run_fused(mr, mi, lr, li, fs, ba))
            t0 = time.perf_counter()
            for _ in range(6):
                f = run_fused(mr, mi, lr, li, fs, ba)
            jax.block_until_ready(f)
            dt = (time.perf_counter() - t0) / 6 * 1000
            fl = np.asarray(f)
            print(f"({mr},{mi},{lr},{li}) {tag}: {dt:.2f} ms "
                  f"ok={int(fl[0])} n_inl={int(fl[1])} ins={int(fl[5])}")


if __name__ == "__main__":
    main()
