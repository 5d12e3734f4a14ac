"""Wall-clock instrumentation of the exact bench loop: where does the host
spend its time per frame?"""
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
    from rover_slam_tpu.slam.tracking import TrackerConfig
    from rover_slam_tpu.slam.loop_closing import LoopConfig
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
    n_warm, n_timed = 40, int(os.environ.get("PROF_TIMED", "60"))
    F = n_warm + n_timed
    R_gt, t_gt, times = synthetic.orbit_trajectory(
        n_frames=F, orbit_radius=5.0, revs=1.1 * F / 160.0, dt=1.0 / 30.0)
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
                        min_init_matches=40, min_inliers_local_map=20,
                        kf_tracked_ratio=float(
                            os.environ.get("PROF_KF_RATIO", "0.75")),
                        ba_iters=int(os.environ.get("PROF_BA_ITERS", "2")),
                        ba_every=int(os.environ.get("PROF_BA_EVERY", "1")))
    # Env knobs for tuning sweeps (defaults = the bench configuration).
    lc_cfg = LoopConfig(
        min_covis_weight=30,
        gba_iters=int(os.environ.get("PROF_GBA_ITERS", "10")),
        gba_chunk_iters=int(os.environ.get("PROF_GBA_CHUNK", "1")))
    slam = MonocularSLAM(cam, config=cfg, map_capacity=(512, NK, 16384),
                         desc_dim=D, enable_loop_closing=True,
                         loop_config=lc_cfg,
                         pipeline=4, matcher=matcher)
    camj = jnp.asarray(cam)

    acc = {}

    def tick(name, t0):
        t1 = time.perf_counter()
        acc.setdefault(name, []).append((t1 - t0) * 1000)
        return t1

    def step(i, timed):
        t0 = time.perf_counter()
        out = ext(imgs[i])
        if timed:
            t0 = tick("ext_dispatch", t0)
        kpts = out["keypoints"][0]
        rays = cameras.unproject_jit(cameras.PINHOLE, camj, kpts)
        if timed:
            t0 = tick("unproject", t0)
        r = slam.track_frame(kpts, rays, out["descriptors"][0],
                             out["valid"][0], times[i])
        if timed:
            tick("track_frame", t0)
        return r

    for i in range(n_warm):
        step(i, False)
    slam.flush()
    slam.precompile()
    t0 = time.perf_counter()
    per_frame = []
    for i in range(n_warm, F):
        t1 = time.perf_counter()
        step(i, True)
        per_frame.append((i - n_warm, (time.perf_counter() - t1) * 1000))
    t_fl = time.perf_counter()
    lc0 = slam.loop_closer
    pend = (len(lc0._pending_detect), len(lc0._pending_cand),
            lc0._gba_pending, lc0._hyp is not None)
    while slam._pending:
        pf, pflags = slam._pending.popleft()
        slam._finish_track(pf, pflags)
    t_mid = time.perf_counter()
    if slam.loop_closer is not None and slam.n_kf >= 2:
        slam.state, linfo = slam.loop_closer.finalize(slam.state)
        if linfo is not None:
            slam._handle_loop_info(linfo.get("query_kf", slam.n_kf - 1),
                                   linfo)
    t_end = time.perf_counter()
    print(f"flush: drain_frames={1000*(t_mid-t_fl):.0f}ms "
          f"finalize={1000*(t_end-t_mid):.0f}ms "
          f"pending(det,cand,gba,hyp)={pend}")
    flush_ms = (time.perf_counter() - t_fl) * 1000
    wall = time.perf_counter() - t0
    # ATE with the bench's protocol (scale-aligned Horn) so tuning
    # experiments get a quality number without a full bench run.
    from rover_slam_tpu.utils import trajectory
    est_t, est_R, est_tcw = slam.get_trajectory()
    ate_cm = float("nan")
    if len(est_t) > 10:
        est_pos = np.stack([-est_R[i].T @ est_tcw[i]
                            for i in range(len(est_t))])
        fin = (np.isfinite(est_pos).all(axis=1)
               & np.isfinite(est_R.reshape(len(est_t), -1)).all(axis=1))
        gt_pos = np.stack([-R_gt[i].T @ t_gt[i] for i in range(len(times))])
        pairs = [(i, j) for i, j in
                 trajectory.associate_by_time(est_t, times) if fin[i]]
        if len(pairs) > 10:
            e = np.stack([est_pos[i] for i, _ in pairs])
            g = np.stack([gt_pos[j] for _, j in pairs])
            rmse, _ = trajectory.ate_rmse(e, g, with_scale=True)
            ate_cm = round(float(rmse * 100), 2)
    print(f"fps={n_timed/wall:.2f} n_kf={slam.n_kf} ate_cm={ate_cm} "
          f"n_loops={len(slam.loop_events)} flush_ms={flush_ms:.0f}")
    pf = np.array([m for _, m in per_frame])
    print(f"frame_ms: med={np.median(pf):.2f} mean={pf.mean():.2f} "
          f"p95={np.percentile(pf, 95):.2f} max={pf.max():.2f}")
    worst = sorted(per_frame, key=lambda x: -x[1])[:12]
    print("slowest frames:", [(i, round(m, 1)) for i, m in sorted(worst)])
    for k, v in sorted(acc.items()):
        v = np.array(v)
        print(f"{k}: med={np.median(v):.2f} mean={v.mean():.2f} "
              f"max={v.max():.2f} sum={v.sum():.0f}ms")
    print("slam timers:", {k: (round(s["median_ms"], 2), s["count"])
                           for k, s in sorted(slam.timers.summary().items())})
    print("loop_events:", slam.loop_events)
    for row in slam.loop_closer.score_log:
        print("score_log kf=%d best=%.4f minscore=%.4f dispatched=%s" % row)
    for row in slam.loop_closer.cand_log:
        print("cand_log", row)
    for row in slam.loop_closer.hyp_log:
        print("hyp_log q_last=%d kf=%d cand=%d n_proj=%d count=%d misses=%d"
              % row)

    from rover_slam_tpu.map import atlas as _atlas
    _atlas.save_atlas(slam.state, "/tmp/probe_state.npz")

    # Oracle check: learned match + Sim3 between the LAST keyframes and the
    # map's start (the geometrically true revisit pair) — separates
    # retrieval failure from matching/geometry failure.
    from rover_slam_tpu.slam.loop_closing import _sim3_between_kfs
    lc = slam.loop_closer
    st = slam.state
    for kq in [slam.n_kf - 2, slam.n_kf - 1]:
        for kc in [0, 1, 2, 6]:
            res, nm2 = _sim3_between_kfs(
                st, jnp.asarray(kq, jnp.int32), jnp.asarray(kc, jnp.int32),
                slam.cam_params, jax.random.PRNGKey(1), lc.cfg.cam_kind,
                lc.cfg.fix_scale,
                ext_matches=lc._kf_matches(st, kq, kc))
            res_n, nm_n = _sim3_between_kfs(
                st, jnp.asarray(kq, jnp.int32), jnp.asarray(kc, jnp.int32),
                slam.cam_params, jax.random.PRNGKey(1), lc.cfg.cam_kind,
                lc.cfg.fix_scale, ext_matches=None)
            print(f"oracle_pair q={kq} c={kc}: lg nm={int(nm2)} "
                  f"ok={bool(res.success)} ninl={int(res.n_inliers)} "
                  f"s={float(res.s):.3f} | nn nm={int(nm_n)} "
                  f"ninl={int(res_n.n_inliers)} s={float(res_n.s):.3f}")


if __name__ == "__main__":
    main()
