"""Headline benchmark: end-to-end monocular tracking frames/s on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Composition per tracked frame (matching the reference's per-frame hot path,
SURVEY.md §3.2): SuperPoint extraction (real Flax net, 480x640) + LightGlue
matching (real net, 512 kpts, 9 layers) + backend tracking (motion-model pose
opt, local-map projection track) with keyframe mapping work (triangulation +
local BA) amortized at the measured keyframe rate.

vs_baseline: the reference claims real-time (30 fps camera) on an RTX 3080
(README.md:1,4-9) and publishes no numbers (BASELINE.md); vs_baseline is
fps / 30.0 — the multiple of the reference's real-time bar.
"""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def time_it(fn, *args, warmup=2, reps=20):
    """Queued timing: dispatch all reps, block once. This is the cost the
    pipelined tracker pays — frontend programs are dispatched asynchronously
    ahead of the tracking kernel (slam/system.py), so per-call host->device
    round trips never serialize the loop."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(reps)]
    out = jax.block_until_ready(outs[-1])
    return (time.perf_counter() - t0) / reps, out


def main():
    from rover_slam_tpu.models.superpoint import SuperPointExtractor
    from rover_slam_tpu.models.lightglue import LightGlueMatcher, normalize_keypoints
    from rover_slam_tpu.slam.system import MonocularSLAM
    from rover_slam_tpu.utils import synthetic

    rng = np.random.default_rng(0)
    H, W, NK = 480, 640, 512

    # --- frontend cost: SuperPoint (1 frame) + LightGlue (1 pair) ---
    ext = SuperPointExtractor(image_hw=(H, W), max_keypoints=NK)
    img = jnp.asarray(rng.uniform(0, 1, (1, H, W)).astype(np.float32))
    t_sp, out = time_it(lambda x: ext(x), img)

    matcher = LightGlueMatcher(num_kpts=NK, num_layers=9)
    k = normalize_keypoints(out["keypoints"], (H, W))
    t_lg, _ = time_it(
        lambda: matcher(k, out["descriptors"], out["valid"],
                        k, out["descriptors"], out["valid"]))

    # --- backend cost: oracle-frontend SLAM steady-state ms/frame ---
    # pipeline=True: the per-frame scalar fetch lags one frame so the
    # host<->device round trip overlaps with compute (same tolerance the
    # reference accepts by queueing keyframes to its async mapping thread).
    # Frames are pre-staged on device: in the real pipeline the frontend
    # (SuperPoint/LightGlue) runs on-chip, so its outputs never leave HBM.
    world = synthetic.make_world(n_landmarks=3000, desc_dim=64, seed=0)
    R_gt, t_gt, times = synthetic.forward_trajectory(n_frames=60, dt=0.1,
                                                     speed=0.6, yaw_rate=0.04)
    frames = synthetic.render_sequence(world, R_gt, t_gt, times, n_kpts=NK,
                                       pix_noise=0.4, desc_noise=0.05)
    dev = [jax.device_put((jnp.asarray(f.kpts), jnp.asarray(f.rays),
                           jnp.asarray(f.desc), jnp.asarray(f.valid)))
           for f in frames]
    slam = MonocularSLAM(world.cam_params, map_capacity=(80, NK, 8192),
                         desc_dim=64, pipeline=True)
    for (k, r, d, v), f in zip(dev[:30], frames[:30]):  # warmup + compile
        slam.track_frame(k, r, d, v, f.time)
    t0 = time.perf_counter()
    for (k, r, d, v), f in zip(dev[30:], frames[30:]):
        slam.track_frame(k, r, d, v, f.time)
    slam.flush()
    t_backend = (time.perf_counter() - t0) / len(frames[30:])

    t_frame = t_sp + t_lg + t_backend
    fps = 1.0 / t_frame
    print(json.dumps({
        "metric": "mono_tracking_fps_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 3),
        "detail": {
            "superpoint_ms": round(t_sp * 1000, 2),
            "lightglue_ms": round(t_lg * 1000, 2),
            "backend_ms_per_frame": round(t_backend * 1000, 2),
            "baseline": "reference real-time claim = 30 fps camera on RTX 3080 (no published numbers)",
        },
    }))


if __name__ == "__main__":
    main()
