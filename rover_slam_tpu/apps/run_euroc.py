"""CLI driver: run SLAM on an EuRoC-format sequence.

The reference's Examples/ mains equivalent (reference: mono_euroc /
mono_inertial_euroc binaries with positional args voc settings data_dir
timestamps [imu] [out]; README.md:44-66). The vocabulary argument is gone —
place recognition needs no trained asset here.

Usage:
  python -m rover_slam_tpu.apps.run_euroc SETTINGS.yaml MAV0_DIR \
      [--sensor monocular|monocular-inertial|stereo] [--out traj.txt] \
      [--superpoint-ckpt superpoint_v1.pth] [--max-frames N]

Images are decoded + prefetched by the native C++ runtime; SuperPoint runs
batched on the TPU; the trajectory is written in TUM format and, if ground
truth is given, scored with the scale-aligned Horn ATE protocol.
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np
import jax.numpy as jnp

from ..models.superpoint import SuperPointExtractor, load_torch_weights
from ..geometry import cameras
from ..utils import dataset, trajectory
from ..utils.config import load_settings, build_system


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("settings")
    ap.add_argument("data_dir", help="EuRoC mav0/ directory")
    ap.add_argument("--sensor", default="monocular")
    ap.add_argument("--out", default="trajectory_tum.txt")
    ap.add_argument("--superpoint-ckpt", default=None)
    ap.add_argument("--lightglue-ckpt", default=None,
                    help="official superpoint_lightglue.pth; enables the "
                         "LightGlue frame-to-frame matcher in the tracker "
                         "(reference SPmatcher::SearchBySP path)")
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--gt", default=None, help="TUM-format ground truth")
    ap.add_argument("--stats-out", default=None,
                    help="write run stats (n_kf, fps, ate_cm) as JSON")
    args = ap.parse_args(argv)

    settings = load_settings(args.settings, sensor=args.sensor)
    matcher = None
    if args.lightglue_ckpt:
        from ..models.lightglue import (LightGlueMatcher,
                                        LightGlueFrameMatcher,
                                        load_torch_weights as lg_weights)
        matcher = LightGlueFrameMatcher(
            LightGlueMatcher(params=lg_weights(args.lightglue_ckpt),
                             num_kpts=settings.n_features),
            settings.image_hw)
    slam = build_system(settings, matcher=matcher)

    seq = dataset.load_euroc_sequence(args.data_dir)
    paths = seq["image_paths"][: args.max_frames]
    t_cam = seq["t_cam"][: len(paths)]
    pf = dataset.ImagePrefetcher(paths, depth=8)
    stereo = "stereo" in args.sensor
    pf_r = None
    if stereo:
        paths_r = seq.get("right_image_paths", [])[: len(paths)]
        if len(paths_r) != len(paths):
            print("stereo sensor needs cam1/ in the sequence",
                  file=sys.stderr)
            return 1
        pf_r = dataset.ImagePrefetcher(paths_r, depth=8)

    h, w = settings.image_hw
    ext = SuperPointExtractor(
        params=(load_torch_weights(args.superpoint_ckpt)
                if args.superpoint_ckpt else None),
        image_hw=(h, w), max_keypoints=settings.n_features)

    imu_idx = 0
    t_imu = seq.get("t_imu")
    t0 = time.time()
    for i in range(len(paths)):
        img = pf.get(i).astype(np.float32) / 255.0
        if img.shape != (h, w):
            print(f"frame {i}: image {img.shape} != settings {(h, w)}",
                  file=sys.stderr)
            return 1
        if stereo:
            # Both eyes ride the batch dim of ONE SuperPoint call (the
            # reference spawns a second extraction thread, Frame.cc:142-146).
            img_r = pf_r.get(i).astype(np.float32) / 255.0
            rr = getattr(slam, "rectification", None)
            if rr is not None:
                # RAW rig: remap both eyes through the build-time maps
                # before extraction (reference src/System.cc:292-299).
                from rover_slam_tpu.geometry import rectify as _rect
                img = _rect.remap(jnp.asarray(img), jnp.asarray(rr.map1))
                img_r = _rect.remap(jnp.asarray(img_r),
                                    jnp.asarray(rr.map2))
                out = ext(jnp.stack([img, img_r]))
            else:
                out = ext(jnp.asarray(np.stack([img, img_r])))
        else:
            out = ext(jnp.asarray(img[None]))
        kpts = out["keypoints"][0]
        rays = cameras.unproject_jit(settings.cam_kind,
                                     jnp.asarray(slam.cam_params), kpts)
        if t_imu is not None and hasattr(slam, "feed_imu") and i > 0:
            while imu_idx < len(t_imu) and t_imu[imu_idx] <= t_cam[i]:
                # Feed RELATIVE time — track_frame gets t_rel below, and the
                # preintegrator differences IMU stamps against frame stamps.
                slam.feed_imu(seq["acc"][imu_idx], seq["gyro"][imu_idx],
                              float(t_imu[imu_idx] - t_cam[0]))
                imu_idx += 1
        t_rel = float(t_cam[i] - t_cam[0])
        if stereo:
            info = slam.track_stereo_frame(
                kpts, rays, out["descriptors"][0], out["valid"][0],
                out["keypoints"][1], out["descriptors"][1], out["valid"][1],
                t_rel)
        else:
            info = slam.track_frame(kpts, rays, out["descriptors"][0],
                                    out["valid"][0], t_rel)
        if i % 50 == 0:
            print(f"frame {i}/{len(paths)} state={info.get('state')} "
                  f"inliers={info.get('n_inliers')}", file=sys.stderr)
    wall = time.time() - t0
    pf.close()
    if pf_r is not None:
        pf_r.close()

    times_, Rs, ts = slam.get_trajectory()
    trajectory.save_tum(args.out, times_ + t_cam[0], Rs, ts)
    if settings.save_atlas:
        # Multi-session persistence (reference System::SaveAtlas on Shutdown,
        # src/System.cc:1476; reloaded via System.LoadAtlasFromFile).
        from ..map import atlas
        atlas.save_atlas(slam.state, settings.save_atlas)
        print(f"atlas -> {settings.save_atlas}", file=sys.stderr)
    print(f"{len(paths)} frames in {wall:.1f}s ({len(paths) / wall:.1f} fps); "
          f"trajectory -> {args.out}", file=sys.stderr)

    ate_cm = None
    if args.gt and len(times_) >= 2:
        gt_t, gt_p, _ = trajectory.load_tum(args.gt)
        est_pos = np.stack([-Rs[i].T @ ts[i] for i in range(len(times_))])
        pairs = trajectory.associate_by_time(times_ + t_cam[0], gt_t)
        e = np.stack([est_pos[i] for i, _ in pairs])
        g = np.stack([gt_p[j] for _, j in pairs])
        rmse, _ = trajectory.ate_rmse(e, g, with_scale="inertial" not in args.sensor)
        ate_cm = float(rmse * 100)
        print(f"ATE RMSE: {ate_cm:.2f} cm over {len(pairs)} poses")
    if args.stats_out:
        import json
        with open(args.stats_out, "w") as f:
            json.dump({"n_kf": int(slam.n_kf), "frames": len(paths),
                       "fps": len(paths) / wall, "ate_cm": ate_cm,
                       "n_loops": len(getattr(slam, "loop_events", [])),
                       "imu_ready": bool(getattr(slam, "imu_ready", False))},
                      f)
    return 0


if __name__ == "__main__":
    sys.exit(main())
