"""Stereo rectification (reference src/Settings.cc:560-575 map construction +
src/System.cc:292-299 remap before TrackStereo): raw distorted, non-coplanar
stereo observations must become row-aligned with correct depths, and a
synthetic UNRECTIFIED stereo sequence must track through the full stereo
path after feature-space rectification."""
import numpy as np
import jax.numpy as jnp
import pytest

from rover_slam_tpu.geometry import rectify, lie, cameras
from rover_slam_tpu.slam.stereo import stereo_match_kernel, StereoSLAM
from rover_slam_tpu.slam import tracking as T
from rover_slam_tpu.utils import synthetic


# A mildly misaligned EuRoC-like rig: right camera 1 deg off about y and z,
# radtan distortion on both sides.
K1 = np.array([458.0, 457.0, 367.0, 248.0])
D1 = np.array([-0.28, 0.07, 2e-4, 1.8e-5])
K2 = np.array([457.5, 456.5, 379.0, 255.0])
D2 = np.array([-0.28, 0.07, -1e-4, 2e-5])
R_21 = np.asarray(lie.so3_exp(jnp.asarray([0.004, -0.017, 0.008])))
T_21 = np.array([-0.11, 0.0005, -0.0007])     # x_right = R x_left + t
HW = (480, 640)


def _raw_project(Xc, K, D):
    xy = Xc[:, :2] / Xc[:, 2:3]
    xyd = rectify.radtan_distort(xy, D)
    return np.stack([xyd[:, 0] * K[0] + K[2], xyd[:, 1] * K[1] + K[3]],
                    axis=-1)


def test_maps_identity_when_already_rectified():
    rr = rectify.stereo_rectify_maps(
        K1, np.zeros(4), K1, np.zeros(4), np.eye(3),
        np.array([-0.11, 0.0, 0.0]), HW)
    m1, R1 = rr.map1, rr.R1
    # Identity extrinsics + zero distortion: the map is a pure reprojection
    # K_raw K_new^-1 — straight lines stay straight and rows stay rows.
    assert np.allclose(R1, np.eye(3), atol=1e-6)
    v = m1[:, :, 1]
    assert np.abs(np.diff(v, axis=1)).max() < 1e-3     # rows flat


def test_epipolar_alignment_and_depth():
    rng = np.random.default_rng(3)
    X = rng.uniform([-2, -1.5, 3.0], [2, 1.5, 8.0], (500, 3))
    uv1_raw = _raw_project(X, K1, D1)
    X2 = X @ R_21.T + T_21
    uv2_raw = _raw_project(X2, K2, D2)
    rr = rectify.stereo_rectify_maps(K1, D1, K2, D2, R_21, T_21, HW)
    K_new, bf, R1, R2r = rr.K_new, rr.bf_px, rr.R1, rr.R2
    uv1 = np.asarray(rectify.rectify_points(
        jnp.asarray(uv1_raw), jnp.asarray(K1), jnp.asarray(D1),
        jnp.asarray(R1), jnp.asarray(K_new)))
    uv2 = np.asarray(rectify.rectify_points(
        jnp.asarray(uv2_raw), jnp.asarray(K2), jnp.asarray(D2),
        jnp.asarray(R2r), jnp.asarray(K_new)))
    # Row-aligned to sub-pixel...
    drow = np.abs(uv1[:, 1] - uv2[:, 1])
    assert np.median(drow) < 0.1 and drow.max() < 0.6, drow.max()
    # ...and disparity encodes metric depth (in the rectified left frame).
    Xr = X @ np.asarray(R1).T
    disp = uv1[:, 0] - uv2[:, 0]
    depth = bf / np.maximum(disp, 1e-6)
    rel = np.abs(depth - Xr[:, 2]) / Xr[:, 2]
    assert np.median(rel) < 0.005, np.median(rel)


def test_remap_consistent_with_point_rectification():
    """Image remap and feature-space rectification must agree: a bright dot
    rendered at a raw projection must land at the rectified projection."""
    rr = rectify.stereo_rectify_maps(K1, D1, K2, D2, R_21, T_21, HW)
    m1, K_new, R1 = rr.map1, rr.K_new, rr.R1
    X = np.array([[0.5, -0.2, 4.0], [-0.8, 0.4, 6.0], [0.1, 0.6, 3.2]])
    uv_raw = _raw_project(X, K1, D1)
    img = np.zeros(HW, np.float32)
    for u, v in uv_raw:
        img[int(round(v)), int(round(u))] = 1.0
    out = np.asarray(rectify.remap(jnp.asarray(img), jnp.asarray(m1)))
    uv_rect = np.asarray(rectify.rectify_points(
        jnp.asarray(uv_raw), jnp.asarray(K1), jnp.asarray(D1),
        jnp.asarray(R1), jnp.asarray(K_new)))
    for u, v in uv_rect:
        ui, vi = int(round(u)), int(round(v))
        patch = out[max(vi - 2, 0):vi + 3, max(ui - 2, 0):ui + 3]
        assert patch.max() > 0.15, (u, v)


@pytest.mark.slow
def test_unrectified_stereo_tracks_e2e():
    """Full stereo path on an UNRECTIFIED synthetic rig: raw distorted
    observations in both cameras -> feature-space rectification ->
    stereo_match_kernel depths -> StereoSLAM tracking stays OK with metric
    scale (round-4 verdict missing #5)."""
    world = synthetic.make_world(n_landmarks=4000, desc_dim=32, seed=5)
    R_gt, t_gt, times = synthetic.forward_trajectory(n_frames=12, dt=0.1,
                                                     speed=0.5)
    rr = rectify.stereo_rectify_maps(K1, D1, K2, D2, R_21, T_21, HW)
    K_new, bf, R1, R2r = rr.K_new, rr.bf_px, rr.R1, rr.R2

    cam_new = cameras.make_pinhole(*K_new)
    cfg = T.TrackerConfig(min_init_matches=30, image_hw=HW)
    slam = StereoSLAM(cam_new, baseline=float(bf / K_new[0]),
                      config=cfg, map_capacity=(32, 512, 8192), desc_dim=32)
    rng = np.random.default_rng(0)
    pos = np.asarray(world.landmarks)
    desc = np.asarray(world.desc)
    N = 512
    for i in range(len(times)):
        # Raw observations in each PHYSICAL camera (left = world pose).
        Rl, tl = R_gt[i], t_gt[i]
        Xl = pos @ Rl.T + tl
        Xr = Xl @ R_21.T + T_21
        vis = (Xl[:, 2] > 0.5) & (Xr[:, 2] > 0.5)
        uvl_raw = _raw_project(np.where(vis[:, None], Xl, 1.0), K1, D1)
        uvr_raw = _raw_project(np.where(vis[:, None], Xr, 1.0), K2, D2)
        inb = (vis & (uvl_raw[:, 0] > 5) & (uvl_raw[:, 0] < 635)
               & (uvl_raw[:, 1] > 5) & (uvl_raw[:, 1] < 475)
               & (uvr_raw[:, 0] > 5) & (uvr_raw[:, 0] < 635)
               & (uvr_raw[:, 1] > 5) & (uvr_raw[:, 1] < 475))
        ids = rng.permutation(np.nonzero(inb)[0])[:N]
        n = len(ids)
        kl = np.zeros((N, 2), np.float32)
        kr = np.zeros((N, 2), np.float32)
        dl = np.zeros((N, desc.shape[1]), np.float32)
        valid = np.zeros((N,), bool)
        kl[:n] = uvl_raw[ids] + rng.normal(0, 0.3, (n, 2))
        kr[:n] = uvr_raw[ids] + rng.normal(0, 0.3, (n, 2))
        dl[:n] = desc[ids] + rng.normal(0, 0.05, (n, desc.shape[1]))
        dl /= np.maximum(np.linalg.norm(dl, axis=1, keepdims=True), 1e-9)
        valid[:n] = True
        # Feature-space rectification (the product's cheap path).
        kl_r = rectify.rectify_points(jnp.asarray(kl), jnp.asarray(K1),
                                      jnp.asarray(D1), jnp.asarray(R1),
                                      jnp.asarray(K_new))
        kr_r = rectify.rectify_points(jnp.asarray(kr), jnp.asarray(K2),
                                      jnp.asarray(D2), jnp.asarray(R2r),
                                      jnp.asarray(K_new))
        rays = cameras.unproject_jit(cameras.PINHOLE, jnp.asarray(cam_new),
                                     kl_r)
        slam.track_stereo_frame(kl_r, rays, jnp.asarray(dl),
                                jnp.asarray(valid), kr_r, jnp.asarray(dl),
                                jnp.asarray(valid), times[i])
    assert slam.tracking_state == T.OK
    assert slam.n_kf >= 2
    # Metric scale: estimated translation magnitude matches ground truth
    # (stereo fixes scale; the rig moved 0.05 m/frame in the rectified-left
    # frame, same magnitude as the raw-left frame).
    est_t, est_R, est_tcw = slam.get_trajectory()
    pos_est = np.stack([-est_R[i].T @ est_tcw[i] for i in range(len(est_t))])
    pos_gt = np.stack([-R_gt[i].T @ t_gt[i] for i in range(len(times))])
    d_est = np.linalg.norm(pos_est[-1] - pos_est[0])
    d_gt = np.linalg.norm(pos_gt[-1] - pos_gt[0])
    assert abs(d_est - d_gt) / d_gt < 0.1, (d_est, d_gt)


def test_config_builds_rectification():
    """A EuRoC-style RAW stereo YAML (distortion + Stereo.T_c1_c2) must come
    out of build_system as a rectified-frame StereoSLAM carrying the maps
    (reference Settings constructor path, src/Settings.cc:560-575)."""
    from rover_slam_tpu.utils import config as C
    T_12 = np.eye(4)
    T_12[:3, :3] = np.asarray(R_21).T
    T_12[:3, 3] = -np.asarray(R_21).T @ T_21
    d = {"Camera.type": "PinHole",
         "Camera1.fx": float(K1[0]), "Camera1.fy": float(K1[1]),
         "Camera1.cx": float(K1[2]), "Camera1.cy": float(K1[3]),
         "Camera1.k1": float(D1[0]), "Camera1.k2": float(D1[1]),
         "Camera1.p1": float(D1[2]), "Camera1.p2": float(D1[3]),
         "Camera2.fx": float(K2[0]), "Camera2.fy": float(K2[1]),
         "Camera2.cx": float(K2[2]), "Camera2.cy": float(K2[3]),
         "Camera2.k1": float(D2[0]), "Camera2.k2": float(D2[1]),
         "Camera2.p1": float(D2[2]), "Camera2.p2": float(D2[3]),
         "Camera.width": 640, "Camera.height": 480,
         "Stereo.T_c1_c2": {"data": T_12.reshape(-1).tolist()},
         "ORBextractor.nFeatures": 256,
         "System.MapKeyFrames": 16, "System.MapLandmarks": 2048,
         "loopClosing": 0}
    st = C.load_settings(d, sensor="stereo")
    assert st.rectification is not None
    assert st.rectification.map1.shape == (480, 640, 2)
    slam = C.build_system(st)
    assert getattr(slam, "rectification", None) is not None
    # System runs at the rectified intrinsics, metric baseline preserved.
    assert abs(float(slam.cam_params[0]) - st.rectification.K_new[0]) < 1e-4
    assert abs(slam.baseline - np.linalg.norm(T_21)) / np.linalg.norm(T_21) \
        < 1e-3
