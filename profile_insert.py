"""Decompose the fused keyframe-insert program's device cost at bench shapes.

Times each stage of _insert_keyframe_body in isolation (non-donating jits on
a frozen snapshot state) so the 60-ms insert frames the loop profile shows
can be attributed: obs builds / covis / triangulation / fuse / distinctive
desc / local BA / stats+cull+normals+mask.
"""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import time
import functools
import numpy as np
import jax
import jax.numpy as jnp


def t_it(fn, *args, warmup=2, reps=10, **kw):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kw))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1000


def main():
    from rover_slam_tpu.map import atlas, map_state as ms
    from rover_slam_tpu.map import maintenance as mnt
    from rover_slam_tpu.slam import tracking as T
    from rover_slam_tpu.geometry import cameras
    from rover_slam_tpu.ops import association as assoc, scatterless

    # State snapshot saved by profile_loop.py (60 KFs, bench capacities).
    st = atlas.load_atlas("/tmp/probe_state.npz")
    st = jax.device_put(st)
    K, N, L = st.K, st.N, st.L
    print(f"state: K={K} N={N} L={L} n_kf={int(st.n_kf)} n_lm={int(st.n_lm)}")
    FX, H, W = 458.0, 480, 640
    cam = jnp.asarray(cameras.make_pinhole(FX, FX, W / 2.0, H / 2.0))
    cam_kind = cameras.PINHOLE

    kf_src = int(st.n_kf) - 1
    R = st.kf_R_cw[kf_src]; t = st.kf_t_cw[kf_src]
    kpts = st.kf_kpts[kf_src]; rays = st.kf_rays[kf_src]
    desc = st.kf_desc[kf_src]; valid = st.kf_kpt_valid[kf_src]
    lidx = st.kf_landmark_idx[kf_src]

    # --- full insert program (non-donated copy cost excluded by timing the
    # donated kernel on fresh copies and subtracting the copy) ---
    @jax.jit
    def copy_state(s):
        return jax.tree.map(lambda x: x + 0 if hasattr(x, "dtype") else x, s)
    t_copy = t_it(copy_state, st)
    print(f"state_copy_ms {t_copy:.2f}")

    def full(run_ba, ba_iters=2):
        stc = copy_state(st)
        return T._insert_keyframe_kernel(
            stc, R, t, kpts, rays, desc, valid, lidx,
            jnp.asarray(99.0, jnp.float32), jnp.asarray(kf_src, jnp.int32),
            cam, cam_kind, 8, 8, ba_iters, run_ba=run_ba)
    for name, kw in [("insert_full(ba2)", dict(run_ba=True, ba_iters=2)),
                     ("insert_full(ba1)", dict(run_ba=True, ba_iters=1)),
                     ("insert_noba", dict(run_ba=False))]:
        print(f"{name}_ms {t_it(lambda: full(**kw)) - t_copy:.2f}")

    # --- stages ---
    @jax.jit
    def obs_cov(s):
        obs = ms.observation_matrix(s)
        Wm = obs @ obs.T
        Wm = Wm * (1.0 - jnp.eye(s.K, dtype=Wm.dtype))
        ids, wts = ms.best_covisible(Wm, jnp.asarray(kf_src, jnp.int32), 2)
        return obs, ids, wts
    print(f"obs+covis_ms {t_it(obs_cov, st):.2f}")
    obs, ids, wts = jax.block_until_ready(obs_cov(st))

    @jax.jit
    def tri2(s):
        s, n0 = T._triangulate_pair_kernel_body(
            s, jnp.asarray(kf_src, jnp.int32),
            jnp.clip(ids[0], 0, s.K - 1), cam, cam_kind,
            (ids[0] >= 0) & (wts[0] >= 10))
        s, n1 = T._triangulate_pair_kernel_body(
            s, jnp.asarray(kf_src, jnp.int32),
            jnp.clip(ids[1], 0, s.K - 1), cam, cam_kind,
            (ids[1] >= 0) & (wts[1] >= 10))
        return s.lm_pos, n0, n1
    print(f"triangulate_x2_ms {t_it(lambda: tri2(st)):.2f}")

    @jax.jit
    def fuse(s):
        s2, a, b = mnt.fuse_into_keyframe(s, jnp.asarray(kf_src, jnp.int32),
                                          cam, cam_kind, obs=obs)
        return s2.lm_pos, a, b
    print(f"fuse_ms {t_it(lambda: fuse(st)):.2f}")

    @jax.jit
    def ddesc(s):
        return mnt.update_distinctive_descriptors(
            s, jnp.asarray(kf_src, jnp.int32), obs=obs).lm_desc
    print(f"distinctive_desc_ms {t_it(lambda: ddesc(st)):.2f}")

    @jax.jit
    def window(s):
        return T._covis_window(s, jnp.asarray(kf_src, jnp.int32), 8, 8)
    win, opt_mask = jax.block_until_ready(window(st))
    print(f"covis_window_ms {t_it(window, st):.2f}")

    for it in (1, 2, 4):
        tms = t_it(lambda it=it: T._local_ba_kernel(
            st, win, opt_mask, cam, cam_kind, it).lm_pos)
        print(f"local_ba_iters{it}_ms {tms:.2f}")

    @jax.jit
    def tail(s):
        uv_l, depth_l, visible_l = assoc.project_landmarks(
            s.lm_pos, s.lm_active, s.kf_R_cw[kf_src], s.kf_t_cw[kf_src],
            cam, cam_kind)
        li_kf = s.kf_landmark_idx[kf_src]
        found_l = scatterless.seg_any(li_kf, li_kf >= 0, s.L)
        s = mnt.update_found_visible(s, visible_l, found_l)
        obs2 = ms.observation_matrix(s)
        s = mnt.recount_lm_obs(s, obs=obs2)
        s = mnt.cull_landmarks(s)
        ow = obs2.astype(jnp.float32)
        n_obs_l = ow.sum(0)
        centers = -jnp.einsum("kji,kj->ki", s.kf_R_cw, s.kf_t_cw)
        sum_c = ow.T @ jnp.where(s.kf_active[:, None], centers, 0.0)
        dirs = s.lm_pos * n_obs_l[:, None] - sum_c
        nn = dirs / jnp.maximum(
            jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-9)
        w_row = obs2 @ obs2[kf_src]
        nbrs = (w_row > 0).at[kf_src].set(True)
        local_mask = ((nbrs.astype(jnp.float32) @ obs2) > 0) & s.lm_active
        return nn, local_mask, s.lm_found
    print(f"stats_cull_normals_mask_ms {t_it(tail, st):.2f}")


if __name__ == "__main__":
    main()
