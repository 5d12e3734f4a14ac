"""Distributed-BA scaling benchmark: solve time vs mesh size, single- and
multi-process.

Measures the edge-sharded BA (parallel/sharded_ba.py) at 1/2/4/8 devices on
whatever backend is available (TPU chips if >1 visible; otherwise the virtual
CPU mesh — structure-correct, bandwidth-unrepresentative). Prints one JSON
line per mesh size (BASELINE metric: near-linear BA scaling at 1 chip / 1
host / 2+ hosts; real ICI numbers need a multi-chip slice — round 2).

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python bench_scaling.py                 # single-process sweep
  python bench_scaling.py --processes 2      # 2-process global mesh
      (spawns 2 workers x 4 CPU devices over jax.distributed/gloo — the
       DCN-analog path of parallel/multihost.py; reports from process 0)
"""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import json
import subprocess
import sys
import time

import numpy as np


def build_problem():
    """Deterministic synthetic BA problem (every process builds the same)."""
    import jax.numpy as jnp
    from rover_slam_tpu.geometry import lie, cameras
    from rover_slam_tpu.optim import ba

    rng = np.random.default_rng(0)
    Kw, Lw = 64, 8192
    obs_per_lm = 8
    cam = cameras.make_pinhole(458.654, 457.296, 367.215, 248.375)
    Xw = np.stack([rng.uniform(-8, 8, Lw), rng.uniform(-6, 6, Lw),
                   rng.uniform(5, 25, Lw)], 1).astype(np.float32)
    R_t, t_t = [], []
    for k in range(Kw):
        Rk, tk = lie.se3_exp(jnp.asarray(
            np.array([0.05 * k, 0.01 * k, 0, 0, 0.01 * k, 0], np.float32)))
        R_t.append(np.asarray(Rk)); t_t.append(np.asarray(tk))
    R_t, t_t = np.stack(R_t), np.stack(t_t)
    e_lm = np.repeat(np.arange(Lw), obs_per_lm).astype(np.int32)
    e_kf = rng.integers(0, Kw, len(e_lm)).astype(np.int32)
    Xc = np.einsum("eij,ej->ei", R_t[e_kf], Xw[e_lm]) + t_t[e_kf]
    uv = np.array(cameras.project(cameras.PINHOLE, jnp.asarray(cam),
                                  jnp.asarray(Xc)))
    uv += rng.normal(0, 0.5, uv.shape)
    ok = Xc[:, 2] > 0.2
    R0 = R_t.copy(); t0 = t_t.copy()
    for k in range(2, Kw):
        dR, dt = lie.se3_exp(jnp.asarray(
            rng.normal(0, 0.02, 6).astype(np.float32)))
        R0[k] = np.asarray(dR) @ R0[k]
        t0[k] = np.asarray(dR) @ t0[k] + np.asarray(dt)
    return ba.BAProblem(
        R_cw=jnp.asarray(R0), t_cw=jnp.asarray(t0),
        pose_opt_mask=jnp.asarray(np.arange(Kw) >= 2),
        lm_pos=jnp.asarray(Xw + rng.normal(0, 0.05, Xw.shape)
                           .astype(np.float32)),
        lm_opt_mask=jnp.ones(Lw, bool), cam_params=jnp.asarray(cam),
        e_kf=jnp.asarray(e_kf), e_lm=jnp.asarray(e_lm),
        e_uv=jnp.asarray(uv, jnp.float32), e_valid=jnp.asarray(ok),
        e_info=jnp.ones(len(e_kf), jnp.float32))


def single_process_sweep():
    import jax
    from rover_slam_tpu.parallel import sharded_ba

    prob = build_problem()
    n_edges = int(prob.e_kf.shape[0])
    n_dev = len(jax.devices())
    results = []
    for n in [1, 2, 4, 8]:
        if n > n_dev:
            break
        mesh = sharded_ba.make_mesh(n)
        run = lambda: sharded_ba.solve_ba_sharded(prob, mesh, iters=6,
                                                  cg_iters=15)
        jax.block_until_ready(run())              # compile
        t0_ = time.perf_counter()
        reps = 3
        for _ in range(reps):
            out = jax.block_until_ready(run())
        dt_ms = (time.perf_counter() - t0_) / reps * 1000
        results.append({"devices": n, "ms": round(dt_ms, 1)})
        print(json.dumps({
            "metric": "sharded_ba_ms", "value": round(dt_ms, 1), "unit": "ms",
            "devices": n, "edges": n_edges,
            "backend": jax.default_backend(),
            "speedup_vs_1dev": round(results[0]["ms"] / dt_ms, 2),
        }))
        # Landmark-sharded variant (variables sharded; psum volume O(K) not
        # O(K+L)) — the map-scale configuration.
        run_lm = lambda: sharded_ba.solve_ba_sharded_lm(prob, mesh, iters=6,
                                                        cg_iters=15)
        jax.block_until_ready(run_lm())
        t0_ = time.perf_counter()
        for _ in range(reps):
            jax.block_until_ready(run_lm())
        dt_lm = (time.perf_counter() - t0_) / reps * 1000
        print(json.dumps({
            "metric": "lm_sharded_ba_ms", "value": round(dt_lm, 1),
            "unit": "ms", "devices": n, "edges": n_edges,
            "backend": jax.default_backend(),
        }))
    return results


def multihost_worker(pid: int, nproc: int, port: str):
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=nproc, process_id=pid)
    from rover_slam_tpu.parallel import multihost

    prob = build_problem()
    mesh = multihost.global_mesh()
    run = lambda: multihost.solve_ba_multihost(prob, mesh, iters=6,
                                               cg_iters=15)
    jax.block_until_ready(run())
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        jax.block_until_ready(run())
    dt_ms = (time.perf_counter() - t0) / reps * 1000
    if pid == 0:
        print(json.dumps({
            "metric": "sharded_ba_ms_multiprocess", "value": round(dt_ms, 1),
            "unit": "ms", "processes": nproc,
            "devices": len(jax.devices()),
            "edges": int(prob.e_kf.shape[0]),
            "backend": "cpu+gloo (DCN-analog)",
        }), flush=True)


def spawn_multihost(nproc: int):
    port = "29531"
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.abspath(__file__))
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--worker", str(pid),
         str(nproc), port], env=env)
        for pid in range(nproc)]
    rc = [p.wait() for p in procs]
    if any(rc):
        raise SystemExit(f"multihost workers failed: {rc}")


if __name__ == "__main__":
    if "--worker" in sys.argv:
        i = sys.argv.index("--worker")
        multihost_worker(int(sys.argv[i + 1]), int(sys.argv[i + 2]),
                         sys.argv[i + 3])
    elif "--processes" in sys.argv:
        spawn_multihost(int(sys.argv[sys.argv.index("--processes") + 1]))
    else:
        single_process_sweep()
