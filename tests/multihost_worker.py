"""Worker process for tests/test_multihost.py: joins the jax.distributed
cluster, solves the shared synthetic BA problem over the global multi-process
mesh, and (process 0) writes the result for the parent to check.

Usage: python multihost_worker.py <process_id> <num_processes> <port> <out.npz>
"""
import os
import sys

pid, nproc, port, out = (int(sys.argv[1]), int(sys.argv[2]), sys.argv[3],
                         sys.argv[4])
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=pid)

import numpy as np  # noqa: E402

from rover_slam_tpu.parallel import multihost  # noqa: E402
from tests.test_ba import make_ba_problem  # noqa: E402

# Every process builds the SAME problem (deterministic seed) — the SLAM host
# state is replicated across hosts; only device work is sharded.
prob, (R_true, t_true, X_true), _ = make_ba_problem(Kw=6, Lw=120, noise_px=0.5)
mesh = multihost.global_mesh()
assert len(jax.devices()) == 4 * nproc, len(jax.devices())
R, t, X, costs = multihost.solve_ba_multihost(prob, mesh, iters=10,
                                              cg_iters=25)
# Landmark-sharded (map-scale) mode: landmark math node-local, only the
# pose vector crosses the process boundary.
R2, t2, X2, costs2 = multihost.solve_ba_multihost(prob, mesh, lm_sharded=True,
                                                  iters=10, cg_iters=25)
if pid == 0:
    np.savez(out, R=np.asarray(R), t=np.asarray(t), X=np.asarray(X),
             costs=np.asarray(costs), n_global_devices=len(jax.devices()),
             R_lm=np.asarray(R2), costs_lm=np.asarray(costs2))
print(f"[worker {pid}] done, cost {float(np.asarray(costs)[-1]):.4f}",
      flush=True)
