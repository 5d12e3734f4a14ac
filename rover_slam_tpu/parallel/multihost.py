"""Multi-host (multi-process) distribution: the DCN-analog execution path.

The reference is one process with pthreads and no collective communication at
all (SURVEY.md §2.3). Here the BA factor graph can span processes:
`jax.distributed` wires N processes into ONE global device mesh, each process
contributes its addressable shard of the edge arrays, and the reduced-system
assembly runs the exact same one-psum-per-matvec program as the single-host
sharded solver (`parallel/sharded_ba.py`) — XLA routes the collective over
ICI within a host and DCN across hosts, nothing in the solver changes.

On real pods: start one process per host with
  initialize(coordinator="<host0>:<port>", num_processes=N, process_id=i)
before first JAX use. For CI this module is exercised with multiple CPU
processes on one machine (gloo collectives) — see tests/test_multihost.py.
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..optim import ba as ba_mod
from . import sharded_ba


def initialize(coordinator: str, num_processes: int, process_id: int):
    """Join this process into the global JAX cluster. Must be called before
    the first JAX backend use in the process."""
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def global_mesh(axis: str = "edges") -> Mesh:
    """1-D mesh over ALL devices of ALL processes."""
    return Mesh(np.array(jax.devices()), (axis,))


def put_global(arr, mesh: Mesh, spec: P):
    """Build a global (possibly non-fully-addressable) device array from a
    full host-local copy. Every process holds the same full `arr` (the SLAM
    host state is replicated across hosts); each contributes only the shards
    its devices own. None fields (optional problem extensions, e.g. the
    stereo observations) pass through untouched."""
    if arr is None:
        return None
    arr = np.asarray(arr)
    return jax.make_array_from_callback(
        arr.shape, NamedSharding(mesh, spec if spec is not None else P()),
        lambda idx: arr[idx])


def put_problem(prob: ba_mod.BAProblem, mesh: Mesh,
                axis: str = "edges") -> ba_mod.BAProblem:
    """Distribute a BAProblem over the global mesh: edge arrays sharded on
    `axis`, variable blocks replicated. Pads edges host-side first so the
    in-solver padding is a no-op (global arrays cannot be padded outside
    jit)."""
    prob = sharded_ba.pad_edges_to(prob, mesh.devices.size)
    specs = ba_mod.BAProblem(
        R_cw=P(), t_cw=P(), pose_opt_mask=P(), lm_pos=P(), lm_opt_mask=P(),
        cam_params=P(),
        e_kf=P(axis), e_lm=P(axis), e_uv=P(axis), e_valid=P(axis),
        e_info=P(axis), e_invd=(None if prob.e_invd is None else P(axis)),
        bf=(None if prob.bf is None else P()))
    return ba_mod.BAProblem(*[put_global(a, mesh, s)
                              for a, s in zip(prob, specs)])


def solve_ba_multihost(prob: ba_mod.BAProblem, mesh: Mesh | None = None,
                       lm_sharded: bool = False, **kw):
    """Edge-sharded LM-PCG BA over the global (multi-process) mesh.
    Same numerics as solve_ba_sharded; returns replicated outputs every
    process can read.

    lm_sharded=True uses solve_ba_sharded_lm: landmark variables sharded
    across the global mesh (landmark math entirely node-local, only the pose
    vector crosses DCN) — the map-scale configuration. The returned lm_pos is
    then itself a sharded global array."""
    mesh = mesh if mesh is not None else global_mesh()
    if lm_sharded:
        axis = mesh.axis_names[0]
        prob, Ls = sharded_ba.partition_by_landmark(prob, mesh.devices.size)
        specs = ba_mod.BAProblem(
            R_cw=P(), t_cw=P(), pose_opt_mask=P(),
            lm_pos=P(axis), lm_opt_mask=P(axis), cam_params=P(),
            e_kf=P(axis), e_lm=P(axis), e_uv=P(axis), e_valid=P(axis),
            e_info=P(axis),
            e_invd=(None if prob.e_invd is None else P(axis)),
            bf=(None if prob.bf is None else P()))
        gprob = ba_mod.BAProblem(*[put_global(a, mesh, s)
                                   for a, s in zip(prob, specs)])
        return sharded_ba._solve_partitioned_lm(gprob, mesh, Ls, **kw)
    gprob = put_problem(prob, mesh)
    return sharded_ba.solve_ba_sharded(gprob, mesh, **kw)
