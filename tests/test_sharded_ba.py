"""Distributed BA on a simulated 8-device CPU mesh (SURVEY.md §4: the multi-host
tests the reference never had)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rover_slam_tpu.optim import ba
from rover_slam_tpu.parallel import sharded_ba
from tests.test_ba import make_ba_problem, pose_errors


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_matches_single_device():
    prob, (R_true, t_true, X_true), _ = make_ba_problem(Kw=6, Lw=120,
                                                        noise_px=0.5)
    mesh = sharded_ba.make_mesh(8)
    R, t, X, costs = sharded_ba.solve_ba_sharded(prob, mesh, iters=10,
                                                 cg_iters=25)
    ref = ba.solve_ba(prob, iters=10, cg_iters=25, solver="pcg", phases=1)
    # Same basin, nearly identical result (reduction order differs).
    assert float(costs[-1]) < float(ref.cost_history[0])
    dt = np.linalg.norm(np.asarray(R) - np.asarray(ref.R_cw))
    assert dt < 1e-2
    ang, dte = pose_errors(R, t, R_true, t_true)
    assert ang.max() < 0.2
    assert dte.max() < 0.05


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_edge_padding():
    prob, _, _ = make_ba_problem(Kw=3, Lw=30, noise_px=0.3)
    # 90 edges do not divide by 8 -> padding path.
    assert len(prob.e_kf) % 8 != 0
    mesh = sharded_ba.make_mesh(8)
    R, t, X, costs = sharded_ba.solve_ba_sharded(prob, mesh, iters=5,
                                                 cg_iters=15)
    assert np.isfinite(np.asarray(costs)).all()
    assert float(costs[-1]) < float(costs[0])
