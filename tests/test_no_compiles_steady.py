"""Compile-free steady state: after warmup + precompile(), the product loop
must dispatch ZERO fresh XLA compiles — through loop detection, verification,
hypothesis confirmation, correction, and the chunked GBA.

Round-4 verdict weak #1: the bench's 8 fps headline was a TAIL artifact —
median frame 8.6 ms but eager-glue XLA compiles fired INSIDE the timed region
at the first gated verification (this platform's remote-relay compiles cost
seconds to minutes and the persistent cache is unavailable). precompile() is
the deployment answer; this test is what keeps it complete: any program
missing from it shows up here as a counted backend compile.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rover_slam_tpu.slam.system import MonocularSLAM
from rover_slam_tpu.slam import tracking as T
from rover_slam_tpu.slam.loop_closing import LoopConfig
from rover_slam_tpu.slam.tracking import TrackerConfig
from rover_slam_tpu.utils import synthetic

pytestmark = pytest.mark.slow

_COMPILES = []
_ARMED = [False]


def _listener(event, duration, **kw):
    if _ARMED[0] and event == "/jax/core/compile/backend_compile_duration":
        _COMPILES.append(kw)


jax.monitoring.register_event_duration_secs_listener(_listener)


def test_steady_state_compile_free():
    world = synthetic.ring_world(n_landmarks=6000, desc_dim=64, seed=0)
    R_gt, t_gt, times = synthetic.orbit_trajectory(n_frames=100, revs=1.25)
    frames = synthetic.render_sequence(world, R_gt, t_gt, times, n_kpts=512,
                                       pix_noise=0.5, desc_noise=0.05)
    # strong_fire_proj=0: force the TEMPORAL-CONSISTENCY path (hypothesis
    # re-verification) so this test exercises and warms every program in the
    # chain — the strong-verification fast path would skip it.
    slam = MonocularSLAM(world.cam_params, map_capacity=(128, 512, 16384),
                         desc_dim=64, enable_loop_closing=True,
                         config=TrackerConfig(local_map_only=True),
                         loop_config=LoopConfig(min_covis_weight=20,
                                                strong_fire_proj=0),
                         pipeline=2)
    # Warmup: bootstrap + the whole per-frame program set compiles here. The
    # split point (65%) is before any verification/hypothesis/correction
    # fires on this scene (the revisit begins ~frame 80).
    n_warm = 65
    for f in frames[:n_warm]:
        slam.track_frame(f.kpts, f.rays, f.desc, f.valid, f.time)
    assert not slam.loop_events, "warmup must not consume the loop closure"
    slam.flush()
    slam.precompile()

    _ARMED[0] = True
    try:
        for f in frames[n_warm:]:
            slam.track_frame(f.kpts, f.rays, f.desc, f.valid, f.time)
        slam.flush()
    finally:
        _ARMED[0] = False

    # The scripted region must exercise the FULL event chain...
    assert slam.tracking_state == T.OK
    assert len(slam.loop_events) >= 1, "loop closure did not fire"
    lc = slam.loop_closer
    assert any(d for (_, _, _, d) in lc.score_log), "no gated dispatch"
    assert lc.hyp_log, "no hypothesis confirmation ran"
    # ...and do it without a single fresh XLA program.
    assert not _COMPILES, (
        f"{len(_COMPILES)} XLA compiles fired in the steady state "
        f"(precompile() is incomplete): {_COMPILES[:5]}")
