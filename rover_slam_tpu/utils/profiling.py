"""Device-level tracing: the REGISTER_TIMES / xprof side of observability.

The reference instruments per-stage wall clock with compile-gated vectors
(reference: src/Tracking.cc:288-553 REGISTER_TIMES). Host-side stage timers
live in utils/timing.py with the same stage taxonomy; this module adds the
device view: jax.profiler traces (viewable with xprof/tensorboard) and named
host annotations that show up inside the trace timeline.

Usage:
    from rover_slam_tpu.utils.profiling import device_trace, annotate
    with device_trace("/tmp/slam_trace"):
        with annotate("track_frame"):
            slam.track_frame(...)
"""
from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def device_trace(logdir: str = "/tmp/rover_slam_trace"):
    """Capture a device+host profiler trace into `logdir` (xprof format)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named host span, visible on the trace timeline alongside device ops."""
    return jax.profiler.TraceAnnotation(name)


def step_annotate(name: str, step_num: int):
    """Frame/step-scoped annotation (xprof groups device ops per step)."""
    return jax.profiler.StepTraceAnnotation(name, step_num=step_num)
