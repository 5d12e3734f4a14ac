"""Per-stage wall-clock instrumentation.

Replicates the reference's REGISTER_TIMES stage taxonomy
(reference: src/Tracking.cc:288-553 vdORBExtract_ms/vdIMUInteg_ms/vdPosePred_ms/
vdLMTrack_ms/vdNewKF_ms + LBA stats in src/LocalMapping.cc:113-126) so per-stage
numbers stay comparable. Stage names: extract, imu_preint, pose_pred, lm_track,
new_kf, triangulate, local_ba, place_recog, loop_correct, gba.
"""
from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager


class StageTimers:
    def __init__(self):
        self.samples = defaultdict(list)

    @contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.samples[name].append((time.perf_counter() - t0) * 1000.0)

    def add(self, name: str, ms: float):
        self.samples[name].append(ms)

    def summary(self) -> dict:
        out = {}
        for k, v in self.samples.items():
            if v:
                import numpy as np
                a = np.asarray(v)
                out[k] = {"mean_ms": float(a.mean()),
                          "median_ms": float(np.median(a)),
                          "max_ms": float(a.max()),
                          "count": len(v)}
        return out

    def report(self) -> str:
        lines = ["stage              mean_ms  median_ms  max_ms  count"]
        for k, s in sorted(self.summary().items()):
            lines.append(f"{k:<18} {s['mean_ms']:8.2f} {s['median_ms']:9.2f} "
                         f"{s['max_ms']:7.1f} {s['count']:6d}")
        return "\n".join(lines)
