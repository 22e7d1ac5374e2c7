"""Stage timers and throughput accounting.

The reference tracks wall-clock per pipeline stage in a ``time_metrics``
dict and prints FPS / FPS-without-IO (MC3D_crop_tracker.py:168-181,
1301-1308). Same capability here, plus a jax.profiler trace hook.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List


class StageTimers:
    def __init__(self, stages: List[str]):
        self.acc: Dict[str, float] = {s: 0.0 for s in stages}

    @contextlib.contextmanager
    def __call__(self, stage: str):
        start = time.time()
        try:
            yield
        finally:
            self.acc[stage] = self.acc.get(stage, 0.0) + time.time() - start

    def totals(self) -> Dict[str, float]:
        return dict(self.acc)

    def fps_without(self, n_frames: int, wall: float, exclude=("load", "plot")) -> float:
        excluded = sum(self.acc.get(s, 0.0) for s in exclude)
        return n_frames / max(wall - excluded, 1e-9)


@contextlib.contextmanager
def device_trace(logdir: str):
    """jax.profiler trace around a block (view in TensorBoard/XProf)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
