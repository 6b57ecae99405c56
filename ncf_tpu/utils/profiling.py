"""Profiling: step timing, throughput counters, device trace capture.

TPU-native equivalent of the reference's wall-clock instrumentation
(reference: src/model/trainer.py:257-259, 274-286 forward/backward
timing; :304-324 tqdm postfix + periodic stat logs; config mentions
Vertex TensorBoard, config.yaml:43-45, but never writes to it).  Here:
``StepTimer`` for honest device-inclusive step timing, and ``trace`` for
real ``jax.profiler`` capture that TensorBoard/XProf can open.

Timing note (this matters on axon-tunneled TPUs): independent dispatches
overlap, so ``StepTimer`` must wrap calls whose outputs feed the next
call's inputs (the train step does: params chain through).  For
standalone ops use chained/scan timing (scripts/bench_kernels.py).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax


@dataclass
class StepTimer:
    """Rolling step-time/throughput tracker.

    Usage::
        timer = StepTimer(batch_size=8192)
        for batch in data:
            state = step(state, batch)
            timer.tick()                      # cheap; no device sync
        stats = timer.stats(block_on=state)   # syncs once, then reports
    """

    batch_size: int = 0
    window: int = 100
    _times: List[float] = field(default_factory=list)
    _t_last: Optional[float] = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._t_last is not None:
            self._times.append(now - self._t_last)
            if len(self._times) > self.window:
                self._times = self._times[-self.window:]
        self._t_last = now

    def reset(self) -> None:
        self._times.clear()
        self._t_last = None

    def stats(self, block_on=None) -> Dict[str, float]:
        if block_on is not None:
            jax.block_until_ready(block_on)
            self.tick()
        if not self._times:
            return {"steps": 0}
        times = sorted(self._times)
        mean = sum(times) / len(times)
        out = {
            "steps": float(len(times)),
            "step_ms_mean": mean * 1e3,
            "step_ms_p50": times[len(times) // 2] * 1e3,
            "step_ms_p99": times[min(len(times) - 1,
                                     int(len(times) * 0.99))] * 1e3,
        }
        if self.batch_size:
            out["examples_per_s"] = self.batch_size / mean
        return out


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device profile trace viewable in TensorBoard/XProf
    (the TensorBoard integration the reference configured but never
    wired, config.yaml:43-45)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace span for the profiler timeline."""
    return jax.profiler.TraceAnnotation(name)
