"""Throughput counters and profiler hooks.

The reference has no timers or profiler integration (SURVEY.md §5).  Here:
`StepMeter` tracks SVGD steps/sec and HMM Msites/sec (the north-star
metric), and `trace()` wraps a block in a jax.profiler trace for offline
inspection with TensorBoard/xprof.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field


@dataclass
class StepMeter:
    """Running throughput over the training loop.

    sites_per_step: observation columns visited per SVGD step
        (= particles x minibatch x chunk length for the HMM term).
    """

    sites_per_step: float = 0.0
    _t0: float = field(default_factory=time.perf_counter)
    _steps: int = 0
    _last_rate: float = 0.0

    def tick(self, n: int = 1) -> None:
        self._steps += n

    @property
    def steps_per_sec(self) -> float:
        dt = time.perf_counter() - self._t0
        return self._steps / dt if dt > 0 else 0.0

    @property
    def msites_per_sec(self) -> float:
        return self.steps_per_sec * self.sites_per_step / 1e6

    def summary(self) -> str:
        return (
            f"{self._steps} steps, {self.steps_per_sec:.2f} it/s, "
            f"{self.msites_per_sec:.0f} Msites/s"
        )


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/phlash_tpu_trace"):
    "Profile the enclosed block with jax.profiler (view with xprof/TensorBoard)."
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
