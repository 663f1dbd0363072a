"""Profiling and numerics-debugging hooks.

The reference has no tracing at all (SURVEY.md §5: wall-clock prints only,
nerf_utils.py:283,295) and hides a commented-out anomaly detector
(run_nerf_helpers.py:3) plus DEBUG nan scans (nerf_utils.py:729-731).
Here both are first-class:

- ``StepTimer``: cheap steady-state rays/sec/chip accounting (the repo's
  north-star metric) with warmup exclusion; logged via MetricsLogger.
- ``trace``: context manager around ``jax.profiler`` producing a
  TensorBoard-loadable trace directory for kernel-level inspection.
- ``enable_nan_debugging``: turns on jax debug_nans (the TPU analog of the
  reference's DEBUG nan/inf scan — errors at the op that produced the NaN).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator


class StepTimer:
    """Steady-state throughput meter: call tick() once per step."""

    def __init__(self, rays_per_step: int, warmup: int = 10):
        self.rays_per_step = rays_per_step
        self.warmup = warmup
        self._count = 0
        self._t0: float | None = None

    def tick(self) -> None:
        self._count += 1
        if self._count == self.warmup:
            self._t0 = time.perf_counter()

    @property
    def steps_per_sec(self) -> float:
        if self._t0 is None or self._count <= self.warmup:
            return 0.0
        return (self._count - self.warmup) / (time.perf_counter() - self._t0)

    @property
    def rays_per_sec(self) -> float:
        return self.steps_per_sec * self.rays_per_step

    def metrics(self) -> dict[str, float]:
        sps = self.steps_per_sec  # snapshot once: the property reads the clock
        return {
            "steps_per_sec": sps,
            "rays_per_sec": sps * self.rays_per_step,
        }


@contextlib.contextmanager
def trace(logdir: str | None) -> Iterator[None]:
    """jax.profiler trace for the enclosed region (no-op when logdir None)."""
    if logdir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_nan_debugging() -> None:
    """Fail loudly at the op producing a NaN (reference DEBUG-scan analog).

    NB: rays that miss the DepthNet bounding sphere produce NaNs BY DESIGN
    (reference utils.py:159-217); enable this only on scenes whose cameras
    keep every ray inside the sphere, or when hunting a genuine numerics bug.
    """
    import jax

    jax.config.update("jax_debug_nans", True)
