"""Tracing / profiling: step timing and XLA profiler hooks.

Reference analog (SURVEY.md §5.1): paired ``torch.cuda.Event`` wall timing
per iteration (train.py:48-49,76,107,120) plus tqdm. TPU-native version:
host wall clock around ``block_until_ready`` plus optional ``jax.profiler``
traces (inspect with xprof/tensorboard), and throughput counters in the
units BASELINE.json scores (pixels/s/chip).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field


@dataclass
class StepTimer:
    """Exponential-moving-average step timer with throughput accounting.

    With JAX async dispatch, only iterations that pull a value to the host
    block on real compute; the in-between ones time near-zero dispatch and
    the blocking one absorbs all their work. Callers mark which stops are
    synchronizing (``stop(synced=...)``): the EMA is fed only at sync points
    with the *per-step average* since the previous sync, so ``ema_s`` is a
    true per-step time for any sync cadence.
    """

    ema_decay: float = 0.9
    ema_s: float = 0.0
    last_s: float = 0.0
    total_s: float = 0.0
    steps: int = 0
    _t0: float = field(default=0.0, repr=False)
    _accum_s: float = field(default=0.0, repr=False)
    _accum_steps: int = field(default=0, repr=False)
    _ema_seeded: bool = field(default=False, repr=False)

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, synced: bool = True) -> float:
        dt = time.perf_counter() - self._t0
        self.last_s = dt
        self.total_s += dt
        self.steps += 1
        self._accum_s += dt
        self._accum_steps += 1
        if synced:
            per_step = self._accum_s / self._accum_steps
            self.ema_s = per_step if not self._ema_seeded else (
                self.ema_decay * self.ema_s + (1.0 - self.ema_decay) * per_step
            )
            self._ema_seeded = True
            self._accum_s = 0.0
            self._accum_steps = 0
        return dt

    def pixels_per_s(self, pixels_per_step: int) -> float:
        return pixels_per_step / self.ema_s if self.ema_s > 0 else 0.0


@contextlib.contextmanager
def trace(log_dir: str | None):
    """``jax.profiler`` trace context; no-op when ``log_dir`` is None."""
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region in profiler traces (TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
