"""Wall-clock timers and profiling scopes.

TPU-native counterpart of the reference's ``param_profile.py``:
``paramTimer`` becomes :class:`ParamTimer`; ``paramProfile``
(``record_function`` + wall timer) becomes :func:`param_profile`, which pairs
a monotonic wall timer with ``jax.profiler.TraceAnnotation`` so regions show
up in Perfetto traces the way nvtx/record_function ranges do in Kineto.
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from dataclasses import dataclass, field

import jax


@dataclass
class ParamTimer:
    """Accumulating nanosecond timer (reference: param_profile.py:41-59)."""

    elapsed_ns: float = 0.0

    def reset(self, new_ns: float = 0.0) -> None:
        self.elapsed_ns = new_ns

    def inc_ns(self, ns: float) -> None:
        self.elapsed_ns += ns

    def get_us(self) -> float:
        return self.elapsed_ns / 1e3

    def get_ms(self) -> float:
        return self.elapsed_ns / 1e6

    def get_s(self) -> float:
        return self.elapsed_ns / 1e9


@contextmanager
def param_profile(timer: ParamTimer | None = None, description: str = ""):
    """Profiling scope: wall timer + named trace annotation
    (reference: param_profile.py:18-38)."""
    ann = jax.profiler.TraceAnnotation(description or "param_profile")
    start = time.monotonic_ns()
    ann.__enter__()
    try:
        yield
    finally:
        ann.__exit__(None, None, None)
        if timer is not None:
            timer.inc_ns(time.monotonic_ns() - start)


@dataclass
class RegionTimers:
    """A named set of accumulating timers used by the DLRM bench's 21 timing
    regions (reference: dlrm.py:961-1009)."""

    timers: dict = field(default_factory=dict)

    def get(self, name: str) -> ParamTimer:
        return self.timers.setdefault(name, ParamTimer())

    def reset_all(self) -> None:
        for t in self.timers.values():
            t.reset()

    def snapshot_us(self) -> dict:
        return {k: v.get_us() for k, v in self.timers.items()}
