"""Profiler integration.

TPU-native counterpart of the reference's Kineto/ET-observer hooks
(``--enable-profiler``, comms.py:1335-1349; ``torch.profiler.profile``
wrapping in et_replay.py:1562-1578): ``jax.profiler`` traces viewable in
Perfetto/TensorBoard, plus ``jax.named_scope`` region markers standing in
for nvtx/record_function ranges.
"""

from __future__ import annotations

import contextlib
import logging
import os
from typing import Optional

import jax

log = logging.getLogger(__name__)


@contextlib.contextmanager
def profile_to(log_dir: Optional[str], enabled: bool = True):
    """Capture a device trace into ``log_dir`` (Perfetto/TensorBoard format).

    Usage: every benchmark CLI takes ``--profile DIR`` and wraps its timed
    section in this context."""
    if not log_dir or not enabled:
        yield
        return
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        log.info("profiler trace written to %s", log_dir)


def annotate(name: str):
    """Named region marker (shows as a scope in the trace)."""
    return jax.profiler.TraceAnnotation(name)


class SizeTriggeredProfiler:
    """Start profiling only once a sweep reaches a trigger size
    (reference: size-triggered profiler start, comms.py:1335-1349)."""

    def __init__(self, log_dir: Optional[str], trigger_size: int = 0):
        self.log_dir = log_dir
        self.trigger_size = trigger_size
        self._active = False

    def maybe_start(self, current_size: int) -> None:
        if (
            self.log_dir
            and not self._active
            and current_size >= self.trigger_size
        ):
            os.makedirs(self.log_dir, exist_ok=True)
            jax.profiler.start_trace(self.log_dir)
            self._active = True

    def stop(self) -> None:
        if self._active:
            jax.profiler.stop_trace()
            self._active = False
