"""Tracing / profiling (SURVEY.md §5): host counters + device traces.

The reference's only profiling is its latency histogram; on TPU we add
jax.profiler traces (viewable in XProf/TensorBoard) and per-stage trace
annotations so the device timeline shows decode -> chain -> publish phases.
"""

from __future__ import annotations

import contextlib
import os
from typing import Iterator, Optional

import jax


class DeviceProfiler:
    """Start/stop jax.profiler traces around a streaming or batch run."""

    def __init__(self, log_dir: str = "/tmp/lvmt_profile"):
        self.log_dir = log_dir
        self._active = False

    def start(self) -> None:
        os.makedirs(self.log_dir, exist_ok=True)
        jax.profiler.start_trace(self.log_dir)
        self._active = True

    def stop(self) -> Optional[str]:
        if not self._active:
            return None
        jax.profiler.stop_trace()
        self._active = False
        return self.log_dir

    @contextlib.contextmanager
    def trace(self) -> Iterator[None]:
        self.start()
        try:
            yield
        finally:
            self.stop()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region on the profiler timeline (maps to TraceAnnotation)."""
    with jax.profiler.TraceAnnotation(name):
        yield
