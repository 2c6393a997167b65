"""Tracing and profiling.

The reference has no profiler — its closest artifacts are GPU-memory polling
in the progress bar (``scripts/train.py:110-112``) and a startup memory
print (``run_pipeline.py:45-50``).  TPU-natively this subsystem wraps
``jax.profiler``:

* :func:`trace` — context manager writing an XPlane trace viewable in
  TensorBoard / Perfetto;
* :func:`trace_annotation` — named region inside a trace (shows up on the
  device timeline);
* :func:`device_memory_stats` — per-device live/peak HBM bytes (the
  ``torch.cuda.memory_allocated`` equivalent);
* :class:`StepTimer` — EMA step timing with utterances/sec derived rates.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace: ``with trace('/tmp/trace'): step()``."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def trace_annotation(name: str):
    """Named region for the profiler timeline."""
    return jax.profiler.TraceAnnotation(name)


def device_memory_stats() -> Dict[str, Dict[str, int]]:
    """Per-device memory statistics in bytes (empty off-TPU)."""
    stats = {}
    for dev in jax.devices():
        try:
            s = dev.memory_stats()
        except Exception:
            s = None
        if s:
            stats[str(dev)] = {
                "bytes_in_use": int(s.get("bytes_in_use", 0)),
                "peak_bytes_in_use": int(s.get("peak_bytes_in_use", 0)),
                "bytes_limit": int(s.get("bytes_limit", 0)),
            }
    return stats


class StepTimer:
    """Exponential-moving-average step timer."""

    def __init__(self, decay: float = 0.9):
        self.decay = decay
        self.ema: Optional[float] = None
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self.ema = dt if self.ema is None else (
            self.decay * self.ema + (1 - self.decay) * dt)
        return False

    def rate(self, items_per_step: int) -> float:
        return items_per_step / self.ema if self.ema else 0.0
