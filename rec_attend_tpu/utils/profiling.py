"""Profiling/tracing helpers.

The reference's only tracing channel is a host wall-clock ``step_time`` CSV
(runner.py:54-57, kept in engine/experiment.py).  TPU-native additions:
``jax.profiler`` trace capture around a step window, and a simple step
timer with percentile summary.
"""

from __future__ import annotations

import contextlib
import time

import numpy as np

import jax


@contextlib.contextmanager
def trace(logdir: str):
  """Capture a jax.profiler trace (view with TensorBoard/XProf)."""
  jax.profiler.start_trace(logdir)
  try:
    yield
  finally:
    jax.profiler.stop_trace()


class StepTimer:
  """Wall-clock step timing with summary percentiles."""

  def __init__(self):
    self.times_ms = []
    self._t0 = None

  def start(self):
    self._t0 = time.perf_counter()

  def stop(self):
    if self._t0 is not None:
      self.times_ms.append((time.perf_counter() - self._t0) * 1000)
      self._t0 = None

  def summary(self):
    if not self.times_ms:
      return {}
    a = np.array(self.times_ms)
    return {'mean_ms': float(a.mean()), 'p50_ms': float(np.percentile(a, 50)),
            'p90_ms': float(np.percentile(a, 90)),
            'p99_ms': float(np.percentile(a, 99)), 'n': len(a)}
