"""Tag-based wall-clock timing + JAX profiler hooks.

``Timing`` mirrors the reference API (perception/utils/timer.py:5-32:
start/end tags, mean/std table). ``trace`` adds what the reference lacks
(SURVEY.md §5.1): jax.profiler trace capture around a code region for
device-level analysis.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import numpy as np


class Timing:
    def __init__(self):
        self._starts = {}
        self._samples = defaultdict(list)

    def start(self, tag: str):
        self._starts[tag] = time.perf_counter()

    def end(self, tag: str):
        self._samples[tag].append(time.perf_counter() - self._starts.pop(tag))

    @contextlib.contextmanager
    def measure(self, tag: str):
        self.start(tag)
        try:
            yield
        finally:
            self.end(tag)

    def stats(self):
        return {
            tag: (float(np.mean(v)), float(np.std(v)), len(v))
            for tag, v in self._samples.items()
        }

    def print_timing(self):
        print(f"{'tag':<30} {'mean (ms)':>12} {'std (ms)':>12} {'n':>6}")
        for tag, (mean, std, n) in self.stats().items():
            print(f"{tag:<30} {mean * 1e3:>12.3f} {std * 1e3:>12.3f} {n:>6}")


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard/XProf)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
