"""Utilities: timers, rate limiting, metrics logging.

Reference: perception/utils/__init__.py:3-14 (Rate), perception/utils/
timer.py:5-32 (Timing).
"""

import time

from object_keypoints_tpu.utils.timer import Timing  # noqa: F401


class Rate:
    """Fixed-rate sleeper (perception/utils/__init__.py:3-14)."""

    def __init__(self, hz: float):
        self.period = 1.0 / hz
        self._last = time.monotonic()

    def sleep(self):
        now = time.monotonic()
        remaining = self.period - (now - self._last)
        if remaining > 0:
            time.sleep(remaining)
        self._last = time.monotonic()
