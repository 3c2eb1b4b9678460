"""Throughput / level metrics.

reference: utils/stream_tracker.h (rolling samples/s), dsp/bench/
speed_tester.h (throughput micro-bench), bench/peak_level_meter.h,
audio/volume.h — the ad-hoc observability the reference sprinkles around
(SURVEY §5), as small reusable pieces exposed over /proc.
"""

from __future__ import annotations

import time
from typing import Callable, Optional

import numpy as np


class StreamTracker:
    """Rolling samples/s over a sliding window
    (reference utils/stream_tracker.h:8-40)."""

    def __init__(self, window_s: float = 2.0):
        self.window_s = float(window_s)
        self._events = []  # (t, n)
        self.total = 0

    def add(self, n: int):
        now = time.monotonic()
        self._events.append((now, n))
        self.total += n
        cutoff = now - self.window_s
        while self._events and self._events[0][0] < cutoff:
            self._events.pop(0)

    def rate(self) -> float:
        if not self._events:
            return 0.0
        now = time.monotonic()
        t0 = self._events[0][0]
        span = max(now - t0, 1e-6)
        return sum(n for _, n in self._events) / span


class PeakLevelMeter:
    """Peak + decaying level in dB (reference bench/peak_level_meter.h)."""

    def __init__(self, decay: float = 0.95):
        self.decay = float(decay)
        self.level = 0.0
        self.peak = 0.0

    def push(self, samples: np.ndarray):
        m = float(np.max(np.abs(samples))) if len(samples) else 0.0
        self.peak = max(self.peak, m)
        self.level = max(m, self.level * self.decay)

    def level_db(self) -> float:
        return 20.0 * np.log10(max(self.level, 1e-10))


class SpeedTester:
    """Throughput micro-bench: pump random blocks through ``fn`` for
    ``duration_s`` and report samples/s (reference
    dsp/bench/speed_tester.h:31-56).  ``fn(block) -> anything``; the
    result is blocked on so device work is included."""

    @staticmethod
    def benchmark(fn: Callable, block: np.ndarray,
                  duration_s: float = 1.0,
                  block_until_ready: Optional[Callable] = None) -> float:
        # warmup
        out = fn(block)
        if block_until_ready:
            block_until_ready(out)
        n = 0
        t0 = time.perf_counter()
        while time.perf_counter() - t0 < duration_s:
            out = fn(block)
            n += block.shape[-1]
        if block_until_ready:
            block_until_ready(out)
        dt = time.perf_counter() - t0
        return n / dt


def volume_scale(audio: np.ndarray, volume: float,
                 muted: bool = False) -> np.ndarray:
    """reference audio/volume.h: amplitude scale with mute."""
    if muted:
        return np.zeros_like(audio)
    return audio * float(volume)


def merge_priority(streams: dict, priorities: dict,
                   default: str) -> Optional[str]:
    """Pick the active stream by priority (reference routing/merger.h:
    higher-priority input preempts the default — used to inject TX
    audio over RX).  ``streams`` maps name → has_data(bool)."""
    best = None
    best_p = -1
    for name, has in streams.items():
        if not has:
            continue
        p = priorities.get(name, 0)
        if p > best_p:
            best, best_p = name, p
    return best if best is not None else (default if streams.get(default)
                                          else None)
