"""Stream routing primitives.

reference: core/src/dsp/routing/{splitter,doubler,stream_link}.h,
buffer/packer.h, sink/ring_buffer_sink.h.  In a tensor program most of
these are free (a value can be consumed twice), so these are the thin
host/runtime analogs used at pipeline boundaries.
"""

from __future__ import annotations

from typing import Callable, List, Optional

import numpy as np

from .pump import Rechunker


class Splitter:
    """Fan one host-side stream out to N callbacks (reference
    routing/splitter.h — inside jit a value is simply reused; this is the
    host boundary version with bind/unbind semantics)."""

    def __init__(self):
        self._outs: List[Callable] = []

    def bind(self, cb: Callable):
        self._outs.append(cb)

    def unbind(self, cb: Callable):
        if cb in self._outs:
            self._outs.remove(cb)

    def push(self, block):
        for cb in list(self._outs):
            cb(block)


def doubler(x):
    """reference routing/doubler.h: one input, two identical outputs."""
    return x, x


class StreamLink:
    """Re-pluggable identity hop (reference routing/stream_link.h): lets a
    consumer keep a stable handle while the producer is swapped."""

    def __init__(self, producer: Optional[Callable] = None):
        self.producer = producer

    def set_producer(self, producer: Callable):
        self.producer = producer

    def __call__(self, *a, **kw):
        if self.producer is None:
            raise RuntimeError("StreamLink has no producer bound")
        return self.producer(*a, **kw)


class Packer(Rechunker):
    """Group samples into fixed-size packets (reference buffer/packer.h —
    identical accumulation semantics to the Rechunker)."""


class RingBufferSink:
    """Sink that retains the last ``capacity`` samples for polling
    consumers (reference sink/ring_buffer_sink.h)."""

    def __init__(self, capacity: int, dtype=np.complex64):
        self.capacity = int(capacity)
        self._buf = np.zeros(self.capacity, dtype)
        self._count = 0
        self._pos = 0

    def push(self, block: np.ndarray):
        block = np.asarray(block).reshape(-1)
        n = len(block)
        if n >= self.capacity:
            self._buf[:] = block[-self.capacity:]
            self._pos = 0
            self._count += n
            return
        end = self._pos + n
        if end <= self.capacity:
            self._buf[self._pos:end] = block
        else:
            k = self.capacity - self._pos
            self._buf[self._pos:] = block[:k]
            self._buf[:n - k] = block[k:]
        self._pos = end % self.capacity
        self._count += n

    def latest(self, n: int) -> np.ndarray:
        n = min(n, min(self._count, self.capacity))
        idx = (self._pos - n + np.arange(n)) % self.capacity
        return self._buf[idx].copy()


class Merger:
    """Priority-preemptive stream merger.

    reference: core/src/dsp/routing/merger.h:35-186 — N bound inputs with
    integer priorities (LOWER number preempts); each emit round picks the
    highest-priority input that has data, drains up to ``chunk`` samples
    from it and DISCARDS what the losing inputs buffered (so a preempted
    stream resumes live, not delayed).  Within ``switch_delay_ms`` of the
    last selection the selected priority is sticky: equal-or-better
    priorities keep the floor even while momentarily empty, so brief gaps
    in the winning stream don't flap the selection (merger.h:114-155).

    The reference runs reader threads + a condition variable; here
    ``push`` is called from producer callbacks and ``pull`` from the
    consumer (the app pump), so no threads are needed — same semantics,
    reordered as a pure data structure.  ``time_fn`` is injectable for
    deterministic tests.
    """

    SWITCH_DELAY_MS = 100            # merger.h:114
    CHUNK = 1024                     # merger.h:168

    def __init__(self, time_fn=None):
        import time as _time
        self._time_fn = time_fn or (lambda: _time.monotonic() * 1000.0)
        self._inputs: dict[int, dict] = {}
        self._next_id = 0
        self._last_priority = 0
        self._last_time = -1e18

    def bind(self, priority: int) -> int:
        port = self._next_id
        self._next_id += 1
        self._inputs[port] = {"priority": int(priority), "data": []}
        return port

    def unbind(self, port: int):
        self._inputs.pop(port, None)

    def push(self, port: int, samples: np.ndarray):
        s = self._inputs.get(port)
        if s is not None:
            s["data"].append(np.asarray(samples))

    def _size(self, s) -> int:
        return sum(b.shape[-1] for b in s["data"])

    def pull(self) -> Optional[np.ndarray]:
        """One merge round: the winning input's samples (≤ CHUNK along the
        last axis) or None; losers are flushed."""
        now = self._time_fn()
        best = None
        sticky = (now - self._last_time) < self.SWITCH_DELAY_MS
        for s in self._inputs.values():
            if sticky:
                if s["priority"] <= self._last_priority:
                    best = s
            elif self._size(s) and (best is None
                                    or s["priority"] < best["priority"]):
                best = s
        if best is None or not self._size(best):
            return None
        self._last_priority = best["priority"]
        self._last_time = now
        data = np.concatenate(best["data"], axis=-1)
        out, rest = data[..., :self.CHUNK], data[..., self.CHUNK:]
        best["data"] = [rest] if rest.shape[-1] else []
        for s in self._inputs.values():
            if s is not best:
                s["data"] = []
        return out

    def drain(self) -> List[np.ndarray]:
        """Pull until empty (a full pump-tick's worth)."""
        out = []
        while True:
            blk = self.pull()
            if blk is None:
                return out
            out.append(blk)
