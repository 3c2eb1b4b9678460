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
