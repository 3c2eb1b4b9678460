"""ctypes bindings for the native runtime library (native/*.cpp).

Loads ``libsdrpp_tpu_native.so`` if built (scripts/build_native.sh);
every entry point has a numpy fallback so the framework runs without the
native build (e.g. fresh checkouts, non-gcc platforms).
"""

from __future__ import annotations

import ctypes
import os
import sys
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None


def _find_lib() -> Optional[str]:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for cand in (
        os.path.join(here, "native", "build", "libsdrpp_tpu_native.so"),
        os.path.join(here, "native", "libsdrpp_tpu_native.so"),
    ):
        if os.path.exists(cand):
            return cand
    return None


def load() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is not None:
        return _LIB
    path = _find_lib()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.wav_open.restype = ctypes.c_void_p
    lib.wav_open.argtypes = [ctypes.c_char_p]
    lib.wav_info.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_uint16), ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_uint16), ctypes.POINTER(ctypes.c_uint16)]
    lib.wav_read_f32.restype = ctypes.c_int64
    lib.wav_read_f32.argtypes = [ctypes.c_void_p, ctypes.c_uint64,
                                 ctypes.c_int64, ctypes.c_void_p]
    lib.wav_close.argtypes = [ctypes.c_void_p]
    lib.ring_create.restype = ctypes.c_void_p
    lib.ring_create.argtypes = [ctypes.c_size_t]
    lib.ring_write.restype = ctypes.c_size_t
    lib.ring_write.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                               ctypes.c_size_t]
    lib.ring_read.restype = ctypes.c_size_t
    lib.ring_read.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                              ctypes.c_size_t]
    lib.ring_available.restype = ctypes.c_size_t
    lib.ring_available.argtypes = [ctypes.c_void_p]
    lib.ring_free.argtypes = [ctypes.c_void_p]
    lib.quantize_i8.restype = ctypes.c_float
    lib.quantize_i8.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                ctypes.c_void_p]
    lib.dequantize_i8.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                  ctypes.c_float, ctypes.c_void_p]
    lib.quantize_i16.restype = ctypes.c_float
    lib.quantize_i16.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                 ctypes.c_void_p]
    _LIB = lib
    return lib


def available() -> bool:
    return load() is not None


# ----------------------------------------------------------------------
class NativeWavReader:
    """Block WAV reader backed by the C++ loader."""

    def __init__(self, path: str):
        lib = load()
        if lib is None:
            raise RuntimeError("native library not built")
        self._lib = lib
        self._h = lib.wav_open(path.encode())
        if not self._h:
            raise OSError(f"cannot open WAV {path}")
        rate = ctypes.c_uint32()
        ch = ctypes.c_uint16()
        frames = ctypes.c_uint64()
        bits = ctypes.c_uint16()
        fmt = ctypes.c_uint16()
        lib.wav_info(self._h, rate, ch, frames, bits, fmt)
        self.samplerate = float(rate.value)
        self.channels = int(ch.value)
        self.frames = int(frames.value)
        self.bits = int(bits.value)

    def read(self, start: int, count: int) -> np.ndarray:
        """→ complex64 IQ (stereo) or float32 (mono)."""
        buf = np.empty(count * self.channels, np.float32)
        got = self._lib.wav_read_f32(self._h, start, count,
                                     buf.ctypes.data_as(ctypes.c_void_p))
        buf = buf[:got * self.channels]
        if self.channels == 2:
            pairs = buf.reshape(-1, 2)
            return (pairs[:, 0] + 1j * pairs[:, 1]).astype(np.complex64)
        return buf

    def close(self):
        if self._h:
            self._lib.wav_close(self._h)
            self._h = None

    def __del__(self):
        # never call into the shared library during interpreter teardown
        # (the CDLL may already be unloaded -> SIGSEGV at exit)
        if sys.is_finalizing():
            return
        try:
            self.close()
        except Exception:
            pass


class NativeRing:
    """Lock-free SPSC float ring."""

    def __init__(self, capacity: int):
        lib = load()
        if lib is None:
            raise RuntimeError("native library not built")
        self._lib = lib
        self._h = lib.ring_create(capacity)

    def write(self, data: np.ndarray) -> int:
        data = np.ascontiguousarray(data, np.float32)
        return self._lib.ring_write(
            self._h, data.ctypes.data_as(ctypes.c_void_p), data.size)

    def read(self, n: int) -> np.ndarray:
        out = np.empty(n, np.float32)
        got = self._lib.ring_read(
            self._h, out.ctypes.data_as(ctypes.c_void_p), n)
        return out[:got]

    def available(self) -> int:
        return self._lib.ring_available(self._h)

    def close(self):
        if self._h:
            self._lib.ring_free(self._h)
            self._h = None

    def __del__(self):
        if sys.is_finalizing():
            return
        try:
            self.close()
        except Exception:
            pass


def native_quantize_i8(x: np.ndarray) -> Tuple[np.ndarray, float]:
    lib = load()
    flat = np.ascontiguousarray(x, np.float32).reshape(-1)
    if lib is None:
        m = float(np.max(np.abs(flat))) or 1e-30
        return (np.clip(flat * (127.0 / m), -128, 127)
                .astype(np.int8), m)
    out = np.empty(flat.size, np.int8)
    scale = lib.quantize_i8(flat.ctypes.data_as(ctypes.c_void_p),
                            flat.size, out.ctypes.data_as(ctypes.c_void_p))
    return out, float(scale)


def native_dequantize_i8(q: np.ndarray, scale: float) -> np.ndarray:
    lib = load()
    q = np.ascontiguousarray(q, np.int8)
    if lib is None:
        return q.astype(np.float32) * (scale / 127.0)
    out = np.empty(q.size, np.float32)
    lib.dequantize_i8(q.ctypes.data_as(ctypes.c_void_p), q.size,
                      ctypes.c_float(scale),
                      out.ctypes.data_as(ctypes.c_void_p))
    return out
