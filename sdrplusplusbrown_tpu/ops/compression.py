"""Sample-stream quantization for network transport.

reference: core/src/dsp/compression/sample_stream_compressor.h — packs a
complex float block as [u16 compressionType, u16 sampleType, f32 scaler,
payload], where payload is f32 passthrough or int8/int16 scaled by
128/maxVal resp. 32768/maxVal.  (We scale by max |component| — the
reference uses the max *signed* component value, which can clip strong
negative excursions; flagged deviation.)  The entropy stage is real
zstd via the system libzstd (utils/zstd.py ctypes binding, same
one-shot level-1 API as core/src/server.cpp:447) — wire-format parity
with reference sdrpp_server peers; zlib remains as a sniffed fallback
for streams recorded before the binding existed (and for environments
without libzstd).
"""

from __future__ import annotations

import struct
import zlib
from enum import IntEnum

import numpy as np

from ..utils import zstd as _zstd


class PCMType(IntEnum):
    F32 = 0
    I16 = 1
    I8 = 2


def compress_samples(x: np.ndarray, pcm: PCMType) -> bytes:
    """complex64 [T] → framed bytes (pre-entropy-coding)."""
    inter = np.empty(2 * len(x), np.float32)
    inter[0::2] = np.real(x)
    inter[1::2] = np.imag(x)
    if pcm == PCMType.F32:
        return struct.pack("<HHf", 0, int(pcm), 0.0) + inter.tobytes()
    max_val = float(np.max(np.abs(inter))) if len(x) else 1.0
    max_val = max(max_val, 1e-30)
    if pcm == PCMType.I8:
        q = np.clip(inter * (127.0 / max_val), -128, 127).astype(np.int8)
    else:
        q = np.clip(inter * (32767.0 / max_val),
                    -32768, 32767).astype(np.int16)
    return struct.pack("<HHf", 0, int(pcm), max_val) + q.tobytes()


def decompress_samples(buf: bytes) -> np.ndarray:
    comp, pcm, scaler = struct.unpack("<HHf", buf[:8])
    payload = buf[8:]
    if pcm == PCMType.F32:
        inter = np.frombuffer(payload, np.float32)
    elif pcm == PCMType.I8:
        inter = np.frombuffer(payload, np.int8).astype(np.float32) \
            * (scaler / 127.0)
    elif pcm == PCMType.I16:
        inter = np.frombuffer(payload, np.int16).astype(np.float32) \
            * (scaler / 32767.0)
    else:
        raise ValueError(f"unknown pcm type {pcm}")
    return (inter[0::2] + 1j * inter[1::2]).astype(np.complex64)


def entropy_encode(buf: bytes, level: int = 1) -> bytes:
    if _zstd.available():
        return _zstd.compress(buf, level)
    return zlib.compress(buf, level)  # pragma: no cover - no-libzstd env


def entropy_decode(buf: bytes) -> bytes:
    if buf[:4] == _zstd.ZSTD_MAGIC and _zstd.available():
        return _zstd.decompress(buf)
    return zlib.decompress(buf)
