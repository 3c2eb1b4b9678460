"""Native C++ runtime library tests (WAV loader, SPSC ring, quantizer)
against the numpy reference implementations."""

import os
import subprocess

import numpy as np
import pytest

from sdrplusplusbrown_tpu import native
from sdrplusplusbrown_tpu.io.wav import write_wav, read_wav_iq

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built "
                                       "(run scripts/build_native.sh)")


def test_native_wav_matches_python(tmp_path, rng):
    x = (rng.uniform(-0.9, 0.9, 5000)
         + 1j * rng.uniform(-0.9, 0.9, 5000)).astype(np.complex64)
    for bits in (16, 32):
        p = str(tmp_path / f"iq{bits}.wav")
        write_wav(p, x, 96000, bits=bits)
        ref, rate = read_wav_iq(p)
        r = native.NativeWavReader(p)
        assert r.samplerate == rate == 96000
        assert r.channels == 2 and r.frames == 5000
        got = r.read(0, 5000)
        np.testing.assert_array_equal(got, ref)
        # partial block read
        got2 = r.read(1000, 500)
        np.testing.assert_array_equal(got2, ref[1000:1500])
        # read past EOF truncates
        assert len(r.read(4900, 500)) == 100
        r.close()


def test_native_ring_spsc(rng):
    ring = native.NativeRing(1024)
    a = rng.standard_normal(300).astype(np.float32)
    assert ring.write(a) == 300
    assert ring.available() == 300
    out = ring.read(200)
    np.testing.assert_array_equal(out, a[:200])
    assert ring.available() == 100
    # fill to capacity: write accepts only what fits
    big = rng.standard_normal(2000).astype(np.float32)
    wrote = ring.write(big)
    assert wrote == 1024 - 100
    out2 = ring.read(2000)
    assert len(out2) == 1024
    np.testing.assert_array_equal(out2[:100], a[200:300])
    ring.close()


def test_native_quantizer_roundtrip(rng):
    x = rng.standard_normal(4096).astype(np.float32)
    q, scale = native.native_quantize_i8(x)
    y = native.native_dequantize_i8(q, scale)
    assert np.max(np.abs(y - x)) <= scale / 127.0 + 1e-6
    # matches the numpy fallback bit-for-bit on scale
    m = float(np.max(np.abs(x)))
    assert abs(scale - m) < 1e-6


def test_file_source_uses_native(tmp_path, rng):
    from sdrplusplusbrown_tpu.io.file_source import FileSource
    x = (rng.uniform(-0.9, 0.9, 3000)
         + 1j * rng.uniform(-0.9, 0.9, 3000)).astype(np.complex64)
    p = str(tmp_path / "baseband_1000000Hz_01-01-01_01-01-2024.wav")
    write_wav(p, x, 200000, bits=32)
    src = FileSource(p)
    assert src.native is not None
    np.testing.assert_array_equal(src.data, x)
