"""Windowed decode fan-out tests (FT8-style subprocess parallelism)."""

import sys
import time

import numpy as np

from sdrplusplusbrown_tpu.runtime.window_decoder import (
    WindowedDecodeRunner, run_external_decoder)


def tone_decoder(audio, samplerate, t0):
    """Toy decoder: report the dominant tone frequency of the window."""
    X = np.abs(np.fft.rfft(audio))
    return float(np.argmax(X) * samplerate / len(audio))


def test_windowed_runner_decodes_in_order(rng):
    fs = 8000.0
    results = []
    r = WindowedDecodeRunner(fs, 0.5, tone_decoder,
                             lambda res, t0: results.append((t0, res)),
                             max_workers=3)
    # 4 windows with different tones
    for i, f in enumerate([440.0, 880.0, 1320.0, 1760.0]):
        t = np.arange(int(fs * 0.5)) / fs
        r.push(np.sin(2 * np.pi * f * t).astype(np.float32))
    r.drain()
    assert r.windows_dispatched == 4
    assert len(results) == 4
    got = dict(results)
    for i, f in enumerate([440.0, 880.0, 1320.0, 1760.0]):
        assert abs(got[int(i * fs * 0.5)] - f) < 3.0
    r.shutdown()


def test_decoder_crash_is_isolated():
    fs = 8000.0
    calls = []

    def bad_decoder(audio, samplerate, t0):
        raise RuntimeError("decoder blew up")

    r = WindowedDecodeRunner(fs, 0.25, bad_decoder,
                             lambda res, t0: calls.append(res))
    r.push(np.zeros(int(fs * 0.6), np.float32))
    r.drain()
    assert r.windows_dispatched == 2
    assert r.decode_errors == 2
    assert calls == []
    r.shutdown()


def test_external_decoder_subprocess():
    """Pipe a window to a real subprocess (python one-liner) like the
    reference pipes audio to sdrpp_ft8_mshv."""
    code = ("import sys,struct;"
            "d=sys.stdin.buffer.read();"
            "n=len(d)//4;"
            "print('NSAMP', n); print('RATE', sys.argv[1])")
    out = run_external_decoder([sys.executable, "-c", code],
                               np.zeros(1000, np.float32), 12000.0)
    assert out[0] == "NSAMP 1000"
    assert out[1] == "RATE 12000"
