"""Streaming server/client and compression tests."""

import threading
import time

import numpy as np
import pytest

from sdrplusplusbrown_tpu.ops.compression import (
    PCMType, compress_samples, decompress_samples, entropy_encode,
    entropy_decode)
from sdrplusplusbrown_tpu.ops.efft import (EFFTCompressor, EFFTDecompressor,
                                           interpolate_holes)
from sdrplusplusbrown_tpu.server.protocol import sign_challenge, make_challenge


def test_sample_compressor_roundtrip(rng):
    x = (rng.standard_normal(1024) + 1j * rng.standard_normal(1024)
         ).astype(np.complex64)
    for pcm, tol in [(PCMType.F32, 0.0), (PCMType.I16, 1e-3),
                     (PCMType.I8, 0.05)]:
        buf = compress_samples(x, pcm)
        y = decompress_samples(buf)
        err = np.max(np.abs(y - x))
        assert err <= tol * max(1.0, float(np.max(np.abs(x)))), (pcm, err)
    # entropy stage
    buf = compress_samples(x, PCMType.I8)
    z = entropy_encode(buf)
    assert entropy_decode(z) == buf


def test_efft_masks_noise_keeps_signal(rng):
    fs = 200_000.0
    comp = EFFTCompressor(fs)
    dec = EFFTDecompressor(comp.fft_size)
    T = comp.fft_size * 40
    n = np.arange(T)
    sig = 0.5 * np.exp(2j * np.pi * 30_000.0 * n / fs)
    x = (sig + 0.01 * (rng.standard_normal(T) + 1j * rng.standard_normal(T))
         ).astype(np.complex64)
    frames = comp.process(x)
    assert len(frames) == 40 - (comp.MIN_RECENTS - 1)
    last = frames[-1]
    # most bins zeroed (that's the compression win)
    zfrac = np.mean(last == 0)
    assert zfrac > 0.5, f"only {zfrac:.2f} of bins zeroed"
    # signal bin survives: reconstruct and check the tone
    td = dec.process([last])
    nn = np.arange(len(td))
    tone = np.abs(np.mean(td * np.exp(-2j * np.pi * 30_000.0 * nn / fs)))
    assert tone > 0.2
    # compression ratio via entropy coding beats raw by > 3x
    raw = compress_samples(np.asarray(frames[-1]), PCMType.F32)
    packed = entropy_encode(compress_samples(np.asarray(frames[-1]),
                                             PCMType.I8))
    assert len(packed) < len(raw) / 3


def test_efft_hole_interpolation():
    a = np.array([0, 2.0, 0, 0, 8.0, 0], np.float64)
    f = interpolate_holes(a)
    np.testing.assert_allclose(f, [2, 2, 4, 6, 8, 8])


def test_challenge_auth_signature():
    ch = make_challenge()
    good = sign_challenge("hunter2", ch)
    assert sign_challenge("hunter2", ch) == good
    assert sign_challenge("wrong", ch) != good
    assert len(good) == 32


@pytest.mark.slow
def test_stream_server_end_to_end(tmp_path, rng):
    """Server streams a file source; client receives identical IQ (raw),
    close IQ (int8), and signal-preserving IQ (efft)."""
    import jax
    from sdrplusplusbrown_tpu.io.wav import write_wav
    from sdrplusplusbrown_tpu.app import SDRApp
    from sdrplusplusbrown_tpu.server.stream_server import StreamServer
    from sdrplusplusbrown_tpu.server.stream_client import StreamClient
    import json, os

    fs = 96_000.0
    T = int(fs)
    # noise-like signal: unique autocorrelation so block alignment below
    # is unambiguous (a periodic tone made the correlation search flaky)
    x = (0.3 * (rng.standard_normal(T) + 1j * rng.standard_normal(T))
         ).astype(np.complex64)
    cap = str(tmp_path / "baseband_7000000Hz_01-01-01_01-01-2024.wav")
    write_wav(cap, x, fs, bits=32)
    root = str(tmp_path / "root")
    os.makedirs(root)
    with open(os.path.join(root, "config.json"), "w") as f:
        json.dump({"source": {"type": "file", "path": cap, "loop": True}},
                  f)
    app = SDRApp(root, run_pump=False)
    srv = StreamServer(app, port=0, password="pw")
    srv.start()
    try:
        cli = StreamClient("127.0.0.1", srv.port, password="pw",
                           compression="int8")
        assert cli.samplerate == fs
        got = []
        for blk in cli.blocks(timeout=10):
            got.append(blk)
            if sum(len(g) for g in got) >= 5 * 480:
                break
        cli.close()
        y = np.concatenate(got)
        assert len(y) >= 5 * 480
        # clients join a live stream mid-file: align the first received
        # block to the source by correlation, then compare quantized IQ
        blk0 = got[0]
        best, best_off = -1.0, 0
        for off in range(0, T - len(blk0), len(blk0)):
            c = np.abs(np.vdot(x[off:off + len(blk0)], blk0))
            if c > best:
                best, best_off = c, off
        xx = np.concatenate([x, x])      # stream wraps at the file loop
        seg = xx[best_off:best_off + len(y)]
        err = np.max(np.abs(y - seg))
        assert err < 0.05, err
    finally:
        srv.stop()
        app.shutdown()


@pytest.mark.slow
def test_stream_server_efft_mode(tmp_path, rng):
    """EFFT-compressed streaming: client receives reconstructed IQ that
    preserves a strong carrier while blanking the noise floor."""
    import jax
    from sdrplusplusbrown_tpu.io.wav import write_wav
    from sdrplusplusbrown_tpu.app import SDRApp
    from sdrplusplusbrown_tpu.server.stream_server import StreamServer
    from sdrplusplusbrown_tpu.server.stream_client import StreamClient
    import json, os

    fs = 96_000.0
    T = int(fs * 4)
    n = np.arange(T)
    x = (0.5 * np.exp(2j * np.pi * 10e3 * n / fs)
         + 0.01 * (rng.standard_normal(T) + 1j * rng.standard_normal(T))
         ).astype(np.complex64)
    cap = str(tmp_path / "baseband_7000000Hz_01-01-01_01-01-2024.wav")
    write_wav(cap, x, fs, bits=32)
    root = str(tmp_path / "root")
    os.makedirs(root)
    with open(os.path.join(root, "config.json"), "w") as f:
        json.dump({"source": {"type": "file", "path": cap, "loop": True}},
                  f)
    app = SDRApp(root, run_pump=False)
    srv = StreamServer(app, port=0)
    srv.start()
    try:
        cli = StreamClient("127.0.0.1", srv.port, compression="efft")
        got = []
        # EFFT needs MIN_RECENTS frames of history before emitting
        for blk in cli.blocks(timeout=30):
            got.append(blk)
            if sum(len(g) for g in got) >= 3 * 4096:
                break
        cli.close()
        y = np.concatenate(got)
        assert len(y) >= 3 * 4096
        nn = np.arange(len(y))
        tone = np.abs(np.mean(y * np.exp(-2j * np.pi * 10e3 * nn / fs)))
        assert tone > 0.2, tone          # carrier survives compression
    finally:
        srv.stop()
        app.shutdown()
