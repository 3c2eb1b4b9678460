"""MPEG Layer I streaming sink (reference sink_modules/mpeg_adts_sink).

The reference encodes with LAME and streams raw MPEG frames over TCP;
this analog encodes MPEG-1 Layer I natively (io/mpeg_sink.py documents
the divergences) — tests assert valid frame syntax, CBR framing,
round-trip audio fidelity through the matching synthesis bank, and the
TCP transport against an in-process server."""

import socket
import threading

import numpy as np
import pytest

from sdrplusplusbrown_tpu.io.mpeg_sink import (
    MpegL1Encoder, MpegNetworkSink, mpeg_l1_decode_frame, _Synthesis,
    _FRAME)


def test_frame_syntax_and_cbr():
    enc = MpegL1Encoder(48000, 288)
    rng = np.random.default_rng(0)
    data = enc.encode(rng.uniform(-0.5, 0.5, 384 * 7).astype(np.float32))
    fb = enc.frame_bytes
    assert fb == 12 * 288000 // 48000 * 4           # spec slot formula
    assert len(data) == 7 * fb                      # CBR, no drift
    for f in range(7):
        hdr, _ = mpeg_l1_decode_frame(data[f * fb:(f + 1) * fb], fb)
        assert hdr["sync"] == 0xFFF
        assert hdr["mpeg1"] == 1
        assert hdr["layer"] == 0b11                 # Layer I
        assert hdr["bitrate_kbps"] == 288
        assert hdr["samplerate"] == 48000
        assert hdr["mono"]


def test_round_trip_tone_snr():
    """440 Hz tone → encode → parse+dequantize → synthesis bank →
    recovered tone dominates (filterbank + 8..2-bit quantization)."""
    sr = 48000
    enc = MpegL1Encoder(sr, 288)
    t = np.arange(384 * 40) / sr
    x = (0.7 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
    data = enc.encode(x)
    fb = enc.frame_bytes
    syn = _Synthesis()
    y = []
    for f in range(len(data) // fb):
        _, sb = mpeg_l1_decode_frame(data[f * fb:(f + 1) * fb], fb)
        y.append(syn.push(sb))
    y = np.concatenate(y)
    # skip the filterbank warm-up, align by the analysis+synthesis delay
    sk = 2000
    seg = y[sk:-(512)]
    n = np.arange(len(seg))
    tone = 2 * np.abs(np.mean(seg * np.exp(-2j * np.pi * 440.0 * n / sr)))
    rms = np.sqrt(np.mean(seg ** 2))
    assert tone > 0.4, tone                  # tone present near 0.7
    assert tone > 1.2 * rms                  # and dominates the output


def test_tcp_transport():
    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    got = bytearray()
    done = threading.Event()

    def serve():
        conn, _ = srv.accept()
        conn.settimeout(5)
        try:
            while True:
                b = conn.recv(65536)
                if not b:
                    break
                got.extend(b)
                if len(got) >= 3 * 288:
                    break
        except OSError:
            pass
        conn.close()
        done.set()

    th = threading.Thread(target=serve, daemon=True)
    th.start()
    sink = MpegNetworkSink("127.0.0.1", port, 48000, 288)
    rng = np.random.default_rng(1)
    audio = rng.uniform(-0.3, 0.3, (2, 384 * 4)).astype(np.float32)
    sink.write(audio)                       # stereo mixes down
    assert done.wait(5)
    sink.close()
    srv.close()
    fb = sink.enc.frame_bytes
    assert len(got) >= fb
    hdr, _ = mpeg_l1_decode_frame(bytes(got[:fb]), fb)
    assert hdr["sync"] == 0xFFF and hdr["mono"]
