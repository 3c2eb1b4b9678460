"""Waterfall data model and IQ exporter tests."""

import json
import os
import socket
import time

import numpy as np
import pytest

from sdrplusplusbrown_tpu.models.waterfall import Waterfall
from sdrplusplusbrown_tpu.ops.compression import decompress_samples
from sdrplusplusbrown_tpu.server.protocol import recv_packet, PacketType


def test_waterfall_ring_and_zoom(rng):
    wf = Waterfall(1024, history=16)
    assert wf.latest() is None
    fs = 1_000_000.0
    for i in range(20):
        # noisy floor: the quietest-quartile noise estimator degenerates
        # on exactly-constant side bins (all values tie at the kth)
        line = (-90.0 + rng.standard_normal(1024)).astype(np.float32)
        line[512 + 100] = -30.0 + i      # carrier at +97.6 kHz
        wf.push_fft(line)
    last = wf.latest()
    assert last[612] == -30.0 + 19
    assert wf.lines(4).shape == (4, 1024)
    # zoom around the carrier: peak hold keeps it visible in coarse bins
    z = wf.zoom(97_656.0, 50_000.0, fs, 16)
    assert z.max() > -15.0
    # zoom away from the carrier: floor only
    z2 = wf.zoom(-300_000.0, 50_000.0, fs, 16)
    assert z2.max() < -80.0
    # SNR tap mirrors the waterfall estimator
    st, snr = wf.vfo_signal_info(97_656.0, 20_000.0, fs)
    assert snr > 20.0


@pytest.mark.slow
def test_iq_exporter_streams(tmp_path, rng):
    from sdrplusplusbrown_tpu.app import SDRApp
    from sdrplusplusbrown_tpu.io.wav import write_wav
    fs = 240_000.0
    T = int(fs)
    x = (0.3 * (rng.standard_normal(T) + 1j * rng.standard_normal(T))
         ).astype(np.complex64)
    cap = str(tmp_path / "baseband_1000000Hz_01-01-01_01-01-2024.wav")
    write_wav(cap, x, fs, bits=32)
    root = str(tmp_path / "root")
    os.makedirs(root)
    with open(os.path.join(root, "config.json"), "w") as f:
        json.dump({"source": {"type": "file", "path": cap, "loop": True},
                   "fftSize": 4096,
                   "modules": {
                       "Radio": {"type": "radio", "demod": "NFM",
                                 "offset": 0},
                       "Export": {"type": "iq_exporter",
                                  "mode": "baseband", "pcm": "i16"},
                   }}, f)
    app = SDRApp(root)
    try:
        exp = app.modules["Export"]
        sock = socket.create_connection(("127.0.0.1", exp.port), timeout=10)
        app.start()
        got = []
        deadline = time.time() + 60
        sock.settimeout(30)
        while sum(len(g) for g in got) < 10000 and time.time() < deadline:
            ptype, payload = recv_packet(sock)
            assert ptype == PacketType.BASEBAND
            got.append(decompress_samples(payload))
        sock.close()
        y = np.concatenate(got)
        assert len(y) >= 10000
        # int16-quantized copy of the source baseband
        assert np.abs(y).max() < 2.0
        assert exp.handle_debug_command("status", "")["port"] == exp.port
    finally:
        app.shutdown()
