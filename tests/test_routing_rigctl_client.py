"""Routing primitives and rigctl client↔server loopback."""

import numpy as np

from sdrplusplusbrown_tpu.runtime.routing import (
    Splitter, doubler, StreamLink, Packer, RingBufferSink)


def test_splitter_fanout():
    s = Splitter()
    got_a, got_b = [], []
    s.bind(got_a.append)
    s.bind(got_b.append)
    s.push(1)
    s.unbind(got_b.append)
    s.push(2)
    assert got_a == [1, 2] and got_b == [1]


def test_doubler_and_streamlink():
    a, b = doubler(7)
    assert a == 7 and b == 7
    link = StreamLink()
    link.set_producer(lambda x: x * 2)
    assert link(21) == 42


def test_packer_groups():
    p = Packer(8)
    out = p.push(np.arange(20, dtype=np.complex64))
    assert [len(o) for o in out] == [8, 8]


def test_ring_buffer_sink(rng):
    rb = RingBufferSink(16, np.float32)
    rb.push(np.arange(10, dtype=np.float32))
    np.testing.assert_array_equal(rb.latest(4), [6, 7, 8, 9])
    rb.push(np.arange(10, 30, dtype=np.float32))   # wraps; >capacity total
    np.testing.assert_array_equal(rb.latest(5), [25, 26, 27, 28, 29])
    rb.push(np.arange(100, dtype=np.float32))      # larger than capacity
    np.testing.assert_array_equal(rb.latest(3), [97, 98, 99])


def test_rigctl_client_against_our_server(tmp_path):
    import json
    import os
    from sdrplusplusbrown_tpu.app import SDRApp
    from sdrplusplusbrown_tpu.server.rigctl import RigctlServer
    from sdrplusplusbrown_tpu.server.rigctl_client import RigctlClient
    from sdrplusplusbrown_tpu.io.wav import write_wav

    x = (np.ones(24000) * 0.1).astype(np.complex64)
    cap = str(tmp_path / "baseband_14200000Hz_01-01-01_01-01-2024.wav")
    write_wav(cap, x, 240000.0, bits=32)
    root = str(tmp_path / "root")
    os.makedirs(root)
    with open(os.path.join(root, "config.json"), "w") as f:
        json.dump({"source": {"type": "file", "path": cap},
                   "transmitter": {"type": "loopback"},
                   "fftSize": 4096,
                   "modules": {"Radio": {"type": "radio",
                                         "demod": "USB"}}}, f)
    app = SDRApp(root, run_pump=False)
    srv = RigctlServer(app, port=0)
    srv.start()
    try:
        cli = RigctlClient("127.0.0.1", srv.port)
        assert cli.set_frequency(7_074_000)
        assert cli.get_frequency() == 7_074_000.0
        assert cli.set_mode("LSB", 2700)
        mode, bw = cli.get_mode()
        assert mode == "LSB" and bw > 0
        assert cli.set_ptt(True) and cli.get_ptt()
        assert cli.set_ptt(False) and not cli.get_ptt()
        cli.close()
    finally:
        srv.stop()
        app.shutdown()
