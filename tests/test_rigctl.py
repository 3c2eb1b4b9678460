"""rigctl (hamlib CAT) server tests against a live in-process app."""

import json
import os
import socket

import numpy as np
import pytest

from sdrplusplusbrown_tpu.io.wav import write_wav


@pytest.fixture
def app_with_rigctl(tmp_path):
    from sdrplusplusbrown_tpu.app import SDRApp
    from sdrplusplusbrown_tpu.server.rigctl import RigctlServer
    x = (np.ones(48000) * 0.1).astype(np.complex64)
    cap = str(tmp_path / "baseband_14200000Hz_01-01-01_01-01-2024.wav")
    write_wav(cap, x, 240000.0, bits=32)
    root = str(tmp_path / "root")
    os.makedirs(root)
    with open(os.path.join(root, "config.json"), "w") as f:
        json.dump({"source": {"type": "file", "path": cap, "loop": True},
                   "fftSize": 4096,
                   "transmitter": {"type": "loopback"},
                   "modules": {"Radio": {"type": "radio", "demod": "USB",
                                         "offset": 0}}}, f)
    app = SDRApp(root, run_pump=False)
    srv = RigctlServer(app, port=0)
    srv.start()
    yield app, srv
    srv.stop()
    app.shutdown()


class RigctlClient:
    def __init__(self, port):
        self.sock = socket.create_connection(("127.0.0.1", port), timeout=5)
        self.buf = b""

    def cmd(self, line, nlines=1):
        self.sock.sendall((line + "\n").encode())
        lines = []
        while len(lines) < nlines:
            while b"\n" not in self.buf:
                data = self.sock.recv(1024)
                if not data:
                    raise ConnectionError
                self.buf += data
            line_, self.buf = self.buf.split(b"\n", 1)
            lines.append(line_.decode())
        return lines


def test_rigctl_freq_mode_ptt(app_with_rigctl):
    app, srv = app_with_rigctl
    c = RigctlClient(srv.port)
    assert c.cmd("F 7074000") == ["RPRT 0"]
    assert app.frequency == 7074000.0
    assert float(c.cmd("f")[0]) == 7074000.0
    assert c.cmd("M LSB 2700") == ["RPRT 0"]
    mode, bw = c.cmd("m", nlines=2)
    assert mode == "LSB" and int(bw) > 0
    assert c.cmd("T 1") == ["RPRT 0"]
    assert app.transmitter.get_ptt()
    assert c.cmd("t") == ["1"]
    assert c.cmd("T 0") == ["RPRT 0"]
    assert c.cmd("v") == ["VFOA"]
    # unknown command → RPRT -11, junk args → error codes
    assert c.cmd("Z") == ["RPRT -11"]
    assert c.cmd("F notanumber") == ["RPRT -1"]
    assert c.cmd("M WARBLE 1000") == ["RPRT -9"]
    state = c.cmd("\\dump_state", nlines=5)
    assert state[0] == "0"


def test_rigctl_quit_closes(app_with_rigctl):
    app, srv = app_with_rigctl
    c = RigctlClient(srv.port)
    c.sock.sendall(b"q\n")
    c.sock.settimeout(3)
    assert c.sock.recv(100) == b""
