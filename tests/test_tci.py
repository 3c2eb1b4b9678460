"""TCI server protocol tests: WS handshake, init block, vfo get/set,
audio_start binary DataStream frames (reference misc_modules/tci_server).
"""

import base64
import hashlib
import os
import socket
import struct
import time

import numpy as np
import pytest

from sdrplusplusbrown_tpu.server.websocket import build_frame


class TCIClient:
    """Minimal stdlib WS client for the tests."""

    def __init__(self, port):
        self.sock = socket.create_connection(("127.0.0.1", port),
                                             timeout=10)
        key = base64.b64encode(os.urandom(16)).decode()
        req = (f"GET / HTTP/1.1\r\nHost: 127.0.0.1:{port}\r\n"
               "Upgrade: websocket\r\nConnection: Upgrade\r\n"
               f"Sec-WebSocket-Key: {key}\r\n"
               "Sec-WebSocket-Version: 13\r\n\r\n")
        self.sock.sendall(req.encode())
        resp = b""
        while b"\r\n\r\n" not in resp:
            resp += self.sock.recv(4096)
        assert b"101" in resp.split(b"\r\n")[0], resp
        # frames may already follow the handshake in the same packet
        self._buf = resp.split(b"\r\n\r\n", 1)[1]

    def _read_exact(self, n):
        while len(self._buf) < n:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise EOFError
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def recv_msg(self):
        hdr = self._read_exact(2)
        op = hdr[0] & 0x0F
        n = hdr[1] & 0x7F
        if n == 126:
            n = struct.unpack(">H", self._read_exact(2))[0]
        elif n == 127:
            n = struct.unpack(">Q", self._read_exact(8))[0]
        return op, self._read_exact(n)

    def send_text(self, text):
        # client frames must be masked
        payload = text.encode()
        mask = os.urandom(4)
        masked = bytes(b ^ mask[i % 4] for i, b in enumerate(payload))
        n = len(payload)
        head = bytes([0x81])
        if n < 126:
            head += bytes([0x80 | n])
        else:
            head += bytes([0x80 | 126]) + struct.pack(">H", n)
        self.sock.sendall(head + mask + masked)

    def close(self):
        self.sock.close()


def _collect_text(client, until, timeout=10.0, keep_binary=None):
    lines = []
    deadline = time.time() + timeout
    while time.time() < deadline:
        op, payload = client.recv_msg()
        if op == 1:
            text = payload.decode()
            lines.append(text)
            if until in text:
                return lines
        elif op == 2 and keep_binary is not None:
            keep_binary.append(payload)
    raise TimeoutError(lines)


@pytest.mark.slow
def test_tci_handshake_tune_and_audio(tmp_path):
    from tests.test_modules import _mk_app
    app = _mk_app(tmp_path, {
        "Radio": {"type": "radio", "demod": "NFM", "offset": 60e3},
        "TCI": {"type": "tci_server", "vfo": "Radio"},
    })
    try:
        app.start()
        tci = app.modules["TCI"]
        client = TCIClient(tci.port)

        lines = _collect_text(client, "ready;")
        joined = "\n".join(lines)
        assert "protocol:esdr,1.6;" in joined
        assert "device:SDRPlusPlusBrown;" in joined
        assert "trx_count:1;" in joined
        assert "modulations_list:" in joined
        assert "audio_samplerate:48000;" in joined
        assert any(ln.startswith("vfo:0,0,") for ln in lines)

        # tune via TCI → app frequency changes and the change is reported
        client.send_text("vfo:0,0,7100000;")
        deadline = time.time() + 10
        while time.time() < deadline and app.frequency != 7_100_000.0:
            time.sleep(0.05)
        assert app.frequency == 7_100_000.0
        lines = _collect_text(client, "vfo:0,0,7100000;")

        # smeter + trx echo
        client.send_text("rx_smeter:0,0;")
        lines = _collect_text(client, "rx_smeter:0,0,0;")
        client.send_text("trx:0,false;")
        lines = _collect_text(client, "trx:0,false;")

        # audio: binary DataStream frames with the reference header
        binaries = []
        client.send_text("audio_start:0;")
        _collect_text(client, "audio_start:0;")
        deadline = time.time() + 30
        while time.time() < deadline and len(binaries) < 3:
            op, payload = client.recv_msg()
            if op == 2:
                binaries.append(payload)
        assert len(binaries) >= 3, "no audio frames"
        head = struct.unpack("<7I", binaries[0][:28])
        receiver, samplerate, fmt, codec, crc, length, typ = head
        assert receiver == 0 and fmt == 3 and codec == 0 and crc == 0
        assert typ == 1 and samplerate == 48000
        data = np.frombuffer(binaries[0][64:], np.float32)
        assert len(data) == length
        assert np.std(data) > 1e-5      # the NFM tone is audible
        client.send_text("audio_stop:0;")
        client.close()
    finally:
        app.shutdown()
