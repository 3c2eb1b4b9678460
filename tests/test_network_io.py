"""Network I/O contract tests: raw network source, rtl_tcp client,
SpyServer client and the network audio sink — each against an
in-process fake peer (the reference modules' protocols:
source_modules/{network_source,rtl_tcp_source,spyserver_source},
sink_modules/network_sink)."""

import json
import os
import socket
import struct
import threading
import time

import numpy as np
import pytest

from sdrplusplusbrown_tpu.io.network_source import (NetworkSource,
                                                    RtlTcpSource)
from sdrplusplusbrown_tpu.io.network_sink import NetworkSink
from sdrplusplusbrown_tpu.io.spyserver_source import (
    SpyServerSource, CMD_HELLO, CMD_SET_SETTING, PROTOCOL_VERSION,
    SETTING_IQ_FREQUENCY, SETTING_STREAMING_ENABLED, MSG_DEVICE_INFO,
    MSG_INT16_IQ)


def _tcp_server(handler):
    """Start a one-connection TCP server; returns (port, thread)."""
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]

    def run():
        conn, _ = srv.accept()
        try:
            handler(conn)
        finally:
            try:
                conn.close()
            except OSError:
                pass
            srv.close()

    th = threading.Thread(target=run, daemon=True)
    th.start()
    return port, th


def _collect(src, n, timeout=5.0):
    got = []
    t0 = time.time()
    for blk in src.blocks(timeout=timeout):
        got.append(blk)
        if sum(len(b) for b in got) >= n or time.time() - t0 > timeout:
            break
    return np.concatenate(got) if got else np.zeros(0, np.complex64)


# ---------------------------------------------------------------------------
# raw network source
# ---------------------------------------------------------------------------

def test_network_source_tcp_int16_roundtrip():
    fs = 100_000.0
    T = 4096
    rng = np.random.default_rng(0)
    iq = (rng.standard_normal(T) + 1j * rng.standard_normal(T)) * 0.3
    pcm = np.empty(2 * T, np.int16)
    pcm[0::2] = np.round(iq.real * 32768).astype(np.int16)
    pcm[1::2] = np.round(iq.imag * 32768).astype(np.int16)

    def handler(conn):
        conn.sendall(pcm.tobytes())
        time.sleep(0.5)

    port, _ = _tcp_server(handler)
    src = NetworkSource(host="127.0.0.1", port=port, protocol="tcp",
                        sample_type="int16", samplerate=fs)
    try:
        got = _collect(src, T)
        assert len(got) >= T // 2
        ref = (pcm[0::2][:len(got)] / 32768.0
               + 1j * pcm[1::2][:len(got)] / 32768.0)
        assert np.max(np.abs(got - ref.astype(np.complex64))) < 1e-6
    finally:
        src.close()


def test_network_source_udp_float32():
    T = 1000
    rng = np.random.default_rng(1)
    iq = (rng.standard_normal(T) + 1j * rng.standard_normal(T)
          ).astype(np.complex64) * 0.2
    flat = np.empty(2 * T, np.float32)
    flat[0::2], flat[1::2] = iq.real, iq.imag

    src = NetworkSource(host="127.0.0.1", port=0, protocol="udp",
                        sample_type="float32", samplerate=48_000.0)
    port = src.sock.getsockname()[1]
    tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    try:
        for i in range(0, 2 * T, 500):
            tx.sendto(flat[i:i + 500].tobytes(), ("127.0.0.1", port))
        got = _collect(src, T)
        assert len(got) == T
        assert np.array_equal(got, iq)
    finally:
        tx.close()
        src.close()


def test_network_source_int8_scaling():
    raw = np.array([127, 0, -128, 64], np.int8).tobytes()

    def handler(conn):
        conn.sendall(raw * 200)
        time.sleep(0.5)

    port, _ = _tcp_server(handler)
    src = NetworkSource(host="127.0.0.1", port=port, protocol="tcp",
                        sample_type="int8", samplerate=102_400.0)
    try:
        got = _collect(src, 4)
        # reference scale: x/128 (volk_8i_s32f_convert_32f with 128.0)
        assert abs(got[0].real - 127 / 128.0) < 1e-6
        assert abs(got[1].real - (-1.0)) < 1e-6
        assert abs(got[1].imag - 0.5) < 1e-6
    finally:
        src.close()


# ---------------------------------------------------------------------------
# rtl_tcp
# ---------------------------------------------------------------------------

def test_rtl_tcp_source_protocol():
    fs = 256_000.0
    T = 4096
    rng = np.random.default_rng(2)
    u8 = rng.integers(0, 256, 2 * T).astype(np.uint8)
    received_cmds = []
    done = threading.Event()

    def handler(conn):
        # standard server banner: "RTL0", tuner type, gain count
        conn.sendall(b"RTL0" + struct.pack(">II", 5, 29))
        conn.sendall(u8.tobytes())
        # collect client command packets (5 bytes each)
        conn.settimeout(3.0)
        buf = b""
        try:
            while len(received_cmds) < 4:
                part = conn.recv(256)
                if not part:
                    break
                buf += part
                while len(buf) >= 5:
                    received_cmds.append(struct.unpack(">BI", buf[:5]))
                    buf = buf[5:]
        except socket.timeout:
            pass
        done.set()

    port, _ = _tcp_server(handler)
    src = RtlTcpSource(host="127.0.0.1", port=port, samplerate=fs)
    try:
        src.tune(100_000_000)
        src.set_gain_mode(True)
        src.set_gain_index(7)
        got = _collect(src, T)
        assert src.tuner_type == 5 and src.tuner_gain_count == 29
        ref = ((u8[0::2].astype(np.float32) - 128) / 128
               + 1j * (u8[1::2].astype(np.float32) - 128) / 128)
        n = len(got)
        assert n >= T // 2
        assert np.max(np.abs(got - ref[:n].astype(np.complex64))) < 1e-6
        assert done.wait(5.0)
        # constructor sends samplerate; then freq, gain mode, gain index
        assert received_cmds[0] == (RtlTcpSource.CMD_SAMPLERATE, int(fs))
        assert (RtlTcpSource.CMD_FREQ, 100_000_000) in received_cmds
        assert (RtlTcpSource.CMD_GAIN_MODE, 1) in received_cmds
        assert (RtlTcpSource.CMD_GAIN_INDEX, 7) in received_cmds
    finally:
        src.close()


# ---------------------------------------------------------------------------
# SpyServer
# ---------------------------------------------------------------------------

def _spyserver_handler(settings_log, iq_int16, max_srate=2_000_000,
                       min_decim=1):
    def handler(conn):
        conn.settimeout(5.0)
        buf = b""

        def read_exact(n):
            nonlocal buf
            while len(buf) < n:
                part = conn.recv(4096)
                if not part:
                    raise ConnectionError
                buf += part
            out, buf2 = buf[:n], buf[n:]
            buf = buf2
            return out

        # hello
        ctype, bsize = struct.unpack("<II", read_exact(8))
        body = read_exact(bsize)
        assert ctype == CMD_HELLO
        ver, = struct.unpack("<I", body[:4])
        assert ver == PROTOCOL_VERSION
        # device info message
        di = struct.pack("<12I", 3, 12345, max_srate, int(max_srate * 0.8),
                         4, 1, 29, 24_000_000, 1_700_000_000, 8,
                         min_decim, 0)
        conn.sendall(struct.pack("<IIIII", ver, MSG_DEVICE_INFO, 0, 0,
                                 len(di)) + di)
        # read settings until streaming enabled, then send IQ
        streaming = False
        while not streaming:
            ctype, bsize = struct.unpack("<II", read_exact(8))
            body = read_exact(bsize)
            if ctype == CMD_SET_SETTING:
                setting, value = struct.unpack("<II", body)
                settings_log.append((setting, value))
                if setting == SETTING_STREAMING_ENABLED and value == 1:
                    streaming = True
        pcm = np.empty(2 * len(iq_int16), np.int16)
        pcm[0::2] = iq_int16.real
        pcm[1::2] = iq_int16.imag
        payload = pcm.astype("<i2").tobytes()
        # gain flag 0 dB in the high 16 bits of MessageType
        conn.sendall(struct.pack("<IIIII", ver, MSG_INT16_IQ, 1, 1,
                                 len(payload)) + payload)
        # then keep the socket open a moment for late setting writes
        try:
            while True:
                ctype, bsize = struct.unpack("<II", read_exact(8))
                body = read_exact(bsize)
                if ctype == CMD_SET_SETTING:
                    settings_log.append(struct.unpack("<II", body))
        except (ConnectionError, socket.timeout, OSError):
            pass
    return handler


def test_spyserver_source_handshake_and_stream():
    T = 2048
    rng = np.random.default_rng(3)
    iq16 = (rng.integers(-20000, 20000, T)
            + 1j * rng.integers(-20000, 20000, T))
    settings = []
    port, _ = _tcp_server(_spyserver_handler(settings, iq16))
    src = SpyServerSource(host="127.0.0.1", port=port, srate_index=1,
                          gain=5)
    try:
        # rate = MaximumSampleRate / 2^(srId + MinimumIQDecimation)
        assert src.samplerate == 2_000_000 / (1 << 2)
        assert src.device_info["DeviceType"] == 3
        src.start_stream(7_100_000.0)
        got = _collect(src, T)
        assert len(got) == T
        ref = (iq16.real / 32768.0 + 1j * iq16.imag / 32768.0)
        assert np.max(np.abs(got - ref.astype(np.complex64))) < 1e-6
        src.tune(14_200_000.0)
        deadline = time.time() + 3
        while time.time() < deadline and \
                (SETTING_IQ_FREQUENCY, 14_200_000) not in settings:
            time.sleep(0.05)
        assert (SETTING_IQ_FREQUENCY, 7_100_000) in settings
        assert (SETTING_IQ_FREQUENCY, 14_200_000) in settings
        assert (SETTING_STREAMING_ENABLED, 1) in settings
    finally:
        src.close()


# ---------------------------------------------------------------------------
# network sink
# ---------------------------------------------------------------------------

def test_network_sink_udp_stereo_interleave():
    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx.bind(("127.0.0.1", 0))
    rx.settimeout(3.0)
    port = rx.getsockname()[1]
    sink = NetworkSink(host="127.0.0.1", port=port, protocol="udp",
                       stereo=True, packer_block=250)
    try:
        T = 500
        audio = np.stack([np.linspace(-0.5, 0.5, T, dtype=np.float32),
                          np.linspace(0.5, -0.5, T, dtype=np.float32)])
        sink.write(audio)
        raw = b""
        while len(raw) < T * 2 * 2:
            part, _ = rx.recvfrom(1 << 16)
            raw += part
        pcm = np.frombuffer(raw, "<i2").astype(np.float32) / 32768.0
        L, R = pcm[0::2], pcm[1::2]
        assert np.max(np.abs(L - audio[0])) < 1e-3
        assert np.max(np.abs(R - audio[1])) < 1e-3
    finally:
        sink.close()
        rx.close()


def test_network_sink_mono_mixdown_and_packing():
    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx.bind(("127.0.0.1", 0))
    rx.settimeout(3.0)
    port = rx.getsockname()[1]
    sink = NetworkSink(host="127.0.0.1", port=port, protocol="udp",
                       stereo=False, packer_block=300)
    try:
        audio = np.stack([np.full(450, 0.25, np.float32),
                          np.full(450, -0.05, np.float32)])
        sink.write(audio)            # 450 frames → one 300-frame packet
        part, _ = rx.recvfrom(1 << 16)
        assert len(part) == 300 * 2
        pcm = np.frombuffer(part, "<i2").astype(np.float32) / 32768.0
        assert np.max(np.abs(pcm - 0.1)) < 1e-3   # (0.25-0.05)/2
        sink.write(audio[:, :150])   # 150 pending + 150 → next packet
        part, _ = rx.recvfrom(1 << 16)
        assert len(part) == 300 * 2
    finally:
        sink.close()
        rx.close()


# ---------------------------------------------------------------------------
# app integration: network source feeds the radio; network sink receives
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_app_with_network_source_and_sink(tmp_path):
    from sdrplusplusbrown_tpu.app import SDRApp
    fs = 240_000.0
    T = int(fs)
    n = np.arange(T)
    audio = 0.8 * np.sin(2 * np.pi * 1000 * n / fs)
    ph = 2 * np.pi * np.cumsum(2500 * audio) / fs
    cap = (0.6 * np.exp(1j * (2 * np.pi * 60e3 * n / fs + ph))
           ).astype(np.complex64)
    flat = np.empty(2 * T, np.float32)
    flat[0::2], flat[1::2] = cap.real, cap.imag

    def feeder(conn):
        # loop the capture until the client hangs up
        try:
            while True:
                conn.sendall(flat.tobytes())
        except OSError:
            pass

    src_port, _ = _tcp_server(feeder)
    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx.bind(("127.0.0.1", 0))
    rx.settimeout(10.0)
    sink_port = rx.getsockname()[1]

    root = str(tmp_path / "root")
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "config.json"), "w") as f:
        json.dump({
            "source": {"type": "network", "host": "127.0.0.1",
                       "port": src_port, "protocol": "tcp",
                       "sampleType": "float32", "samplerate": fs},
            "fftSize": 4096, "fftRate": 20,
            "network_sink": {"host": "127.0.0.1", "port": sink_port,
                             "protocol": "udp", "stereo": False},
            "modules": {"Radio": {"type": "radio", "demod": "NFM",
                                  "offset": 60e3}},
        }, f)
    app = SDRApp(root)
    try:
        assert app.select_sink("Radio", "network")
        app.start()
        raw = b""
        deadline = time.time() + 30
        while len(raw) < 9600 and time.time() < deadline:
            try:
                part, _ = rx.recvfrom(1 << 16)
            except socket.timeout:
                break
            raw += part
        pcm = np.frombuffer(raw, "<i2").astype(np.float32) / 32768.0
        assert len(pcm) >= 4800
        # the 1 kHz tone dominates the demodulated audio
        half = pcm[len(pcm) // 2:]
        X = np.abs(np.fft.rfft(half * np.hanning(len(half))))
        f = np.fft.rfftfreq(len(half), 1 / 48_000.0)
        peak = f[np.argmax(X)]
        assert abs(peak - 1000.0) < 50.0, peak
    finally:
        app.shutdown()
        rx.close()
