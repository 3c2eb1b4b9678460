"""Hermes Lite 2 source/transmitter tests against an in-process fake
device speaking openHPSDR protocol 1 over UDP loopback (the reference
module: source_modules/hl2_source — hl2_device.h framing,
protocol1_discovery.cpp discovery)."""

import socket
import struct
import threading
import time

import numpy as np

from sdrplusplusbrown_tpu.io.hl2_source import (
    HL2Source, decode_rx_frame, encode_tx_samples, relays_for_frequency,
    discover, FRAME_BYTES, SAMPLES_PER_FRAME, SYNC, REG_RX_FREQ,
    FULL_SCALE_24)


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _build_ep6_frame(control, iq):
    """Fake-device side EP6 frame builder: 24-bit big-endian I/Q."""
    frame = np.zeros(FRAME_BYTES, np.uint8)
    frame[0] = frame[1] = frame[2] = SYNC
    frame[3:8] = control
    body = frame[8:8 + SAMPLES_PER_FRAME * 8].reshape(SAMPLES_PER_FRAME, 8)
    i24 = np.round(iq.real * FULL_SCALE_24).astype(np.int64) & 0xFFFFFF
    q24 = np.round(iq.imag * FULL_SCALE_24).astype(np.int64) & 0xFFFFFF
    body[:, 0] = i24 >> 16
    body[:, 1] = (i24 >> 8) & 0xFF
    body[:, 2] = i24 & 0xFF
    body[:, 3] = q24 >> 16
    body[:, 4] = (q24 >> 8) & 0xFF
    body[:, 5] = q24 & 0xFF
    return frame


def _metis(endpoint, payload, seq=0):
    return struct.pack(">BBBBI", 0xEF, 0xFE, 0x01, endpoint, seq) + payload


class FakeHL2:
    """Minimal protocol-1 peer: records register writes and TX IQ,
    answers RQST'd frequency readbacks with an ACK, and streams EP6
    IQ frames on demand."""

    def __init__(self):
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self.sock.bind(("127.0.0.1", 0))
        self.sock.settimeout(0.1)
        self.port = self.sock.getsockname()[1]
        self.peer = None
        self.started = threading.Event()
        self.stopped = threading.Event()
        self.lock = threading.Lock()
        self.registers = {}          # reg -> last u32 value
        self.mox_seen = False
        self.tx_iq = []              # decoded 16-bit TX samples (complex)
        self.acked_freqs = []
        self._run = True
        self._seq = 0
        self.thread = threading.Thread(target=self._loop, daemon=True)
        self.thread.start()

    def _decode_ep2_frame(self, frame):
        if frame[0] != SYNC or frame[1] != SYNC or frame[2] != SYNC:
            return
        c0 = frame[3]
        mox = bool(c0 & 1)
        rqst = bool(c0 & 0x80)
        reg = (c0 >> 1) & 0x3F if not rqst else (c0 >> 1) & 0x1F
        value = struct.unpack(">I", bytes(frame[4:8]))[0]
        with self.lock:
            self.registers[reg] = value
            if mox:
                self.mox_seen = True
                body = np.frombuffer(bytes(frame[8:8 + 63 * 8]),
                                     np.uint8).reshape(63, 8)
                i16 = ((body[:, 4].astype(np.int32) << 8)
                       | body[:, 5]).astype(np.uint16).astype(np.int16)
                q16 = ((body[:, 6].astype(np.int32) << 8)
                       | body[:, 7]).astype(np.uint16).astype(np.int16)
                if np.any(i16) or np.any(q16):   # frames w/o queued TX IQ
                    self.tx_iq.append(i16 / 32767.0 + 1j * (q16 / 32767.0))
        if rqst and reg == REG_RX_FREQ and self.peer:
            # ACK the readback (hl2_device.h ACK path)
            ack = np.zeros(5, np.uint8)
            ack[0] = 0x80 | (REG_RX_FREQ << 1)
            ack[1:5] = np.frombuffer(struct.pack(">I", value), np.uint8)
            self.acked_freqs.append(value)
            self.send_frames(ack, np.zeros(SAMPLES_PER_FRAME, np.complex64))

    def _loop(self):
        while self._run:
            try:
                raw, addr = self.sock.recvfrom(2048)
            except socket.timeout:
                continue
            except OSError:
                return
            if len(raw) < 4 or raw[0] != 0xEF or raw[1] != 0xFE:
                continue
            self.peer = addr
            if raw[2] == 0x04:
                (self.started if raw[3] & 1 else self.stopped).set()
            elif raw[2] == 0x01 and raw[3] == 0x02 and len(raw) >= 1032:
                buf = np.frombuffer(raw, np.uint8)
                self._decode_ep2_frame(buf[8:8 + FRAME_BYTES])
                self._decode_ep2_frame(buf[8 + FRAME_BYTES:])
            elif raw[2] == 0x02:
                # discovery: board 6, gateware 73 (HL2), 4 receivers
                resp = bytearray(60)
                resp[0], resp[1], resp[2] = 0xEF, 0xFE, 0x02
                resp[3:9] = bytes.fromhex("02aabbccddee")
                resp[9], resp[10] = 73, 6
                resp[0x13] = 4
                self.sock.sendto(bytes(resp), addr)

    def send_frames(self, control, iq):
        """Push one EP6 packet (two frames: data + idle) to the peer."""
        f1 = _build_ep6_frame(control, iq)
        f2 = _build_ep6_frame(np.zeros(5, np.uint8),
                              np.zeros(SAMPLES_PER_FRAME, np.complex64))
        self._seq += 1
        self.sock.sendto(_metis(6, f1.tobytes() + f2.tobytes(), self._seq),
                         self.peer)

    def close(self):
        self._run = False
        self.thread.join(timeout=2.0)
        self.sock.close()


def _wait(pred, timeout=5.0):
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        if pred():
            return True
        time.sleep(0.01)
    return False


# ---------------------------------------------------------------------------
# codec units
# ---------------------------------------------------------------------------

def test_rx_frame_codec_roundtrip_including_negative_samples():
    rng = np.random.default_rng(7)
    iq = (rng.uniform(-1, 1, SAMPLES_PER_FRAME)
          + 1j * rng.uniform(-1, 1, SAMPLES_PER_FRAME)).astype(np.complex64)
    iq[0] = -1.0 - 1.0j        # full-scale negative → sign extension
    control = np.array([0x00, 1, 0, 0, 0], np.uint8)
    frame = _build_ep6_frame(control, iq)
    ctl, out, _mic = decode_rx_frame(frame)
    assert ctl is not None and list(ctl) == list(control)
    assert out.shape == (1, SAMPLES_PER_FRAME)
    np.testing.assert_allclose(out[0].real, iq.real, atol=2 / FULL_SCALE_24)
    np.testing.assert_allclose(out[0].imag, iq.imag, atol=2 / FULL_SCALE_24)


def test_rx_frame_without_sync_is_dropped():
    frame = np.zeros(FRAME_BYTES, np.uint8)
    ctl, iq, _ = decode_rx_frame(frame)
    assert ctl is None and iq.shape[1] == 0


def test_encode_tx_samples_clips_and_scales():
    dest = np.zeros(8 * 4, np.uint8)
    samples = np.array([0.5, -0.5j, 2.0, 0.25 + 0.25j], np.complex64)
    clipped = encode_tx_samples(dest, samples, scale=1.0)
    assert clipped == 1                      # |2.0| > 1 renormalized
    body = dest.reshape(4, 8)

    def s16(hi, lo):
        return struct.unpack(">h", bytes([int(hi), int(lo)]))[0]

    i0 = s16(body[0, 4], body[0, 5])
    q1 = s16(body[1, 6], body[1, 7])
    i2 = s16(body[2, 4], body[2, 5])
    assert abs(i0 - 16383) <= 1
    assert abs(q1 + 16383) <= 1
    assert abs(i2 - 32767) <= 1              # clipped to full scale


def test_band_relay_map():
    assert relays_for_frequency(7_100_000) == 4      # 40 m
    assert relays_for_frequency(14_200_000) == 8     # 20 m
    assert relays_for_frequency(28_500_000) == 32    # 10 m
    assert relays_for_frequency(150_000_000) == 0    # out of band


# ---------------------------------------------------------------------------
# protocol against the fake device
# ---------------------------------------------------------------------------

def test_discovery_against_fake_device():
    fake = FakeHL2()
    try:
        found = discover(host="127.0.0.1", port=fake.port, timeout=1.0)
    finally:
        fake.close()
    assert len(found) == 1
    dev = found[0]
    assert dev["name"] == "Hermes Lite V2"
    assert dev["gateware_version"] == 73
    assert dev["supported_receivers"] == 4
    assert dev["mac"] == "02:aa:bb:cc:dd:ee"


def test_source_streams_rx_iq_and_programs_registers():
    fake = FakeHL2()
    src = HL2Source(host="127.0.0.1", port=fake.port, samplerate=192_000,
                    pacer_interval=0.0005)
    try:
        assert _wait(fake.started.is_set)
        # register 0 carries the sample-rate bits and duplex flag
        assert _wait(lambda: 0 in fake.registers)
        r0 = fake.registers[0]
        assert (r0 >> 24) & 0x3 == 0x02          # 192 kHz speed bits
        assert r0 & 0b100                        # duplex

        # tune → RX frequency register + 20 m relay bits + RQST/ACK
        src.tune(14_200_000)
        assert _wait(lambda: fake.registers.get(REG_RX_FREQ) == 14_200_000)
        assert _wait(lambda: len(fake.acked_freqs) > 0)
        assert _wait(lambda: src.device.confirmed_frequency == 14_200_000)
        assert _wait(
            lambda: ((fake.registers.get(0, 0) >> 16) & 0xFF) == (8 << 1))

        # stream a known ramp through EP6 and read it off the source
        ramp = (np.arange(SAMPLES_PER_FRAME) / 128.0).astype(np.complex64)
        for _ in range(3):
            fake.send_frames(np.zeros(5, np.uint8), ramp)
        data = []
        for blk in src.blocks(timeout=2.0):
            if np.abs(blk).max() > 0:
                data.append(blk)
                break
        assert data, "no nonzero IQ block received"
        np.testing.assert_allclose(data[0].real, ramp.real,
                                   atol=2 / FULL_SCALE_24)
    finally:
        src.close()
        fake.close()


def test_transmit_path_and_telemetry():
    fake = FakeHL2()
    src = HL2Source(host="127.0.0.1", port=fake.port, samplerate=48_000,
                    pacer_interval=0.0005)
    try:
        assert _wait(fake.started.is_set)
        src.set_tx_gain(1.0)
        src.set_ptt(True)
        assert src.get_ptt()
        tone = (0.5 * np.exp(2j * np.pi * 0.01
                             * np.arange(SAMPLES_PER_FRAME * 4))
                ).astype(np.complex64)
        src.send_iq(tone)
        assert _wait(lambda: len(fake.tx_iq) >= 4)
        with fake.lock:
            sent = np.concatenate(fake.tx_iq[:4])
        np.testing.assert_allclose(sent.real, tone.real, atol=2e-4)
        np.testing.assert_allclose(sent.imag, tone.imag, atol=2e-4)
        assert fake.mox_seen

        # telemetry: forward (group 1) then reverse (group 2) power
        fwd, rev = 2000, 500
        c1 = np.array([1 << 3, 0, 0, fwd >> 8, fwd & 0xFF], np.uint8)
        fake.send_frames(c1, np.zeros(SAMPLES_PER_FRAME, np.complex64))
        c2 = np.array([2 << 3, rev >> 8, rev & 0xFF, 0, 0], np.uint8)
        fake.send_frames(c2, np.zeros(SAMPLES_PER_FRAME, np.complex64))
        assert _wait(lambda: src.get_forward_power() > 0)
        assert src.get_swr() >= 1.0
        src.set_ptt(False)
    finally:
        src.close()
        fake.close()
