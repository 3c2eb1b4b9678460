"""RyFi data-link receiver/transmitter — QPSK + K=7 conv + RS(255,223)
with packet-over-frame framing.

reference: decoder_modules/ryfi_decoder/src/ryfi/ — the fork's own
wideband digital data link:

  * PSK4 demod (RRC 31/0.6, AGC 0.1, Costas 0.005, M&M 1e-6/0.01,
    receiver.cpp:19);
  * Deframer: hard-dibit shift register matched against the 64-bit sync
    0x341CC540819D8963 in all four QPSK rotations (Hamming < 6), then
    8168 de-rotated payload symbols per frame (framing.cpp:52-135);
  * soft conv decode, rate 1/2 K=7 polys 0o161/0o127 (libcorrect
    r12_7, conv_codec.cpp:4-35);
  * 4x RS(255,223) with a 1020-byte XOR scrambler (rs_codec.cpp:36,103);
  * Frame: u16 counter | u16 firstPacket | u16 lastPacket | 886-byte
    data area (frame.cpp); packets are u16-size-prefixed and may span
    frames (receiver.cpp:69-195 reassembly, packet.cpp:99-110).

Wire note: TX/RX here are self-consistent and follow the documented
layout; bit-level interop with the fork's libcorrect build is untested
(no RyFi hardware in this environment).  The scrambler sequence is the
protocol's 1020-byte constant carried as data.
"""

from __future__ import annotations

import base64
from typing import List, Optional, Tuple

import numpy as np

import jax.numpy as jnp

from ..runtime.block import Block
from ..ops.fec import conv_encode, viterbi_decode, rs_encode, rs_decode
from ..ops.demod_digital import PSKDemod

SYNC_WORD = 0x341CC540819D8963            # framing.h:8
SYNC_BITS = 64
SYNC_SYMS = SYNC_BITS // 2
FRAME_SYMS = 8168                         # framing.cpp:127
RS_BLOCK_ENC, RS_BLOCK_DEC, RS_BLOCKS = 255, 223, 4
FRAME_SIZE = RS_BLOCK_DEC * RS_BLOCKS     # 892
FRAME_DATA_SIZE = FRAME_SIZE - 6          # 886
PKT_OFFS_NONE = 0xFFFF
MAX_CONTENT_SIZE = 0x3FFF
CONV_G1, CONV_G2, CONV_K = 0o161, 0o127, 7

# rs_codec.cpp:103 — the protocol's scrambler sequence (config data)
SCRAMBLER = np.frombuffer(base64.b64decode(
    "dQV8zvHQbPb6Zfb84AqCF2y+dqDWRhIu3rX3rctRY0cnMH5D0aHLEAhJ34bUxNc8bQMHN1uzzXlvHrrFbsOMeiWZYVRalleb4GBbCW2LLZ0VnQ6/V/ucSYIsSFmSR3kXFnTq6rvFcjIX0bPe6xXHVYryiMIzpheL1HciAGNHRV82NViLiOzKxGBTnr2y9VFGNJoHJT/1ZWN3PFr6Tgz3G4KrcwZ/t8Zrv7FG8wGRsf9cb/lDDmpwiQvqjNQbUQExcS7fJMHV2w7163h5OVutw6mmYDCimnug9KrFV7MW+bV5IMGImgBDssaEjQPy2JB6ITd+93Xl+8ncq0u8NTi5OlOJftWUEi2bkZAdTQ7gk/PBoZtzJyJBJ+4q10W8j5uiNhEWNxrxLnHPhomDWvEkbFZxU+TSy8qGHqDVgzvvCQnCB1OG5orGcPuRQ8uRbqm8MUJhDIi4LO3Y5qPsrLlFXixzPy4G4L9z3S5FUGxTVfB/bmH6oHoc8L2sSGEDa+1UKieU9vlqBAgLPMMwZgH73MllA4N9Ct+lBBTk8kwB3wTSgLmb2V74KpONjAmbOOw7xCmQfGU68ktp02ObQJXD+2dUQJsmn1L+2NAknFzU794oZnUEy6TAuUvJIEtWx4bFOUUYp0gUGlHK0MAV3cEoSnrSEOqD0zrvSClBpNRXph12JJNYfrfdC/LOcVX1q4zIcFlzaZ0pXln0ssSXdfBlG2ZfpDNcx79F5iDAva2un5cF2AQrCkbouMsA4nxwG0negeskrBs+Cfust/LRsnjzrMdqogdM7WGtBH9Fg1kxJ/AWawyq1NHLHFFBDS+P+fl/IolG9LiTmJ4+I/FuZAi2yW5TU+2tIc0a8EX8FADq90Lu2lgNhbx0+3N4tV5eb29+OcIFUNs9uPOPgOxGKTmJ81Wcal982XwT5FZe6WAZ4n3EQZKN2iFYIOmoTBY0may3ML05GaybSyf6MsFIoYA0Nh77kkM1ci3v0vL8woWrWUCNnRof4pKHovkseOTDJlYHs3iveT2I9K1mfAdYmIIaJvf9zv917au9rm1cKJHzt1wnBew7492TJH+tFKpJYY+WH6qy7qgkQXzc8Sgm5n+YIFBfkCGKCSZZ0Acv4TVNCyCy1d21rBv+2eM18bg/PfwLWlepkivIPsKq77mYLKir9qG/vI2XonTZ5ZmFgRWw54tIhvSUnGKC0SwkS6x6uE5K0vaq7eCcmNLfwby/VX1Atd7UJbuB9Acd5zy0YslVCjrVzpftMHZ2UbyM5FS+t7XN+HY3Uyyf5Mfr9Y0jitrRqdhMU/NJpxpd5QNJUtPiH6U1nLsLxw2kZVSLOfE7ZyFxEOd2xKjCnZPGUboj"), np.uint8).copy()
assert len(SCRAMBLER) == RS_BLOCK_ENC * RS_BLOCKS

AMP = 0.070710678118                      # framing.cpp:4-9
# symbol index (bit1<<1 | bit0) -> complex; re sign = MSB, im sign = LSB
QPSK_SYMBOLS = np.array([(-1 - 1j), (-1 + 1j), (1 - 1j), (1 + 1j)],
                        np.complex64) * AMP


def _bits_of(word: int, n: int) -> np.ndarray:
    return np.array([(word >> (n - 1 - i)) & 1 for i in range(n)],
                    np.uint8)


def _dibits_to_syms(bits: np.ndarray) -> np.ndarray:
    d = bits.reshape(-1, 2)
    return QPSK_SYMBOLS[(d[:, 0] << 1) | d[:, 1]]


SYNC_SYMBOLS = _dibits_to_syms(_bits_of(SYNC_WORD, 64))


def _rot_sync(word: int) -> List[int]:
    """Four constellation rotations of the sync word (framing.cpp:52-81):
    0 deg = word, 180 = ~word, 90 = per-dibit rotation, 270 = ~that."""
    quad = 0
    for i in range(62, -1, -2):
        sym = (word >> i) & 0b11
        rsym = {0b00: 0b10, 0b01: 0b00, 0b11: 0b01, 0b10: 0b11}[sym]
        quad = ((quad << 2) | rsym) & ((1 << 64) - 1)
    mask = (1 << 64) - 1
    return [word, quad, (~word) & mask, (~quad) & mask]


SYNC_ROTS = _rot_sync(SYNC_WORD)
SYM_ROTS = np.array([1.0, -1.0j, -1.0, 1.0j], np.complex64)


# ----------------------------------------------------------------------
# Frame + packet layer

class Frame:
    def __init__(self, counter=0, first_packet=PKT_OFFS_NONE,
                 last_packet=PKT_OFFS_NONE,
                 content: Optional[np.ndarray] = None):
        self.counter = int(counter) & 0xFFFF
        self.first_packet = int(first_packet) & 0xFFFF
        self.last_packet = int(last_packet) & 0xFFFF
        self.content = np.zeros(FRAME_DATA_SIZE, np.uint8) \
            if content is None else np.asarray(content, np.uint8)

    def serialize(self) -> np.ndarray:
        out = np.empty(FRAME_SIZE, np.uint8)
        out[0], out[1] = self.counter >> 8, self.counter & 0xFF
        out[2], out[3] = self.first_packet >> 8, self.first_packet & 0xFF
        out[4], out[5] = self.last_packet >> 8, self.last_packet & 0xFF
        out[6:] = self.content
        return out

    @staticmethod
    def deserialize(b: np.ndarray) -> "Frame":
        b = np.asarray(b, np.uint8)
        return Frame((int(b[0]) << 8) | int(b[1]),
                     (int(b[2]) << 8) | int(b[3]),
                     (int(b[4]) << 8) | int(b[5]), b[6:FRAME_SIZE])


def pack_packets(packets: List[bytes], counter0: int = 1) -> List[Frame]:
    """Serialize u16-size-prefixed packets into consecutive frames
    (transmitter.cpp semantics: firstPacket/lastPacket are the offsets of
    the first/last packet SIZE fields in each frame)."""
    stream = b"".join(len(p).to_bytes(2, "big") + bytes(p)
                      for p in packets)
    # packet start offsets within the stream
    starts = []
    off = 0
    for p in packets:
        starts.append(off)
        off += 2 + len(p)
    frames = []
    pos = 0
    counter = counter0
    while pos < len(stream):
        chunk = stream[pos:pos + FRAME_DATA_SIZE]
        in_frame = [s - pos for s in starts
                    if pos <= s < pos + FRAME_DATA_SIZE
                    and (s - pos) <= FRAME_DATA_SIZE - 2]
        content = np.zeros(FRAME_DATA_SIZE, np.uint8)
        content[:len(chunk)] = np.frombuffer(chunk, np.uint8)
        f = Frame(counter,
                  in_frame[0] if in_frame else PKT_OFFS_NONE,
                  in_frame[-1] if in_frame else PKT_OFFS_NONE, content)
        frames.append(f)
        pos += FRAME_DATA_SIZE
        counter += 1
    return frames


class PacketAssembler:
    """Frame stream -> packets (receiver.cpp:69-195)."""

    def __init__(self):
        self.last_counter = 0
        self.pkt_expected = 0
        self.pkt_read = 0
        self.buf = np.zeros(MAX_CONTENT_SIZE, np.uint8)
        self.packets: List[bytes] = []
        self.lost_frames = 0

    def push_frame(self, frame: Frame):
        expected = (self.last_counter + 1) & 0xFFFF
        self.last_counter = frame.counter
        frame_read = 0
        if frame.counter != expected:
            self.lost_frames += (frame.counter - expected) & 0xFFFF
            self.pkt_expected = self.pkt_read = 0
            if frame.first_packet != PKT_OFFS_NONE:
                if frame.first_packet > FRAME_DATA_SIZE - 2:
                    return
                frame_read = frame.first_packet
        if not self.pkt_expected and frame.first_packet == PKT_OFFS_NONE:
            return
        first, last = True, False
        while frame_read < FRAME_DATA_SIZE:
            if self.pkt_expected:
                readable = min(self.pkt_expected - self.pkt_read,
                               FRAME_DATA_SIZE - frame_read)
                self.buf[self.pkt_read:self.pkt_read + readable] = \
                    frame.content[frame_read:frame_read + readable]
                self.pkt_read += readable
                frame_read += readable
                if self.pkt_read >= self.pkt_expected:
                    self.packets.append(
                        self.buf[:self.pkt_expected].tobytes())
                    self.pkt_read = self.pkt_expected = 0
                    if last or frame.first_packet == PKT_OFFS_NONE:
                        frame_read = FRAME_DATA_SIZE
                continue
            if FRAME_DATA_SIZE - frame_read < 2:
                frame_read = FRAME_DATA_SIZE
                self.pkt_expected = self.pkt_read = 0
                continue
            if first:
                frame_read = frame.first_packet
                first = False
            last = frame_read == frame.last_packet
            self.pkt_expected = (int(frame.content[frame_read]) << 8) \
                | int(frame.content[frame_read + 1])
            frame_read += 2


# ----------------------------------------------------------------------
# Coding layer

def _bytes_to_bits(b: np.ndarray) -> np.ndarray:
    return np.unpackbits(np.asarray(b, np.uint8))


def encode_frame_symbols(frame: Frame) -> np.ndarray:
    """frame -> sync + 8168 QPSK symbols (TX: rs+scramble+conv+map)."""
    enc = np.zeros(RS_BLOCK_ENC * RS_BLOCKS, np.uint8)
    raw = frame.serialize()
    for blk in range(RS_BLOCKS):
        enc[blk * RS_BLOCK_ENC:(blk + 1) * RS_BLOCK_ENC] = \
            np.frombuffer(rs_encode(
                raw[blk * RS_BLOCK_DEC:(blk + 1) * RS_BLOCK_DEC]
                .tobytes(), 32), np.uint8)
    enc ^= SCRAMBLER
    coded = conv_encode(_bytes_to_bits(enc), CONV_G1, CONV_G2, CONV_K)
    pad = 2 * FRAME_SYMS - len(coded)
    assert pad >= 0, pad
    coded = np.concatenate([coded, np.zeros(pad, np.uint8)])
    return np.concatenate([SYNC_SYMBOLS, _dibits_to_syms(coded)])


def decode_frame_symbols(syms: np.ndarray) -> Optional[Frame]:
    """8168 de-rotated soft symbols -> Frame (conv+descramble+rs)."""
    soft = np.empty(2 * FRAME_SYMS, np.float32)
    # dibit MSB is the re sign, LSB the im sign; map +/- -> 1/0 softly
    soft[0::2] = np.clip(np.real(syms) / (2 * AMP) + 0.5, 0.0, 1.0)
    soft[1::2] = np.clip(np.imag(syms) / (2 * AMP) + 0.5, 0.0, 1.0)
    bits = viterbi_decode(jnp.asarray(soft), CONV_G1, CONV_G2, CONV_K)
    enc = np.packbits(bits[:RS_BLOCK_ENC * RS_BLOCKS * 8])
    enc ^= SCRAMBLER
    out = np.zeros(FRAME_SIZE, np.uint8)
    for blk in range(RS_BLOCKS):
        dec = rs_decode(enc[blk * RS_BLOCK_ENC:(blk + 1) * RS_BLOCK_ENC]
                        .tobytes(), 32)
        if dec is None:
            return None
        out[blk * RS_BLOCK_DEC:(blk + 1) * RS_BLOCK_DEC] = \
            np.frombuffer(dec, np.uint8)
    return Frame.deserialize(out)


# ----------------------------------------------------------------------
# Symbol-level deframer (host; byte-rate work)

class Deframer:
    """Soft symbol stream -> 8168-symbol de-rotated frames
    (framing.cpp:89-135)."""

    def __init__(self):
        self.shift = 0
        self.known_rot = 0
        self.recv = 0
        self.cur: List[np.ndarray] = []
        self.frames: List[np.ndarray] = []

    def push_symbols(self, syms: np.ndarray):
        syms = np.asarray(syms, np.complex64)
        i = 0
        n = len(syms)
        while i < n:
            if self.recv:
                take = min(self.recv, n - i)
                self.cur.append(syms[i:i + take]
                                * SYM_ROTS[self.known_rot])
                self.recv -= take
                i += take
                if self.recv == 0:
                    self.frames.append(np.concatenate(self.cur))
                    self.cur = []
                continue
            s = syms[i]
            sym = ((2 if s.real > 0 else 0) | (1 if s.imag > 0 else 0))
            self.shift = ((self.shift << 2) | sym) & ((1 << 64) - 1)
            for k in range(4):
                rot = (self.known_rot + k) & 0b11
                if bin(self.shift ^ SYNC_ROTS[rot]).count("1") < 6:
                    self.known_rot = rot
                    self.recv = FRAME_SYMS
                    self.cur = []
                    break
            i += 1


class RyfiReceiver:
    """Baseband -> packets: PSK4 demod + deframe + FEC + reassembly."""

    def __init__(self, baudrate: float, samplerate: float):
        # receiver.cpp:19 demod parameters
        self.demod = PSKDemod(4, baudrate, samplerate, rrc_tap_count=31,
                              rrc_beta=0.6, agc_rate=0.1,
                              costas_bandwidth=0.005)
        self.deframer = Deframer()
        self.assembler = PacketAssembler()
        self.frames_decoded = 0
        self.frames_bad = 0
        import jax
        self._step = jax.jit(lambda s, x: self.demod.apply(None, s, x))
        self._state = self.demod.init_state(())

    def process(self, iq: np.ndarray) -> List[bytes]:
        import jax.numpy as jnp
        (sym, valid), self._state = self._step(self._state,
                                               jnp.asarray(iq))
        before = len(self.assembler.packets)
        self.deframer.push_symbols(np.asarray(sym)[np.asarray(valid)])
        while self.deframer.frames:
            syms = self.deframer.frames.pop(0)
            frame = decode_frame_symbols(syms)
            if frame is None:
                self.frames_bad += 1
                continue
            self.frames_decoded += 1
            self.assembler.push_frame(frame)
        return self.assembler.packets[before:]


def transmit_packets(packets: List[bytes],
                     counter0: int = 1) -> np.ndarray:
    """packets -> QPSK symbol stream (1 sample/symbol)."""
    out = [encode_frame_symbols(f)
           for f in pack_packets(packets, counter0)]
    return np.concatenate(out) if out else np.zeros(0, np.complex64)
