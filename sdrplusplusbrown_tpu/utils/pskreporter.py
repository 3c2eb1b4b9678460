"""PSKReporter spot upload client (UDP, IPFIX-style wire format).

reference: decoder_modules/ft8_decoder/src/main.cpp uploads FT8/FT4
decodes to pskreporter.info.  The wire protocol is the public
PSKReporter datagram format (an IPFIX profile, as implemented by the
common amateur clients): a 16-byte header (version 0x000A, length,
epoch seconds, sequence, random session ID), periodic receiver/sender
record-format descriptors using PSKReporter's enterprise-specific
field IDs (enterprise 30351: 0x8001 senderCallsign, 0x8002
receiverCallsign, 0x8004 receiverLocator, 0x8005 frequency, 0x8006
sNR, 0x8007 mode, 0x8008 decoderSoftware, 0x800B informationSource,
plus IPFIX 0x0096 flowStartSeconds), then data sets with the matching
template IDs (0x50E2 receiver, 0x50E3 sender).  Strings are 1-byte
length prefixed; multi-byte integers are big-endian.

Spots are queued by ``add_spot`` and shipped by ``flush`` — the caller
decides cadence (the reference batches ~5 min).  Tested against an
in-process fake server (tests/test_pskreporter.py) that parses the
datagrams back."""

from __future__ import annotations

import secrets
import socket
import struct
import time
from typing import List, Optional

from .flog import flog

_RX_TEMPLATE = 0x50E2
_TX_TEMPLATE = 0x50E3


def _s(text: str) -> bytes:
    b = text.encode("ascii", "replace")[:255]
    return bytes([len(b)]) + b


def _pad4(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 4)


#: receiver record format descriptor (option template, enterprise
#: 30351): receiverCallsign, receiverLocator, decoderSoftware
_RX_DESCRIPTOR = bytes.fromhex(
    "00030024" + format(_RX_TEMPLATE, "04X") + "00030000"
    "8002FFFF0000768F"     # receiverCallsign, var-len
    "8004FFFF0000768F"     # receiverLocator, var-len
    "8008FFFF0000768F"     # decoderSoftware, var-len
    "0000")

#: sender record format descriptor: senderCallsign, frequency, sNR,
#: mode, informationSource, flowStartSeconds
_TX_DESCRIPTOR = bytes.fromhex(
    "00020036" + format(_TX_TEMPLATE, "04X") + "0006"
    "8001FFFF0000768F"     # senderCallsign, var-len
    "800500040000768F"     # frequency, 4 bytes
    "800600010000768F"     # sNR, 1 byte
    "8007FFFF0000768F"     # mode, var-len
    "800B00010000768F"     # informationSource, 1 byte
    "00960004"             # flowStartSeconds
    "0000")


class Spot:
    __slots__ = ("callsign", "freq_hz", "snr_db", "mode", "epoch")

    def __init__(self, callsign: str, freq_hz: int, snr_db: int,
                 mode: str, epoch: Optional[int] = None):
        self.callsign = callsign
        self.freq_hz = int(freq_hz)
        self.snr_db = int(snr_db)
        self.mode = mode
        self.epoch = int(epoch if epoch is not None else time.time())


class PSKReporterClient:
    """Queue decodes, ship PSKReporter datagrams over UDP."""

    def __init__(self, callsign: str, locator: str,
                 software: str = "sdrplusplusbrown_tpu",
                 host: str = "report.pskreporter.info", port: int = 4739,
                 max_spots_per_packet: int = 64):
        self.callsign = callsign
        self.locator = locator
        self.software = software
        self.addr = (host, int(port))
        self.max_spots = int(max_spots_per_packet)
        self.session_id = secrets.randbits(32)
        self.sequence = 0
        self.pending: List[Spot] = []
        self.packets_sent = 0
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)

    # -- queueing ---------------------------------------------------------
    def add_spot(self, callsign: str, freq_hz: float, snr_db: float,
                 mode: str, epoch: Optional[int] = None):
        self.pending.append(Spot(callsign, int(round(freq_hz)),
                                 int(round(snr_db)), mode, epoch))

    # -- wire building ----------------------------------------------------
    def _receiver_set(self) -> bytes:
        body = _s(self.callsign) + _s(self.locator) + _s(self.software)
        body = _pad4(body)
        return struct.pack(">HH", _RX_TEMPLATE, 4 + len(body)) + body

    def _sender_set(self, spots: List[Spot]) -> bytes:
        body = b""
        for sp in spots:
            body += (_s(sp.callsign)
                     + struct.pack(">I", sp.freq_hz)
                     + struct.pack(">b", max(-128, min(127, sp.snr_db)))
                     + _s(sp.mode)
                     + b"\x01"                       # automatic extract
                     + struct.pack(">I", sp.epoch))
        body = _pad4(body)
        return struct.pack(">HH", _TX_TEMPLATE, 4 + len(body)) + body

    def build_packet(self, spots: List[Spot]) -> bytes:
        sets = (_RX_DESCRIPTOR + _TX_DESCRIPTOR + self._receiver_set()
                + self._sender_set(spots))
        hdr = struct.pack(">HHIII", 0x000A, 16 + len(sets),
                          int(time.time()), self.sequence,
                          self.session_id)
        self.sequence += 1
        return hdr + sets

    # -- shipping ---------------------------------------------------------
    def flush(self) -> int:
        """Send all pending spots; returns the number shipped."""
        shipped = 0
        while self.pending:
            batch = self.pending[:self.max_spots]
            self.pending = self.pending[self.max_spots:]
            pkt = self.build_packet(batch)
            try:
                self.sock.sendto(pkt, self.addr)
                self.packets_sent += 1
                shipped += len(batch)
            except OSError as e:
                flog.warn("pskreporter send failed: {}", repr(e))
                self.pending = batch + self.pending
                break
        return shipped

    def close(self):
        try:
            self.sock.close()
        except OSError:
            pass


# ---------------------------------------------------------------------
# datagram parser (fake-server tests + debugging)

def parse_packet(pkt: bytes) -> dict:
    ver, length, epoch, seq, sid = struct.unpack(">HHIII", pkt[:16])
    out = {"version": ver, "length": length, "epoch": epoch,
           "sequence": seq, "session_id": sid, "sets": [],
           "receiver": None, "spots": []}
    pos = 16
    while pos + 4 <= length:
        set_id, set_len = struct.unpack(">HH", pkt[pos:pos + 4])
        body = pkt[pos + 4:pos + set_len]
        out["sets"].append(set_id)
        if set_id == _RX_TEMPLATE:
            p = 0
            vals = []
            for _ in range(3):
                n = body[p]
                vals.append(body[p + 1:p + 1 + n].decode("ascii"))
                p += 1 + n
            out["receiver"] = {"callsign": vals[0], "locator": vals[1],
                               "software": vals[2]}
        elif set_id == _TX_TEMPLATE:
            p = 0
            while p < len(body) and body[p] != 0:
                n = body[p]
                call = body[p + 1:p + 1 + n].decode("ascii")
                p += 1 + n
                freq, = struct.unpack(">I", body[p:p + 4])
                p += 4
                snr, = struct.unpack(">b", body[p:p + 1])
                p += 1
                n = body[p]
                mode = body[p + 1:p + 1 + n].decode("ascii")
                p += 1 + n
                src = body[p]
                p += 1
                t0, = struct.unpack(">I", body[p:p + 4])
                p += 4
                out["spots"].append({"callsign": call, "freq_hz": freq,
                                     "snr_db": snr, "mode": mode,
                                     "source": src, "epoch": t0})
        pos += set_len
        if set_len == 0:
            break
    return out
