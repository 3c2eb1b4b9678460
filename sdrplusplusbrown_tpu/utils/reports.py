"""Spot-report aggregation: RBN telnet client, report records, dedup.

reference: core/src/utils/proto/reporter_services.{h,cpp} — Report
records (:37-52, toString :434-440), the RBN telnet protocol
(connect, wait for "your call", send the callsign, stream "DX de …"
lines, :336-430) and its line parsing (split+coalesce, reporter
"-#" suffix strip, timestamp "HHMMz" → "HH:MM:00Z", WPM comment).
"""

from __future__ import annotations

import dataclasses
import socket
import threading
from typing import Callable, List, Optional

RS_PSKREPORTER, RS_WSPRNET, RS_RBN = 0, 1, 2
_SOURCE_NAMES = {RS_PSKREPORTER: "PSKREPORTER", RS_WSPRNET: "WSPRNET",
                 RS_RBN: "RBN"}


@dataclasses.dataclass
class Report:
    reporting_source: int = RS_RBN
    error_status: str = ""
    reporter_callsign: str = ""
    reported_callsign: str = ""
    timestamp: str = ""
    mode: str = ""
    mode_parameters: str = ""
    receiver_locator: str = ""
    distance: int = -1
    decibel: float = 0.0
    frequency: float = 0.0       # Hz (RBN lines carry kHz; kept as-is
                                 # like the reference's atof)

    def to_string(self) -> str:
        if self.error_status:
            return "STATUS:" + self.error_status
        return (f"{_SOURCE_NAMES.get(self.reporting_source, '?')}: "
                f"{self.reported_callsign} by {self.reporter_callsign} "
                f"TS:{self.timestamp} {self.mode} "
                f"{self.mode_parameters} LOC:{self.receiver_locator} "
                f"FREQ:{self.frequency:.6f} SNR:{self.decibel:.6f}")


def parse_rbn_line(line: str) -> Optional[Report]:
    """Parse one RBN spot line (reporter_services.cpp:387-424), e.g.
    ``DX de W3LPL-#:  14025.1  K1ABC  CW  12 dB  17 WPM  CQ  1530Z``."""
    if not line.startswith("DX de"):
        return None
    parts = [p for p in line.split(" ") if p]        # split + coalesce
    if len(parts) < 12:
        return None
    r = Report(reporting_source=RS_RBN)
    r.reporter_callsign = parts[2].rstrip(":")
    suff = r.reporter_callsign.find("-#")
    if suff >= 0:
        r.reporter_callsign = r.reporter_callsign[:suff]
    try:
        r.frequency = float(parts[3])
        r.decibel = float(parts[6])
    except ValueError:
        return None
    r.reported_callsign = parts[4]
    r.mode = parts[5]
    r.mode_parameters = f"{parts[8]} {parts[9]}"
    ts = parts[-1]
    head = line[:line.rfind(ts)]
    if len(ts) >= 4:
        r.timestamp = f"{ts[:2]}:{ts[2:4]}:00Z"
    wpm = head.rfind("WPM")
    if wpm >= 0:
        r.mode_parameters += ": " + head[wpm + 4:].strip()
    return r


class ReportAggregator:
    """Dedup + ring of recent reports (reporters_monitor main.cpp:434-470:
    duplicates share mode+reporter+reported+timestamp)."""

    def __init__(self, limit: int = 500):
        self.limit = int(limit)
        self._lock = threading.Lock()
        self.reports: List[Report] = []

    def add(self, report: Report) -> bool:
        with self._lock:
            for rep in self.reports:
                if (rep.mode == report.mode
                        and rep.reporter_callsign
                        == report.reporter_callsign
                        and rep.reported_callsign
                        == report.reported_callsign
                        and rep.timestamp == report.timestamp):
                    return False
            self.reports.insert(0, report)
            del self.reports[self.limit:]
            return True

    def status(self) -> str:
        with self._lock:
            return f"RPTS: {len(self.reports):03d}"

    def snapshot(self, n: int = 50) -> List[Report]:
        with self._lock:
            return list(self.reports[:n])


class RBNClient:
    """Telnet client for the Reverse Beacon Network
    (reporter_services.cpp:334-430; host/port injectable for tests —
    production default telnet.reversebeacon.net:7000)."""

    def __init__(self, callsign: str,
                 callback: Callable[[Report], None],
                 host: str = "telnet.reversebeacon.net",
                 port: int = 7000, spot_filter: str = ""):
        self.callsign = callsign
        self.callback = callback
        self.host, self.port = host, int(port)
        #: only spots whose reported callsign contains this pass
        #: ("" = all — the reference's `callsign == ""` branch)
        self.spot_filter = spot_filter
        self.status = "idle"
        self.count = 0
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self._sock: Optional[socket.socket] = None

    def start(self):
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def stop(self):
        self._stop.set()
        if self._sock is not None:
            try:
                self._sock.close()
            except OSError:
                pass
        if self._thread is not None:
            self._thread.join(timeout=5)

    def _run(self):
        try:
            sock = socket.create_connection((self.host, self.port),
                                            timeout=10)
            self._sock = sock
            greeting = sock.recv(10240).decode(errors="replace")
            if "your call" not in greeting:
                self.status = "Protocol error"
                sock.close()
                return
            sock.sendall((self.callsign + "\r\n").encode())
            self.status = "telnet connected."
            buf = ""
            sock.settimeout(1.0)
            while not self._stop.is_set():
                try:
                    chunk = sock.recv(10240)
                except socket.timeout:
                    continue
                except OSError:
                    break
                if not chunk:
                    break
                buf += chunk.decode(errors="replace")
                while "\n" in buf:
                    line, buf = buf.split("\n", 1)
                    line = line.rstrip("\r")
                    rep = parse_rbn_line(line)
                    if rep is None:
                        continue
                    self.count += 1
                    if (not self.spot_filter
                            or self.spot_filter
                            in rep.reported_callsign):
                        self.callback(rep)
                    self.status = f"streaming: {self.count}"
        except OSError as e:
            self.status = f"receive: {e}"
        finally:
            if self._sock is not None:
                try:
                    self._sock.close()
                except OSError:
                    pass
