"""Misc control-surface modules: reports_monitor (RBN against a fake
telnet server), websdr_view (KiwiSDR client against a fake kiwi WS
server), discord presence formatting.
"""

import socket
import struct
import threading
import time

import numpy as np
import pytest

from sdrplusplusbrown_tpu.utils.reports import (parse_rbn_line,
                                                ReportAggregator,
                                                RBNClient, Report)
from sdrplusplusbrown_tpu.modules.discord_module import \
    format_presence_freq

RBN_LINE = ("DX de W3LPL-#:   14025.1  K1ABC         CW    12 dB  "
            "17 WPM  CQ      1530Z")


def test_parse_rbn_line():
    r = parse_rbn_line(RBN_LINE)
    assert r is not None
    assert r.reporter_callsign == "W3LPL"
    assert r.reported_callsign == "K1ABC"
    assert r.mode == "CW"
    assert r.frequency == 14025.1
    assert r.decibel == 12.0
    assert r.timestamp == "15:30:00Z"
    assert "17 WPM" in r.mode_parameters
    assert parse_rbn_line("not a spot") is None
    assert "K1ABC by W3LPL" in r.to_string()


def test_aggregator_dedup():
    agg = ReportAggregator()
    r = parse_rbn_line(RBN_LINE)
    assert agg.add(r)
    assert not agg.add(parse_rbn_line(RBN_LINE))    # duplicate
    r2 = parse_rbn_line(RBN_LINE.replace("1530Z", "1531Z"))
    assert agg.add(r2)
    assert agg.status() == "RPTS: 002"
    assert agg.snapshot(1)[0].timestamp == "15:31:00Z"


def _fake_rbn_server(sock, lines):
    conn, _ = sock.accept()
    conn.sendall(b"Please enter your call: ")
    got = b""
    while b"\r\n" not in got:
        got += conn.recv(256)
    for ln in lines:
        conn.sendall(ln.encode() + b"\r\n")
        time.sleep(0.05)
    time.sleep(0.5)
    conn.close()


@pytest.mark.slow
def test_rbn_client_against_fake_server():
    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    lines = [RBN_LINE, "random banner line",
             RBN_LINE.replace("K1ABC", "W9XYZ").replace("1530Z",
                                                        "1532Z")]
    t = threading.Thread(target=_fake_rbn_server, args=(srv, lines),
                         daemon=True)
    t.start()
    agg = ReportAggregator()
    cli = RBNClient("", agg.add, host="127.0.0.1", port=port)
    cli.start()
    deadline = time.time() + 10
    while time.time() < deadline and len(agg.reports) < 2:
        time.sleep(0.1)
    cli.stop()
    srv.close()
    assert len(agg.reports) == 2
    calls = {r.reported_callsign for r in agg.reports}
    assert calls == {"K1ABC", "W9XYZ"}


@pytest.mark.slow
def test_reports_monitor_module(tmp_path):
    import json
    import os
    from sdrplusplusbrown_tpu.app import SDRApp
    root = str(tmp_path / "root")
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "config.json"), "w") as f:
        json.dump({"source": {"type": "none", "samplerate": 1e6},
                   "modules": {"Rpt": {"type": "reports_monitor"}}}, f)
    app = SDRApp(root, run_pump=False)
    try:
        mod = app.modules["Rpt"]
        r = mod.handle_debug_command("inject", RBN_LINE)
        assert r["added"]
        r = mod.handle_debug_command("inject", RBN_LINE)
        assert not r["added"]                        # dedup
        st = mod.handle_debug_command("status", "")
        assert st["status"] == "RPTS: 001"
        reps = mod.handle_debug_command("reports", "5")
        assert "K1ABC by W3LPL" in reps["reports"][0]
    finally:
        app.shutdown()


# ---------------------------------------------------------------------
# websdr_view / KiwiSDR

def _fake_kiwi(conn, n_packets=5):
    """Serve the kiwi protocol on an accepted WS connection."""
    cmds = []

    def on_msg(c, opcode, payload):
        cmds.append(payload.decode(errors="replace"))

    return cmds, on_msg


@pytest.mark.slow
def test_kiwisdr_client_against_fake_server(tmp_path):
    from sdrplusplusbrown_tpu.server.websocket import WebSocketServer
    from sdrplusplusbrown_tpu.server.kiwisdr import KiwiSDRClient

    cmds = []
    ready = threading.Event()

    def on_connect(conn):
        def feeder():
            # wait for the mod command, then stream REAL SND packets
            deadline = time.time() + 5
            while time.time() < deadline and not any(
                    c.startswith("SET mod=") for c in cmds):
                time.sleep(0.05)
            audio = (np.sin(np.linspace(0, 40 * np.pi, 512))
                     * 16000).astype(">i2")
            for i in range(6):
                payload = b"SND" + bytes(7) + audio.tobytes()
                conn.send_binary(payload)
                time.sleep(0.05)
            ready.set()
        threading.Thread(target=feeder, daemon=True).start()

    def on_message(conn, opcode, payload):
        cmds.append(payload.decode(errors="replace"))

    srv = WebSocketServer(port=0, on_connect=on_connect,
                          on_message=on_message)
    got = []
    cli = KiwiSDRClient("127.0.0.1", srv.port, freq_khz=14_100.0,
                        on_audio=got.append)
    cli.start()
    assert ready.wait(10), cmds
    deadline = time.time() + 5
    while time.time() < deadline and len(got) < 5:
        time.sleep(0.05)
    cli.stop()
    srv.close()
    # the client spoke the kiwi dialect
    assert any(c.startswith("SET auth t=kiwi") for c in cmds)
    assert any(c.startswith("SET AR OK in=12000") for c in cmds)
    assert any("SERVER DE CLIENT" in c for c in cmds)
    assert any(c.startswith("SET mod=usb") and "freq=14100.000" in c
               for c in cmds), cmds
    # audio arrived and decoded from big-endian int16
    assert len(got) >= 5
    assert abs(float(np.max(got[0])) - 16000.0 / 32767.0) < 1e-3


@pytest.mark.slow
def test_websdr_view_module(tmp_path):
    import json
    import os
    from sdrplusplusbrown_tpu.app import SDRApp
    from sdrplusplusbrown_tpu.server.websocket import WebSocketServer

    def on_connect(conn):
        def feeder():
            audio = (np.ones(512) * 8000).astype(">i2")
            for _ in range(4):
                conn.send_binary(b"SND" + bytes(7) + audio.tobytes())
                time.sleep(0.05)
        threading.Thread(target=feeder, daemon=True).start()

    srv = WebSocketServer(port=0, on_connect=on_connect)
    root = str(tmp_path / "root")
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "config.json"), "w") as f:
        json.dump({"source": {"type": "none", "samplerate": 1e6},
                   "modules": {"Web": {"type": "websdr_view"}}}, f)
    app = SDRApp(root, run_pump=False)
    try:
        mod = app.modules["Web"]
        r = mod.handle_debug_command(
            "add_receiver", f"kiwi1,127.0.0.1:{srv.port},Testville")
        assert r["status"] == "ok"
        assert mod.handle_debug_command("connect", "kiwi1,7100.0") \
            == {"status": "ok"}
        deadline = time.time() + 10
        while time.time() < deadline:
            p = mod.handle_debug_command("peaks", "kiwi1")
            if p.get("peaks"):
                break
            time.sleep(0.1)
        assert p["peaks"], p
        assert abs(p["peaks"][-1] - 8000.0 / 32767.0) < 1e-3
        lst = mod.handle_debug_command("list", "")
        assert lst["receivers"][0]["loc"] == "Testville"
        # receiver list persisted to config
        with app.config.acquire(False) as conf:
            assert "kiwi1" in conf["modules"]["Web"]["receivers"]
        mod.handle_debug_command("disconnect", "kiwi1")
    finally:
        app.shutdown()
        srv.close()


def test_presence_formatting():
    assert format_presence_freq(14_074_000.0, "USB") == "14.074MHz USB"
    assert format_presence_freq(7_100.0, "CW") == "7.100KHz CW"
    assert format_presence_freq(500.0, "AM") == "500.000Hz AM"


@pytest.mark.slow
def test_discord_presence_module(tmp_path):
    import json
    import os
    from sdrplusplusbrown_tpu.app import SDRApp
    root = str(tmp_path / "root")
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "config.json"), "w") as f:
        json.dump({"source": {"type": "none", "samplerate": 1e6},
                   "frequency": 14_074_000.0,
                   "modules": {
                       "Radio": {"type": "radio", "demod": "USB"},
                       "Disc": {"type": "discord_integration",
                                "interval_s": 3600}}}, f)
    app = SDRApp(root, run_pump=False)
    try:
        mod = app.modules["Disc"]
        published = []
        mod.publisher = published.append
        r = mod.handle_debug_command("refresh", "")
        assert r["changed"]
        assert r["presence"]["details"] == "Listening to"
        assert r["presence"]["state"] == "14.074MHz USB"
        assert published and published[0]["state"] == "14.074MHz USB"
        # unchanged state is not re-published (main.cpp:110)
        assert not mod.handle_debug_command("refresh", "")["changed"]
        app.tune(7_200_000.0)
        assert mod.handle_debug_command("refresh", "")["changed"]
    finally:
        app.shutdown()
