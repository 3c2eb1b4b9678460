"""PSKReporter UDP upload client vs an in-process fake server.

reference: decoder_modules/ft8_decoder/src/main.cpp upload path.  The
client ships the public IPFIX-profile datagrams (utils/pskreporter.py);
the fake server parses them back and checks structure + content."""

import socket

import numpy as np

from sdrplusplusbrown_tpu.utils.pskreporter import (
    PSKReporterClient, parse_packet, _RX_TEMPLATE, _TX_TEMPLATE,
    _RX_DESCRIPTOR, _TX_DESCRIPTOR)


def _server():
    s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    s.bind(("127.0.0.1", 0))
    s.settimeout(5)
    return s, s.getsockname()[1]


def test_descriptor_set_lengths():
    # each descriptor's declared IPFIX set length must equal its size
    for d in (_RX_DESCRIPTOR, _TX_DESCRIPTOR):
        declared = int.from_bytes(d[2:4], "big")
        assert declared == len(d), (declared, len(d))


def test_upload_roundtrip():
    srv, port = _server()
    cli = PSKReporterClient("N0CALL", "JO62", host="127.0.0.1",
                            port=port)
    cli.add_spot("DL1ABC", 14_074_500, -12, "FT8", epoch=1_700_000_000)
    cli.add_spot("K1XYZ", 14_075_100, 3, "FT8", epoch=1_700_000_015)
    assert cli.flush() == 2
    pkt, _ = srv.recvfrom(65536)
    out = parse_packet(pkt)
    assert out["version"] == 0x000A
    assert out["length"] == len(pkt)
    assert out["session_id"] == cli.session_id
    assert 3 in out["sets"] and 2 in out["sets"]        # descriptors
    assert _RX_TEMPLATE in out["sets"] and _TX_TEMPLATE in out["sets"]
    assert out["receiver"] == {"callsign": "N0CALL", "locator": "JO62",
                               "software": "sdrplusplusbrown_tpu"}
    assert len(out["spots"]) == 2
    s0 = out["spots"][0]
    assert s0["callsign"] == "DL1ABC" and s0["freq_hz"] == 14_074_500
    assert s0["snr_db"] == -12 and s0["mode"] == "FT8"
    assert s0["source"] == 1 and s0["epoch"] == 1_700_000_000
    assert out["spots"][1]["callsign"] == "K1XYZ"
    # queue drained; nothing further sent
    assert cli.flush() == 0
    cli.close()
    srv.close()


def test_batching_and_sequence():
    srv, port = _server()
    cli = PSKReporterClient("N0CALL", "JO62", host="127.0.0.1",
                            port=port, max_spots_per_packet=3)
    for i in range(7):
        cli.add_spot(f"TEST{i}", 7_074_000 + i, -i, "FT4")
    assert cli.flush() == 7
    seqs, total = [], 0
    for _ in range(3):
        pkt, _ = srv.recvfrom(65536)
        out = parse_packet(pkt)
        seqs.append(out["sequence"])
        total += len(out["spots"])
    assert total == 7
    assert seqs == sorted(seqs) and len(set(seqs)) == 3
    cli.close()
    srv.close()


def test_ft8_module_spots_flow(tmp_path):
    """FT8 decodes with callsigns turn into queued spots and ship on
    psk_flush (module-level wiring)."""
    import json, os
    from sdrplusplusbrown_tpu.app import SDRApp
    srv, port = _server()
    root = str(tmp_path / "root")
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "config.json"), "w") as f:
        json.dump({"source": {"type": "none", "samplerate": 1e6},
                   "frequency": 14_074_000,
                   "modules": {
                       "Radio": {"type": "radio", "demod": "USB"},
                       "FT8": {"type": "ft8_decoder", "stream": "Radio",
                               "psk_upload": {"callsign": "N0CALL",
                                              "locator": "JO62",
                                              "host": "127.0.0.1",
                                              "port": port}}}}, f)
    app = SDRApp(root, run_pump=False)
    try:
        mod = app.modules["FT8"]
        assert mod.psk is not None
        # inject a decode result the way the runner would deliver it
        mod._on_result([{"message": "CQ DL1ABC JO62", "snr": -10,
                         "freq": 1500.0}], t0=0)
        assert len(mod.psk.pending) == 1
        r = mod.handle_debug_command("psk_flush", "")
        assert r["shipped"] == 1 and r["packets"] == 1
        pkt, _ = srv.recvfrom(65536)
        out = parse_packet(pkt)
        assert out["spots"][0]["callsign"] == "DL1ABC"
        assert out["spots"][0]["freq_hz"] == 14_074_000 + 1500
    finally:
        app.shutdown()
        srv.close()
