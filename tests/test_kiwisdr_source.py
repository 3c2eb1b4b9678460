"""KiwiSDR IQ source against a fake kiwi WebSocket server (reference:
source_modules/kiwisdr_source — TUNE_IQ packets per
core/src/utils/proto/kiwisdr.h:123-151, header sizes include the tag)."""

import threading
import time

import numpy as np

from sdrplusplusbrown_tpu.server.websocket import WebSocketServer
from sdrplusplusbrown_tpu.io.kiwisdr_source import KiwiSDRSource


def _iq_packet(iq512):
    """SND IQ packet: 20-byte header incl. tag, flags 0x08, s16be pairs."""
    hdr = bytearray(20)
    hdr[0:3] = b"SND"
    hdr[3] = 0x08
    pcm = np.empty(1024, ">i2")
    pcm[0::2] = np.round(iq512.real * 32767).astype(np.int16)
    pcm[1::2] = np.round(iq512.imag * 32767).astype(np.int16)
    return bytes(hdr) + pcm.tobytes()


def test_kiwisdr_source_streams_iq_and_retunes():
    cmds = []
    got_mod = threading.Event()

    ramp = ((np.arange(512) - 256) / 512.0
            + 1j * (np.arange(512)[::-1] - 256) / 512.0).astype(np.complex64)

    def on_connect(conn):
        def feeder():
            deadline = time.time() + 5
            while time.time() < deadline and not got_mod.is_set():
                time.sleep(0.02)
            for _ in range(6):
                conn.send_binary(_iq_packet(ramp))
                time.sleep(0.03)
        threading.Thread(target=feeder, daemon=True).start()

    def on_message(conn, opcode, payload):
        c = payload.decode(errors="replace")
        cmds.append(c)
        if c.startswith("SET mod=iq"):
            got_mod.set()

    srv = WebSocketServer(port=0, on_connect=on_connect,
                          on_message=on_message)
    src = KiwiSDRSource("127.0.0.1", srv.port, freq_hz=14_074_000.0)
    try:
        assert src.samplerate == 12_000.0
        got = []
        for blk in src.blocks(timeout=5.0):
            got.append(blk)
            if len(got) >= 3:
                break
        assert len(got) >= 3, f"no IQ received; cmds={cmds}"
        np.testing.assert_allclose(got[0].real, ramp.real, atol=2e-4)
        np.testing.assert_allclose(got[0].imag, ramp.imag, atol=2e-4)

        # kiwi dialect + the reference's IQ tune line (kiwisdr.h:196-198)
        assert any(c.startswith("SET auth t=kiwi") for c in cmds)
        assert any(c.startswith("SET mod=iq low_cut=-7000 high_cut=7000")
                   and "freq=14074.000" in c for c in cmds), cmds

        src.tune(7_074_000.0)
        deadline = time.time() + 5
        while time.time() < deadline and not any(
                "freq=7074.000" in c for c in cmds):
            time.sleep(0.05)
        assert any(c.startswith("SET mod=iq") and "freq=7074.000" in c
                   for c in cmds), cmds
    finally:
        src.close()
        srv.close()
