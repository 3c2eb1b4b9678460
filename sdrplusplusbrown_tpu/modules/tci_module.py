"""TCI server module — ExpertSDR3 TCI protocol over WebSocket, driving
the app's tune/audio surface (used by logging/digital-mode software).

reference: misc_modules/tci_server/src/main.cpp — on connect the server
sends the init block (protocol:esdr,1.6; device; trx_count; vfo_limits;
if_limits; modulations_list; start; rx_enable; tx_enable; trx;
audio_samplerate;), the current ``vfo:0,0,<freq>;`` and ``ready;``
(main.cpp:338-351).  Text commands are ``cmd:a,b;``: trx echo,
rx_smeter → ",0;", vfo get/set (set tunes the radio), audio_start/stop
(main.cpp:418-441).  Audio flows as binary DataStream frames — 16 u32
header {receiver, sampleRate, format=3, codec=0, crc=0, length, type=1,
reserv[9]} + float32 interleaved stereo (main.cpp:71-84,465-520) — fed
from the SinkManager StreamHook bus (main.cpp:161-168), exactly the bus
runtime/sink.py provides.
"""

from __future__ import annotations

import struct
import threading
import time
from typing import Optional

import numpy as np

from ..app import ModuleInstance
from ..server.websocket import WebSocketServer
from ..utils.flog import flog

INIT_LINES = [
    "protocol:esdr,1.6;",
    "device:SDRPlusPlusBrown;",
    "trx_count:1;",
    "vfo_limits:0,1600000000;",
    "if_limits:-19531,19531;",
    "modulations_list:am,sam,dsb,lsb,usb,cw,nfm,digl,digu,wfm,drm;",
    "start;",
    "rx_enable:0,true;",
    "tx_enable:0,true;",
    "trx:0,false;",
    "audio_samplerate:48000;",
]

AUDIO_CHUNK_HZ = 60            # sampleRate/60 samples per frame


def pack_datastream(receiver: int, samplerate: int,
                    stereo: np.ndarray) -> bytes:
    """reference main.cpp:71-84: 16-u32 header + interleaved float32."""
    inter = np.empty(stereo.shape[-1] * 2, np.float32)
    inter[0::2] = stereo[0]
    inter[1::2] = stereo[1]
    head = struct.pack("<7I", receiver, samplerate, 3, 0, 0,
                       len(inter), 1) + b"\x00" * 36
    return head + inter.tobytes()


class TCIServerModule(ModuleInstance):
    def __init__(self, name: str, app, port: int = 0,
                 vfo: str = "Radio"):
        super().__init__(name)
        self.app = app
        self.selected_vfo = vfo
        self.server = WebSocketServer(port=port,
                                      on_connect=self._on_connect,
                                      on_message=self._on_message)
        self.port = self.server.port
        self._stop = threading.Event()
        app.stream_registry.on_stream_data.bind(self._on_hook)
        threading.Thread(target=self._report_loop, daemon=True).start()
        flog.info("tci_server[{}] on ws://127.0.0.1:{}", name, self.port)

    def module_type(self) -> str:
        return "tci_server"

    # -- protocol -------------------------------------------------------
    def _send(self, conn, cmd: str):
        conn.send_text(cmd)

    def _on_connect(self, conn):
        conn.user_data.update({
            "reported_vfo": None, "audio": False, "buf": [],
            "lock": threading.Lock(), "samplerate": 48000})
        for line in INIT_LINES:
            self._send(conn, line)
        freq = int(self.app.frequency)
        self._send(conn, f"vfo:0,0,{freq};")
        conn.user_data["reported_vfo"] = freq
        self._send(conn, "ready;")

    def _on_message(self, conn, opcode, payload: bytes):
        if opcode != 1:          # text only (main.cpp:393-397)
            conn.close()
            return
        text = payload.decode(errors="replace").strip()
        if ":" in text and text.endswith(";"):
            cmd, rest = text.split(":", 1)
            args = rest[:-1].split(",") if rest[:-1] else []
        elif text.endswith(";"):
            cmd, args = text[:-1], []
        else:
            flog.warn("tci: unparsed data: {}", text)
            return
        self._on_command(conn, cmd, args)

    def _on_command(self, conn, cmd: str, args):
        if cmd == "trx" and len(args) == 2:
            self._send(conn, f"trx:{args[0]},{args[1]};")
        elif cmd == "rx_smeter" and len(args) == 2:
            self._send(conn, f"rx_smeter:{args[0]},{args[1]},0;")
        elif cmd == "vfo" and len(args) == 2:
            conn.user_data["reported_vfo"] = None    # re-report
        elif cmd == "vfo" and len(args) == 3:
            try:
                freq = float(args[2])
            except ValueError:
                return
            conn.user_data["reported_vfo"] = None
            self.app.tune(freq)
        elif cmd == "audio_start" and len(args) == 1:
            conn.user_data["audio"] = True
            self._send(conn, "audio_start:0;")
        elif cmd == "audio_stop" and len(args) == 1:
            conn.user_data["audio"] = False
            self._send(conn, "audio_stop:0;")

    # -- audio feed (StreamHook bus → per-connection buffers) ----------
    def _on_hook(self, hook):
        from ..runtime.sink import StreamHook
        if hook.source_type != StreamHook.SOURCE_DEMOD_OUTPUT \
                or hook.source != self.selected_vfo \
                or hook.stereo_data is None:
            return
        for conn in list(self.server.connections):
            ud = conn.user_data
            if not ud.get("audio"):
                continue
            ud["samplerate"] = int(hook.samplerate)
            with ud["lock"]:
                ud["buf"].append(np.asarray(hook.stereo_data,
                                            np.float32))

    def _report_loop(self):
        """Push vfo changes and drain audio buffers (main.cpp:446-520)."""
        while not self._stop.is_set():
            freq = int(self.app.frequency)
            for conn in list(self.server.connections):
                ud = conn.user_data
                if not ud:
                    continue
                if ud.get("reported_vfo") != freq:
                    self._send(conn, f"vfo:0,0,{freq};")
                    ud["reported_vfo"] = freq
                if ud.get("audio"):
                    sr = ud.get("samplerate", 48000)
                    chunk = max(sr // AUDIO_CHUNK_HZ, 1)
                    with ud["lock"]:
                        data = np.concatenate(ud["buf"], axis=-1) \
                            if ud["buf"] else None
                        ud["buf"] = []
                    while data is not None and data.shape[-1] >= chunk:
                        conn.send_binary(pack_datastream(
                            0, sr, data[..., :chunk]))
                        data = data[..., chunk:]
                    if data is not None and data.shape[-1]:
                        with ud["lock"]:
                            ud["buf"].insert(0, data)
            time.sleep(0.02)

    def shutdown(self):
        self._stop.set()
        self.server.close()

    def handle_debug_command(self, cmd: str, args: str) -> dict:
        if cmd == "get_status":
            return {"port": self.port, "vfo": self.selected_vfo,
                    "clients": len(self.server.connections)}
        if cmd == "set_vfo":
            self.selected_vfo = args.strip() or "Radio"
            return {"status": "ok", "vfo": self.selected_vfo}
        return super().handle_debug_command(cmd, args)
