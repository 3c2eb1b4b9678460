"""websdr_view module — compare your signal across remote KiwiSDR
receivers.

reference: misc_modules/websdr_view/src/main.cpp — a list of KiwiSDR
receivers (url + location, persisted in config, :244-262); each connects
over the kiwi WebSocket protocol, tunes the selected frequency and
charts the received peak levels (:49-140) for propagation comparison;
receive duration is adjustable (:287).
"""

from __future__ import annotations

import threading
from typing import Dict, List

import numpy as np

from ..app import ModuleInstance
from ..server.kiwisdr import KiwiSDRClient
from ..utils.flog import flog


class _Receiver:
    def __init__(self, rid: str, url: str, loc: str):
        self.id = rid
        self.url = url
        self.loc = loc
        self.client: KiwiSDRClient | None = None
        self.peaks: List[float] = []
        self._lock = threading.Lock()

    def on_audio(self, audio: np.ndarray):
        with self._lock:
            self.peaks.append(float(np.max(np.abs(audio))))
            self.peaks = self.peaks[-512:]


class WebSDRViewModule(ModuleInstance):
    def __init__(self, name: str, app, receivers=None,
                 receive_duration: float = 30.0):
        super().__init__(name)
        self.app = app
        self.receive_duration = float(receive_duration)
        self.receivers: Dict[str, _Receiver] = {}
        for rid, rc in (receivers or {}).items():
            self.receivers[rid] = _Receiver(rid, rc.get("url", ""),
                                            rc.get("loc", ""))

    def module_type(self) -> str:
        return "websdr_view"

    def _persist(self):
        with self.app.config.acquire() as conf:
            mc = conf.setdefault("modules", {}).setdefault(self.name, {})
            mc["type"] = "websdr_view"
            mc["receivers"] = {r.id: {"url": r.url, "loc": r.loc}
                               for r in self.receivers.values()}

    def add_receiver(self, rid: str, url: str, loc: str = ""):
        self.receivers[rid] = _Receiver(rid, url, loc)
        self._persist()

    def remove_receiver(self, rid: str) -> bool:
        r = self.receivers.pop(rid, None)
        if r is None:
            return False
        if r.client:
            r.client.stop()
        self._persist()
        return True

    def connect(self, rid: str, freq_khz: float | None = None) -> bool:
        r = self.receivers.get(rid)
        if r is None:
            return False
        host, _, port = r.url.partition(":")
        try:
            port_i = int(port or "8073")
        except ValueError:
            return False
        freq = freq_khz if freq_khz is not None \
            else self.app.frequency / 1e3
        r.client = KiwiSDRClient(host, port_i, freq_khz=freq,
                                 on_audio=r.on_audio)
        r.client.start()
        flog.info("websdr_view[{}]: connecting {} ({})", self.name,
                  r.url, r.loc)
        return True

    def disconnect(self, rid: str):
        r = self.receivers.get(rid)
        if r and r.client:
            r.client.stop()
            r.client = None

    def shutdown(self):
        for r in self.receivers.values():
            if r.client:
                r.client.stop()

    def handle_debug_command(self, cmd: str, args: str) -> dict:
        if cmd == "list":
            return {"receivers": [
                {"id": r.id, "url": r.url, "loc": r.loc,
                 "status": r.client.status if r.client
                 else "disconnected",
                 "packets": r.client.packets if r.client else 0}
                for r in self.receivers.values()]}
        if cmd == "add_receiver":
            parts = [p.strip() for p in args.split(",")]
            if len(parts) < 2:
                return {"error": "expected 'id,url[,loc]'"}
            self.add_receiver(parts[0], parts[1],
                              parts[2] if len(parts) > 2 else "")
            return {"status": "ok", "id": parts[0]}
        if cmd == "remove_receiver":
            return {"status": "ok"} if self.remove_receiver(args.strip()) \
                else {"error": f"no receiver '{args}'"}
        if cmd == "connect":
            parts = [p.strip() for p in args.split(",")]
            freq = float(parts[1]) if len(parts) > 1 else None
            if not self.connect(parts[0], freq):
                return {"error": f"cannot connect '{parts[0]}'"}
            return {"status": "ok"}
        if cmd == "disconnect":
            self.disconnect(args.strip())
            return {"status": "ok"}
        if cmd == "peaks":
            r = self.receivers.get(args.strip())
            if r is None:
                return {"error": f"no receiver '{args}'"}
            with r._lock:
                return {"id": r.id, "peaks":
                        [round(p, 5) for p in r.peaks[-64:]]}
        if cmd == "set_duration":
            try:
                self.receive_duration = float(args)
                return {"status": "ok",
                        "duration": self.receive_duration}
            except ValueError:
                return {"error": f"bad duration '{args}'"}
        return super().handle_debug_command(cmd, args)
