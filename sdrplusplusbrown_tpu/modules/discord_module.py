"""discord_integration module — rich-presence "Listening to <freq>
<mode>" publishing.

reference: misc_modules/discord_integration/src/main.cpp — a 10 s worker
(:64-76) reads the selected VFO's frequency and demod mode (:78-108),
formats the frequency as MHz/KHz/Hz with three decimals (:112-122) and
pushes {details: "Listening to", state: "<freq> <mode>"} to Discord
(:125-128).  The Discord SDK is replaced by a pluggable publisher: a
webhook URL (generic HTTP POST) or any callable — the formatting and
change-detection logic is the module.
"""

from __future__ import annotations

import json
import threading
import urllib.request
from typing import Callable, Optional

from ..app import ModuleInstance, RadioModuleInstance
from ..models.radio import DEMOD_NAMES

# main.cpp:87-108 mode names
_PRESENCE_MODES = {"NFM": "NFM", "WFM": "FM", "AM": "AM", "DSB": "DSB",
                   "USB": "USB", "CW": "CW", "LSB": "LSB"}


def format_presence_freq(freq: float, mode: str) -> str:
    """main.cpp:112-122 formatting."""
    if freq >= 1e6:
        return f"{freq / 1e6:.3f}MHz {mode}"
    if freq >= 1e3:
        return f"{freq / 1e3:.3f}KHz {mode}"
    return f"{freq:.3f}Hz {mode}"


class DiscordIntegrationModule(ModuleInstance):
    def __init__(self, name: str, app, vfo: str = "Radio",
                 webhook_url: str = "",
                 interval_s: float = 10.0,
                 publisher: Optional[Callable] = None):
        super().__init__(name)
        self.app = app
        self.vfo = vfo
        self.webhook_url = webhook_url
        self.interval_s = float(interval_s)
        self.publisher = publisher or self._default_publisher
        self.presence = {"details": "", "state": ""}
        self.updates = 0
        self._last = (None, None)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def module_type(self) -> str:
        return "discord_integration"

    def _default_publisher(self, presence: dict):
        if not self.webhook_url:
            return
        data = json.dumps({"content": f"{presence['details']} "
                           f"{presence['state']}"}).encode()
        req = urllib.request.Request(
            self.webhook_url, data=data,
            headers={"Content-Type": "application/json"})
        urllib.request.urlopen(req, timeout=5)

    def _mode_name(self) -> str:
        m = self.app.modules.get(self.vfo)
        if isinstance(m, RadioModuleInstance) and m.radio is not None:
            name = m.radio.demod_name.upper()
            return _PRESENCE_MODES.get(name, "Raw")
        return "Raw"

    def update_presence(self):
        freq = float(self.app.frequency)
        mode = self._mode_name()
        if (freq, mode) == self._last:
            return False
        self._last = (freq, mode)
        self.presence = {"details": "Listening to",
                         "state": format_presence_freq(freq, mode)}
        self.updates += 1
        try:
            self.publisher(self.presence)
        except Exception:        # noqa: BLE001 — webhook failures are soft
            pass
        return True

    def _worker(self):
        while not self._stop.wait(self.interval_s):
            if self.is_enabled():
                self.update_presence()

    def shutdown(self):
        self._stop.set()
        self._thread.join(timeout=2)

    def handle_debug_command(self, cmd: str, args: str) -> dict:
        if cmd == "get_presence":
            return {"presence": self.presence, "updates": self.updates}
        if cmd == "refresh":
            changed = self.update_presence()
            return {"status": "ok", "changed": changed,
                    "presence": self.presence}
        if cmd == "set_webhook":
            self.webhook_url = args.strip()
            return {"status": "ok"}
        return super().handle_debug_command(cmd, args)
