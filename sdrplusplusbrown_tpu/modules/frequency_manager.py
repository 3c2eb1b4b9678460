"""Frequency manager — named bookmarks with persistence and apply-to-VFO.

reference: misc_modules/frequency_manager (1475 LoC) — bookmark lists
(name → frequency, bandwidth, mode) stored in the module config, applied
to the selected VFO (tune + demod + bandwidth), plus bookmark scanning
hooks for the scanner.
"""

from __future__ import annotations

import json
from typing import Dict

from ..app import ModuleInstance, RadioModuleInstance
from ..models.radio import DEMOD_IDS, DEMOD_NAMES


class FrequencyManagerModule(ModuleInstance):
    def __init__(self, name: str, app, bookmarks: Dict[str, dict]
                 | None = None):
        super().__init__(name)
        self.app = app
        self.bookmarks: Dict[str, dict] = dict(bookmarks or {})
        self._load()

    def module_type(self) -> str:
        return "frequency_manager"

    def _load(self):
        with self.app.config.acquire(False) as conf:
            saved = conf.get("frequencyManager", {}).get(self.name, {})
            for k, v in saved.items():
                self.bookmarks.setdefault(k, v)

    def _save(self):
        with self.app.config.acquire() as conf:
            conf.setdefault("frequencyManager", {})[self.name] = \
                self.bookmarks

    # ------------------------------------------------------------------
    def add(self, name: str, frequency: float, mode: str = "NFM",
            bandwidth: float | None = None):
        self.bookmarks[name] = {"frequency": float(frequency),
                                "mode": mode, "bandwidth": bandwidth}
        self._save()

    def remove(self, name: str) -> bool:
        if name not in self.bookmarks:
            return False
        del self.bookmarks[name]
        self._save()
        return True

    def apply(self, bookmark: str, vfo: str = "Radio") -> bool:
        bm = self.bookmarks.get(bookmark)
        m = self.app.modules.get(vfo)
        if bm is None or not isinstance(m, RadioModuleInstance):
            return False
        # tune center so the bookmark lands at the VFO's current offset
        self.app.tune(bm["frequency"] - m.offset_hz)
        if bm.get("mode") in DEMOD_IDS and \
                DEMOD_IDS[bm["mode"]] != m.demod_id:
            m.select_demod(DEMOD_IDS[bm["mode"]])
        if bm.get("bandwidth"):
            m.set_bandwidth(float(bm["bandwidth"]))
        return True

    # ------------------------------------------------------------------
    def handle_debug_command(self, cmd: str, args: str) -> dict:
        if cmd == "list":
            return {"bookmarks": self.bookmarks}
        if cmd == "add":
            try:
                j = json.loads(args)
                self.add(j["name"], j["frequency"], j.get("mode", "NFM"),
                         j.get("bandwidth"))
                return {"status": "ok"}
            except (json.JSONDecodeError, KeyError) as e:
                return {"error": f"bad bookmark: {e}"}
        if cmd == "remove":
            return ({"status": "ok"} if self.remove(args.strip())
                    else {"error": f"no bookmark '{args}'"})
        if cmd == "apply":
            parts = args.split(",")
            bm = parts[0].strip()
            vfo = parts[1].strip() if len(parts) > 1 else "Radio"
            return ({"status": "ok"} if self.apply(bm, vfo)
                    else {"error": f"cannot apply '{args}'"})
        return super().handle_debug_command(cmd, args)
