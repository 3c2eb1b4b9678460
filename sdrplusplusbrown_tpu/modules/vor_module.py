"""VOR receiver module — tunes a 25 kHz channel on the wideband baseband
and publishes bearing/quality over the control plane.

reference: decoder_modules/vor_receiver/src/main.cpp:29-106 — the module
creates a 25 kHz VFO, feeds vor::Decoder(integrationTime=1) and renders
`Bearing`/`Quality`; here those surface as debug commands.
"""

from __future__ import annotations

import threading

import numpy as np

from ..app import ModuleInstance
from ..models.rx_vfo import RxVFO
from ..models.vor import VORDecoder, VOR_IN_SR
from ..runtime.block import Chain
from ..runtime.pump import Rechunker
from ..utils.flog import flog


class VORReceiverModule(ModuleInstance):
    def __init__(self, name: str, app, offset_hz: float = 0.0,
                 integration_time: float = 1.0):
        super().__init__(name)
        self.app = app
        self.offset_hz = float(offset_hz)
        self.integration_time = float(integration_time)
        self._mtx = threading.Lock()
        self.bearing_deg = 0.0
        self.quality = 0.0
        self.windows = 0
        self._build()
        app.baseband_event.bind(self._on_baseband)

    def module_type(self) -> str:
        return "vor_receiver"

    def _build(self):
        import jax
        sr = self.app.frontend.effective_sr
        chan = RxVFO(sr, VOR_IN_SR, VOR_IN_SR, offset_hz=self.offset_hz)
        dec = VORDecoder(self.integration_time)
        chain = Chain([("chan", chan), ("dec", dec)])
        with self._mtx:
            self.chan = chan
            self.chain = chain
            self.params = {"chan": chan.make_params(self.offset_hz),
                           "dec": None}
            self.state = chain.init_state(())
            self.step = jax.jit(lambda p, s, x: chain.apply(p, s, x))
            self.rc = Rechunker(chain.in_multiple)

    def set_offset(self, offset_hz: float):
        with self._mtx:
            self.offset_hz = float(offset_hz)
            self.params = {"chan": self.chan.make_params(self.offset_hz),
                           "dec": None}

    def _on_baseband(self, iq: np.ndarray):
        if not self.is_enabled():
            return
        import jax.numpy as jnp
        for chunk in self.rc.push(iq):
            with self._mtx:
                (bear, qual), self.state = self.step(
                    self.params, self.state, jnp.asarray(chunk))
            b, q = np.asarray(bear), np.asarray(qual)
            if b.size:
                self.bearing_deg = float(np.rad2deg(b[-1]))
                self.quality = float(q[-1])
                self.windows += int(b.size)

    def handle_debug_command(self, cmd: str, args: str) -> dict:
        if cmd == "get_bearing":
            return {"bearing": round(self.bearing_deg, 2),
                    "quality": round(self.quality * 100.0, 1),
                    "windows": self.windows}
        if cmd == "set_offset":
            try:
                self.set_offset(float(args))
                return {"status": "ok", "offset": self.offset_hz}
            except ValueError:
                return {"error": f"bad offset '{args}'"}
        return super().handle_debug_command(cmd, args)
