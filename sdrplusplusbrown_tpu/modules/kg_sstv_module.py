"""KG-SSTV decoder module.

reference: decoder_modules/kg_sstv_decoder/src/main.cpp — VFO into
kgsstv::Decoder; upstream writes raw frame bytes to kgsstv_out.bin;
here frames surface over the debug command plane.
"""

from __future__ import annotations

import threading

import numpy as np

from ..app import ModuleInstance
from ..models.kg_sstv import KGSSTVDemod, KGSSTVDeframer
from ..models.rx_vfo import RxVFO
from ..runtime.pump import Rechunker

KGSSTV_VFO_SR = 24_000.0


class KGSSTVDecoderModule(ModuleInstance):
    def __init__(self, name: str, app, offset_hz: float = 0.0):
        super().__init__(name)
        self.app = app
        self.offset_hz = float(offset_hz)
        self._mtx = threading.Lock()
        self.deframer = KGSSTVDeframer()
        self._build()
        app.baseband_event.bind(self._on_baseband)

    def module_type(self) -> str:
        return "kg_sstv_decoder"

    def _build(self):
        import jax
        sr = self.app.frontend.effective_sr
        self.chan = None
        if sr > KGSSTV_VFO_SR:
            self.chan = RxVFO(sr, KGSSTV_VFO_SR, KGSSTV_VFO_SR,
                              offset_hz=self.offset_hz)
        rate = KGSSTV_VFO_SR if self.chan is not None else sr
        dem = KGSSTVDemod(rate)
        with self._mtx:
            self.dem = dem
            self.dem_state = dem.init_state(())
            if self.chan is not None:
                self.chan_params = self.chan.make_params(self.offset_hz)
                self.chan_state = self.chan.init_state(())

                def step(cp, cs, ds, x):
                    y, cs = self.chan.apply(cp, cs, x)
                    (sym, valid), ds = dem.apply(None, ds, y)
                    return (sym, valid), cs, ds
                self.step = jax.jit(step)
                g = self.chan.in_multiple
            else:
                self.step = jax.jit(
                    lambda ds, x: dem.apply(None, ds, x))
                g = 1
            blk = ((int(rate) // 4 + g - 1) // g) * g
            self.rc = Rechunker(max(blk, g))

    def process_iq(self, iq: np.ndarray):
        import jax.numpy as jnp
        for chunk in self.rc.push(iq):
            with self._mtx:
                if self.chan is not None:
                    (sym, valid), self.chan_state, self.dem_state = \
                        self.step(self.chan_params, self.chan_state,
                                  self.dem_state, jnp.asarray(chunk))
                else:
                    (sym, valid), self.dem_state = self.step(
                        self.dem_state, jnp.asarray(chunk))
            self.deframer.push_symbols(
                np.asarray(sym)[np.asarray(valid)])

    def _on_baseband(self, iq: np.ndarray):
        if self.is_enabled():
            self.process_iq(iq)

    def handle_debug_command(self, cmd: str, args: str) -> dict:
        if cmd == "status":
            return {"frames": self.deframer.frames_seen}
        if cmd == "get_frames":
            return {"frames": [f.hex() for f in
                               self.deframer.frames[-16:]]}
        return super().handle_debug_command(cmd, args)
