"""DAB decoder module — OFDM front end with constellation/CFO products.

reference: decoder_modules/dab_decoder/src/main.cpp — 2.048 MS/s VFO →
CyclicSync → FrameFreqSync → constellation display.  The upstream stops
at the constellation (no FIC/MSC Viterbi); this module matches that
scope and additionally surfaces the per-symbol time-differential DQPSK
dibits.
"""

from __future__ import annotations

import threading

import numpy as np

from ..app import ModuleInstance
from ..models.dab import (CyclicSync, FrameFreqSync, DAB_SR,
                          symbol_dqpsk_dibits)
from ..models.rx_vfo import RxVFO
from ..runtime.pump import Rechunker


class DABDecoderModule(ModuleInstance):
    def __init__(self, name: str, app, offset_hz: float = 0.0):
        super().__init__(name)
        self.app = app
        self.offset_hz = float(offset_hz)
        self._mtx = threading.Lock()
        self.csync = CyclicSync()
        self.ffsync = FrameFreqSync()
        self._sym_read = 0
        self._build()
        app.baseband_event.bind(self._on_baseband)

    def module_type(self) -> str:
        return "dab_decoder"

    def _build(self):
        sr = self.app.frontend.effective_sr
        self.chan = None
        if sr > DAB_SR:
            import jax
            self.chan = RxVFO(sr, DAB_SR, 1_712_000.0,
                              offset_hz=self.offset_hz)
            self.chan_params = self.chan.make_params(self.offset_hz)
            self.chan_state = self.chan.init_state(())
            self.chan_step = jax.jit(
                lambda p, s, x: self.chan.apply(p, s, x))
            g = self.chan.in_multiple
        else:
            g = 1
        blk = ((int(min(sr, DAB_SR)) // 10 + g - 1) // g) * g
        self.rc = Rechunker(max(blk, g))

    def process_iq(self, iq: np.ndarray):
        import jax.numpy as jnp
        for chunk in self.rc.push(iq):
            with self._mtx:
                if self.chan is not None:
                    y, self.chan_state = self.chan_step(
                        self.chan_params, self.chan_state,
                        jnp.asarray(chunk))
                    chunk = np.asarray(y)
                self.csync.push(chunk)
                while self._sym_read < len(self.csync.symbols):
                    i = self._sym_read
                    self.ffsync.push_symbol(self.csync.symbols[i],
                                            pos=self.csync.positions[i])
                    self._sym_read += 1
                # bound memory
                if self._sym_read > 4096:
                    del self.csync.symbols[:self._sym_read]
                    del self.csync.positions[:self._sym_read]
                    self._sym_read = 0
                self.ffsync.constellations = \
                    self.ffsync.constellations[-128:]

    def _on_baseband(self, iq: np.ndarray):
        if self.is_enabled():
            self.process_iq(iq)

    def handle_debug_command(self, cmd: str, args: str) -> dict:
        if cmd == "status":
            return {"symbols": len(self.csync.symbols),
                    "frames": self.ffsync.frames_seen,
                    "cfo_hz": round(self.ffsync.last_cfo_hz, 1)}
        if cmd == "get_constellation":
            if not self.ffsync.constellations:
                return {"points": []}
            c = self.ffsync.constellations[-1][:256]
            return {"points": [[round(float(v.real), 4),
                                round(float(v.imag), 4)] for v in c]}
        if cmd == "get_dibits":
            dm = self.ffsync.demap_time_differential()
            if not dm:
                return {"dibits": []}
            return {"dibits": dm[-1][:128].tolist()}
        return super().handle_debug_command(cmd, args)
