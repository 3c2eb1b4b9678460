"""ATV decoder module — analog PAL television to a 768×576 grayscale
frame buffer.

reference: decoder_modules/atv_decoder/src/main.cpp — 14.77 MS/s VFO →
FastAGC → amplitude demod → LineSync → level servo/field sync → image
(color path is disabled upstream; grayscale parity here).
"""

from __future__ import annotations

import threading

import numpy as np

from ..app import ModuleInstance
from ..models.atv import (ATVFrontEnd, LineSync, FrameAssembler,
                          SAMPLE_RATE, MAX_LOCK)
from ..models.rx_vfo import RxVFO
from ..runtime.pump import Rechunker
from ..utils.flog import flog


class ATVDecoderModule(ModuleInstance):
    def __init__(self, name: str, app, offset_hz: float = 0.0):
        super().__init__(name)
        self.app = app
        self.offset_hz = float(offset_hz)
        self._mtx = threading.Lock()
        self.linesync = LineSync()
        self.assembler = FrameAssembler()
        self._build()
        app.baseband_event.bind(self._on_baseband)

    def module_type(self) -> str:
        return "atv_decoder"

    def _build(self):
        import jax
        sr = self.app.frontend.effective_sr
        self.chan = None
        if sr > SAMPLE_RATE:
            self.chan = RxVFO(sr, SAMPLE_RATE, 7_000_000.0,
                              offset_hz=self.offset_hz)
        fe = ATVFrontEnd()
        with self._mtx:
            self.fe = fe
            self.fe_state = fe.init_state(())
            if self.chan is not None:
                self.chan_params = self.chan.make_params(self.offset_hz)
                self.chan_state = self.chan.init_state(())

                def step(cp, cs, fs, x):
                    y, cs = self.chan.apply(cp, cs, x)
                    v, fs = fe.apply(None, fs, y)
                    return v, cs, fs
                self.step = jax.jit(step)
                g = self.chan.in_multiple
            else:
                self.step = jax.jit(lambda fs, x: fe.apply(None, fs, x))
                g = 1
            blk = ((int(min(sr, SAMPLE_RATE)) // 25 + g - 1) // g) * g
            self.rc = Rechunker(max(blk, g))

    def process_iq(self, iq: np.ndarray):
        import jax.numpy as jnp
        for chunk in self.rc.push(iq):
            with self._mtx:
                if self.chan is not None:
                    v, self.chan_state, self.fe_state = self.step(
                        self.chan_params, self.chan_state,
                        self.fe_state, jnp.asarray(chunk))
                else:
                    v, self.fe_state = self.step(self.fe_state,
                                                 jnp.asarray(chunk))
            for line in self.linesync.push(np.asarray(v)):
                self.assembler.push_line(line)

    def _on_baseband(self, iq: np.ndarray):
        if self.is_enabled():
            self.process_iq(iq)

    def handle_debug_command(self, cmd: str, args: str) -> dict:
        if cmd == "status":
            return {"h_locked": self.linesync.locked > 750,
                    "h_lock": self.linesync.locked,
                    "v_locked": self.assembler.vlock > 15,
                    "v_lock": self.assembler.vlock,
                    "lines": self.linesync.lines_out,
                    "frames": self.assembler.frames,
                    "gain": round(self.assembler.gain, 4),
                    "offset": round(self.assembler.offset, 4)}
        if cmd == "get_row":
            try:
                row = int(args)
                return {"row": row,
                        "pixels": self.assembler.image[row][:64]
                        .tolist()}
            except (ValueError, IndexError):
                return {"error": f"bad row '{args}'"}
        return super().handle_debug_command(cmd, args)
