"""Falcon-9 telemetry decoder module.

reference: decoder_modules/falcon9_decoder/src/main.cpp — 6 MS/s VFO →
FSK demod → deframe → RS → packet sync; upstream pipes packets into a
zstd-compressed video/TLM parser (vendored, out of scope) — here the
raw packets surface over the debug command plane.
"""

from __future__ import annotations

import threading

import numpy as np

from ..app import ModuleInstance
from ..models.falcon9 import (FalconDemod, FalconDeframer,
                              FalconPacketSync, falcon_rs_decode,
                              FALCON_SR)
from ..models.rx_vfo import RxVFO
from ..runtime.pump import Rechunker
from ..utils.flog import flog


class Falcon9DecoderModule(ModuleInstance):
    def __init__(self, name: str, app, offset_hz: float = 0.0):
        super().__init__(name)
        self.app = app
        self.offset_hz = float(offset_hz)
        self._mtx = threading.Lock()
        self.deframer = FalconDeframer()
        self.pkt_sync = FalconPacketSync()
        self.frames_ok = 0
        self.frames_bad = 0
        self._build()
        app.baseband_event.bind(self._on_baseband)

    def module_type(self) -> str:
        return "falcon9_decoder"

    def _build(self):
        import jax
        sr = self.app.frontend.effective_sr
        self.chan = None
        if sr > FALCON_SR:
            self.chan = RxVFO(sr, FALCON_SR, 4_000_000.0,
                              offset_hz=self.offset_hz)
        dem = FalconDemod()
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
            blk = ((int(min(sr, FALCON_SR)) // 10 + g - 1) // g) * g
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
            hard = (np.asarray(sym)[np.asarray(valid)] > 0) \
                .astype(np.uint8)
            before = len(self.deframer.frames)
            self.deframer.push_bits(hard)
            while self.deframer.frames:
                fr = self.deframer.frames.pop(0)
                out = falcon_rs_decode(fr)
                if out is None:
                    self.frames_bad += 1
                    continue
                self.frames_ok += 1
                self.pkt_sync.push_frame(out)
            _ = before

    def _on_baseband(self, iq: np.ndarray):
        if self.is_enabled():
            self.process_iq(iq)

    def handle_debug_command(self, cmd: str, args: str) -> dict:
        if cmd == "status":
            return {"frames_ok": self.frames_ok,
                    "frames_bad": self.frames_bad,
                    "packets": len(self.pkt_sync.packets)}
        if cmd == "get_packets":
            n = 8
            try:
                n = int(args) if args.strip() else 8
            except ValueError:
                pass
            return {"packets": [p.hex() for p in
                                self.pkt_sync.packets[-n:]]}
        return super().handle_debug_command(cmd, args)
