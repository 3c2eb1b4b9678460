"""RyFi decoder module — receives the fork's wideband QPSK data link and
surfaces packets over the control plane.

reference: decoder_modules/ryfi_decoder/src/main.cpp — VFO over the
RyFi channel into ryfi::Receiver; received packets stream out (upstream
feeds a TUN device; here the packet bytes surface over debug commands).
"""

from __future__ import annotations

import threading

import numpy as np

from ..app import ModuleInstance
from ..models.rx_vfo import RxVFO
from ..models.ryfi import RyfiReceiver
from ..runtime.pump import Rechunker
from ..utils.flog import flog


class RyfiDecoderModule(ModuleInstance):
    def __init__(self, name: str, app, offset_hz: float = 0.0,
                 baudrate: float = 720_000.0,
                 channel_sr: float = 1_500_000.0):
        super().__init__(name)
        self.app = app
        self.offset_hz = float(offset_hz)
        self.baudrate = float(baudrate)
        self.channel_sr = float(channel_sr)
        self._mtx = threading.Lock()
        self.packets: list = []
        self._build()
        app.baseband_event.bind(self._on_baseband)

    def module_type(self) -> str:
        return "ryfi_decoder"

    def _build(self):
        sr = self.app.frontend.effective_sr
        self.chan = None
        if sr > self.channel_sr:
            self.chan = RxVFO(sr, self.channel_sr, self.channel_sr,
                              offset_hz=self.offset_hz)
        with self._mtx:
            self.rx = RyfiReceiver(self.baudrate,
                                   self.channel_sr if self.chan
                                   else sr)
            if self.chan is not None:
                import jax
                self.chan_params = self.chan.make_params(self.offset_hz)
                self.chan_state = self.chan.init_state(())
                self.chan_step = jax.jit(
                    lambda p, s, x: self.chan.apply(p, s, x))
                g = self.chan.in_multiple
            else:
                g = 1
            blk = ((int(sr) // 10 + g - 1) // g) * g
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
                new = self.rx.process(chunk)
            if new:
                self.packets.extend(new)
                self.packets = self.packets[-256:]
                flog.info("ryfi[{}]: {} packets", self.name,
                          len(self.packets))

    def _on_baseband(self, iq: np.ndarray):
        if self.is_enabled():
            self.process_iq(iq)

    def handle_debug_command(self, cmd: str, args: str) -> dict:
        if cmd == "status":
            return {"frames": self.rx.frames_decoded,
                    "bad_frames": self.rx.frames_bad,
                    "lost_frames": self.rx.assembler.lost_frames,
                    "packets": len(self.packets)}
        if cmd == "get_packets":
            n = 16
            try:
                n = int(args) if args.strip() else 16
            except ValueError:
                pass
            return {"packets": [p.hex() for p in self.packets[-n:]]}
        return super().handle_debug_command(cmd, args)
