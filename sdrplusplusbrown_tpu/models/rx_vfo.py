"""RxVFO — the channelizer: translate → rational resample → bandwidth FIR.

reference: core/src/dsp/channel/rx_vfo.h:89-121 — xlator(-offset) →
RationalResampler(inSR→outSR) → optional low-pass when bandwidth != outSR
(cutoff = bw/2, trans = bw/2 · 0.1, designed at outSR; rx_vfo.h:117-121).

Batched: one RxVFO instance serves ``[C, T]`` blocks of C channels; the
offset is a runtime param (per-channel array) so hundreds of differently
tuned VFOs share one compiled kernel — the TPU answer to the reference's
one-thread-per-VFO fan-out (reference: core/src/signal_path/
iq_frontend.cpp:159-179).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..runtime.block import Block
from ..ops import taps as taps_mod
from ..ops.fir import FIR
from ..ops.xlator import FrequencyXlator, nco_params
from ..ops.resampler import RationalResampler


class RxVFO(Block):
    def __init__(self, in_samplerate: float, out_samplerate: float,
                 bandwidth: float, offset_hz: float = 0.0):
        self.in_samplerate = float(in_samplerate)
        self.out_samplerate = float(out_samplerate)
        self.bandwidth = float(bandwidth)
        self.offset_hz = float(offset_hz)

        self.xlator = FrequencyXlator(-offset_hz, in_samplerate)
        self.resamp = RationalResampler(in_samplerate, out_samplerate)
        self.filter_needed = bandwidth != out_samplerate
        if self.filter_needed:
            fw = bandwidth / 2.0
            self.fir = FIR(taps_mod.low_pass(fw, fw * 0.1, out_samplerate))
        from fractions import Fraction
        self.ratio = self.resamp.ratio
        self.in_multiple = self.resamp.in_multiple

    def make_params(self, offset_hz):
        """Per-call retune; ``offset_hz`` may be per-channel (numpy array)."""
        return {"xl": nco_params(-np.asarray(offset_hz, np.float64),
                                 self.in_samplerate)}

    def init_params(self):
        return self.make_params(self.offset_hz)

    def init_state(self, batch_shape=()):
        st = {"xl": self.xlator.init_state(batch_shape),
              "rs": self.resamp.init_state(batch_shape)}
        if self.filter_needed:
            st["fir"] = self.fir.init_state(batch_shape)
        return st

    def apply(self, params, state, x):
        if params is None:
            params = self.init_params()
        st = dict(state)
        y, st["xl"] = self.xlator.apply(params["xl"], state["xl"], x)
        y, st["rs"] = self.resamp.apply(None, state["rs"], y)
        if self.filter_needed:
            y, st["fir"] = self.fir.apply(None, state["fir"], y)
        return y, st


class SharedRxVFOBank(Block):
    """RxVFO over a SHARED wideband: the per-channel mix-down is folded
    into the first predecimation halfband (ops/fused_frontend.py), so
    the full-rate wideband is read once instead of C times.

    Produces bit-near (~90 dB) the same output as broadcasting the
    wideband into a batched RxVFO; the remaining (decimated-rate) chain
    reuses the exact same blocks.
    """

    def __init__(self, in_samplerate: float, out_samplerate: float,
                 bandwidth: float):
        from ..ops.fused_frontend import SharedXlateDecimFIR, fused_params
        self.base = RxVFO(in_samplerate, out_samplerate, bandwidth)
        self.in_samplerate = float(in_samplerate)
        self._fused_params = fused_params
        blocks = self.base.resamp.chain.named_blocks
        self.has_predec = bool(blocks) and blocks[0][0] == "decim"
        if self.has_predec:
            stage0 = blocks[0][1].stages[0]
            self.fused = SharedXlateDecimFIR(stage0.taps,
                                             in_samplerate, stage0.decim)
            self.rest_decim = blocks[0][1].stages[1:]
        else:
            # no predecimation to fold into — plain broadcast path
            self.fused = None
            self.rest_decim = []
        self.rest = [(n, b) for n, b in blocks if n != "decim"]
        self.ratio = self.base.ratio
        self.in_multiple = self.base.in_multiple
        self.filter_needed = self.base.filter_needed

    def make_params(self, offsets_hz):
        if self.fused is None:
            return {"xl": self.base.make_params(offsets_hz)["xl"]}
        return {"fused": self._fused_params(
            np.asarray(offsets_hz, np.float64), self.in_samplerate,
            self.fused.decim)}

    def init_state(self, C: int):
        st = {}
        if self.fused is None:
            st["xl"] = self.base.xlator.init_state((C,))
        else:
            st["fused"] = self.fused.init_state((C,))
            st["rest_decim"] = [s.init_state((C,))
                                for s in self.rest_decim]
        for n, b in self.rest:
            st[n] = b.init_state((C,))
        if self.filter_needed:
            st["fir"] = self.base.fir.init_state((C,))
        return st

    def apply(self, params, state, x):
        """x: [T] shared wideband → ([C, T_out], state')."""
        st = dict(state)
        if self.fused is None:
            C = params["xl"]["omega"].shape[0]
            xb = jnp.broadcast_to(x[None, :], (C, x.shape[-1]))
            y, st["xl"] = self.base.xlator.apply(params["xl"],
                                                 state["xl"], xb)
        else:
            y, st["fused"] = self.fused.apply(params["fused"],
                                              state["fused"], x)
            new_rd = []
            for blk, s in zip(self.rest_decim, state["rest_decim"]):
                y, ns = blk.apply(None, s, y)
                new_rd.append(ns)
            st["rest_decim"] = new_rd
        for n, b in self.rest:
            y, st[n] = b.apply(None, state[n], y)
        if self.filter_needed:
            y, st["fir"] = self.base.fir.apply(None, state["fir"], y)
        return y, st
