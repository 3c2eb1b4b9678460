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
