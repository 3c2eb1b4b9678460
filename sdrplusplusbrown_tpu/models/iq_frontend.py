"""IQFrontEnd — the signal-path head: decimation, DC block, IQ correction,
pluggable preprocessors, and the FFT/spectrum branch.

reference: core/src/signal_path/iq_frontend.{h,cpp} — input buffering →
preprocessor chain (power-of-2 decimator, DC blocker, conjugate-for-IQ-invert,
pluggable baseband preprocessors like the logmmse IF NR) → splitter →
{FFT path (reshape → window → FFT → dB), N × RxVFO}.  The splitter fan-out
(routing/splitter.h:59-92) is free here: the baseband tensor is simply used
by both the spectrum branch and every (batched) VFO consumer.
"""

from __future__ import annotations

import math
from fractions import Fraction
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..runtime.block import Block
from ..ops.resampler import PowerDecimator
from ..ops.recurrence import DCBlocker
from ..ops.spectrum import SpectrumPath, gen_reshape_params


class Conjugate(Block):
    """IQ inversion (reference: math/conjugate.h used by iq_frontend.cpp:42)."""

    def apply(self, params, state, x):
        return jnp.conj(x), state


class IQFrontEnd(Block):
    """Wideband block → (processed baseband, dB spectra frames).

    Defaults mirror MainWindow::init's wiring: decimation 1, DC blocker
    rate 50/SR when enabled, FFT 65536 bins @ 20 fps Nuttall
    (reference: gui/main_window.cpp:104, core.cpp:559-561).
    """

    def __init__(self, samplerate: float, decim_ratio: int = 1,
                 dc_blocking: bool = False, invert_iq: bool = False,
                 fft_size: int = 65536, fft_rate: float = 20.0,
                 fft_window: str = "nuttall",
                 preprocessors: Sequence[Tuple[str, Block]] = ()):
        self.samplerate = float(samplerate)
        self.decim_ratio = int(decim_ratio)
        self.effective_sr = self.samplerate / self.decim_ratio

        self.decim = (PowerDecimator(self.samplerate, self.decim_ratio)
                      if self.decim_ratio > 1 else None)
        # reference: genDCBlockRate = 50/SR (iq_frontend.h:84-86)
        self.dc = DCBlocker(50.0 / self.effective_sr) if dc_blocking else None
        self.conj = Conjugate() if invert_iq else None
        self.preprocessors = list(preprocessors)
        self.spectrum = SpectrumPath(self.effective_sr, fft_size, fft_rate,
                                     fft_window)

        need = self.decim_ratio
        for _, p in self.preprocessors:
            need = math.lcm(need, p.in_multiple * self.decim_ratio)
        need = math.lcm(need, self.spectrum.in_multiple * self.decim_ratio)
        self.in_multiple = need
        self.ratio = Fraction(1, self.decim_ratio)

    def init_state(self, batch_shape=()):
        st = {}
        if self.decim is not None:
            st["decim"] = self.decim.init_state(batch_shape)
        if self.dc is not None:
            st["dc"] = self.dc.init_state(batch_shape)
        for name, p in self.preprocessors:
            st[f"pre_{name}"] = p.init_state(batch_shape)
        return st

    def apply(self, params, state, x):
        st = dict(state)
        if self.decim is not None:
            x, st["decim"] = self.decim.apply(None, state["decim"], x)
        if self.dc is not None:
            x, st["dc"] = self.dc.apply(None, state["dc"], x)
        if self.conj is not None:
            x, _ = self.conj.apply(None, None, x)
        for name, p in self.preprocessors:
            x, st[f"pre_{name}"] = p.apply(None, state[f"pre_{name}"], x)
        spectra, _ = self.spectrum.apply(None, None, x)
        return (x, spectra), st
