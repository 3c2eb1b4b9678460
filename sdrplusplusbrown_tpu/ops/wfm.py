"""WFM broadcast stereo demodulator with 19 kHz pilot recovery and RDS tap.

reference: core/src/dsp/demod/broadcast_fm.h:35-215.  Signal flow (stereo):

    quadrature FM ──┬── lprDelay ────────────────────────────┐  L=(L+R)+(L−R)
                    └ r→c ─┬─ pilot BPF ─ PLL ─ conj ──┐      ├─ 15 kHz FIRs
                           └ lmrDelay ───────── ×pll² ─┴ 2·re ┘  R=(L+R)−(L−R)
                           └ xlate −57 kHz ─ resample → 5 kHz RDS out

Constants (reference broadcast_fm.h:43-53): pilot band-pass 18750–19250 Hz
(trans 3 kHz, odd taps, complex); PLL bandwidth 25000/fs, init 19 kHz, limits
18750–19250 Hz; delays (pilotTaps−1)/2 + 1; audio low-pass 15 kHz trans 4 kHz;
RDS xlate −57 kHz → 5 kHz.

Pilot recovery has two modes:
  * ``pll_mode="scan"`` — exact reference PLL via lax.scan.
  * ``pll_mode="normalize"`` (default) — p/|p| of the band-passed pilot,
    delayed one sample to match the PLL's one-sample output lag; fully
    parallel (no per-sample dependency anywhere in the WFM chain).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..runtime.block import Block
from . import taps as taps_mod
from .fir import FIR, RealFIR
from .demod import Quadrature
from .pll import PLL, pilot_normalize
from .delay import Delay
from .xlator import FrequencyXlator
from .resampler import RationalResampler


class BroadcastFM(Block):
    def __init__(self, deviation: float, samplerate: float,
                 stereo: bool = True, low_pass: bool = True,
                 rds_out: bool = False, pll_mode: str = "normalize"):
        self.samplerate = float(samplerate)
        self.stereo = stereo
        self.low_pass = low_pass
        self.rds_out = rds_out
        self.pll_mode = pll_mode

        self.quad = Quadrature(deviation, samplerate)
        self.pilot_taps = taps_mod.band_pass_complex(
            18750.0, 19250.0, 3000.0, samplerate, odd_tap_count=True)
        self.pilot_fir = FIR(self.pilot_taps)
        w19 = taps_mod.hz_to_rads(19000.0, samplerate)
        self.pll = PLL(25000.0 / samplerate, init_freq=w19,
                       min_freq=taps_mod.hz_to_rads(18750.0, samplerate),
                       max_freq=taps_mod.hz_to_rads(19250.0, samplerate))
        d = (len(self.pilot_taps) - 1) // 2 + 1
        self.lpr_delay = Delay(d)
        self.lmr_delay = Delay(d)
        self.pilot_lag = Delay(1)  # normalize-mode stand-in for PLL lag
        self.audio_taps = taps_mod.low_pass(15000.0, 4000.0, samplerate)
        self.audio_fir = RealFIR(self.audio_taps)  # applied to stacked L/R
        if rds_out:
            self.rds_xlator = FrequencyXlator(-57000.0, samplerate)
            self.rds_resamp = RationalResampler(samplerate, 5000.0)
            self.in_multiple = self.rds_resamp.in_multiple
        self.out_channels = 2

    def init_state(self, batch_shape=()):
        st = {
            "quad": self.quad.init_state(batch_shape),
            "pilot_fir": self.pilot_fir.init_state(batch_shape),
            "pll": self.pll.init_state(batch_shape),
            "pilot_lag": self.pilot_lag.init_state(batch_shape, jnp.complex64),
            "lpr_delay": self.lpr_delay.init_state(batch_shape, jnp.float32),
            "lmr_delay": self.lmr_delay.init_state(batch_shape, jnp.complex64),
            "audio_fir": self.audio_fir.init_state(batch_shape + (2,)),
        }
        if self.rds_out:
            st["rds_xl"] = self.rds_xlator.init_state(batch_shape)
            st["rds_rs"] = self.rds_resamp.init_state(batch_shape)
        return st

    def apply(self, params, state, x):
        st = dict(state)
        mpx, st["quad"] = self.quad.apply(None, state["quad"], x)

        rds = None
        if self.stereo:
            mpx_c = mpx.astype(jnp.complex64)
            pilot, st["pilot_fir"] = self.pilot_fir.apply(
                None, state["pilot_fir"], mpx_c)
            if self.pll_mode == "scan":
                vco, st["pll"] = self.pll.apply(None, state["pll"], pilot)
            else:
                vco = pilot_normalize(pilot)
                vco, st["pilot_lag"] = self.pilot_lag.apply(
                    None, state["pilot_lag"], vco)
            lpr, st["lpr_delay"] = self.lpr_delay.apply(
                None, state["lpr_delay"], mpx)
            lmr_c, st["lmr_delay"] = self.lmr_delay.apply(
                None, state["lmr_delay"], mpx_c)
            # conjugate VCO squared downconverts the 38 kHz L−R subcarrier
            vco2 = jnp.conj(vco)
            lmr_c = lmr_c * vco2 * vco2
            if self.rds_out:
                rds_bb, st["rds_xl"] = self.rds_xlator.apply(
                    None, state["rds_xl"], mpx_c)
                rds, st["rds_rs"] = self.rds_resamp.apply(
                    None, state["rds_rs"], rds_bb)
            lmr = jnp.real(lmr_c) * 2.0
            l = lpr + lmr
            r = lpr - lmr
            lr = jnp.stack([l, r], axis=-2)  # [..., 2, T]
            if self.low_pass:
                lr, st["audio_fir"] = self.audio_fir.apply(
                    None, state["audio_fir"], lr)
        else:
            if self.rds_out:
                mpx_c = mpx.astype(jnp.complex64)
                rds_bb, st["rds_xl"] = self.rds_xlator.apply(
                    None, state["rds_xl"], mpx_c)
                rds, st["rds_rs"] = self.rds_resamp.apply(
                    None, state["rds_rs"], rds_bb)
            mono = mpx
            if self.low_pass:
                mono2 = jnp.stack([mono, mono], axis=-2)
                mono2, st["audio_fir"] = self.audio_fir.apply(
                    None, state["audio_fir"], mono2)
                lr = mono2
            else:
                lr = jnp.stack([mono, mono], axis=-2)
        if self.rds_out:
            return (lr, rds), st
        return lr, st
