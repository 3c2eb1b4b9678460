"""Demodulator primitives: quadrature FM discriminator, AM envelope,
SSB/CW product detection, squelch.

reference: core/src/dsp/demod/{quadrature,fm,am,ssb,cw}.h,
noise_reduction/squelch.h.
"""

from __future__ import annotations

from fractions import Fraction

import jax
import jax.numpy as jnp
import numpy as np

from ..runtime.block import Block
from . import taps as taps_mod
from .fir import FIR, RealFIR
from .xlator import FrequencyXlator
from .agc import AGC
from .recurrence import DCBlocker


class Quadrature(Block):
    """FM discriminator: out[n] = normalizePhase(∠x[n] − ∠x[n−1]) / deviation.

    reference: core/src/dsp/demod/quadrature.h:39-46.  The per-sample phase
    carry becomes a one-sample state and the wrapped difference is computed
    in closed form as angle(x[n]·conj(x[n−1])) — identical result (atan2
    output lies in (−π, π], matching normalizePhase), fully parallel.
    """

    def __init__(self, deviation_hz: float, samplerate: float):
        self.inv_deviation = float(
            1.0 / (2.0 * np.pi * deviation_hz / samplerate))
        self.samplerate = samplerate

    def init_state(self, batch_shape=()):
        # carried previous sample; reference phase starts at 0 ⇒ phasor 1+0j
        return jnp.ones(batch_shape + (1,), jnp.complex64)

    def apply(self, params, state, x):
        ext = jnp.concatenate([state, x], axis=-1)
        d = ext[..., 1:] * jnp.conj(ext[..., :-1])
        re, im = jnp.real(d), jnp.imag(d)
        # A zeroed input (e.g. closed squelch gate) yields ±0 products;
        # atan2(−0, −0) = −π would turn silence into full-scale noise —
        # emit exact silence instead.
        y = jnp.where((re == 0.0) & (im == 0.0), 0.0,
                      jnp.arctan2(im, re)) * jnp.float32(self.inv_deviation)
        return y, x[..., -1:]

    def apply_planes(self, state, xr, xi):
        """Same discriminator on separate re/im planes (float32) — used
        by the plane-protocol front end so the IF never materializes as
        complex (one HBM pass saved).  State stays the complex carried
        sample."""
        er = jnp.concatenate([jnp.real(state), xr], axis=-1)
        ei = jnp.concatenate([jnp.imag(state), xi], axis=-1)
        # x[n]·conj(x[n−1]) expanded in real parts
        re = er[..., 1:] * er[..., :-1] + ei[..., 1:] * ei[..., :-1]
        im = ei[..., 1:] * er[..., :-1] - er[..., 1:] * ei[..., :-1]
        y = jnp.where((re == 0.0) & (im == 0.0), 0.0,
                      jnp.arctan2(im, re)) * jnp.float32(self.inv_deviation)
        import jax
        new_state = jax.lax.complex(xr[..., -1:], xi[..., -1:])
        return y, new_state


class AMEnvelope(Block):
    """|x| envelope detector (reference demod/am.h:101-133 uses
    volk_32fc_magnitude_32f)."""

    def apply(self, params, state, x):
        return jnp.abs(x).astype(jnp.float32), state


class ComplexToReal(Block):
    def apply(self, params, state, x):
        return jnp.real(x).astype(jnp.float32), state


class Squelch(Block):
    """Block-mean power gate: if 10·log10(mean(|x|)) < level, zero the block.

    reference: core/src/dsp/noise_reduction/squelch.h:55-69 (complex branch
    averages |x| then compares 10·log10 of the mean against the level).
    """

    MIN_SQUELCH = -100.0

    def __init__(self, level: float = -100.0):
        self.default_level = float(level)

    def init_params(self):
        return {"level": jnp.float32(self.default_level)}

    def apply(self, params, state, x):
        level = params["level"] if params else jnp.float32(self.default_level)
        mean_amp = jnp.mean(jnp.abs(x), axis=-1)
        power_db = 10.0 * jnp.log10(jnp.maximum(mean_amp, 1e-20))
        gate = (power_db >= level).astype(jnp.float32)
        return x * gate[..., None], state


class FMDemod(Block):
    """NFM demodulator: quadrature + optional low/high-pass FIR.

    reference: core/src/dsp/demod/fm.h:25-160.  deviation = bandwidth/2;
    lowpass cutoff bw/2 trans bw/2·0.1; highpass cutoff 300 Hz trans 100 Hz;
    both → bandpass(300, bw/2, 100).
    """

    def __init__(self, samplerate: float, bandwidth: float,
                 low_pass: bool = True, high_pass: bool = False):
        self.quad = Quadrature(bandwidth / 2.0, samplerate)
        self.filtering = low_pass or high_pass
        if low_pass and high_pass:
            t = taps_mod.band_pass_real(300.0, bandwidth / 2.0, 100.0, samplerate)
        elif high_pass:
            t = taps_mod.high_pass(300.0, 100.0, samplerate)
        elif low_pass:
            t = taps_mod.low_pass(bandwidth / 2.0, (bandwidth / 2.0) * 0.1,
                                  samplerate)
        else:
            t = np.ones(1)
        self.fir = RealFIR(t)

    def init_state(self, batch_shape=()):
        return {"quad": self.quad.init_state(batch_shape),
                "fir": self.fir.init_state(batch_shape)}

    def apply(self, params, state, x):
        y, qs = self.quad.apply(None, state["quad"], x)
        fs = state["fir"]
        if self.filtering:
            y, fs = self.fir.apply(None, fs, y)
        return y, {"quad": qs, "fir": fs}

    def apply_planes(self, params, state, planes):
        """Same demod on (re, im) float32 planes — the IF never
        materializes as complex64 (pairs with the fused front ends)."""
        xr, xi = planes
        y, qs = self.quad.apply_planes(state["quad"], xr, xi)
        fs = state["fir"]
        if self.filtering:
            y, fs = self.fir.apply(None, fs, y)
        return y, {"quad": qs, "fir": fs}


class AMDemod(Block):
    """AM demodulator: [carrier AGC] → envelope → DC block → [audio AGC] →
    lowpass FIR.  reference: core/src/dsp/demod/am.h:101-133; radio wrapper
    passes agcAttack=50/IF, agcDecay=5/IF, dcRate=100/IF, IF=15 kHz
    (reference: decoder_modules/radio/src/demodulators/am.h:34,76,97-98).
    """

    def __init__(self, samplerate: float, bandwidth: float = 10000.0,
                 agc_attack: float = 50.0, agc_decay: float = 5.0,
                 carrier_agc: bool = False):
        self.carrier_agc = carrier_agc
        atk = agc_attack / samplerate
        dec = agc_decay / samplerate
        self.c_agc = AGC(set_point=1.0, attack=atk, decay=dec,
                         max_gain=10e6, max_output=10.0)
        self.a_agc = AGC(set_point=1.0, attack=atk, decay=dec,
                         max_gain=10e6, max_output=10.0)
        self.dc = DCBlocker(100.0 / samplerate)
        self.lpf = RealFIR(taps_mod.low_pass(
            bandwidth / 2.0, (bandwidth / 2.0) * 0.1, samplerate))

    def init_state(self, batch_shape=()):
        return {"cagc": self.c_agc.init_state(batch_shape),
                "aagc": self.a_agc.init_state(batch_shape),
                "dc": self.dc.init_state(batch_shape, jnp.float32),
                "lpf": self.lpf.init_state(batch_shape)}

    def apply(self, params, state, x):
        st = dict(state)
        if self.carrier_agc:
            x, st["cagc"] = self.c_agc.apply(None, state["cagc"], x)
        env = jnp.abs(x).astype(jnp.float32)
        env, st["dc"] = self.dc.apply(None, state["dc"], env)
        if not self.carrier_agc:
            env, st["aagc"] = self.a_agc.apply(None, state["aagc"], env)
        y, st["lpf"] = self.lpf.apply(None, state["lpf"], env)
        return y, st


class SSBDemod(Block):
    """SSB product detector: translate by ±bw/2 (USB/LSB; DSB: 0) → real →
    AGC.  reference: core/src/dsp/demod/ssb.h:82-123; radio wrappers use
    IF 24 kHz, agc 50/5 (reference: demodulators/{usb,lsb,dsb}.h).
    """

    USB, LSB, DSB = "usb", "lsb", "dsb"

    def __init__(self, mode: str, bandwidth: float, samplerate: float,
                 agc_attack: float = 50.0, agc_decay: float = 5.0):
        self.mode = mode
        if mode == self.USB:
            offset = bandwidth / 2.0
        elif mode == self.LSB:
            offset = -bandwidth / 2.0
        else:
            offset = 0.0
        self.xlator = FrequencyXlator(offset, samplerate)
        self.agc = AGC(set_point=1.0, attack=agc_attack / samplerate,
                       decay=agc_decay / samplerate, max_gain=10e6,
                       max_output=10.0)

    def init_state(self, batch_shape=()):
        return {"xl": self.xlator.init_state(batch_shape),
                "agc": self.agc.init_state(batch_shape)}

    def apply(self, params, state, x):
        y, xs = self.xlator.apply(
            params.get("xl") if params else None, state["xl"], x)
        y = jnp.real(y).astype(jnp.float32)
        y, ags = self.agc.apply(None, state["agc"], y)
        return y, {"xl": xs, "agc": ags}


class CWDemod(Block):
    """CW: translate by the sidetone frequency → real → AGC.
    reference: core/src/dsp/demod/cw.h:17-95; radio wrapper IF 3 kHz,
    tone 800 Hz, agc 100/5 (reference: demodulators/cw.h:37,82,109-110)."""

    def __init__(self, tone_hz: float, samplerate: float,
                 agc_attack: float = 100.0, agc_decay: float = 5.0):
        self.xlator = FrequencyXlator(tone_hz, samplerate)
        self.agc = AGC(set_point=1.0, attack=agc_attack / samplerate,
                       decay=agc_decay / samplerate, max_gain=10e6,
                       max_output=10.0)

    def init_state(self, batch_shape=()):
        return {"xl": self.xlator.init_state(batch_shape),
                "agc": self.agc.init_state(batch_shape)}

    def apply(self, params, state, x):
        y, xs = self.xlator.apply(None, state["xl"], x)
        y = jnp.real(y).astype(jnp.float32)
        y, ags = self.agc.apply(None, state["agc"], y)
        return y, {"xl": xs, "agc": ags}
