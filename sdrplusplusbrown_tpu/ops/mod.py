"""TX modulators.

reference: core/src/dsp/mod/{quadrature,am,ssb,psk,gfsk}.h and
multirate/rrc_interpolator.h.  The FM phasor integration
(phase += deviation·x[n], out = e^{jφ}) is a prefix sum — parallel via
``jnp.cumsum`` with a carried phase scalar instead of the reference's
per-sample loop.
"""

from __future__ import annotations

from fractions import Fraction

import jax
import jax.numpy as jnp
import numpy as np

from ..runtime.block import Block
from . import taps as taps_mod
from .fir import FIR, RealFIR
from .resampler import PolyphaseResampler
from .xlator import FrequencyXlator

_TWO_PI = 2.0 * np.pi


class QuadratureMod(Block):
    """FM modulator: out[n] = exp(j·(φ + deviation·Σx)).

    reference: mod/quadrature.h:44-49 (normalizePhase per step; here the
    cumulative phase is wrapped once per block — identical phasors).
    """

    def __init__(self, deviation_hz: float, samplerate: float):
        self.omega_dev = float(2.0 * np.pi * deviation_hz / samplerate)
        self.samplerate = float(samplerate)

    def init_state(self, batch_shape=()):
        return jnp.zeros(batch_shape, jnp.float32)

    def apply(self, params, state, x):
        inc = jnp.cumsum(x.astype(jnp.float32), axis=-1) \
            * jnp.float32(self.omega_dev)
        phase = state[..., None] + inc
        phase = jnp.mod(phase + np.pi, _TWO_PI) - np.pi
        out = jax.lax.complex(jnp.cos(phase), jnp.sin(phase))
        return out, phase[..., -1]


class AMMod(Block):
    """AM: out = (carrier + depth·x) as complex (reference mod/am.h)."""

    def __init__(self, depth: float = 1.0, carrier: float = 1.0):
        self.depth = float(depth)
        self.carrier = float(carrier)

    def apply(self, params, state, x):
        env = self.carrier + self.depth * x.astype(jnp.float32)
        return env.astype(jnp.complex64), state


class SSBMod(Block):
    """SSB: analytic signal via complex band-pass, then shift by ±bw/2
    (the TX inverse of demod/ssb.h's sideband translate)."""

    USB, LSB = 0, 1

    def __init__(self, mode: int, bandwidth: float, samplerate: float):
        self.mode = mode
        sign = 1.0 if mode == self.USB else -1.0
        lo = 0.0 if mode == self.USB else -bandwidth
        hi = bandwidth if mode == self.USB else 0.0
        self.fir = FIR(taps_mod.band_pass_complex(lo, hi, bandwidth * 0.1,
                                                  samplerate))

    def init_state(self, batch_shape=()):
        return self.fir.init_state(batch_shape)

    def apply(self, params, state, x):
        return self.fir.apply(None, state, x.astype(jnp.complex64))


class RRCInterpolator(Block):
    """Upsample symbols with root-raised-cosine shaping
    (reference multirate/rrc_interpolator.h: PolyphaseResampler with RRC
    prototype scaled by the interpolation factor)."""

    def __init__(self, symbolrate: float, samplerate: float,
                 beta: float = 0.35, tap_count: int = 31):
        from math import gcd
        s, f = round(symbolrate), round(samplerate)
        g = gcd(s, f)
        self.interp = f // g
        self.decim = s // g
        # input is one sample per symbol, so at the zero-stuffed prototype
        # rate (symbolrate·interp) the symbol period is exactly ``interp``;
        # normalize the pulse peak to 1 so an isolated symbol has unit
        # amplitude after shaping.
        proto = taps_mod.root_raised_cosine(tap_count * self.interp, beta,
                                            float(self.interp))
        proto = proto / np.max(np.abs(proto))
        self.resamp = PolyphaseResampler(self.interp, self.decim, proto)
        self.ratio = self.resamp.ratio
        self.in_multiple = self.resamp.in_multiple

    def init_state(self, batch_shape=(), dtype=jnp.complex64):
        return self.resamp.init_state(batch_shape, dtype)

    def apply(self, params, state, x):
        return self.resamp.apply(None, state, x)


class PSKMod(Block):
    """BPSK/QPSK symbol mapper (reference mod/psk.h): bits → constellation
    points; shape with RRCInterpolator downstream."""

    def __init__(self, order: int = 2):
        assert order in (2, 4)
        self.order = order

    def apply(self, params, state, bits):
        bits = jnp.asarray(bits, jnp.int32)
        if self.order == 2:
            sym = (1.0 - 2.0 * bits).astype(jnp.complex64)
        else:
            b = bits.reshape(bits.shape[:-1] + (-1, 2))
            i = 1.0 - 2.0 * b[..., 0]
            q = 1.0 - 2.0 * b[..., 1]
            sym = (i + 1j * q).astype(jnp.complex64) / np.sqrt(2.0)
        return sym, state


class GFSKMod(Block):
    """GFSK: gaussian-filtered NRZ → FM phasor (reference mod/gfsk.h)."""

    def __init__(self, samplerate: float, deviation_hz: float,
                 symbolrate: float, bt: float = 0.5):
        sps = samplerate / symbolrate
        n = int(round(4 * sps)) | 1
        t = (np.arange(n) - n // 2) / sps
        sigma = np.sqrt(np.log(2)) / (2 * np.pi * bt)
        g = np.exp(-t * t / (2 * sigma * sigma))
        self.gauss = RealFIR(g / g.sum())
        self.fm = QuadratureMod(deviation_hz, samplerate)

    def init_state(self, batch_shape=()):
        return {"g": self.gauss.init_state(batch_shape),
                "fm": self.fm.init_state(batch_shape)}

    def apply(self, params, state, nrz):
        y, gs = self.gauss.apply(None, state["g"], nrz)
        out, fs = self.fm.apply(None, state["fm"], y)
        return out, {"g": gs, "fm": fs}
