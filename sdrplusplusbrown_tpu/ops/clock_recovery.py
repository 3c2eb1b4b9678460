"""Mueller-Müller symbol timing recovery.

reference: core/src/dsp/clock_recovery/mm.h — per output symbol, an 8-tap
polyphase-interpolated sample is taken at the loop's fractional position;
the M&M timing error (real: step(y[n-1])·y[n] − y[n-1]·step(y[n]);
complex: Re{(p0−p2)·conj(c1) − (c0−c2)·conj(p1)}) drives a second-order
loop whose phase is the fractional sample position and whose frequency is
the samples-per-symbol estimate (clamped to ±omegaRelLimit).

JAX formulation: the reference's while-loop consumes a variable number of
input samples per symbol; here we scan over a *fixed* maximum symbol count
(count/omega·(1+limit)+2) and mask the tail — output is (symbols, valid).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..runtime.block import Block
from . import taps as taps_mod
from .resampler import build_polyphase_bank


def _step_r(x):
    return jnp.where(x > 0.0, 1.0, -1.0)


class MMClockRecovery(Block):
    def __init__(self, omega: float, omega_gain: float = 1e-6,
                 mu_gain: float = 0.01, omega_rel_limit: float = 0.01,
                 interp_phase_count: int = 128, interp_tap_count: int = 8,
                 complex_data: bool = True, unroll: int = 4):
        self.omega = float(omega)              # samples per symbol
        self.omega_gain = float(omega_gain)    # beta
        self.mu_gain = float(mu_gain)          # alpha
        self.rel = float(omega_rel_limit)
        self.P = int(interp_phase_count)
        self.K = int(interp_tap_count)
        self.complex_data = complex_data
        self.unroll = unroll
        # reference generateInterpTaps (mm.h:175-180)
        bw = 0.5 / self.P
        proto = taps_mod.windowed_sinc(self.P * self.K,
                                       2.0 * np.pi * bw, norm=self.P)
        self.bank = build_polyphase_bank(self.P, proto).astype(np.float32)

    def max_out(self, in_len: int) -> int:
        return int(math.ceil(in_len / (self.omega * (1.0 - self.rel)))) + 2

    def init_state(self, batch_shape=()):
        dtype = jnp.complex64 if self.complex_data else jnp.float32
        st = {
            "tail": jnp.zeros(batch_shape + (self.K - 1,), dtype),
            "phase": jnp.zeros(batch_shape, jnp.float32),
            "freq": jnp.full(batch_shape, self.omega, jnp.float32),
            "offset": jnp.zeros(batch_shape, jnp.int32),
        }
        if self.complex_data:
            for k in ("p0", "p1", "p2", "c0", "c1", "c2"):
                st[k] = jnp.zeros(batch_shape, jnp.complex64)
        else:
            st["last_out"] = jnp.zeros(batch_shape, jnp.float32)
        return st

    def apply(self, params, state, x):
        """x [T] (single stream) → (symbols [max_out], valid [max_out])."""
        assert x.ndim == 1, "MM runs per-stream; vmap for batching"
        T = x.shape[-1]
        ext = jnp.concatenate([state["tail"].astype(x.dtype), x])
        n_out = self.max_out(T)
        bank = jnp.asarray(self.bank)
        alpha = jnp.float32(self.mu_gain)
        beta = jnp.float32(self.omega_gain)
        fmin = jnp.float32(self.omega * (1.0 - self.rel))
        fmax = jnp.float32(self.omega * (1.0 + self.rel))
        cplx = self.complex_data

        def step(carry, _):
            st = dict(carry)
            valid = st["offset"] < T
            ph_idx = jnp.clip((st["phase"] * self.P).astype(jnp.int32),
                              0, self.P - 1)
            win = jax.lax.dynamic_slice_in_dim(
                ext, jnp.maximum(st["offset"], 0), self.K)
            taps = bank[ph_idx]
            out = jnp.sum(win * taps.astype(win.dtype))
            if cplx:
                p2, p1 = st["p1"], st["p0"]
                c2, c1 = st["c1"], st["c0"]
                p0 = out
                c0 = (_step_r(jnp.real(out))
                      + 1j * _step_r(jnp.imag(out))).astype(jnp.complex64)
                err = jnp.real((p0 - p2) * jnp.conj(c1)
                               - (c0 - c2) * jnp.conj(p1))
                upd = {"p0": p0, "p1": p1, "p2": p2,
                       "c0": c0, "c1": c1, "c2": c2}
            else:
                err = (_step_r(st["last_out"]) * out
                       - st["last_out"] * _step_r(out))
                upd = {"last_out": out}
            err = jnp.clip(err, -1.0, 1.0)
            freq = jnp.clip(st["freq"] + beta * err, fmin, fmax)
            phase = st["phase"] + freq + alpha * err
            delta = jnp.floor(phase).astype(jnp.int32)
            new = {
                "tail": st["tail"], "freq": freq,
                "phase": phase - delta.astype(jnp.float32),
                "offset": st["offset"] + delta,
            }
            # only advance the loop on valid symbols
            for k, v in upd.items():
                new[k] = jnp.where(valid, v, st.get(k, v))
            for k in ("freq", "phase", "offset"):
                new[k] = jnp.where(valid, new[k], st[k])
            return new, (out, valid)

        final, (outs, valids) = jax.lax.scan(
            step, dict(state), None, length=n_out, unroll=self.unroll)
        new_state = dict(final)
        new_state["offset"] = final["offset"] - T
        new_state["tail"] = ext[..., ext.shape[-1] - (self.K - 1):]
        return (outs, valids), new_state


class FDClockRecovery(Block):
    """Frequency-derivative timing recovery for real symbol streams.

    reference: core/src/dsp/clock_recovery/fd.h — same loop as M&M but the
    timing error is the slope of the interpolated signal at the sampling
    point times the symbol sign: err = dfdt·step(y), with dfdt estimated
    from the adjacent polyphase interpolation phases (fd.h:105-134).
    """

    def __init__(self, omega: float, omega_gain: float = 1e-6,
                 mu_gain: float = 0.01, omega_rel_limit: float = 0.01,
                 interp_phase_count: int = 128, interp_tap_count: int = 8,
                 unroll: int = 4):
        self.omega = float(omega)
        self.omega_gain = float(omega_gain)
        self.mu_gain = float(mu_gain)
        self.rel = float(omega_rel_limit)
        self.P = int(interp_phase_count)
        self.K = int(interp_tap_count)
        self.unroll = unroll
        bw = 0.5 / self.P
        proto = taps_mod.windowed_sinc(self.P * self.K,
                                       2.0 * np.pi * bw, norm=self.P)
        self.bank = build_polyphase_bank(self.P, proto).astype(np.float32)

    def max_out(self, in_len: int) -> int:
        return int(math.ceil(in_len / (self.omega * (1.0 - self.rel)))) + 2

    def init_state(self, batch_shape=()):
        return {
            "tail": jnp.zeros(batch_shape + (self.K - 1,), jnp.float32),
            "phase": jnp.zeros(batch_shape, jnp.float32),
            "freq": jnp.full(batch_shape, self.omega, jnp.float32),
            "offset": jnp.zeros(batch_shape, jnp.int32),
        }

    def apply(self, params, state, x):
        assert x.ndim == 1
        T = x.shape[-1]
        ext = jnp.concatenate([state["tail"], x.astype(jnp.float32)])
        n_out = self.max_out(T)
        bank = jnp.asarray(self.bank)
        alpha = jnp.float32(self.mu_gain)
        beta = jnp.float32(self.omega_gain)
        fmin = jnp.float32(self.omega * (1.0 - self.rel))
        fmax = jnp.float32(self.omega * (1.0 + self.rel))

        def step(carry, _):
            st = dict(carry)
            valid = st["offset"] < T
            ph = jnp.clip((st["phase"] * self.P).astype(jnp.int32),
                          0, self.P - 1)
            win = jax.lax.dynamic_slice_in_dim(
                ext, jnp.maximum(st["offset"], 0), self.K)
            out = jnp.sum(win * bank[ph])
            lo = jnp.sum(win * bank[jnp.maximum(ph - 1, 0)])
            hi = jnp.sum(win * bank[jnp.minimum(ph + 1, self.P - 1)])
            dfdt = jnp.where(ph == 0, hi - out,
                             jnp.where(ph == self.P - 1, out - lo,
                                       (hi - lo) * 0.5))
            err = jnp.clip(dfdt * _step_r(out), -1.0, 1.0)
            freq = jnp.clip(st["freq"] + beta * err, fmin, fmax)
            phase = st["phase"] + freq + alpha * err
            delta = jnp.floor(phase).astype(jnp.int32)
            new = {"tail": st["tail"],
                   "freq": jnp.where(valid, freq, st["freq"]),
                   "phase": jnp.where(valid, phase
                                      - delta.astype(jnp.float32),
                                      st["phase"]),
                   "offset": jnp.where(valid, st["offset"] + delta,
                                       st["offset"])}
            return new, (out, valid)

        final, (outs, valids) = jax.lax.scan(
            step, dict(state), None, length=n_out, unroll=self.unroll)
        new_state = dict(final)
        new_state["offset"] = final["offset"] - T
        new_state["tail"] = ext[..., ext.shape[-1] - (self.K - 1):]
        return (outs, valids), new_state
