"""Phase-locked loops and carrier recovery.

reference: core/src/dsp/loop/pll.h:15-90, loop/phase_control_loop.h (the
critically-damped α/β second-order loop), loop/costas.h.

Two implementations are provided:

  * ``PLL`` — exact sequential loop via ``lax.scan`` (batched over channels).
    Matches the reference sample-for-sample.
  * ``pilot_normalize`` — a fast XLA-parallel approximation used by the WFM
    stereo path: the 19 kHz pilot is already isolated by a ±250 Hz bandpass
    FIR, so its normalised analytic signal p/|p| is the VCO output the PLL
    would converge to.  This removes the only per-sample serial dependency
    in the WFM chain; selectable per-pipeline (default for throughput,
    scan-PLL for strict parity).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..runtime.block import Block


def critically_damped(bandwidth: float):
    """reference: loop/phase_control_loop.h criticallyDamped()."""
    df = np.sqrt(2.0) / 2.0
    denom = 1.0 + 2.0 * df * bandwidth + bandwidth * bandwidth
    alpha = (4.0 * df * bandwidth) / denom
    beta = (4.0 * bandwidth * bandwidth) / denom
    return float(alpha), float(beta)


def _normalize_phase(d):
    """Wrap to (-π, π] like reference math/normalize_phase.h (single-step)."""
    two_pi = jnp.float32(2.0 * np.pi)
    pi = jnp.float32(np.pi)
    d = jnp.where(d > pi, d - two_pi, d)
    d = jnp.where(d <= -pi, d + two_pi, d)
    return d


class PLL(Block):
    """Second-order PLL emitting the VCO phasor exp(j·phase).

    Per sample (reference pll.h:64-70, phase_control_loop.h advance()):
        out = exp(j·phase)
        err = normalizePhase(∠in − phase)
        freq += β·err, clamped to [minFreq, maxFreq]
        phase += freq + α·err, wrapped to [−π, π]
    """

    def __init__(self, bandwidth: float, init_phase: float = 0.0,
                 init_freq: float = 0.0, min_freq: float = -np.pi,
                 max_freq: float = np.pi, unroll: int = 16):
        self.alpha, self.beta = critically_damped(bandwidth)
        self.init_phase = float(init_phase)
        self.init_freq = float(init_freq)
        self.min_freq = float(min_freq)
        self.max_freq = float(max_freq)
        self.unroll = unroll

    def init_state(self, batch_shape=()):
        return {"phase": jnp.full(batch_shape, self.init_phase, jnp.float32),
                "freq": jnp.full(batch_shape, self.init_freq, jnp.float32)}

    def apply(self, params, state, x):
        alpha = jnp.float32(self.alpha)
        beta = jnp.float32(self.beta)
        fmin = jnp.float32(self.min_freq)
        fmax = jnp.float32(self.max_freq)
        ang = jnp.arctan2(jnp.imag(x), jnp.real(x)).astype(jnp.float32)
        angt = jnp.moveaxis(ang, -1, 0)

        def step(carry, a):
            phase, freq = carry
            out_phase = phase
            err = _normalize_phase(a - phase)
            freq = jnp.clip(freq + beta * err, fmin, fmax)
            phase = _normalize_phase(phase + freq + alpha * err)
            return (phase, freq), out_phase

        (phase, freq), out_phases = jax.lax.scan(
            step, (state["phase"], state["freq"]), angt, unroll=self.unroll)
        ph = jnp.moveaxis(out_phases, 0, -1)
        vco = jax.lax.complex(jnp.cos(ph), jnp.sin(ph))
        return vco, {"phase": phase, "freq": freq}


class CarrierTrackingPLL(PLL):
    """PLL that outputs the de-rotated input (x·conj(vco)) instead of the
    VCO — carrier recovery for synchronous AM and RDS
    (reference: core/src/dsp/loop/carrier_tracking_pll.h)."""

    def apply(self, params, state, x):
        vco, new_state = super().apply(params, state, x)
        return x * jnp.conj(vco), new_state


def pilot_normalize(p: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Fast VCO approximation: unit-magnitude version of the band-passed
    pilot.  Valid because the pilot FIR (18750–19250 Hz, reference
    demod/broadcast_fm.h:43) leaves a near-pure tone."""
    mag = jnp.abs(p)
    return p / jnp.maximum(mag, eps).astype(p.real.dtype)
