"""Frequency translation (complex NCO rotate).

Reference: core/src/dsp/channel/frequency_xlator.h:43-56 — a VOLK phasor
rotator that multiplies each sample by an accumulated unit phasor.  The
sequential phasor accumulation is replaced by a closed form:

    y[n] = x[n] * exp(j*(phase0 + omega*n))

with the scalar ``phase0`` carried across blocks.  float32 phase accuracy
over long blocks: the angle grid is factored as an outer product
exp(j*A*m) ⊗ exp(j*omega*k), n = m*SPAN + k, where A = (omega*SPAN) mod 2π
is computed **host-side in float64** and shipped as a param alongside omega.
This bounds phase error to ~eps*(|A|*M + |omega|*SPAN) ≈ 1e-4 rad per
256k-sample block instead of eps*omega*T ≈ 2.6e-2.

``omega`` (radians/sample) is a runtime param — retuning a VFO does not
recompile — and may be per-channel (shape = batch shape) so one compiled
kernel serves hundreds of differently-tuned VFOs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..runtime.block import Block

_TWO_PI = 2.0 * np.pi
SPAN = 1024


def nco_params(offset_hz, samplerate: float):
    """Host-side float64 computation of the NCO params pytree.

    ``offset_hz`` may be a scalar or a numpy array (per-channel offsets).
    """
    omega = np.asarray(offset_hz, np.float64) * (_TWO_PI / samplerate)
    omega_span = np.mod(omega * SPAN, _TWO_PI)
    return {"omega": jnp.asarray(omega, jnp.float32),
            "omega_span": jnp.asarray(omega_span, jnp.float32)}


def rotor(phase0, omega, omega_span, T: int):
    """Unit phasor table exp(j*(phase0 + omega*arange(T))); batch-broadcast."""
    phase0 = jnp.asarray(phase0, jnp.float32)
    omega = jnp.asarray(omega, jnp.float32)
    omega_span = jnp.asarray(omega_span, jnp.float32)
    batch = jnp.broadcast_shapes(phase0.shape, omega.shape)
    phase0 = jnp.broadcast_to(phase0, batch)
    omega = jnp.broadcast_to(omega, batch)
    omega_span = jnp.broadcast_to(omega_span, batch)
    if T <= SPAN:
        n = jnp.arange(T, dtype=jnp.float32)
        ang = phase0[..., None] + omega[..., None] * n
        return jax.lax.complex(jnp.cos(ang), jnp.sin(ang))
    M = -(-T // SPAN)  # ceil; surplus sliced off below
    m = jnp.arange(M, dtype=jnp.float32)
    k = jnp.arange(SPAN, dtype=jnp.float32)
    # keep A*m wrapped so the fp32 product stays small
    ang_m = phase0[..., None] + jnp.mod(omega_span[..., None] * m, _TWO_PI)
    ang_k = omega[..., None] * k
    pm = jax.lax.complex(jnp.cos(ang_m), jnp.sin(ang_m))
    pk = jax.lax.complex(jnp.cos(ang_k), jnp.sin(ang_k))
    full = (pm[..., :, None] * pk[..., None, :]).reshape(batch + (M * SPAN,))
    return full[..., :T]


def advance_phase(phase0, omega, omega_span, T: int):
    phase0 = jnp.asarray(phase0, jnp.float32)
    if T <= SPAN:
        return jnp.mod(phase0 + jnp.asarray(omega, jnp.float32) * T, _TWO_PI)
    M, rem = divmod(T, SPAN)
    acc = jnp.mod(jnp.asarray(omega_span, jnp.float32) * M, _TWO_PI)
    if rem:
        acc = acc + jnp.asarray(omega, jnp.float32) * rem
    return jnp.mod(phase0 + acc, _TWO_PI)


class FrequencyXlator(Block):
    """y = x * exp(j*(phase + omega*n)); carried scalar phase per channel.

    Sign convention matches the reference: RxVFO translates by -offset
    (reference: core/src/dsp/channel/rx_vfo.h:27)."""

    def __init__(self, offset_hz: float, samplerate: float):
        self.offset_hz = float(offset_hz)
        self.samplerate = float(samplerate)

    def init_state(self, batch_shape=()):
        return jnp.zeros(batch_shape, jnp.float32)

    def init_params(self):
        return nco_params(self.offset_hz, self.samplerate)

    def make_params(self, offset_hz):
        """Retune helper (host float64 → params pytree)."""
        return nco_params(offset_hz, self.samplerate)

    def apply(self, params, state, x):
        if params is None:
            params = self.init_params()
        omega, omega_span = params["omega"], params["omega_span"]
        T = x.shape[-1]
        rot = rotor(state, omega, omega_span, T)
        y = x * rot
        new_phase = advance_phase(state, omega, omega_span, T)
        return y, jnp.broadcast_to(new_phase, state.shape)
