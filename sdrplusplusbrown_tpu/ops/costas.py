"""Costas loops (carrier recovery for PSK).

reference: core/src/dsp/loop/costas.h — a PLL whose phase error comes from
the demodulated constellation: order 2 → re·im; order 4 →
step(re)·im − step(im)·re; order 8 → the α-weighted variant.  Sequential
by nature; batched across channels inside ``lax.scan`` like ops/pll.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..runtime.block import Block
from .pll import critically_damped, _normalize_phase


def _step(x):
    return jnp.where(x > 0.0, 1.0, -1.0)


def _error(order: int, v: jnp.ndarray) -> jnp.ndarray:
    re, im = jnp.real(v), jnp.imag(v)
    if order == 2:
        err = re * im
    elif order == 4:
        err = _step(re) * im - _step(im) * re
    elif order == 8:
        k = jnp.float32(np.sqrt(2.0) - 1.0)
        err_hi = _step(re) * im - _step(im) * re * k
        err_lo = _step(re) * im * k - _step(im) * re
        err = jnp.where(jnp.abs(re) >= jnp.abs(im), err_hi, err_lo)
    else:
        raise ValueError(f"invalid costas order {order}")
    return jnp.clip(err, -1.0, 1.0)


class Costas(Block):
    def __init__(self, order: int, bandwidth: float,
                 init_phase: float = 0.0, init_freq: float = 0.0,
                 min_freq: float = -np.pi, max_freq: float = np.pi,
                 unroll: int = 16, error_fn=None):
        """``error_fn(v) -> err`` overrides the order-based phase detector
        (used by the Meteor 'broken modulation' Costas variant,
        reference: decoder_modules/meteor_demodulator/src/meteor_costas.h)."""
        assert order in (2, 4, 8)
        self.order = order
        self.error_fn = error_fn
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
        order = self.order
        err_fn = self.error_fn or (lambda v: _error(order, v))
        xt = jnp.moveaxis(x, -1, 0)

        def step(carry, xin):
            phase, freq = carry
            rot = jax.lax.complex(jnp.cos(-phase), jnp.sin(-phase))
            out = xin * rot
            err = jnp.clip(err_fn(out), -1.0, 1.0)
            freq = jnp.clip(freq + beta * err, fmin, fmax)
            phase = _normalize_phase(phase + freq + alpha * err)
            return (phase, freq), out

        (phase, freq), outs = jax.lax.scan(
            step, (state["phase"], state["freq"]), xt, unroll=self.unroll)
        return jnp.moveaxis(outs, 0, -1), {"phase": phase, "freq": freq}
