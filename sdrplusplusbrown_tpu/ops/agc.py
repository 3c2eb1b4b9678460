"""Automatic gain control.

reference: core/src/dsp/loop/agc.h:85-139 — attack/decay envelope follower
with gain = min(setPoint/amp, maxGain) and a 4800-sample start ramp to
suppress clicks on demod switches.  The envelope recursion switches its
coefficient on a comparison with its own output, so it is genuinely
sequential; we run it as a ``lax.scan`` over time with all VFO channels
batched into the scan lanes (the VPU processes the whole channel axis per
step).  The start ramp and the gain application are computed outside the
scan, fully parallel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..runtime.block import Block

ENVELOPE_LEN = 4800  # reference loop/agc.h:163 (_totalEnvelopeLength)


def fast_agc(set_point: float = 1.0, max_gain: float = 10e6,
             rate: float = 0.1):
    """Single-rate AGC used by digital demod front ends
    (reference: core/src/dsp/loop/fast_agc.h — one smoothing rate for
    both attack and decay, no startup ramp concern at symbol rates)."""
    return AGC(set_point=set_point, attack=rate, decay=rate,
               max_gain=max_gain)


class AGC(Block):
    def __init__(self, set_point: float = 1.0, attack: float = 50.0 / 48000.0,
                 decay: float = 5.0 / 48000.0, max_gain: float = 10e6,
                 max_output: float = 10.0, init_gain: float = 1.0,
                 unroll: int = 16):
        self.set_point = float(set_point)
        self.attack = float(attack)
        self.decay = float(decay)
        self.max_gain = float(max_gain)
        self.max_output = float(max_output)
        self.init_gain = float(init_gain)
        self.unroll = unroll

    def init_state(self, batch_shape=()):
        return {
            "amp": jnp.full(batch_shape, self.set_point / self.init_gain,
                            jnp.float32),
            "env": jnp.zeros(batch_shape, jnp.int32),
        }

    def init_params(self):
        return {"frozen": jnp.asarray(False)}

    def apply(self, params, state, x):
        if self.attack <= 0:  # reference agc.h:96-99 — pass-through
            return x, state
        frozen = params["frozen"] if params else jnp.asarray(False)
        T = x.shape[-1]
        in_amp = jnp.abs(x).astype(jnp.float32)
        xt = jnp.moveaxis(in_amp, -1, 0)  # [T, batch...]
        atk = jnp.float32(self.attack)
        dec = jnp.float32(self.decay)
        sp = jnp.float32(self.set_point)
        mg = jnp.float32(self.max_gain)

        def step(amp, ia):
            namp = jnp.where(ia > amp,
                             amp * (1.0 - atk) + ia * atk,
                             amp * (1.0 - dec) + ia * dec)
            upd = jnp.logical_and(ia != 0.0, jnp.logical_not(frozen))
            namp = jnp.where(upd, namp, amp)
            gain = jnp.where(upd, jnp.minimum(sp / namp, mg), 1.0)
            return namp, gain

        amp_final, gains = jax.lax.scan(step, state["amp"], xt,
                                        unroll=self.unroll)
        gain = jnp.moveaxis(gains, 0, -1)

        n0 = state["env"]
        n = n0[..., None] + jnp.arange(T, dtype=jnp.int32)
        env = jnp.minimum(n.astype(jnp.float32) / ENVELOPE_LEN, 1.0)
        y = x * gain * env
        new_state = {"amp": amp_final,
                     "env": jnp.minimum(n0 + T, jnp.int32(1 << 30))}
        return y, new_state
