"""Pure delay line (reference: core/src/dsp/math/delay.h — a d-sample
ring buffer; here the d carried samples are explicit state)."""

from __future__ import annotations

import jax.numpy as jnp

from ..runtime.block import Block


class Delay(Block):
    def __init__(self, delay: int):
        self.delay = int(delay)

    def init_state(self, batch_shape=(), dtype=jnp.float32):
        return jnp.zeros(batch_shape + (self.delay,), dtype)

    def apply(self, params, state, x):
        if self.delay == 0:
            return x, state
        state = state.astype(x.dtype) if state.dtype != x.dtype else state
        ext = jnp.concatenate([state, x], axis=-1)
        T = x.shape[-1]
        return ext[..., :T], ext[..., T:]
