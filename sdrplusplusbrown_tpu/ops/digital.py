"""Digital symbol primitives: binary slicer, differential codec,
manchester codec (reference: core/src/dsp/digital/*.h)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..runtime.block import Block


def binary_slice(x):
    """float → bit (reference digital/binary_slicer.h: in > 0)."""
    return (np.asarray(x) > 0.0).astype(np.uint8)


class DifferentialDecoder(Block):
    """out[n] = (in[n] - in[n-1]) mod M  (reference
    digital/differential_decoder.h; M=2 → XOR for bits)."""

    def __init__(self, modulus: int = 2):
        self.modulus = int(modulus)

    def init_state(self, batch_shape=()):
        return jnp.zeros(batch_shape + (1,), jnp.int32)

    def apply(self, params, state, x):
        x = jnp.asarray(x, jnp.int32)
        ext = jnp.concatenate([state, x], axis=-1)
        out = jnp.mod(ext[..., 1:] - ext[..., :-1], self.modulus)
        return out.astype(jnp.uint8), ext[..., -1:]


class DifferentialEncoder(Block):
    """out[n] = (in[n] + out[n-1]) mod M — host-side helper for TX/tests."""

    def __init__(self, modulus: int = 2):
        self.modulus = int(modulus)

    def encode(self, bits: np.ndarray, prev: int = 0) -> np.ndarray:
        out = np.zeros_like(bits)
        acc = prev
        for i, b in enumerate(bits):
            acc = (acc + int(b)) % self.modulus
            out[i] = acc
        return out


def manchester_encode(bits: np.ndarray) -> np.ndarray:
    """bit → (bit, ~bit) symbol pair (reference digital/manchester.h)."""
    bits = np.asarray(bits, np.uint8)
    out = np.empty(2 * len(bits), np.uint8)
    out[0::2] = bits
    out[1::2] = 1 - bits
    return out


def manchester_decode(symbols: np.ndarray) -> np.ndarray:
    symbols = np.asarray(symbols, np.uint8)
    return symbols[0::2]
