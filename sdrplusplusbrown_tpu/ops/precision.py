"""Inter-kernel handoff precision for the fused TPU paths.

The monolithic front end, the whole-demod WFM kernel and the MPX-rate
audio tail hand IF/MPX planes to each other through HBM.  Those
handoffs are the largest remaining HBM terms of the WFM chain
(~27 B/in-sample at the WFM-8 bench config in f32), and the signals
they carry are constant-envelope IF / audio-rate MPX where bfloat16's
8-bit mantissa keeps the quantization floor ~-45 dBc — far below the
analog FM noise floor the reference pipeline tolerates (its own int8
wire formats carry the antenna signal at -42 dB).

``set_handoff_dtype(...)`` switches every kernel-to-kernel plane
between bfloat16 and float32; all in-kernel arithmetic stays float32
(bf16 is storage only — loads upcast before any math).  DEFAULT bf16:
the measured full-chain delta vs the f32 handoff is −65.3 dB audio
SNR with identical stereo separation (docs/benchmarks.md), far below
the analog FM floor.  ``set_handoff_dtype("float32")`` restores
bit-level agreement with the chained reference path (>70 dB equality
oracles — the test suite pins f32 in conftest and covers bf16 in
tests/test_bf16_handoff.py).
"""

from __future__ import annotations

import jax.numpy as jnp

_HANDOFF = ["bf16"]

_DTYPES = {"float32": jnp.float32, "bf16": jnp.bfloat16}


def set_handoff_dtype(name: str) -> None:
    if name not in _DTYPES:
        raise ValueError(f"handoff dtype {name!r} not in {set(_DTYPES)}")
    _HANDOFF[0] = name


def get_handoff_dtype():
    """Current inter-kernel plane dtype (a jnp dtype object)."""
    return _DTYPES[_HANDOFF[0]]


def get_handoff_name() -> str:
    return _HANDOFF[0]
