"""Time-sharded streaming application of DSP blocks.

For every overlap-save block the streaming state *is* the last few input
samples (reference keeps exactly this as mutable history,
core/src/dsp/filter/fir.h:84-86) — so under time sharding the state of
shard i is the left halo fetched from shard i-1 with ``ppermute``, and the
stream-level carry (state entering the next global block) is the global
tail broadcast from the last shard.  First-order IIR blocks (de-emphasis,
DC blocker) instead use the exact distributed affine scan.  Each helper
returns ``(y_local, new_carry)`` where ``new_carry`` is replicated over the
time axis and channel-sharded like the data.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.fir import FIR
from ..ops.resampler import PolyphaseResampler, PowerDecimator, RationalResampler
from ..ops.demod import Quadrature
from ..ops.delay import Delay
from ..ops.recurrence import Deemphasis, DCBlocker
from .halo import left_halo, last_shard_tail
from .dist_scan import sharded_linear_recurrence


def _halo_block(block, n_halo: int, x, axis_name: str, carry):
    """Blocks whose state == last ``n_halo`` input samples."""
    halo = left_halo(x, n_halo, axis_name, carry)
    y, _ = block.apply(None, halo, x)
    new_carry = last_shard_tail(x, n_halo, axis_name)
    return y, new_carry


def sharded_apply(block, x, axis_name: str, carry):
    """Dispatch on block type; mirrors Block.apply but time-sharded."""
    if isinstance(block, FIR):
        return _halo_block(block, block.K - 1, x, axis_name, carry)
    if isinstance(block, PolyphaseResampler):
        return _halo_block(block, block.tpp - 1, x, axis_name, carry)
    if isinstance(block, Quadrature):
        # carry init must be the phasor 1+0j (reference starts phase at 0)
        return _halo_block(block, 1, x, axis_name, carry)
    if isinstance(block, Delay):
        return _halo_block(block, block.delay, x, axis_name, carry)
    if isinstance(block, PowerDecimator):
        new_carry = []
        for stage, c in zip(block.stages, carry):
            x, nc = _halo_block(stage, stage.K - 1, x, axis_name, c)
            new_carry.append(nc)
        return x, new_carry
    if isinstance(block, RationalResampler):
        new_carry = {}
        for name, blk in block.chain.named_blocks:
            x, new_carry[name] = sharded_apply(blk, x, axis_name, carry[name])
        return x, new_carry
    if isinstance(block, Deemphasis):
        a = jnp.float32(1.0 - block.alpha)
        b = x * jnp.float32(block.alpha)
        y, final = sharded_linear_recurrence(a, b, carry, axis_name)
        return y, final
    if isinstance(block, DCBlocker):
        r = jnp.float32(block.rate)
        offs, final = sharded_linear_recurrence(1.0 - r, x * r, carry,
                                                axis_name)
        halo = left_halo(offs, 1, axis_name, carry[..., None]
                         if carry.ndim == offs.ndim - 1 else carry)
        prev = jnp.concatenate([halo, offs[..., :-1]], axis=-1)
        return x - prev, final
    raise TypeError(f"no sharded rule for {type(block).__name__}")


def init_carry(block, batch_shape=(), dtype=jnp.complex64):
    """Stream-start carry for ``sharded_apply`` (matches a reset block)."""
    if isinstance(block, FIR):
        return jnp.zeros(batch_shape + (block.K - 1,), dtype)
    if isinstance(block, PolyphaseResampler):
        return jnp.zeros(batch_shape + (block.tpp - 1,), dtype)
    if isinstance(block, Quadrature):
        return jnp.ones(batch_shape + (1,), jnp.complex64)
    if isinstance(block, Delay):
        return jnp.zeros(batch_shape + (block.delay,), dtype)
    if isinstance(block, PowerDecimator):
        return [jnp.zeros(batch_shape + (s.K - 1,), dtype)
                for s in block.stages]
    if isinstance(block, RationalResampler):
        return {name: init_carry(blk, batch_shape, dtype)
                for name, blk in block.chain.named_blocks}
    if isinstance(block, (Deemphasis,)):
        return jnp.zeros(batch_shape, jnp.float32)
    if isinstance(block, DCBlocker):
        return jnp.zeros(batch_shape, dtype)
    raise TypeError(f"no carry rule for {type(block).__name__}")
