"""Halo exchange over the time axis of a sharded mesh.

Inside ``shard_map`` each device holds a contiguous ``[..., T_local]`` time
segment.  Every overlap-save op (FIR, decimating FIR, polyphase resampler,
quadrature discriminator, delay line) needs the last ``n`` *input* samples of
the left neighbour — exactly the history the reference keeps as mutable
block state (reference: core/src/dsp/filter/fir.h:84-86,
demod/quadrature.h:43).  One ``lax.ppermute`` shift to the right supplies it
over ICI; the leftmost shard takes the globally-carried streaming state
instead (or zeros at stream start, matching a freshly-reset reference block).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _axis_size(axis_name: str) -> int:
    return jax.lax.axis_size(axis_name)


def left_halo(x: jnp.ndarray, n: int, axis_name: str,
              carry: jnp.ndarray | None = None) -> jnp.ndarray:
    """Return each shard's left halo: the last ``n`` samples (along the last
    axis) of the left neighbour's local block.

    Shard 0 receives ``carry`` (the stream-level carried state, replicated
    across the mesh) or zeros when ``carry`` is None.
    """
    if n == 0:
        return x[..., :0]
    if n > x.shape[-1]:
        raise ValueError(
            f"halo of {n} samples exceeds the local shard length "
            f"{x.shape[-1]}: overlap-save history would span more than "
            f"one neighbor. Increase t_local so every stage's local "
            f"input is at least its taps-1.")
    size = _axis_size(axis_name)
    tail = x[..., -n:]
    if size == 1:
        shifted = jnp.zeros_like(tail)
    else:
        # device i -> i+1; destination 0 is unlisted => filled with zeros.
        perm = [(i, i + 1) for i in range(size - 1)]
        shifted = jax.lax.ppermute(tail, axis_name, perm=perm)
    if carry is not None:
        idx = jax.lax.axis_index(axis_name)
        is_first = (idx == 0)
        shifted = jnp.where(is_first, carry.astype(tail.dtype), shifted)
    return shifted


def last_shard_tail(x: jnp.ndarray, n: int, axis_name: str) -> jnp.ndarray:
    """The last ``n`` samples of the *global* sequence, replicated to every
    shard — the new stream-level carry after this step.  Implemented as a
    broadcast (psum of a masked tail) from the last shard."""
    if n == 0:
        return x[..., :0]
    size = _axis_size(axis_name)
    tail = x[..., -n:]
    if size == 1:
        return tail
    idx = jax.lax.axis_index(axis_name)
    masked = jnp.where(idx == size - 1, tail, jnp.zeros_like(tail))
    return jax.lax.psum(masked, axis_name)


def shard_offset(t_local: int, axis_name: str) -> jnp.ndarray:
    """Global sample index of this shard's first sample (int32 scalar)."""
    return jax.lax.axis_index(axis_name).astype(jnp.int32) * t_local
