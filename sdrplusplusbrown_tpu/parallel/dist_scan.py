"""Distributed first-order linear recurrences.

The reference runs de-emphasis / DC-block / envelope recursions per sample
(reference: core/src/dsp/filter/deephasis.h:14-80,
correction/dc_blocker.h).  ``ops.recurrence`` already evaluates them in
O(log T) with an intra-device associative scan; this module extends the scan
*across time shards*:

  1. each shard composes its local affine map  y -> A_total*y + B_total
     (2 scalars per channel) with one local associative scan,
  2. an exclusive prefix over the device axis combines the per-shard maps
     (all_gather of 2 scalars, negligible on ICI),
  3. each shard applies its prefix carry to its local scan output.

This is exact — identical to the serial recurrence — and is the same
blocked-scan construction used for long-sequence RNN/SSM training.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _combine(left, right):
    a1, b1 = left
    a2, b2 = right
    return a1 * a2, b1 * a2 + b2


def dist_affine_carry(a_tot: jnp.ndarray, b_tot: jnp.ndarray,
                      y0: jnp.ndarray, axis_name: str):
    """Given each shard's total affine map (a_tot, b_tot) (shape [...]) and
    the global initial value ``y0`` (replicated), return each shard's entry
    carry (the recurrence value just before the shard's first sample) and the
    global final value (replicated)."""
    size = jax.lax.axis_size(axis_name)
    if size == 1:
        return y0, a_tot * y0 + b_tot
    # all_gather along a new leading axis: [n_shards, ...]
    A = jax.lax.all_gather(a_tot, axis_name)
    B = jax.lax.all_gather(b_tot, axis_name)
    # inclusive scan over shards (tiny: n_shards elements)
    Ai, Bi = jax.lax.associative_scan(_combine, (A, B), axis=0)
    yends = Ai * y0 + Bi                     # value after each shard
    idx = jax.lax.axis_index(axis_name)
    # entry carry: y0 for shard 0, yends[i-1] otherwise
    prev = jnp.where(idx == 0, y0,
                     jnp.take(yends, jnp.maximum(idx - 1, 0), axis=0))
    return prev, yends[-1]


def sharded_linear_recurrence(a, b, y0, axis_name: str):
    """y[n] = a[n]*y[n-1] + b[n] along the last axis of a time-sharded array.

    ``y0`` is the global initial value (replicated across shards).  Returns
    (local y sequence, global final value replicated).
    """
    b = jnp.asarray(b)
    a = jnp.broadcast_to(jnp.asarray(a, b.dtype), b.shape)
    A, B = jax.lax.associative_scan(_combine, (a, b), axis=-1)
    entry, final = dist_affine_carry(A[..., -1], B[..., -1], y0, axis_name)
    y = A * jnp.expand_dims(entry, -1) + B
    return y, final
