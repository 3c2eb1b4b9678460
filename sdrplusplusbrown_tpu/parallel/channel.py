"""Channel (VFO) data parallelism.

The reference fans one wideband baseband out to N independent VFO thread
chains via a memcpy Splitter (reference: core/src/routing/splitter.h:59-92,
signal_path/iq_frontend.cpp:159-179).  Here the N channels are a leading
batch axis of one tensor program, and scaling out is sharding that axis over
the mesh: the wideband block is replicated (it is small — one block of IQ),
while per-channel params (NCO offsets) and all per-channel state shard.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def channel_specs(tree: Any, n_channels: int, axis: str = "ch"):
    """PartitionSpec pytree: leaves whose leading dim == n_channels shard on
    ``axis``; everything else replicates."""
    def spec(leaf):
        leaf = jnp.asarray(leaf)
        if leaf.ndim >= 1 and leaf.shape[0] == n_channels:
            return P(axis, *([None] * (leaf.ndim - 1)))
        return P(*([None] * leaf.ndim))
    return jax.tree.map(spec, tree)


def channel_sharded_fn(step: Callable, mesh: Mesh, params: Any, state: Any,
                       x_example: jnp.ndarray, n_channels: int,
                       axis: str = "ch"):
    """Wrap ``step(params, state, x) -> (y, state)`` so that the channel
    axis shards over ``mesh[axis]`` under jit (GSPMD partitioning).

    Returns (jitted_fn, place) where ``place(params, state, x)`` device_puts
    the operands with the right shardings.
    """
    p_spec = channel_specs(params, n_channels, axis)
    s_spec = channel_specs(state, n_channels, axis)
    x_spec = channel_specs(x_example, n_channels, axis)

    def shard(tree, specs):
        return jax.tree.map(
            lambda l, sp: jax.device_put(l, NamedSharding(mesh, sp)),
            tree, specs)

    in_sh = (jax.tree.map(lambda sp: NamedSharding(mesh, sp), p_spec),
             jax.tree.map(lambda sp: NamedSharding(mesh, sp), s_spec),
             jax.tree.map(lambda sp: NamedSharding(mesh, sp), x_spec))
    fn = jax.jit(step, in_shardings=in_sh)

    def place(params, state, x):
        return (shard(params, p_spec), shard(state, s_spec),
                shard(x, x_spec))

    return fn, place
