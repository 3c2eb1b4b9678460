"""Multi-host scaffolding tests (single-process mode on the virtual
8-device mesh)."""

import numpy as np
import jax
import jax.numpy as jnp

from sdrplusplusbrown_tpu.parallel.multihost import (
    initialize_distributed, make_mesh, feed_time_sharded, replicate,
    host_local_slice)


def test_make_mesh_shapes():
    m = make_mesh(n_time=2, n_ch=4)
    assert m.shape == {"time": 2, "ch": 4}
    m1 = make_mesh(n_time=1)
    assert m1.shape["ch"] == len(jax.devices())


def test_initialize_noop_single_process():
    initialize_distributed(num_processes=1)   # must not raise


def test_feed_time_sharded(rng):
    mesh = make_mesh(n_time=2, n_ch=4)
    T = 1024
    x = (rng.standard_normal(T) + 1j * rng.standard_normal(T)
         ).astype(np.complex64)
    arr = feed_time_sharded(mesh, x, T)
    assert arr.shape == (T,)
    # sharded over "time": 2 shards of 512
    shards = arr.addressable_shards
    sizes = sorted(s.data.shape[0] for s in shards)
    assert sizes[0] == 512 and sizes[-1] == 512
    np.testing.assert_array_equal(np.asarray(arr), x)
    r = replicate(mesh, jnp.float32(3.0))
    assert float(r) == 3.0
    lo, hi = host_local_slice(T)
    assert (lo, hi) == (0, T)
