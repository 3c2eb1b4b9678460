"""256-channel scanner workload (BASELINE config 5 shape): full
xlate→resample→demod chain, channel-sharded over the virtual mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from sdrplusplusbrown_tpu.models.radio import Radio, DEMOD_NFM
from sdrplusplusbrown_tpu.parallel.channel import channel_sharded_fn


@pytest.mark.slow
def test_256_channel_bank_sharded(rng):
    fs = 2_400_000.0
    C = 256
    radio = Radio(fs, DEMOD_NFM, pll_mode="normalize")
    g = radio.in_multiple
    T = ((24_000 + g - 1) // g) * g
    mesh = Mesh(np.array(jax.devices()), ("ch",))

    offsets = np.linspace(-1.1e6, 1.1e6, C)
    params = radio.make_params(offsets)
    state = radio.init_state((C,))
    x = (0.05 * (rng.standard_normal((C, T))
                 + 1j * rng.standard_normal((C, T)))).astype(np.complex64)

    def step(p, s, xx):
        return radio.apply(p, s, xx)

    fn, place = channel_sharded_fn(step, mesh, params, state,
                                   jnp.asarray(x), C)
    p, s, xd = place(params, state, jnp.asarray(x))
    y, s2 = fn(p, s, xd)
    assert y.shape[0] == C
    # channel axis is actually sharded over the mesh
    shards = y.addressable_shards
    assert len(shards) == len(jax.devices())
    per_dev = sorted(sh.data.shape[0] for sh in shards)
    assert per_dev[0] == C // len(jax.devices())
    assert np.all(np.isfinite(np.asarray(y)))
    # second streaming step with carried state
    y2, _ = fn(p, s2, xd)
    assert np.all(np.isfinite(np.asarray(y2)))
