"""Sharded channelized (PFB) pipeline equality vs the unsharded
production path — BASELINE config 5 on the real architecture.

Two regimes over the virtual 8-device CPU mesh (tests/conftest.py):
* chained XLA stages (what CPU runs),
* the actual pallas kernels in interpret mode (what TPU runs) — proves
  the three-kernel scanner path composes with ``shard_map``.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from sdrplusplusbrown_tpu.models.radio import Radio, DEMOD_NFM
from sdrplusplusbrown_tpu.parallel.chan_time import (
    ShardedChannelizedPipeline)

FS = 2_400_000.0
C = 16


def _mesh(nt, nc):
    devs = jax.devices()[:nt * nc]
    if len(devs) < nt * nc:
        pytest.skip(f"needs {nt * nc} devices")
    return Mesh(np.array(devs).reshape(nt, nc), ("time", "ch"))


def _signal(T, offsets, seed=0, live_every=4):
    """FM carriers on every ``live_every``-th channel + noise floor."""
    rng = np.random.default_rng(seed)
    n = np.arange(T)
    x = np.zeros(T, np.complex128)
    for off in offsets[::live_every]:
        tone = 0.5 * np.sin(2 * np.pi * 700.0 * n / FS)
        ph = 2 * np.pi * np.cumsum(2500 * tone) / FS
        x += np.exp(1j * (ph + 2 * np.pi * off * n / FS))
    x = x / max(len(offsets[::live_every]), 1)
    x += 0.003 * (rng.standard_normal(T) + 1j * rng.standard_normal(T))
    return x.astype(np.complex64)


def _snr_db(ref, test):
    err = np.mean((np.asarray(ref) - np.asarray(test)) ** 2)
    sig = np.mean(np.asarray(ref) ** 2)
    return 10 * np.log10(sig / max(err, 1e-30))


def _run_pair(mesh, n_blocks, use_kernels, interpret, squelch_level,
              t_local=24_000):
    radio = Radio(FS, DEMOD_NFM, squelch_enabled=True,
                  pll_mode="normalize")
    pipe = ShardedChannelizedPipeline(
        FS, mesh, C, t_local, DEMOD_NFM, squelch_enabled=True,
        use_kernels=use_kernels, interpret=interpret)
    offsets = np.linspace(-1.0e6, 1.0e6, C) + 917.0
    T = pipe.t_global
    x_blocks = [_signal(T, offsets, seed=b) for b in range(n_blocks)]

    params_s = pipe.make_params(offsets, squelch_level=squelch_level)
    carry = pipe.init_carry()
    audio_s = []
    for xb in x_blocks:
        y, carry = pipe.step(params_s, carry, jnp.asarray(xb))
        audio_s.append(np.asarray(jax.device_get(y)))

    params_u = radio.make_params_channelized(
        offsets, squelch_level=squelch_level)
    state = radio.init_state_channelized(C)
    force = True if interpret else None
    audio_u = []
    for xb in x_blocks:
        y, state = radio.apply_channelized(params_u, state,
                                           jnp.asarray(xb),
                                           _force_fused=force)
        audio_u.append(np.asarray(jax.device_get(y)))

    a_s = np.concatenate(audio_s, axis=-1)
    a_u = np.concatenate(audio_u, axis=-1)
    assert a_s.shape == a_u.shape, (a_s.shape, a_u.shape)
    return a_s, a_u


def test_sharded_channelized_chained_equality():
    """Sharded (2 time × 4 ch) chained path == unsharded chained path
    across a 3-block stream (carry correctness included)."""
    mesh = _mesh(2, 4)
    a_s, a_u = _run_pair(mesh, 3, use_kernels=False, interpret=False,
                         squelch_level=-20.0)
    snr = _snr_db(a_u, a_s)
    assert snr > 55.0, snr
    # the squelch actually did something: some channels gated silent
    ch_pow = np.mean(a_u ** 2, axis=(1, 2))
    assert (ch_pow < 1e-12).any() and (ch_pow > 1e-6).any(), ch_pow


def test_sharded_channelized_squelch_open():
    """Level low enough that every channel passes — exercises the
    all-open gate path."""
    mesh = _mesh(2, 4)
    a_s, a_u = _run_pair(mesh, 2, use_kernels=False, interpret=False,
                         squelch_level=-100.0)
    assert _snr_db(a_u, a_s) > 55.0


@pytest.mark.slow
def test_sharded_channelized_pallas_interpret_equality():
    """The ACTUAL three-kernel scanner path (PFB kernel, post-channelizer
    kernel, demod+audio kernel — interpret mode) under shard_map equals
    the unsharded fused path."""
    mesh = _mesh(2, 2)
    a_s, a_u = _run_pair(mesh, 2, use_kernels=True, interpret=True,
                         squelch_level=-20.0)
    snr = _snr_db(a_u, a_s)
    assert snr > 55.0, snr


def test_sharded_channelized_time_only_mesh():
    """nt=4, nc=1 — pure time sharding."""
    mesh = _mesh(4, 1)
    a_s, a_u = _run_pair(mesh, 2, use_kernels=False, interpret=False,
                         squelch_level=-20.0)
    assert _snr_db(a_u, a_s) > 55.0
