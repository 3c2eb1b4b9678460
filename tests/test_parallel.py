"""Multi-device sharding tests on the virtual 8-device CPU mesh.

Validates that the time×channel sharded pipelines produce the same samples
as the single-device streaming blocks (the reference's correctness oracle is
demod-audio equivalence within an SNR bound, tests/baseband_file_test.cpp).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from sdrplusplusbrown_tpu.ops.fir import FIR
from sdrplusplusbrown_tpu.ops import taps as taps_mod
from sdrplusplusbrown_tpu.models.radio import Radio, DEMOD_WFM
from sdrplusplusbrown_tpu.parallel import (
    ShardedWFMPipeline, sharded_linear_recurrence)
from sdrplusplusbrown_tpu.parallel.stream_shard import sharded_apply, init_carry


def snr_db(ref, test):
    ref = np.asarray(ref, np.float64)
    err = np.asarray(test, np.float64) - ref
    p = np.mean(ref ** 2)
    pe = np.mean(err ** 2)
    if pe == 0:
        return np.inf
    return 10 * np.log10(p / pe)


def make_mesh(nt, nc):
    devs = np.array(jax.devices()[:nt * nc]).reshape(nt, nc)
    return Mesh(devs, ("time", "ch"))


def test_sharded_linear_recurrence_exact(rng):
    n = 8
    mesh = Mesh(np.array(jax.devices()), ("time",))
    T = 64 * n
    a = np.float32(0.93)
    b = rng.standard_normal(T).astype(np.float32)
    y0 = np.float32(0.7)

    # serial reference
    y_ref = np.zeros(T, np.float32)
    acc = y0
    for i in range(T):
        acc = a * acc + b[i]
        y_ref[i] = acc

    def local(bl):
        y, fin = sharded_linear_recurrence(a, bl, jnp.float32(y0), "time")
        return y, fin

    fn = jax.jit(jax.shard_map(local, mesh=mesh, in_specs=(P("time"),),
                           out_specs=(P("time"), P()), check_vma=False))
    y, fin = fn(jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(float(fin), y_ref[-1], rtol=2e-4, atol=2e-4)


def test_sharded_fir_matches_streaming(rng):
    nt = 8
    mesh = Mesh(np.array(jax.devices()), ("time",))
    t = taps_mod.low_pass(0.1, 0.05, 1.0)
    fir = FIR(t)
    T = 256 * nt
    x = (rng.standard_normal(T) + 1j * rng.standard_normal(T)
         ).astype(np.complex64)

    # streaming reference over 2 global blocks
    st = fir.init_state(())
    y1, st = fir.apply(None, st, jnp.asarray(x))
    y2, _ = fir.apply(None, st, jnp.asarray(x))

    def local(xl, carry):
        y, nc = sharded_apply(fir, xl, "time", carry)
        return y, nc

    fn = jax.jit(jax.shard_map(local, mesh=mesh,
                           in_specs=(P("time"), P()),
                           out_specs=(P("time"), P()), check_vma=False))
    carry = init_carry(fir, (), jnp.complex64)
    ys1, carry = fn(jnp.asarray(x), carry)
    ys2, _ = fn(jnp.asarray(x), carry)
    np.testing.assert_allclose(np.asarray(ys1), np.asarray(y1),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ys2), np.asarray(y2),
                               rtol=1e-5, atol=1e-5)


def _wfm_baseband(rng, fs, T, offsets, audio_hz):
    """Synthesize C FM carriers at ``offsets`` in one wideband capture."""
    n = np.arange(T)
    x = np.zeros(T, np.complex128)
    for off, ah in zip(offsets, audio_hz):
        audio = 0.5 * np.sin(2 * np.pi * ah * n / fs)
        # mono FM, 75 kHz deviation
        phase = 2 * np.pi * np.cumsum(75e3 * audio) / fs
        x += np.exp(1j * (2 * np.pi * off * n / fs + phase))
    return (x / len(offsets)).astype(np.complex64)


@pytest.mark.slow
def test_sharded_wfm_matches_radio(rng):
    fs = 600_000.0
    nt, nc, C = 4, 2, 4
    mesh = make_mesh(nt, nc)
    radio = Radio(fs, DEMOD_WFM, pll_mode="normalize")
    g = radio.in_multiple
    t_local = ((4000 + g - 1) // g) * g
    pipe = ShardedWFMPipeline(fs, mesh, C, t_local)
    T = pipe.t_global

    offsets = np.array([-150e3, -50e3, 50e3, 150e3])
    x = _wfm_baseband(rng, fs, 3 * T, offsets, [400, 700, 1000, 1300])

    # sharded run: 3 global blocks
    params = pipe.make_params(offsets)
    carry = pipe.init_carry()
    outs = []
    for i in range(3):
        y, carry = pipe.step(params, carry, jnp.asarray(x[i * T:(i + 1) * T]))
        outs.append(np.asarray(y))
    y_shard = np.concatenate(outs, axis=-1)          # [C, 2, T_audio]

    # unsharded batched reference
    rparams = radio.make_params(offsets)
    rstate = radio.init_state((C,))
    router = []
    xb = jnp.asarray(x).reshape(1, -1)
    step = jax.jit(lambda p, s, blk: radio.apply(p, s, blk))
    blk_len = T
    for i in range(3):
        blk = jnp.broadcast_to(x[i * T:(i + 1) * T][None, :], (C, blk_len))
        y, rstate = step(rparams, rstate, blk)
        router.append(np.asarray(y))
    y_ref = np.concatenate(router, axis=-1)

    assert y_shard.shape == y_ref.shape
    # skip the filter warm-up transient
    skip = y_ref.shape[-1] // 4
    s = snr_db(y_ref[..., skip:], y_shard[..., skip:])
    assert s > 40.0, f"sharded/unsharded mismatch SNR {s:.1f} dB"
