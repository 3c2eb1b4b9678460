"""Mode-generic time×channel sharded radio vs unsharded reference."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from sdrplusplusbrown_tpu.models.radio import (
    Radio, DEMOD_NFM, DEMOD_AM, DEMOD_USB, DEMOD_CW)
from sdrplusplusbrown_tpu.parallel.radio_time import ShardedRadioPipeline


def snr_db(ref, test):
    ref = np.asarray(ref, np.float64)
    err = np.asarray(test, np.float64) - ref
    pe = np.mean(err ** 2)
    return np.inf if pe == 0 else 10 * np.log10(np.mean(ref ** 2) / pe)


def make_mesh(nt, nc):
    devs = np.array(jax.devices()[:nt * nc]).reshape(nt, nc)
    return Mesh(devs, ("time", "ch"))


def _wideband(rng, fs, T, offsets, make_mod):
    n = np.arange(T)
    x = np.zeros(T, np.complex128)
    for i, off in enumerate(offsets):
        x += make_mod(i, n) * np.exp(2j * np.pi * off * n / fs)
    x += 0.01 * (rng.standard_normal(T) + 1j * rng.standard_normal(T))
    return (x / max(len(offsets), 1)).astype(np.complex64)


@pytest.mark.slow
@pytest.mark.parametrize("demod_id,min_snr", [
    (DEMOD_NFM, 40.0),
    (DEMOD_AM, 25.0),      # audio AGC is approximate under time sharding
    (DEMOD_USB, 25.0),
])
def test_sharded_radio_matches_unsharded(rng, demod_id, min_snr):
    fs = 240_000.0
    nt, nc, C = 4, 2, 4
    mesh = make_mesh(nt, nc)
    radio = Radio(fs, demod_id, pll_mode="normalize")
    g = radio.in_multiple
    # shards must be long enough that every stage's taps-1 history fits
    # inside one neighbor shard (the SSB 24 kHz channel FIR has ~650 taps
    # at a 10x decimated rate → needs ≥6500 wideband samples per shard)
    t_local = ((12_000 + g - 1) // g) * g
    pipe = ShardedRadioPipeline(fs, mesh, C, t_local, demod_id)
    T = pipe.t_global

    offsets = np.array([-80e3, -30e3, 30e3, 80e3])

    def mod(i, n):
        tone = 0.6 * np.sin(2 * np.pi * (500 + 300 * i) * n / fs)
        if demod_id == DEMOD_NFM:
            ph = 2 * np.pi * np.cumsum(2500 * tone) / fs
            return np.exp(1j * ph)
        if demod_id == DEMOD_AM:
            return 1.0 + 0.6 * tone
        return tone + 0.0j          # SSB-ish (real modulation)

    x = _wideband(rng, fs, 3 * T, offsets, mod)

    params = pipe.make_params(offsets)
    carry = pipe.init_carry()
    outs = []
    for i in range(3):
        y, carry = pipe.step(params, carry,
                             jnp.asarray(x[i * T:(i + 1) * T]))
        outs.append(np.asarray(y))
    y_shard = np.concatenate(outs, axis=-1)

    rparams = radio.make_params(offsets)
    rstate = radio.init_state((C,))
    step = jax.jit(lambda p, s, b: radio.apply(p, s, b))
    router = []
    for i in range(3):
        blk = jnp.broadcast_to(x[i * T:(i + 1) * T][None, :], (C, T))
        yr, rstate = step(rparams, rstate, blk)
        router.append(np.asarray(yr))
    y_ref = np.concatenate(router, axis=-1)

    assert y_shard.shape == y_ref.shape
    skip = y_ref.shape[-1] // 3
    s = snr_db(y_ref[..., skip:], y_shard[..., skip:])
    assert s > min_snr, f"demod {demod_id}: sharded mismatch SNR {s:.1f} dB"


@pytest.mark.slow
def test_sharded_radio_cw_runs(rng):
    fs = 96_000.0
    mesh = make_mesh(2, 4)
    radio = Radio(fs, DEMOD_CW, pll_mode="normalize")
    g = radio.in_multiple
    # CW's 200 Hz channel FIR has 1140 taps at the 3 kHz IF (32x
    # decimated) → needs ≥ ~37k wideband samples per shard
    t_local = ((40_000 + g - 1) // g) * g
    pipe = ShardedRadioPipeline(fs, mesh, 8, t_local, DEMOD_CW)
    x = (0.1 * (rng.standard_normal(pipe.t_global)
                + 1j * rng.standard_normal(pipe.t_global))
         ).astype(np.complex64)
    y, carry = pipe.step(pipe.make_params(np.linspace(-30e3, 30e3, 8)),
                         pipe.init_carry(), jnp.asarray(x))
    assert y.shape[0] == 8 and y.shape[1] == 2
    assert np.all(np.isfinite(np.asarray(y)))


@pytest.mark.slow
def test_sharded_radio_with_spectrum(rng):
    """The sharded pipeline's optional spectrum branch produces the same
    dB frames as the unsharded SpectrumPath (frames are shard-local)."""
    import math
    from sdrplusplusbrown_tpu.ops.spectrum import SpectrumPath
    fs = 240_000.0
    mesh = make_mesh(4, 2)
    radio = Radio(fs, DEMOD_NFM, pll_mode="normalize")
    sp = SpectrumPath(fs, 2048, 20.0)
    g = math.lcm(radio.in_multiple, sp.in_multiple)
    t_local = ((12_000 + g - 1) // g) * g
    pipe = ShardedRadioPipeline(fs, mesh, 4, t_local, DEMOD_NFM,
                                spectrum_fft=2048, spectrum_rate=20.0)
    x = (0.1 * (rng.standard_normal(pipe.t_global)
                + 1j * rng.standard_normal(pipe.t_global))
         ).astype(np.complex64)
    (audio, spectra), carry = pipe.step(
        pipe.make_params(np.zeros(4)), pipe.init_carry(), jnp.asarray(x))
    ref, _ = sp.apply(None, None, jnp.asarray(x))
    assert spectra.shape == ref.shape
    np.testing.assert_allclose(np.asarray(spectra), np.asarray(ref),
                               rtol=1e-4, atol=1e-2)


@pytest.mark.slow
def test_sharded_runtime_squelch_matches_unsharded(rng):
    """Runtime squelch level flows through make_params on BOTH pipelines
    (no recompile): with the gate above the signal level both outputs are
    silenced; with it below, both pass — and they stay equal."""
    fs = 240_000.0
    mesh = make_mesh(4, 2)
    radio = Radio(fs, DEMOD_NFM, pll_mode="normalize",
                  squelch_enabled=True)
    g = radio.in_multiple
    t_local = ((12_000 + g - 1) // g) * g
    pipe = ShardedRadioPipeline(fs, mesh, 4, t_local, DEMOD_NFM,
                                squelch_enabled=True)
    T = pipe.t_global
    offsets = np.array([-80e3, -30e3, 30e3, 80e3])

    def mod(i, n):
        tone = 0.6 * np.sin(2 * np.pi * (500 + 300 * i) * n / fs)
        ph = 2 * np.pi * np.cumsum(2500 * tone) / fs
        return np.exp(1j * ph)

    x = _wideband(rng, fs, T, offsets, mod)
    xj = jnp.asarray(x)

    step = jax.jit(lambda p, s, b: radio.apply(p, s, b))
    blk = jnp.broadcast_to(xj[None, :], (4, T))
    # the per-channel IF sits at ≈ −6 dB mean amplitude
    for level, expect_audio in ((-3.0, False), (-60.0, True)):
        y_s, _ = pipe.step(pipe.make_params(offsets, squelch_level=level),
                           pipe.init_carry(), xj)
        y_u, _ = step(radio.make_params(offsets, squelch_level=level),
                      radio.init_state((4,)), blk)
        y_s, y_u = np.asarray(y_s), np.asarray(y_u)
        ta = y_u.shape[-1]
        has_audio = float(np.mean(y_u[..., ta // 3:] ** 2)) > 1e-8
        assert has_audio == expect_audio, (level, has_audio)
        if expect_audio:
            s = snr_db(y_u[..., y_u.shape[-1] // 3:],
                       y_s[..., y_s.shape[-1] // 3:])
            assert s > 40.0, s
        else:
            assert np.allclose(y_s, 0.0) and np.allclose(y_u, 0.0)


@pytest.mark.slow
def test_sharded_rds_group_decode_matches_unsharded(rng):
    """RDS under time sharding (VERDICT r2 item 5): the tap (xlate →
    resample) shards via the exact halo rules, the BPSK demod chain
    (AGC → Costas → FIR → Costas → MM clock recovery → diff) runs under
    the sequential relay — the sharded pipeline must decode the same
    RDS groups as the unsharded Radio + RDSDemod."""
    from sdrplusplusbrown_tpu.models.rds import (
        RDSDecoder, RDSDemod, rds_encode_group, rds_group_bits)
    from sdrplusplusbrown_tpu.ops.digital import DifferentialEncoder
    from sdrplusplusbrown_tpu.models.radio import DEMOD_WFM

    PS = "TESTFM  "
    groups = []
    for addr in range(4):
        chars = (ord(PS[addr * 2]) << 8) | ord(PS[addr * 2 + 1])
        groups.append(rds_encode_group(0xABCD, 0, False, 5, addr, 0,
                                       chars))
    bits = np.tile(np.concatenate([rds_group_bits(g) for g in groups]),
                   5)
    enc = DifferentialEncoder().encode(bits)
    d = 1.0 - 2.0 * enc.astype(np.float64)
    fs, fbit = 1_200_000.0, 1187.5
    T_sig = int((len(bits) / fbit + 0.05) * fs)
    t = np.arange(T_sig) / fs
    bit_idx = np.minimum((t * fbit).astype(int), len(bits) - 1)
    frac = t * fbit - np.floor(t * fbit)
    biphase = d[bit_idx] * np.where(frac < 0.5, 1.0, -1.0)
    mpx = (0.2 * np.sin(2 * np.pi * 1000 * t)
           + 0.1 * np.sin(2 * np.pi * 19000 * t)
           + 0.12 * biphase * np.cos(2 * np.pi * 57000 * t))
    x = np.exp(1j * (2 * np.pi * np.cumsum(75000 * mpx) / fs)
               ).astype(np.complex64)

    nt, nc, C = 4, 2, 2
    mesh = make_mesh(nt, nc)
    radio = Radio(fs, DEMOD_WFM, rds=True, pll_mode="normalize")
    g = radio.in_multiple
    t_local = ((60_000 + g - 1) // g) * g
    pipe = ShardedRadioPipeline(fs, mesh, C, t_local, DEMOD_WFM,
                                rds=True)
    Tg = pipe.t_global
    params = pipe.make_params(np.array([0.0, 150e3]))

    carry = pipe.init_carry()
    dec_sh = RDSDecoder()
    n_steps = T_sig // Tg
    for i in range(n_steps):
        (audio, (hard, valid)), carry = pipe.step(
            params, carry, jnp.asarray(x[i * Tg:(i + 1) * Tg]))
        h = np.asarray(hard)[0]
        v = np.asarray(valid)[0]
        dec_sh.push_bits(h[v])

    # unsharded oracle: Radio(rds) tap + RDSDemod on channel 0
    rst = radio.init_state(())
    rp = radio.make_params(0.0)
    demod = RDSDemod()
    dst = demod.init_state(())
    dec_un = RDSDecoder()
    step = jax.jit(lambda p, s, xx: radio.apply(p, s, xx))
    dstep = jax.jit(lambda s, xx: demod.apply(None, s, xx))
    B = ((int(fs * 0.25) + g - 1) // g) * g
    for i in range((n_steps * Tg) // B):
        (audio, rds), rst = step(rp, rst,
                                 jnp.asarray(x[i * B:(i + 1) * B]))
        (hard, valid), dst = dstep(dst, rds)
        dec_un.push_bits(np.asarray(hard)[np.asarray(valid)])

    st_sh, st_un = dec_sh.status(), dec_un.status()
    assert st_un["synced"] and st_un["pi"] == 0xABCD, st_un
    assert st_sh["synced"], st_sh
    assert st_sh["pi"] == st_un["pi"] == 0xABCD
    assert st_sh["ps"] == st_un["ps"] == PS, (st_sh, st_un)
