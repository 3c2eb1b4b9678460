"""LogMMSE noise-reduction tests (audio + wideband paths).

The reference has no NR unit tests; these assert the observable contract —
noise suppressed, signal preserved — plus exactness of the numerical
helpers (E1, hole interpolation) the gain formula depends on.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy import special

from sdrplusplusbrown_tpu.ops.logmmse import (
    LogMMSE, IFNRLogMMSE, AFNRLogMMSE, expn_e1, linear_interpolate_holes)


def test_expn_matches_scipy():
    x = np.logspace(-6, 1.5, 300).astype(np.float32)
    got = np.asarray(expn_e1(jnp.asarray(x)))
    want = special.exp1(x)
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=1e-6)


def test_linear_interpolate_holes():
    a = np.array([0., 0., 3., 0., 0., 6., 0., 2., 0., 0.], np.float32)
    f, nz = linear_interpolate_holes(jnp.asarray(a))
    np.testing.assert_allclose(
        np.asarray(f), [3, 3, 3, 4, 5, 6, 4, 2, 2, 2])
    assert bool(nz)
    _, nz0 = linear_interpolate_holes(jnp.zeros(8, jnp.float32))
    assert not bool(nz0)


def test_logmmse_config_constants():
    lm = LogMMSE(48000.0)
    # Slen = floor(0.02*SR) (even), nFFT = 2*Slen  (logmmse.h:286-312)
    assert lm.Slen == 960 and lm.nFFT == 1920
    assert lm.len1 == lm.len2 == 480
    assert lm.H == 200          # nFFT >= 1000
    assert LogMMSE(8000.0).H == 2000
    assert lm.audio is False or lm.audio is True
    assert LogMMSE(24000.0).audio and not LogMMSE(48000.0).audio
    assert abs(lm.ksi_min - 10 ** -2.5) < 1e-9


@pytest.mark.slow
def test_audio_nr_suppresses_silence(rng):
    fs = 8000
    lm = LogMMSE(fs)
    T = fs * 4
    t = np.arange(T) / fs
    clean = np.sin(2 * np.pi * 440 * t) * (np.sin(2 * np.pi * 0.5 * t) > 0)
    x = (clean + 0.3 * rng.standard_normal(T)).astype(np.complex64)
    st = lm.init_state(())
    st = lm.prime(st, jnp.asarray(x[:lm.NOISE_FRAMES * lm.Slen]))
    B = lm.len2 * 25
    ap = jax.jit(lambda p, s, xx: lm.apply(p, s, xx))
    p = lm.init_params()
    outs = []
    for i in range(T // B):
        y, st = ap(p, st, jnp.asarray(x[i * B:(i + 1) * B]))
        outs.append(np.asarray(y))
    y = np.concatenate(outs)
    sil = np.sin(2 * np.pi * 0.5 * t) <= -0.1
    act = np.sin(2 * np.pi * 0.5 * t) > 0.1
    supp = (10 * np.log10(np.mean(np.abs(x[sil]) ** 2))
            - 10 * np.log10(np.mean(np.abs(y[sil]) ** 2)))
    keep = (10 * np.log10(np.mean(np.abs(x[act]) ** 2))
            - 10 * np.log10(np.mean(np.abs(y[act]) ** 2)))
    assert supp > 10.0, f"only {supp:.1f} dB suppression in silence"
    assert keep < 8.0, f"active signal attenuated {keep:.1f} dB"


@pytest.mark.slow
def test_wideband_ifnr_snr_gain(rng):
    fs = 96000
    nr = IFNRLogMMSE(fs)
    lm = nr.core
    assert not lm.audio
    T = fs * 3
    t = np.arange(T) / fs
    x = (0.5 * np.exp(2j * np.pi * 10000 * t)
         + 0.2 * (rng.standard_normal(T) + 1j * rng.standard_normal(T))
         ).astype(np.complex64)
    st = nr.init_state(())
    st = nr.prime(st, jnp.asarray(x[:lm.NOISE_FRAMES * lm.Slen]))
    B = lm.len2 * 20
    ap = jax.jit(lambda p, s, xx: nr.apply(p, s, xx))
    p = nr.init_params()
    outs = []
    for i in range(T // B):
        y, st = ap(p, st, jnp.asarray(x[i * B:(i + 1) * B]))
        outs.append(np.asarray(y))
    y = np.concatenate(outs)
    half = slice(T // 2, T)
    nn = np.arange(T)[half]
    rot = np.exp(-2j * np.pi * 10000 * nn / fs)

    def cpow(sig):
        return 20 * np.log10(np.abs(np.mean(sig[half] * rot)))

    n_in = 10 * np.log10(np.median(np.abs(np.fft.fft(x[half])) ** 2))
    n_out = 10 * np.log10(np.median(np.abs(np.fft.fft(y[half])) ** 2))
    carrier_gain = cpow(y) - cpow(x)
    # output has the reference's x4 (=12 dB) makeup gain (if_nr.h:99-104)
    assert abs(carrier_gain - 12.0) < 1.5
    snr_gain = carrier_gain - (n_out - n_in)
    assert snr_gain > 10.0, f"SNR gain only {snr_gain:.1f} dB"


def test_afnr_shapes(rng):
    nr = AFNRLogMMSE(24000.0)
    lm = nr.core
    st = nr.init_state(())
    x0 = (0.01 * rng.standard_normal(lm.NOISE_FRAMES * lm.Slen)
          ).astype(np.complex64)
    st = nr.prime(st, jnp.asarray(x0))
    B = lm.len2 * 4
    x = (0.01 * rng.standard_normal(B)).astype(np.complex64)
    y, st2 = nr.apply(nr.init_params(), st, jnp.asarray(x))
    assert y.shape == (B,)
    assert st2["sma"].shape == (nr.SMA - 1,)


@pytest.mark.slow
def test_logmmse_batched_matches_per_channel(rng):
    """Batched [C, T] NR must equal running each channel separately."""
    fs = 8000
    lm = LogMMSE(fs)
    T = lm.len2 * 30
    x = (0.1 * (rng.standard_normal((2, T))
                + 1j * rng.standard_normal((2, T)))).astype(np.complex64)
    st = lm.init_state((2,))
    yb, _ = lm.apply(lm.init_params(), st, jnp.asarray(x))
    for c in range(2):
        stc = lm.init_state(())
        yc, _ = lm.apply(lm.init_params(), stc, jnp.asarray(x[c]))
        np.testing.assert_allclose(np.asarray(yb[c]), np.asarray(yc),
                                   rtol=1e-4, atol=1e-5)
