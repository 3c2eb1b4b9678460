"""Spectrum path tests: reshaper framing, FFT dB math, SNR estimator,
IQFrontEnd composition."""

import numpy as np
import jax.numpy as jnp

from sdrplusplusbrown_tpu.ops.spectrum import (
    Reshaper, SpectrumFFT, SpectrumPath, gen_reshape_params,
    calculate_vfo_signal_info, raw_fft_index, make_fft_window)
from sdrplusplusbrown_tpu.ops import windows
from sdrplusplusbrown_tpu.models.iq_frontend import IQFrontEnd


def test_gen_reshape_params():
    # 1 MS/s, 65536-bin FFT @ 20 fps: interval 50000 < 65536 → nz=50000
    nz, skip = gen_reshape_params(1_000_000, 65536, 20.0)
    assert nz == 50000 and skip == 0
    # 10 MS/s: interval 500000 → nz = 65536, skip = 434464
    nz, skip = gen_reshape_params(10_000_000, 65536, 20.0)
    assert nz == 65536 and skip == 500000 - 65536


def test_reshaper_framing(rng):
    r = Reshaper(keep=8, skip=4)
    x = jnp.arange(36, dtype=jnp.float32)
    frames, _ = r.apply(None, None, x)
    assert frames.shape == (3, 8)
    np.testing.assert_array_equal(np.asarray(frames[1]),
                                  np.arange(12, 20, dtype=np.float32))


def test_spectrum_tone_centered(rng):
    """A tone at +fs/8 must appear at bin N/2 + N/8 of the centered FFT."""
    fs = 1024.0
    N = 1024
    n = np.arange(N)
    f = fs / 8
    x = np.exp(2j * np.pi * f * n / fs).astype(np.complex64)
    sp = SpectrumFFT(N, N, window="rectangular")
    db, _ = sp.apply(None, None, jnp.asarray(x)[None, :])
    line = np.asarray(db)[0]
    peak = int(np.argmax(line))
    assert peak == N // 2 + N // 8
    # unit tone, rectangular window: |X|=N ⇒ 10·log10(N²/N²)=0 dB
    assert abs(line[peak]) < 0.1


def test_vfo_signal_info_snr():
    """Synthetic spectrum: noise floor −90 dB, carrier −30 dB in band."""
    fs = 1_000_000.0
    N = 4096
    rng = np.random.default_rng(7)
    line = -90.0 + rng.standard_normal(N)
    center, bw = 100_000.0, 10_000.0
    peak_idx = raw_fft_index(center, fs, N)
    line[peak_idx] = -30.0
    out = calculate_vfo_signal_info(line, center, bw, fs)
    assert out is not None
    strength, snr = out
    # the reference's own test oracle: >20 dB on signal, <20 dB on noise
    # (reference tests/baseband_file_test.cpp:63-91).  Note the estimator
    # reproduces the reference's biased "true noise floor" (it sums the
    # quietest lower+1 side bins but divides by lower, waterfall.cpp:742-746),
    # so the absolute value sits ~10 dB below the ideal max-avg figure.
    assert snr > 20.0
    assert 40.0 < snr < 70.0
    # off-band VFO sees only noise
    _, snr2 = calculate_vfo_signal_info(line, -200_000.0, 10_000.0, fs)
    assert snr2 < 20.0


def test_iq_frontend_composition(rng):
    fs = 1_000_000.0
    fe = IQFrontEnd(fs, decim_ratio=2, dc_blocking=True,
                    fft_size=4096, fft_rate=100.0)
    g = fe.in_multiple
    # long enough for the 50/SR DC blocker (τ = 10k samples) to converge
    T = ((100000 + g - 1) // g) * g
    n = np.arange(T)
    x = (np.exp(2j * np.pi * 50_000.0 * n / fs) + (0.5 + 0.5j)
         ).astype(np.complex64)
    st = fe.init_state(())
    (bb, spectra), st = fe.apply(None, st, jnp.asarray(x))
    assert bb.shape == (T // 2,)
    # effective SR 500k, fft interval = 5000 samples
    assert spectra.shape[-1] == 4096
    assert spectra.shape[0] == (T // 2) // 5000
    # DC component removed by the blocker (steady state by the last frame)
    line = np.asarray(spectra)[-1]
    dc_bin = 4096 // 2
    tone_bin = raw_fft_index(50_000.0, 500_000.0, 4096)
    assert line[tone_bin] > line[dc_bin] + 20.0
