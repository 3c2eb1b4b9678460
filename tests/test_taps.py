"""Golden tests for the tap designers against scipy and against the
reference's documented design rules (SURVEY.md §2.2, BASELINE.md)."""
import numpy as np
import scipy.signal as sig

from sdrplusplusbrown_tpu.ops import taps, windows


def freq_response(h, fs, freqs):
    w, H = sig.freqz(h, worN=np.asarray(freqs) * 2 * np.pi / fs)
    return np.abs(H)


def test_tap_count_rule():
    # reference: core/src/dsp/taps/estimate_tap_count.h — 3.8*fs/trans
    assert taps.estimate_tap_count(1000.0, 24000.0) == int(3.8 * 24)
    assert taps.estimate_tap_count(4000.0, 500000.0) == 475


def test_nuttall_window_values():
    # Nuttall continuous-first-derivative coefficients
    w = windows.fft_window("nuttall", 64)
    # edge value = alternating sum of coefficients (≈0 for Nuttall)
    assert abs(w[0] - (0.355768 - 0.487396 + 0.144232 - 0.012604)) < 1e-12
    # peak at n = N/2 sums all coefficients to 1
    peak = windows.nuttall(32.0, 64)
    assert abs(peak - 1.0) < 1e-6


def test_lowpass_unity_dc_and_stopband():
    fs = 48000.0
    h = taps.low_pass(3000.0, 1000.0, fs)
    assert len(h) == int(3.8 * 48)
    # DC gain ~1
    assert abs(np.sum(h) - 1.0) < 1e-3
    # passband flat (cutoff is the ~-6 dB point), stopband deep past
    # cutoff + trans (the 3.8 rule reaches ~-90 dB there)
    pb = freq_response(h, fs, [0.0, 1000.0, 2000.0])
    sb = freq_response(h, fs, [4000.0, 6000.0, 10000.0])
    assert np.all(pb > 0.97)
    assert np.all(sb < 1e-4)  # > 80 dB


def test_highpass_response():
    fs = 48000.0
    h = taps.high_pass(300.0, 100.0, fs)
    lo = freq_response(h, fs, [0.0, 100.0])
    hi = freq_response(h, fs, [1000.0, 5000.0])
    assert np.all(lo < 0.05)
    assert np.all(hi > 0.9)


def test_bandpass_complex_asymmetric():
    # WFM pilot filter: 18750–19250 Hz at 500 kHz
    fs = 500000.0
    h = taps.band_pass_complex(18750.0, 19250.0, 3000.0, fs, odd_tap_count=True)
    assert len(h) % 2 == 1
    # complex taps select +19 kHz only (not -19 kHz) under the correlation
    # convention out[i] = sum_k x[i+k] h[k]  ⇒  H(ω) = sum_k h[k] e^{+jωk}.
    # Absolute gain is ~0.22 because the reference designs a 250 Hz-cutoff
    # sinc inside a 3 kHz transition — we reproduce it faithfully; the WFM
    # pilot PLL normalises the amplitude anyway.
    n = np.arange(len(h))

    def gain(f):
        return abs(np.sum(h * np.exp(2j * np.pi * f / fs * n)))

    g_pass = gain(19000.0)
    assert g_pass > 0.1
    assert gain(-19000.0) < 1e-4 * g_pass
    assert gain(12000.0) < 1e-3 * g_pass
    assert gain(26000.0) < 1e-3 * g_pass


def test_bandpass_real_two_sided():
    fs = 48000.0
    h = taps.band_pass_real(300.0, 3000.0, 500.0, fs)
    g = freq_response(h, fs, [1500.0])
    assert g[0] > 0.9
    g0 = freq_response(h, fs, [0.0, 6000.0])
    assert np.all(g0 < 0.05)
