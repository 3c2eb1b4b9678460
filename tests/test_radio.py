"""End-to-end demodulation tests for the Radio model (the analog of the
reference's e2e recording tests, SURVEY.md §4): synthesize IQ, run the full
VFO→demod→audio pipeline, assert recovered audio content."""
import numpy as np
import jax.numpy as jnp
import pytest

from sdrplusplusbrown_tpu.models.radio import (
    Radio, DEMOD_WFM, DEMOD_NFM, DEMOD_AM, DEMOD_USB, DEMOD_LSB, DEMOD_CW,
    DEMOD_RAW)


def tone_power(x, f, fs):
    """Power of frequency f in real signal x (normalized amplitude)."""
    t = np.arange(len(x)) / fs
    c = np.exp(-2j * np.pi * f * t)
    return 2 * np.abs(np.mean(x * c))


def fm_modulate(mpx, deviation, fs):
    phase = np.cumsum(2 * np.pi * deviation * mpx / fs)
    return np.exp(1j * phase).astype(np.complex64)


def block_len(radio, target):
    g = radio.in_multiple
    return ((target + g - 1) // g) * g


def test_wfm_stereo_pipeline():
    fs = 2_400_000.0
    radio = Radio(fs, DEMOD_WFM, stereo=True)
    n = block_len(radio, 1 << 19)  # ~0.22 s
    t = np.arange(n) / fs
    fl, fr = 600.0, 1100.0
    L = np.sin(2 * np.pi * fl * t)
    R = np.sin(2 * np.pi * fr * t)
    wp = 2 * np.pi * 19000.0
    mpx = (0.45 * (L + R) / 2 + 0.1 * np.cos(wp * t)
           + 0.45 * ((L - R) / 2) * np.cos(2 * wp * t))
    x = fm_modulate(mpx, 75_000.0, fs)

    y, st = radio.apply(radio.init_params(), radio.init_state(),
                        jnp.asarray(x))
    y = np.asarray(y)
    assert y.shape[0] == 2
    n48 = y.shape[-1]
    assert n48 == int(n * radio.ratio)
    # skip filter transients
    l, r = y[0, 8000:], y[1, 8000:]
    fs48 = 48000.0
    # left tone appears in L, right tone in R
    assert tone_power(l, fl, fs48) > 0.1
    assert tone_power(r, fr, fs48) > 0.1
    # stereo separation > 12 dB
    assert tone_power(l, fl, fs48) > 4 * tone_power(l, fr, fs48)
    assert tone_power(r, fr, fs48) > 4 * tone_power(r, fl, fs48)


def test_wfm_mono_pipeline():
    fs = 2_400_000.0
    radio = Radio(fs, DEMOD_WFM, stereo=False, deemphasis="none")
    n = block_len(radio, 1 << 19)
    t = np.arange(n) / fs
    msg = 0.5 * np.sin(2 * np.pi * 1000.0 * t)
    x = fm_modulate(msg, 75_000.0, fs)
    y, _ = radio.apply(None, radio.init_state(), jnp.asarray(x))
    y = np.asarray(y)[0, 4000:]
    p = tone_power(y, 1000.0, 48000.0)
    assert abs(p - 0.5) < 0.05  # amplitude preserved through the chain


def test_wfm_offset_tuning():
    fs = 1_200_000.0
    offset = 250_000.0
    radio = Radio(fs, DEMOD_WFM, stereo=False, offset_hz=offset,
                  deemphasis="none")
    n = block_len(radio, 1 << 18)
    t = np.arange(n) / fs
    msg = 0.4 * np.sin(2 * np.pi * 700.0 * t)
    bb = fm_modulate(msg, 75_000.0, fs)
    x = (bb * np.exp(2j * np.pi * offset * t)).astype(np.complex64)
    y, _ = radio.apply(None, radio.init_state(), jnp.asarray(x))
    y = np.asarray(y)[0, 8000:]
    assert abs(tone_power(y, 700.0, 48000.0) - 0.4) < 0.05


def test_nfm_pipeline():
    fs = 1_200_000.0
    radio = Radio(fs, DEMOD_NFM)  # bw 12.5k, dev 6.25k, IF 50k
    n = block_len(radio, 1 << 18)
    t = np.arange(n) / fs
    msg = 0.7 * np.sin(2 * np.pi * 1000.0 * t)
    x = fm_modulate(msg, 6_250.0, fs)
    y, _ = radio.apply(None, radio.init_state(), jnp.asarray(x))
    y = np.asarray(y)[0, 4000:]
    assert abs(tone_power(y, 1000.0, 48000.0) - 0.7) < 0.07


def test_am_pipeline():
    fs = 960_000.0
    radio = Radio(fs, DEMOD_AM)
    n = block_len(radio, 1 << 18)
    t = np.arange(n) / fs
    x = ((1.0 + 0.5 * np.sin(2 * np.pi * 1000.0 * t)) *
         np.exp(2j * np.pi * 0.0 * t)).astype(np.complex64)
    y, _ = radio.apply(None, radio.init_state(), jnp.asarray(x))
    y = np.asarray(y)[0, 8000:]
    # audio AGC normalises to its set point; check tone dominates
    p_sig = tone_power(y, 1000.0, 48000.0)
    p_off = tone_power(y, 1731.0, 48000.0)
    assert p_sig > 10 * p_off
    assert p_sig > 0.2


@pytest.mark.parametrize("demod_id,sideband", [(DEMOD_USB, +1),
                                               (DEMOD_LSB, -1)])
def test_ssb_pipeline(demod_id, sideband):
    fs = 768_000.0
    bw = 2800.0
    audio_f = 1000.0
    # VFO offset points at passband centre; carrier sits at ∓bw/2
    radio = Radio(fs, demod_id, bandwidth=bw)
    n = block_len(radio, 1 << 18)
    t = np.arange(n) / fs
    # a tone at carrier + sideband*audio_f; carrier = -sideband*bw/2 rel. VFO
    f_rf = sideband * (audio_f - bw / 2.0)
    x = np.exp(2j * np.pi * f_rf * t).astype(np.complex64)
    y, _ = radio.apply(None, radio.init_state(), jnp.asarray(x))
    y = np.asarray(y)[0, 8000:]
    p_sig = tone_power(y, audio_f, 48000.0)
    p_img = tone_power(y, audio_f + 537.0, 48000.0)
    assert p_sig > 0.2
    assert p_sig > 10 * p_img


def test_cw_pipeline():
    fs = 768_000.0
    radio = Radio(fs, DEMOD_CW)  # tone 800 Hz, IF 3 kHz
    # AGC start ramp is 4800 samples at the 3 kHz IF = 1.6 s (reference
    # loop/agc.h:163), so feed ~4 s and measure after the ramp.
    n = block_len(radio, 1 << 22)
    x = np.ones(n, np.complex64)  # carrier exactly on the VFO
    y, _ = radio.apply(None, radio.init_state(), jnp.asarray(x))
    n48 = np.asarray(y).shape[-1]
    y = np.asarray(y)[0, int(n48 * 0.75):]
    p_sig = tone_power(y, 800.0, 48000.0)
    assert p_sig > 0.5


def test_raw_pipeline():
    fs = 480_000.0
    radio = Radio(fs, DEMOD_RAW)
    n = block_len(radio, 48000)
    t = np.arange(n) / fs
    x = np.exp(2j * np.pi * 5000.0 * t).astype(np.complex64)
    y, _ = radio.apply(None, radio.init_state(), jnp.asarray(x))
    y = np.asarray(y)
    assert y.shape[0] == 2
    # I/Q stereo: L = I = cos, R = Q = sin at 5 kHz
    assert tone_power(y[0, 2000:], 5000.0, 48000.0) > 0.5


def test_radio_batched_channels():
    fs = 1_200_000.0
    C = 4
    offsets = np.array([-300e3, -100e3, 100e3, 300e3])
    radio = Radio(fs, DEMOD_NFM)
    n = block_len(radio, 1 << 17)
    t = np.arange(n) / fs
    # four NFM stations, each with a distinct audio tone
    tones = [400.0, 700.0, 1000.0, 1300.0]
    x = np.zeros(n, np.complex64)
    for off, tf in zip(offsets, tones):
        msg = 0.6 * np.sin(2 * np.pi * tf * t)
        x += fm_modulate(msg, 6250.0, fs) * np.exp(2j * np.pi * off * t) \
            .astype(np.complex64)
    xb = np.broadcast_to(x, (C, n))
    params = radio.make_params(offsets)
    y, _ = radio.apply(params, radio.init_state((C,)), jnp.asarray(xb))
    y = np.asarray(y)
    assert y.shape[:2] == (C, 2)
    for c in range(C):
        a = y[c, 0, 4000:]
        assert tone_power(a, tones[c], 48000.0) > 0.3
        other = tones[(c + 1) % C]
        assert tone_power(a, tones[c], 48000.0) > \
            5 * tone_power(a, other, 48000.0)


def test_radio_streaming_seamless():
    """Two half-blocks produce the same audio as one full block."""
    fs = 1_200_000.0
    radio = Radio(fs, DEMOD_NFM)
    n = block_len(radio, 1 << 17)
    t = np.arange(2 * n) / fs
    msg = 0.5 * np.sin(2 * np.pi * 900.0 * t)
    x = fm_modulate(msg, 6250.0, fs)
    y_full, _ = radio.apply(None, radio.init_state(),
                            jnp.asarray(x[:2 * n]))
    st = radio.init_state()
    y1, st = radio.apply(None, st, jnp.asarray(x[:n]))
    y2, st = radio.apply(None, st, jnp.asarray(x[n:]))
    got = np.concatenate([np.asarray(y1), np.asarray(y2)], axis=-1)
    np.testing.assert_allclose(got, np.asarray(y_full), atol=2e-4)
