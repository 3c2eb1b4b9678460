"""Xlator / quadrature / recurrence / AGC / PLL kernel tests against
per-sample numpy oracles mirroring the reference loops."""
import numpy as np
import jax.numpy as jnp

from sdrplusplusbrown_tpu.ops.xlator import FrequencyXlator
from sdrplusplusbrown_tpu.ops.demod import Quadrature, Squelch
from sdrplusplusbrown_tpu.ops.recurrence import (
    Deemphasis, DCBlocker, NoiseBlanker, linear_recurrence)
from sdrplusplusbrown_tpu.ops.agc import AGC
from sdrplusplusbrown_tpu.ops.pll import PLL, critically_damped


def test_xlator_tone_shift(rng):
    fs = 48000.0
    xl = FrequencyXlator(-1000.0, fs)  # shift down by 1 kHz
    n = 4096
    t = np.arange(n) / fs
    x = np.exp(2j * np.pi * 1000.0 * t).astype(np.complex64)
    y, ph = xl.apply(xl.init_params(), xl.init_state(), jnp.asarray(x))
    y = np.asarray(y)
    # result should be DC
    assert abs(np.mean(y) - 1.0) < 1e-3
    assert np.std(np.real(y)) < 1e-3


def test_xlator_streaming_phase_continuity(rng):
    fs = 250000.0
    xl = FrequencyXlator(12345.0, fs)
    n = 8192
    x = np.ones(n, np.complex64)
    st = xl.init_state()
    parts = []
    for i in range(0, n, 2048):
        y, st = xl.apply(xl.init_params(), st, jnp.asarray(x[i:i + 2048]))
        parts.append(np.asarray(y))
    got = np.concatenate(parts)
    omega = 2 * np.pi * 12345.0 / fs
    want = np.exp(1j * omega * np.arange(n))
    err = np.abs(got - want)
    assert np.max(err) < 2e-3  # float32 phase accumulation bound


def test_xlator_long_block_accuracy():
    fs = 2.4e6
    xl = FrequencyXlator(-370000.0, fs)
    n = 1 << 18  # 262144 samples — stress float32 phase accuracy
    x = np.ones(n, np.complex64)
    y, _ = xl.apply(xl.init_params(), xl.init_state(), jnp.asarray(x))
    omega = -2 * np.pi * 370000.0 / fs
    want = np.exp(1j * (omega * np.arange(n) % (2 * np.pi)))
    err = np.abs(np.asarray(y) - want.astype(np.complex64))
    assert np.max(err) < 5e-3


def test_quadrature_fm_demod():
    fs = 500000.0
    dev = 75000.0
    n = 8192
    # FM-modulate a 1 kHz tone
    msg = np.sin(2 * np.pi * 1000.0 * np.arange(n) / fs)
    phase = np.cumsum(2 * np.pi * dev * msg / fs)
    x = np.exp(1j * phase).astype(np.complex64)
    q = Quadrature(dev, fs)
    y, _ = q.apply(None, q.init_state(), jnp.asarray(x))
    y = np.asarray(y)[1:]
    np.testing.assert_allclose(y, msg[1:], atol=2e-3)


def test_quadrature_streaming_no_seam():
    fs = 50000.0
    n = 4096
    phase = np.cumsum(0.3 * np.ones(n))
    x = np.exp(1j * phase).astype(np.complex64)
    q = Quadrature(fs / 2 / (2 * np.pi) * 0.3 * 0 + 1000.0, fs)
    st = q.init_state()
    parts = []
    for i in range(0, n, 1024):
        y, st = q.apply(None, st, jnp.asarray(x[i:i + 1024]))
        parts.append(np.asarray(y))
    got = np.concatenate(parts)[1:]
    assert np.std(got - got.mean()) < 1e-4  # constant frequency ⇒ constant out


def test_linear_recurrence_matches_loop(rng):
    a = rng.uniform(0.5, 0.99, 512).astype(np.float32)
    b = rng.standard_normal(512).astype(np.float32)
    y0 = np.float32(0.7)
    got = np.asarray(linear_recurrence(jnp.asarray(a), jnp.asarray(b),
                                       jnp.asarray(y0)))
    want = np.zeros(512, np.float32)
    prev = y0
    for i in range(512):
        prev = a[i] * prev + b[i]
        want[i] = prev
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_deemphasis_matches_reference_loop(rng):
    fs, tau = 48000.0, 50e-6
    d = Deemphasis(tau, fs)
    x = rng.standard_normal(1024).astype(np.float32)
    y, _ = d.apply(None, d.init_state(), jnp.asarray(x))
    dt = 1.0 / fs
    alpha = dt / (tau + dt)
    want = np.zeros(1024, np.float32)
    prev = 0.0
    for i in range(1024):
        prev = alpha * x[i] + (1 - alpha) * prev
        want[i] = prev
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-4, atol=1e-5)


def test_dc_blocker_removes_dc(rng):
    fs = 15000.0
    dc = DCBlocker(100.0 / fs)
    x = (rng.standard_normal(8192) * 0.1 + 3.0).astype(np.float32)
    st = dc.init_state((), jnp.float32)
    y, st = dc.apply(None, st, jnp.asarray(x))
    y2, _ = dc.apply(None, st, jnp.asarray(x))
    assert abs(np.mean(np.asarray(y2))) < 0.02  # converged: DC gone


def test_dc_blocker_matches_reference_loop(rng):
    rate = 0.01
    dc = DCBlocker(rate)
    x = rng.standard_normal(256).astype(np.float32)
    y, _ = dc.apply(None, dc.init_state((), jnp.float32), jnp.asarray(x))
    offset = 0.0
    want = np.zeros(256, np.float32)
    for i in range(256):
        want[i] = x[i] - offset
        offset += want[i] * rate
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-3, atol=1e-5)


def test_noise_blanker_limits_spikes(rng):
    nb = NoiseBlanker(rate=500.0 / 24000.0, level=10.0)
    x = np.ones(4096, np.complex64) * 0.5
    x[2000] = 100.0 + 0j  # impulse
    y, _ = nb.apply(nb.init_params(), nb.init_state(), jnp.asarray(x))
    y = np.asarray(y)
    # spike limited to the running average (0.5*(1-r) + 100*r ≈ 2.57)
    assert abs(y[2000]) < 3.0
    assert abs(y[1000] - 0.5) < 1e-3  # steady signal untouched


def test_agc_matches_reference_loop(rng):
    atk, dec, sp, mg = 50.0 / 24000.0, 5.0 / 24000.0, 1.0, 10e6
    agc = AGC(set_point=sp, attack=atk, decay=dec, max_gain=mg,
              max_output=10.0)
    x = (rng.standard_normal(2048) * 0.01).astype(np.float32)
    y, _ = agc.apply(None, agc.init_state(), jnp.asarray(x))
    # oracle
    amp = sp / 1.0
    env_n = 0
    want = np.zeros(2048, np.float32)
    for i in range(2048):
        ia = abs(x[i])
        gain = 1.0
        if ia != 0.0:
            amp = amp * (1 - atk) + ia * atk if ia > amp \
                else amp * (1 - dec) + ia * dec
            gain = min(sp / amp, mg)
        env = min(env_n / 4800.0, 1.0)
        env_n += 1
        want[i] = x[i] * gain * env
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-3, atol=1e-5)


def test_agc_batched_channels(rng):
    agc = AGC(attack=0.01, decay=0.001)
    x = (rng.standard_normal((4, 1024)) * 0.1).astype(np.float32)
    y, st = agc.apply(None, agc.init_state((4,)), jnp.asarray(x))
    assert y.shape == (4, 1024)
    assert st["amp"].shape == (4,)


def test_pll_locks_to_tone():
    fs = 500000.0
    f_pilot = 19000.0
    bw = 25000.0 / fs
    w0 = 2 * np.pi * f_pilot / fs
    pll = PLL(bw, init_freq=w0,
              min_freq=2 * np.pi * 18750.0 / fs,
              max_freq=2 * np.pi * 19250.0 / fs)
    n = 20000
    # pilot with a small frequency offset and phase
    w_true = 2 * np.pi * (f_pilot + 80.0) / fs
    x = np.exp(1j * (w_true * np.arange(n) + 0.7)).astype(np.complex64)
    vco, st = pll.apply(None, pll.init_state(), jnp.asarray(x))
    vco = np.asarray(vco)
    # after settling, VCO tracks input phase
    err = np.angle(x[-4000:] * np.conj(vco[-4000:]))
    assert np.max(np.abs(err)) < 0.05
    assert abs(float(st["freq"]) - w_true) < 1e-4


def test_squelch_gates_noise(rng):
    sq = Squelch(level=-30.0)
    quiet = (rng.standard_normal(1024) + 1j * rng.standard_normal(1024)) \
        .astype(np.complex64) * 1e-4
    loud = quiet * 1e3
    yq, _ = sq.apply(sq.init_params(), None, jnp.asarray(quiet))
    yl, _ = sq.apply(sq.init_params(), None, jnp.asarray(loud))
    assert np.all(np.asarray(yq) == 0)
    np.testing.assert_array_equal(np.asarray(yl), loud)


def test_carrier_tracking_pll_derotates(rng):
    """CarrierTrackingPLL outputs the de-rotated input: a pure offset
    carrier collapses to ~DC."""
    from sdrplusplusbrown_tpu.ops.pll import CarrierTrackingPLL
    fs = 48_000.0
    f0 = 200.0
    n = np.arange(int(fs * 0.5))
    x = jnp.asarray(np.exp(2j * np.pi * f0 * n / fs).astype(np.complex64))
    pll = CarrierTrackingPLL(0.02)
    y, st = pll.apply(None, pll.init_state(()), x)
    tail = np.asarray(y)[-4000:]
    # locked: output phase nearly constant (spread well below the input
    # rotation of 2π f0/fs per sample × 4000 samples)
    ph = np.unwrap(np.angle(tail))
    assert np.abs(ph[-1] - ph[0]) < 1.0
    assert abs(float(st["freq"]) - 2 * np.pi * f0 / fs) < 1e-3


def test_fast_agc_normalizes(rng):
    from sdrplusplusbrown_tpu.ops.agc import fast_agc
    agc = fast_agc(rate=0.1)
    x = jnp.asarray((0.01 * np.ones(8000)).astype(np.complex64))
    y, _ = agc.apply(agc.init_params(), agc.init_state(()), x)
    assert 0.7 < float(np.abs(np.asarray(y)[-1])) < 1.3
