"""Raw front-end→demod handoff on the shared-VFO path (perf round 3).

apply_shared on TPU hands the monolithic front-end kernel's untrimmed
[2C, W] buffer straight to the demod kernels (wfm_kernel / demod_kernel)
instead of materializing [C, m_if] plane slices — a full IF-rate HBM
copy each way.  These tests force that path in interpret mode on CPU:
the raw handoff must be BIT-IDENTICAL to feeding the same kernels the
sliced planes, and the end-to-end forced path must stream exactly
(two half blocks == one block)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sdrplusplusbrown_tpu.models.radio import Radio, DEMOD_WFM, DEMOD_NFM


def _wfm_iq(fs, T, offsets, seed=0):
    """One REAL stereo-FM signal on every channel offset — off-carrier
    channels see a near-zero pilot and pilot_normalize's division
    amplifies fp32 block-boundary noise to O(1), which is
    ill-conditioning, not a streaming bug."""
    rng = np.random.default_rng(seed)
    t = np.arange(T) / fs
    x = np.zeros(T, np.complex64)
    for k, off in enumerate(offsets):
        tone = np.sin(2 * np.pi * (500.0 + 60.0 * k) * t)
        pilot = 0.1 * np.sin(2 * np.pi * 19_000.0 * t)
        sub = -np.cos(2 * np.pi * 38_000.0 * t)
        mpx = 0.45 * tone + 0.45 * tone * sub + pilot
        phase = 2 * np.pi * (off * t + 75_000.0
                             * np.cumsum(mpx) / fs)
        x = x + (0.3 * np.exp(1j * phase)).astype(np.complex64)
    x = x + 1e-3 * (rng.standard_normal(T)
                    + 1j * rng.standard_normal(T))
    return x.astype(np.complex64)


def _setup(demod):
    fs = 2_400_000.0
    radio = Radio(fs, demod, pll_mode="normalize")
    C = 8
    g = radio.in_multiple
    T = ((1 << 17) // g + 1) * g
    offsets = np.linspace(-0.9e6, 0.9e6, C)
    x = jnp.asarray(_wfm_iq(fs, 2 * T, offsets))
    params = radio.make_params_shared(offsets)
    return radio, C, T, x, params


def test_raw_buffer_matches_sliced_planes():
    radio, C, T, x, params = _setup(DEMOD_WFM)
    vs = radio._build_vfo_shared()
    st = radio.init_state_shared(C)
    raw, _ = vs.apply(params["vfo"], st["vfo"], x[:T], raw=True,
                      _force_kernel=True)
    assert isinstance(raw[1], int), "mono kernel should hand off raw"
    buf, m_if = raw
    planes, _ = vs.apply(params["vfo"], st["vfo"], x[:T],
                         return_planes=True, _force_kernel=True)
    np.testing.assert_array_equal(np.asarray(buf[:C, :m_if]),
                                  np.asarray(planes[0]))
    np.testing.assert_array_equal(np.asarray(buf[C:2 * C, :m_if]),
                                  np.asarray(planes[1]))

    # WFM whole-demod kernel: raw feed == sliced-planes feed, bit-exact
    d0 = radio.demod.init_state((C,))
    y_raw, dr = radio.demod.apply_planes(None, d0, (buf, m_if),
                                         _force_kernel=True)
    y_pl, dp = radio.demod.apply_planes(
        None, d0, (buf[:C, :m_if], buf[C:2 * C, :m_if]),
        _force_kernel=True)
    np.testing.assert_array_equal(np.asarray(y_raw), np.asarray(y_pl))
    np.testing.assert_array_equal(np.asarray(dr["quad"]),
                                  np.asarray(dp["quad"]))


def test_raw_feed_demod_kernel_nfm():
    radio, C, T, x, params = _setup(DEMOD_NFM)
    vs = radio._build_vfo_shared()
    st = radio.init_state_shared(C)
    raw, _ = vs.apply(params["vfo"], st["vfo"], x[:T], raw=True,
                      _force_kernel=True)
    assert isinstance(raw[1], int)
    buf, m_if = raw
    pipe2 = radio._fm_audio_pipe(C, True)
    assert pipe2 is not None and pipe2.C == C
    d0 = radio.demod.init_state((C,))
    a0 = radio.af_resamp.init_state((C,))
    y_raw, _, _ = pipe2.apply(None, d0, a0, buf, m_if)
    y_pl, _, _ = pipe2.apply(None, d0, a0,
                             (buf[:C, :m_if], buf[C:2 * C, :m_if]), m_if)
    np.testing.assert_array_equal(np.asarray(y_raw), np.asarray(y_pl))


def test_apply_shared_planes_input_equality():
    """(xr, xi) plane input == complex input, bit-exact, on both the
    forced-kernel and the fallback path (the SoA host-feed form that
    avoids the per-real()/imag() X64Split pass on TPU)."""
    radio, C, T, x, params = _setup(DEMOD_WFM)
    xr = jnp.real(x[:T])
    xi = jnp.imag(x[:T])
    for force in (True, False):
        st = radio.init_state_shared(C)
        y1, s1 = radio.apply_shared(params, st, x[:T],
                                    _force_fused=force)
        st = radio.init_state_shared(C)
        y2, s2 = radio.apply_shared(params, st, (xr, xi),
                                    _force_fused=force)
        np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
        np.testing.assert_array_equal(
            np.asarray(s1["vfo"]["fused"]["tail"]),
            np.asarray(s2["vfo"]["fused"]["tail"]))


def test_spectrum_planes_input_equality():
    from sdrplusplusbrown_tpu.ops.spectrum import SpectrumPath
    fs = 2_400_000.0
    spec = SpectrumPath(fs, fft_size=4096, fft_rate=20.0)
    g = spec.in_multiple
    T = 2 * g
    rng = np.random.default_rng(3)
    x = jnp.asarray((rng.standard_normal(T) + 1j
                     * rng.standard_normal(T)).astype(np.complex64))
    db1, _ = spec.apply(None, None, x)
    db2, _ = spec.apply(None, None, (jnp.real(x), jnp.imag(x)))
    np.testing.assert_allclose(np.asarray(db1), np.asarray(db2),
                               atol=1e-5)


@pytest.mark.parametrize("demod", [DEMOD_WFM, DEMOD_NFM])
def test_apply_shared_forced_streaming_continuity(demod):
    """Two half blocks == one full block through the forced raw path
    (state carry across calls survives the new plumbing)."""
    radio, C, T, x, params = _setup(demod)

    st = radio.init_state_shared(C)
    y_one, _ = radio.apply_shared(params, st, x, _force_fused=True)

    st = radio.init_state_shared(C)
    ya, st = radio.apply_shared(params, st, x[:T], _force_fused=True)
    yb, _ = radio.apply_shared(params, st, x[T:], _force_fused=True)
    y_two = np.concatenate([np.asarray(ya), np.asarray(yb)], -1)

    one = np.asarray(y_one)
    assert one.shape == y_two.shape
    err = np.abs(one - y_two)
    den = max(float(np.abs(one).max()), 1e-12)
    assert err.max() / den < 5e-4, err.max() / den
