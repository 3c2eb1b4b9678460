"""Fused WFM stereo-section kernel (ops/pallas_wfm.py) vs the XLA
reference-shaped path, in pallas interpret mode on the CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sdrplusplusbrown_tpu.ops.wfm import BroadcastFM
from sdrplusplusbrown_tpu.ops.pallas_wfm import wfm_stereo_apply


def _xla_stereo(dem, state, mpx):
    """The fallback path of BroadcastFM._stereo_section, isolated."""
    from sdrplusplusbrown_tpu.ops.pll import pilot_normalize
    st = dict(state)
    mpx_c = mpx.astype(jnp.complex64)
    pilot, st["pilot_fir"] = dem.pilot_fir.apply(
        None, state["pilot_fir"], mpx_c)
    vco = pilot_normalize(pilot)
    vco, st["pilot_lag"] = dem.pilot_lag.apply(
        None, state["pilot_lag"], vco)
    vco = vco * jnp.complex64(dem.pilot_phase_corr)
    lpr, st["lpr_delay"] = dem.lpr_delay.apply(
        None, state["lpr_delay"], mpx)
    lmr_c, st["lmr_delay"] = dem.lmr_delay.apply(
        None, state["lmr_delay"], mpx_c)
    vco2 = jnp.conj(vco)
    lmr = jnp.real(lmr_c * vco2 * vco2) * 2.0
    return jnp.stack([lpr + lmr, lpr - lmr], axis=0), st


def _synth_mpx(fsm, C, T, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(T) / fsm
    out = np.zeros((C, T), np.float32)
    for c in range(C):
        l = 0.7 * np.sin(2 * np.pi * (700.0 + 80.0 * c) * t)
        r = 0.5 * np.sin(2 * np.pi * (1900.0 + 60.0 * c) * t)
        mpx = 0.5 * (l + r) + 0.1 * np.sin(2 * np.pi * 19000.0 * t) \
            + 0.5 * (l - r) * (-np.cos(2 * np.pi * 38000.0 * t))
        out[c] = mpx + 0.01 * rng.standard_normal(T)
    return out


@pytest.mark.parametrize("T", [8192, 10240])
def test_stereo_kernel_matches_xla(T):
    fsm = 125000.0
    C = 8
    dem = BroadcastFM(75000.0, 500000.0, stereo=True, rds_out=False,
                      pll_mode="normalize")
    assert dem.out_samplerate == fsm
    K = len(dem.pilot_taps)
    d = dem.lpr_delay.delay
    mpx = jnp.asarray(_synth_mpx(fsm, C, T))
    state = dem.init_state((C,))
    want, _ = _xla_stereo(dem, state, mpx)
    ext = jnp.concatenate([state["mpx_hist"], mpx], axis=-1)
    got = wfm_stereo_apply(ext, dem.pilot_taps, dem.pilot_phase_corr,
                           d, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-4)
    assert ext.shape[-1] == T + K


def test_stereo_kernel_streaming_continuity():
    """Two chained blocks == one long block (history handoff exact)."""
    fsm = 125000.0
    C = 8
    dem = BroadcastFM(75000.0, 500000.0, stereo=True,
                      pll_mode="normalize")
    K = len(dem.pilot_taps)
    d = dem.lpr_delay.delay
    T = 8192
    mpx = jnp.asarray(_synth_mpx(fsm, C, 2 * T, seed=3))
    hist0 = jnp.zeros((C, K), jnp.float32)
    one = wfm_stereo_apply(jnp.concatenate([hist0, mpx], -1),
                           dem.pilot_taps, dem.pilot_phase_corr, d,
                           interpret=True)
    ext1 = jnp.concatenate([hist0, mpx[:, :T]], -1)
    y1 = wfm_stereo_apply(ext1, dem.pilot_taps, dem.pilot_phase_corr,
                          d, interpret=True)
    hist1 = ext1[:, ext1.shape[-1] - K:]
    y2 = wfm_stereo_apply(jnp.concatenate([hist1, mpx[:, T:]], -1),
                          dem.pilot_taps, dem.pilot_phase_corr, d,
                          interpret=True)
    got = jnp.concatenate([y1, y2], axis=-1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(one),
                               rtol=1e-4, atol=1e-5)


def test_audio_poly_merge_rates():
    """audio_rate merges the 15 kHz LP + AF resample into one polyphase
    stage with the right rates and granularity."""
    dem = BroadcastFM(75000.0, 500000.0, stereo=True,
                      audio_rate=48000.0)
    assert dem.audio_poly is not None and dem.audio_fir is None
    assert dem.out_samplerate == 48000.0
    assert dem.audio_poly.interp * 125000 == dem.audio_poly.decim * 48000
    C, T = 2, dem.in_multiple * 8
    x = jnp.asarray((np.random.default_rng(0).standard_normal((C, T))
                     + 0j).astype(np.complex64))
    st = dem.init_state((C,))
    y, st = dem.apply(None, st, x)
    assert y.shape[:-1] == (C, 2)
    assert y.shape[-1] * 125000 * dem.mpx_decim == T * 48000


def test_wfm_whole_demod_kernel_equality(rng):
    """ops/wfm_kernel.py (quad + halfbands + stereo in one kernel) vs
    the chained apply_planes path, streaming across two calls."""
    import jax.numpy as jnp
    from sdrplusplusbrown_tpu.ops.wfm import BroadcastFM

    FSI = 500_000.0
    C, Tb = 8, 25_000
    dem = BroadcastFM(75_000.0, FSI, stereo=True, audio_rate=48_000.0,
                      pll_mode="normalize")
    assert dem._wfm_pipe(C, True) is not None

    # synthetic stereo FM at IF rate: per-channel tone in L only
    n = np.arange(2 * Tb)
    x = np.zeros((C, 2 * Tb), np.complex64)
    for c in range(C):
        tone = np.sin(2 * np.pi * (700.0 + 150.0 * c) * n / FSI)
        pilot = 0.1 * np.sin(2 * np.pi * 19_000.0 * n / FSI)
        sub = -np.cos(2 * np.pi * 38_000.0 * n / FSI)
        mpx = 0.45 * tone + 0.45 * tone * sub + pilot
        phase = 2 * np.pi * 75_000.0 * np.cumsum(mpx) / FSI
        x[c] = np.exp(1j * phase)
    x += 1e-3 * (rng.standard_normal(x.shape)
                 + 1j * rng.standard_normal(x.shape))
    xr = jnp.asarray(np.real(x).astype(np.float32))
    xi = jnp.asarray(np.imag(x).astype(np.float32))

    st1 = dem.init_state((C,))
    y1a, st1 = dem.apply_planes(None, st1, (xr[:, :Tb], xi[:, :Tb]),
                                _force_kernel=False)
    y1b, st1 = dem.apply_planes(None, st1, (xr[:, Tb:], xi[:, Tb:]),
                                _force_kernel=False)
    y1 = np.concatenate([np.asarray(y1a), np.asarray(y1b)], -1)

    st2 = dem.init_state((C,))
    y2a, st2 = dem.apply_planes(None, st2, (xr[:, :Tb], xi[:, :Tb]),
                                _force_kernel=True)
    y2b, st2 = dem.apply_planes(None, st2, (xr[:, Tb:], xi[:, Tb:]),
                                _force_kernel=True)
    y2 = np.concatenate([np.asarray(y2a), np.asarray(y2b)], -1)

    assert y1.shape == y2.shape == (C, 2, 2 * Tb * 48 // 125 // 4)
    err = y1 - y2
    snr = 10 * np.log10(np.mean(y1 ** 2)
                        / max(np.mean(err ** 2), 1e-30))
    assert snr > 70, snr
    # and the kernel path actually decodes stereo: tone lands in L
    sk = y2.shape[-1] // 2
    pl_ = np.mean(y2[0, 0, sk:] ** 2)
    pr_ = np.mean(y2[0, 1, sk:] ** 2)
    assert pl_ > 50 * pr_, (pl_, pr_)
