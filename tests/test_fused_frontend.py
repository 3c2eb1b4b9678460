"""Fused shared-wideband front end (ops/fused_frontend.py) equality and
streaming-state tests vs the broadcast xlate→FIR path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sdrplusplusbrown_tpu.ops.fused_frontend import (SharedXlateDecimFIR,
                                                     fused_params)
from sdrplusplusbrown_tpu.ops.fir import FIR
from sdrplusplusbrown_tpu.ops.xlator import FrequencyXlator, nco_params
from sdrplusplusbrown_tpu.models.radio import Radio, DEMOD_WFM, DEMOD_NFM


def _snr(ref, test):
    ref, test = np.asarray(ref), np.asarray(test)
    err = np.abs(test - ref) ** 2
    return 10 * np.log10(np.mean(np.abs(ref) ** 2)
                         / max(np.mean(err), 1e-30))


@pytest.mark.slow
def test_fused_stage_matches_unfused_streaming(rng):
    fs, C, T, D = 2_400_000.0, 8, 48_000, 2
    taps = np.hanning(63)
    taps /= taps.sum()
    offs = np.linspace(-1e6, 1e6, C)

    fused = SharedXlateDecimFIR(taps, fs, D)
    p = fused_params(offs, fs, D)
    st = fused.init_state((C,))

    xl = FrequencyXlator(0.0, fs)
    fir = FIR(taps, decim=D)
    xl_p = nco_params(-offs, fs)
    xl_st = xl.init_state((C,))
    fir_st = fir.init_state((C,))

    for _ in range(3):          # state carries across blocks
        x = (rng.standard_normal(T) + 1j * rng.standard_normal(T)
             ).astype(np.complex64) * 0.3
        yf, st = fused.apply(p, st, jnp.asarray(x))
        xb = jnp.broadcast_to(jnp.asarray(x)[None, :], (C, T))
        r, xl_st = xl.apply(xl_p, xl_st, xb)
        yu, fir_st = fir.apply(None, fir_st, r)
        assert _snr(yu, yf) > 70.0


@pytest.mark.slow
@pytest.mark.parametrize("demod", [DEMOD_WFM, DEMOD_NFM])
def test_radio_apply_shared_matches_broadcast(rng, demod):
    fs, C = 2_400_000.0, 8
    radio = Radio(fs, demod, pll_mode="normalize")
    g = radio.in_multiple
    T = ((96_000 + g - 1) // g) * g
    offs = np.linspace(-1e6, 1e6, C)
    # real FM carriers at the offsets: demodulating pure noise is
    # chaotically phase-sensitive and would make the SNR comparison
    # ill-conditioned
    n = np.arange(T)
    dev = 50e3 if demod == DEMOD_WFM else 2.5e3
    x = np.zeros(T, np.complex128)
    for i, off in enumerate(offs):
        tone = 0.6 * np.sin(2 * np.pi * (400 + 200 * i) * n / fs)
        ph = 2 * np.pi * np.cumsum(dev * tone) / fs
        x += np.exp(1j * (ph + 2 * np.pi * off * n / fs))
    x = (x / C + 0.002 * (rng.standard_normal(T)
                          + 1j * rng.standard_normal(T))
         ).astype(np.complex64)

    # IF (linear chain) equality is the tight check — the FM
    # discriminator chaotically amplifies ~1e-7 float-reassociation
    # differences, so demod audio only gets a sanity bound
    vfo_u, _ = radio.vfo.apply(radio.vfo.make_params(-offs * 0 + offs),
                               radio.vfo.init_state((C,)),
                               jnp.broadcast_to(jnp.asarray(x)[None, :],
                                                (C, T)))
    vs = radio._build_vfo_shared()
    vfo_f, _ = vs.apply(vs.make_params(offs), vs.init_state(C),
                        jnp.asarray(x))
    assert _snr(vfo_u, vfo_f) > 70.0

    yu, _ = jax.jit(lambda p, s, b: radio.apply(p, s, b))(
        radio.make_params(offs), radio.init_state((C,)),
        jnp.broadcast_to(jnp.asarray(x)[None, :], (C, T)))
    yf, _ = jax.jit(lambda p, s, b: radio.apply_shared(p, s, b))(
        radio.make_params_shared(offs), radio.init_state_shared(C),
        jnp.asarray(x))
    assert yf.shape == yu.shape
    assert _snr(yu, yf) > 20.0


@pytest.mark.slow
def test_radio_bank_shared_runs(rng):
    from sdrplusplusbrown_tpu.models.radio_bank import RadioBank, VFOSpec
    from sdrplusplusbrown_tpu.models.radio import DEMOD_AM, DEMOD_USB
    fs = 240_000.0
    vfos = [VFOSpec("am0", DEMOD_AM, -60e3),
            VFOSpec("am1", DEMOD_AM, 20e3),
            VFOSpec("usb0", DEMOD_USB, 80e3)]
    bank = RadioBank(fs, vfos)
    g = bank.in_multiple
    T = ((48_000 + g - 1) // g) * g
    x = (rng.standard_normal(T) + 1j * rng.standard_normal(T)
         ).astype(np.complex64) * 0.1
    outs, st = bank.apply(bank.make_params(), bank.init_state(),
                          jnp.asarray(x))
    outs2, _ = bank.apply(bank.make_params(), st, jnp.asarray(x))
    for d, y in outs2.items():
        assert np.all(np.isfinite(np.asarray(y)))
