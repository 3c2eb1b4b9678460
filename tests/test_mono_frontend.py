"""Monolithic front-end kernel vs the per-stage chained path.

The mono kernel (ops/mono_frontend.py) runs the whole shared-VFO
decimation chain in one pallas grid with rolling VMEM state; it must be
sample-exact (to fp32 reassociation) against SharedRxVFOBank's chained
apply, across streaming calls and after a runtime retune."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sdrplusplusbrown_tpu.models.radio import (Radio, DEMOD_WFM,
                                               DEMOD_NFM, DEMOD_AM,
                                               DEMOD_USB)
from sdrplusplusbrown_tpu.ops.mono_frontend import build_mono_pipeline


def _snr_db(ref, test):
    err = np.linalg.norm(ref - test)
    sig = np.linalg.norm(ref)
    if err == 0:
        return np.inf
    return 20.0 * np.log10(sig / max(err, 1e-30))


def _make_radio(demod):
    kw = {"pll_mode": "normalize"} if demod == DEMOD_WFM else {}
    return Radio(2_400_000.0, demod, **kw)


def _run_equality(demod, C=8, n_calls=3, retune_at=None):
    radio = _make_radio(demod)
    bank = radio._build_vfo_shared()
    pipe = build_mono_pipeline(bank, C)
    if pipe is None:
        pytest.skip("chain shape unsupported by the mono kernel")
    pipe.interpret = True

    g = np.lcm(radio.in_multiple, pipe.adv_x)
    T = int(g)
    rng = np.random.default_rng(3)
    offs = np.linspace(-0.9e6, 0.9e6, C)
    params = bank.make_params(offs)["fused"]
    st_ref = bank.init_state(C)
    st_mono = bank.init_state(C)

    for call in range(n_calls):
        if retune_at is not None and call == retune_at:
            offs = offs + 37_500.0
            params = bank.make_params(offs)["fused"]
        x = jnp.asarray((rng.standard_normal(T)
                         + 1j * rng.standard_normal(T))
                        .astype(np.complex64) * 0.3)
        y_ref, st_ref = _chained_apply(bank, params, st_ref, x)
        y_mono, st_mono = pipe.apply(params, st_mono, x)
        assert y_mono.shape == y_ref.shape, (y_mono.shape, y_ref.shape)
        snr = _snr_db(np.asarray(y_ref), np.asarray(y_mono))
        assert snr > 70.0, f"call {call}: mono vs chained SNR {snr:.1f} dB"


def _chained_apply(bank, fused_params, state, x):
    """The bank's per-stage path, bypassing the pallas dispatch."""
    st = dict(state)
    y, st["fused"] = bank.fused.apply(fused_params, state["fused"], x)
    new_rd = []
    for blk, s in zip(bank.rest_decim, state["rest_decim"]):
        y, ns = blk.apply(None, s, y)
        new_rd.append(ns)
    st["rest_decim"] = new_rd
    for n, b in bank.rest:
        y, st[n] = b.apply(None, state[n], y)
    if bank.filter_needed:
        y, st["fir"] = bank.base.fir.apply(None, state["fir"], y)
    return y, st


@pytest.mark.slow
def test_mono_wfm_streaming_equality():
    _run_equality(DEMOD_WFM)


@pytest.mark.slow
def test_mono_wfm_retune_without_rebuild():
    _run_equality(DEMOD_WFM, n_calls=3, retune_at=1)


@pytest.mark.slow
def test_mono_nfm_streaming_equality():
    _run_equality(DEMOD_NFM)


@pytest.mark.slow
def test_mono_am_streaming_equality():
    _run_equality(DEMOD_AM, n_calls=2)


@pytest.mark.slow
def test_mono_usb_streaming_equality():
    _run_equality(DEMOD_USB, n_calls=2)


def test_mono_geometry_solver_shapes():
    """The solver must support all four 2.4 MS/s chains at C=8."""
    for demod in (DEMOD_WFM, DEMOD_NFM, DEMOD_AM, DEMOD_USB):
        radio = _make_radio(demod)
        bank = radio._build_vfo_shared()
        pipe = build_mono_pipeline(bank, 8)
        assert pipe is not None, demod
        assert pipe.adv_x % 1024 == 0
        assert pipe.adv0 % 256 == 0


@pytest.mark.slow
def test_mono_nfm_c4_equality():
    """C=4 — the multimode bank's NFM group size (2C=8 rows still tile
    the 8-sublane granule)."""
    _run_equality(DEMOD_NFM, C=4, n_calls=2)


@pytest.mark.slow
def test_mono_am_c4_equality():
    _run_equality(DEMOD_AM, C=4, n_calls=2)
