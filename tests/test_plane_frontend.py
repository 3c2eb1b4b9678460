"""Plane-chained front end (ops/plane_frontend.py): equality against
the standard SharedRxVFOBank path, streaming state carry, and the WFM-8
bench configuration — all in pallas interpret mode on CPU."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sdrplusplusbrown_tpu.models.rx_vfo import SharedRxVFOBank, RxVFO
from sdrplusplusbrown_tpu.ops.plane_frontend import build_plane_pipeline


def _snr_db(got, ref):
    err = np.abs(got - ref) ** 2
    sig = np.abs(ref) ** 2
    return 10 * np.log10(np.mean(sig) / max(np.mean(err), 1e-30))


def _mk(fs, if_rate, bw, C, seed=0):
    bank = SharedRxVFOBank(fs, if_rate, bw)
    pipe = build_plane_pipeline(bank, C, interpret=True)
    rng = np.random.default_rng(seed)
    offsets = np.linspace(-fs / 3, fs / 3, C)
    params = {"fused": bank.make_params(offsets)["fused"]}
    state = bank.init_state(C)
    return bank, pipe, params, state, rng, offsets


def test_plane_pipeline_matches_bank_wfm():
    """The WFM-8 bench front end: 2.4 MS/s → 500 kHz, bw 150 kHz."""
    fs, if_rate, bw, C = 2_400_000.0, 500_000.0, 150_000.0, 8
    bank, pipe, params, state, rng, _ = _mk(fs, if_rate, bw, C)
    assert pipe is not None, "plane pipeline must support the bench cfg"
    g = bank.in_multiple
    T = ((48_000 + g - 1) // g) * g
    x = (rng.standard_normal(T) + 1j * rng.standard_normal(T)
         ).astype(np.complex64) * 0.5

    y_ref, st_ref = jax.jit(bank.apply)(params["fused"] and params,
                                        state, jnp.asarray(x)) \
        if False else bank.apply(params, state, jnp.asarray(x))
    y_pl, st_pl = pipe.apply(params["fused"], state, jnp.asarray(x))
    snr = _snr_db(np.asarray(y_pl), np.asarray(y_ref))
    assert snr > 70, snr
    # state equality: fused tail/phase exact, stage tails near-exact
    np.testing.assert_allclose(np.asarray(st_pl["fused"]["tail"]),
                               np.asarray(st_ref["fused"]["tail"]))
    np.testing.assert_allclose(np.asarray(st_pl["fused"]["phase"]),
                               np.asarray(st_ref["fused"]["phase"]),
                               atol=1e-5)
    for a, b in zip(st_pl["rest_decim"], st_ref["rest_decim"]):
        assert _snr_db(np.asarray(a), np.asarray(b)) > 70


def test_plane_pipeline_streaming_continuity():
    """Two half blocks == one full block (state carry across calls)."""
    fs, if_rate, bw, C = 2_400_000.0, 500_000.0, 150_000.0, 8
    bank, pipe, params, state, rng, _ = _mk(fs, if_rate, bw, C, seed=3)
    g = bank.in_multiple
    T = ((48_000 + g - 1) // g) * g
    x = (rng.standard_normal(2 * T) + 1j * rng.standard_normal(2 * T)
         ).astype(np.complex64) * 0.5

    y_full, _ = pipe.apply(params["fused"], state, jnp.asarray(x[:T]))
    y_full2, _ = bank.apply(params, state, jnp.asarray(x[:T]))

    y1, st1 = pipe.apply(params["fused"], state,
                         jnp.asarray(x[:T // 2]))
    y2, st2 = pipe.apply(params["fused"], st1,
                         jnp.asarray(x[T // 2:T]))
    y_split = np.concatenate([np.asarray(y1), np.asarray(y2)], axis=-1)
    snr = _snr_db(y_split, np.asarray(y_full))
    assert snr > 80, snr
    # and the streamed plane path still matches the standard path
    assert _snr_db(y_split, np.asarray(y_full2)) > 70


def test_plane_pipeline_matches_unshared_vfo():
    """End-to-end against a per-channel (broadcast) RxVFO bank."""
    fs, if_rate, bw, C = 2_400_000.0, 500_000.0, 150_000.0, 8
    bank, pipe, params, state, rng, offsets = _mk(fs, if_rate, bw, C,
                                                  seed=5)
    base = RxVFO(fs, if_rate, bw)
    g = max(bank.in_multiple, base.in_multiple)
    T = ((48_000 + g - 1) // g) * g
    x = (rng.standard_normal(T) + 1j * rng.standard_normal(T)
         ).astype(np.complex64) * 0.5

    y_pl, _ = pipe.apply(params["fused"], state, jnp.asarray(x))

    bp = base.make_params(offsets)
    bs = base.init_state((C,))
    xb = jnp.broadcast_to(jnp.asarray(x)[None, :], (C, T))
    y_ref, _ = base.apply(bp, bs, xb)
    snr = _snr_db(np.asarray(y_pl), np.asarray(y_ref))
    assert snr > 60, snr


def test_plane_pipeline_nfm_rates():
    """A second rate plan (NFM 2.4 MS/s → 50 kHz) exercises a longer
    decimator cascade through the same protocol."""
    fs, if_rate, bw, C = 2_400_000.0, 50_000.0, 25_000.0, 8
    bank, pipe, params, state, rng, _ = _mk(fs, if_rate, bw, C, seed=7)
    if pipe is None:
        pytest.skip("NFM plan unsupported by plane pipeline")
    g = bank.in_multiple
    T = ((96_000 + g - 1) // g) * g
    x = (rng.standard_normal(T) + 1j * rng.standard_normal(T)
         ).astype(np.complex64) * 0.5
    y_pl, _ = pipe.apply(params["fused"], state, jnp.asarray(x))
    y_ref, _ = bank.apply(params, state, jnp.asarray(x))
    snr = _snr_db(np.asarray(y_pl), np.asarray(y_ref))
    assert snr > 70, snr
