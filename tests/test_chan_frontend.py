"""Fused post-channelizer kernel (ops/chan_frontend.py) equality tests.

Oracle: the chained ChannelizedRxVFOBank path (gather → FrequencyXlator
→ decim2 → bandwidth FIR as separate XLA ops) — the fused kernel must
match it to float32 accumulation noise (>70 dB), including streaming
state across calls, runtime retunes, and the squelch whole-block sums.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sdrplusplusbrown_tpu.models.radio import Radio, DEMOD_NFM
from sdrplusplusbrown_tpu.models.rx_vfo import ChannelizedRxVFOBank

FS = 2_400_000.0
C = 16


def _bank():
    return ChannelizedRxVFOBank(FS, 50_000.0, 12_500.0)


def _wideband(rng, T):
    x = (rng.standard_normal(T) + 1j * rng.standard_normal(T)
         ).astype(np.complex64) * 0.1
    n = np.arange(T)
    # a few strong carriers so channels have structure
    for f in (-700e3, -150e3, 333e3, 901e3):
        x = x + 0.4 * np.exp(2j * np.pi * f * n / FS).astype(np.complex64)
    return x


def _offsets():
    return np.linspace(-1.0e6, 1.0e6, C) + 917.0


def _snr(ref, got):
    err = np.asarray(ref) - np.asarray(got)
    return 10 * np.log10(np.mean(np.abs(ref) ** 2)
                         / max(np.mean(np.abs(err) ** 2), 1e-30))


def test_fused_equality_and_squelch_sums(rng):
    vb = _bank()
    params = vb.make_params(_offsets())
    T = 48 * 2500
    x = jnp.asarray(_wideband(rng, T))

    st1 = vb.init_state(C)
    y1, st1 = vb.apply(params, st1, x)

    st2 = vb.init_state(C)
    res = vb.apply_fused(params, st2, x, interpret=True)
    assert res is not None, "kernel should support this geometry"
    y2, sq, st2 = res

    snr = _snr(np.asarray(y1), np.asarray(y2))
    assert snr > 70, snr
    np.testing.assert_allclose(
        np.asarray(sq), np.sum(np.abs(np.asarray(y2)), axis=-1),
        rtol=1e-4, atol=1e-3)


def test_fused_streaming_state(rng):
    vb = _bank()
    params = vb.make_params(_offsets())
    T = 48 * 2000
    x = _wideband(rng, 2 * T)

    st1 = vb.init_state(C)
    y1, st1 = vb.apply(params, st1, jnp.asarray(x))

    st2 = vb.init_state(C)
    ya, _, st2 = vb.apply_fused(params, st2, jnp.asarray(x[:T]),
                                interpret=True)
    yb, _, st2 = vb.apply_fused(params, st2, jnp.asarray(x[T:]),
                                interpret=True)
    y2 = np.concatenate([np.asarray(ya), np.asarray(yb)], axis=-1)
    snr = _snr(np.asarray(y1), y2)
    assert snr > 70, snr


def test_fused_runtime_retune(rng):
    vb = _bank()
    T = 48 * 2000
    x = _wideband(rng, 2 * T)
    offs2 = _offsets() + 13_100.0

    st1 = vb.init_state(C)
    _, st1 = vb.apply(vb.make_params(_offsets()), st1, jnp.asarray(x[:T]))
    y1, st1 = vb.apply(vb.make_params(offs2), st1, jnp.asarray(x[T:]))

    st2 = vb.init_state(C)
    _, _, st2 = vb.apply_fused(vb.make_params(_offsets()), st2,
                               jnp.asarray(x[:T]), interpret=True)
    y2, _, st2 = vb.apply_fused(vb.make_params(offs2), st2,
                                jnp.asarray(x[T:]), interpret=True)
    # retune discontinuity: both paths carry the SAME xl phase rule, so
    # outputs still match exactly
    snr = _snr(np.asarray(y1), np.asarray(y2))
    assert snr > 70, snr


def test_pallas_channelizer_equality(rng):
    """ops/pallas_channelizer.py vs the XLA OversampledChannelizer,
    streaming across two calls and with mid-stream state interchange."""
    from sdrplusplusbrown_tpu.ops.pallas_channelizer import (
        build_pallas_channelizer)
    vb = _bank()
    chz = vb.chz
    pz = build_pallas_channelizer(chz, interpret=True)
    assert pz is not None
    T = 48 * 2000
    x = _wideband(rng, 2 * T)

    st1 = chz.init_state()
    y1a, st1 = chz.apply(None, st1, jnp.asarray(x[:T]))
    y1b, st1 = chz.apply(None, st1, jnp.asarray(x[T:]))
    y1 = np.concatenate([np.asarray(y1a), np.asarray(y1b)], -1)

    Tb = 2 * T // chz.M
    W = (Tb + pz.NF - 1) // pz.NF * pz.NF
    st2 = chz.init_state()
    b2a, st2 = pz.apply(st2, jnp.asarray(x[:T]), W)
    # state dicts interchange mid-stream: run the SECOND half chained
    y2b, _ = chz.apply(None, st2, jnp.asarray(x[T:]))
    y2a = (np.asarray(b2a)[:chz.M, :Tb]
           + 1j * np.asarray(b2a)[chz.M:, :Tb])
    y2 = np.concatenate([y2a, np.asarray(y2b)], -1)
    snr = _snr(y1, y2)
    assert snr > 90, snr


def test_pallas_channelizer_v2_vs_v1(rng):
    """The plane-fed V2 kernel (natural [T/128, 128] row view, in-kernel
    window assembly) == the hop-major V1 kernel, bins AND state, on a
    length with a PARTIAL last x block (the OOB-row zero-mask path);
    the (xr, xi) tuple feed == the complex feed."""
    from sdrplusplusbrown_tpu.ops.pallas_channelizer import (
        PallasChannelizer, PallasChannelizerV2)
    vb = _bank()
    chz = vb.chz
    v1 = PallasChannelizer(chz, interpret=True)
    v2 = PallasChannelizerV2(chz, interpret=True)
    assert v1.supported and v2.supported
    T = 384 * 30            # 90 rows -> 1.875 blocks of 48
    x = _wideband(rng, T)
    Tb = 2 * T // chz.M
    W = (Tb + v1.NF - 1) // v1.NF * v1.NF
    st = chz.init_state()
    b1, s1 = v1.apply(st, jnp.asarray(x), W, out_dtype=jnp.float32)
    b2, s2 = v2.apply(st, jnp.asarray(x), W, out_dtype=jnp.float32)
    xr = jnp.asarray(np.real(x).astype(np.float32))
    xi = jnp.asarray(np.imag(x).astype(np.float32))
    b3, s3 = v2.apply(st, (xr, xi), W, out_dtype=jnp.float32)
    b1, b2, b3 = map(np.asarray, (b1, b2, b3))
    assert not np.isnan(b2).any()
    assert np.abs(b1[:, :Tb] - b2[:, :Tb]).max() < 1e-5
    np.testing.assert_array_equal(b2, b3)
    for k in s1:
        np.testing.assert_allclose(np.asarray(s1[k]), np.asarray(s2[k]),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(s2[k]), np.asarray(s3[k]),
                                   atol=1e-6)


def test_chan_fused_equality(rng):
    """ChanFusedPipeline (PFB + post-channelizer in ONE kernel) ==
    the PallasChannelizerV2 → ChanPostPipeline two-kernel route,
    bit-exact incl. squelch sums and every state entry."""
    import jax.tree_util as jtu
    vb = _bank()
    C = 16
    params = vb.make_params(np.linspace(-1.0e6, 1.0e6, C) + 917.0)
    fused = vb._chan_fused(C, interpret=True)
    assert fused is not None and fused.supported
    pipe = vb._chan_pipe(C, interpret=True)
    pz = vb._pallas_chz(True)
    T = 48 * 2560
    x = jnp.asarray(_wideband(rng, T))
    state = vb.init_state(C)
    Tb = 2 * T // vb.M
    pad_to = pipe._plan(Tb)["Tb_pad"]
    st = dict(state)
    bins, st["chz"] = pz.apply(state["chz"], x, pad_to,
                               out_dtype=jnp.float32)
    y1, sq1, ns1 = pipe.apply(params, st, bins, Tb=Tb,
                              return_planes=True)
    y2, sq2, ns2 = fused.apply(params, state, x, return_planes=True)
    np.testing.assert_allclose(np.asarray(y1[0]), np.asarray(y2[0]),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(y1[1]), np.asarray(y2[1]),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(sq1), np.asarray(sq2),
                               rtol=1e-5)
    l1 = jtu.tree_flatten_with_path(ns1)[0]
    l2 = jtu.tree_flatten_with_path(ns2)[0]
    assert len(l1) == len(l2)
    for (p1, v1), (p2, v2) in zip(l1, l2):
        assert p1 == p2
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                                   atol=2e-5, err_msg=str(p1))


def test_fm_audio_chunked_equality(rng):
    """apply_chunked over 16-channel kernel launches == one 32-channel
    launch (wide banks chunk around the scoped-VMEM cap)."""
    from sdrplusplusbrown_tpu.ops.demod_kernel import (
        build_fm_audio_pipeline, apply_chunked)
    radio = Radio(FS, DEMOD_NFM, pll_mode="normalize")
    Cw, m_if = 32, 2500
    p32 = build_fm_audio_pipeline(radio.demod, radio.af_resamp, Cw,
                                  interpret=True)
    p16 = build_fm_audio_pipeline(radio.demod, radio.af_resamp, 16,
                                  interpret=True)
    assert p32 is not None and p16 is not None
    xr = jnp.asarray(rng.standard_normal((Cw, m_if)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((Cw, m_if)).astype(np.float32))
    gate = jnp.asarray((rng.random(Cw) > 0.5).astype(np.float32))
    d = radio.demod.init_state((Cw,))
    a = radio.af_resamp.init_state((Cw,))
    y1, d1, a1 = p32.apply(gate, d, a, (xr, xi), m_if)
    iq_raw = jnp.concatenate([xr, xi], axis=0)
    y2, d2, a2 = apply_chunked(p16, gate, d, a, iq_raw, m_if, Cw)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d1["fir"]), np.asarray(d2["fir"]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(a1["resamp"]),
                               np.asarray(a2["resamp"]),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_radio_channelized_fused_matches_chained(rng):
    radio = Radio(FS, DEMOD_NFM, squelch_enabled=True,
                  pll_mode="normalize")
    g = radio.in_multiple
    T = ((48 * 2500 + g - 1) // g) * g
    n = np.arange(T)
    offs = _offsets()
    # one loud NFM carrier on channel 0 (above squelch), silence
    # elsewhere (below)
    audio = 0.8 * np.sin(2 * np.pi * 1000 * n / FS)
    phase = 2 * np.pi * np.cumsum(2500 * audio) / FS
    x = (0.7 * np.exp(1j * (2 * np.pi * offs[0] * n / FS + phase))
         + 1e-3 * (rng.standard_normal(T) + 1j * rng.standard_normal(T))
         ).astype(np.complex64)
    params = radio.make_params_channelized(offs, squelch_level=-30.0)

    st1 = radio.init_state_channelized(C)
    y1, st1 = radio.apply_channelized(params, st1, jnp.asarray(x),
                                      _force_fused=False)

    st2 = radio.init_state_channelized(C)
    y2, st2 = radio.apply_channelized(params, st2, jnp.asarray(x),
                                      _force_fused=True)

    a1, a2 = np.asarray(y1), np.asarray(y2)
    assert a1.shape == a2.shape
    # same channels squelched in both paths
    open1 = np.abs(a1).max(axis=(-2, -1)) > 1e-6
    open2 = np.abs(a2).max(axis=(-2, -1)) > 1e-6
    np.testing.assert_array_equal(open1, open2)
    assert open1[0] and not open1[C - 1]  # carrier channel open only
    snr = _snr(a1[open1], a2[open1])
    assert snr > 60, snr


def test_fm_audio_kernel_c4(rng):
    """C=4 (multimode NFM group size) through the demod kernel equals
    the chained FMDemod+resampler tail."""
    from sdrplusplusbrown_tpu.ops.demod_kernel import (
        build_fm_audio_pipeline)
    radio = Radio(FS, DEMOD_NFM, pll_mode="normalize")
    C4, m_if = 4, 5000
    pipe = build_fm_audio_pipeline(radio.demod, radio.af_resamp, C4,
                                   interpret=True)
    assert pipe is not None
    xr = jnp.asarray(rng.standard_normal((C4, m_if)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((C4, m_if)).astype(np.float32))
    d = radio.demod.init_state((C4,))
    a = radio.af_resamp.init_state((C4,))
    y1, _ = radio.demod.apply_planes(None, d, (xr, xi))
    y1, _ = radio.af_resamp.apply(None, a, y1)
    y2, _, _ = pipe.apply(None, d, a, (xr, xi), m_if)
    err = np.abs(np.asarray(y1) - np.asarray(y2))
    den = float(np.abs(np.asarray(y1)).max())
    assert err.max() / den < 1e-5, err.max() / den
