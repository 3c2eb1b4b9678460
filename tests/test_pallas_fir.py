"""Pallas FIR kernel vs the conv reference (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sdrplusplusbrown_tpu.ops.fir import correlate
from sdrplusplusbrown_tpu.ops.pallas_fir import fir_apply_any, toeplitz_taps


@pytest.mark.parametrize("K", [17, 129, 400])
def test_pallas_fir_matches_conv(rng, K):
    taps = rng.standard_normal(K).astype(np.float32)
    ext = (rng.standard_normal((3, 4096 + K - 1))
           + 1j * rng.standard_normal((3, 4096 + K - 1))
           ).astype(np.complex64)
    ref = np.asarray(correlate(jnp.asarray(ext), taps))
    got = np.asarray(fir_apply_any(jnp.asarray(ext), taps, interpret=True))
    scale = max(1.0, float(np.abs(ref).max()))
    assert np.max(np.abs(got - ref)) < 1e-3 * scale


def test_pallas_fir_real_input(rng):
    K = 65
    taps = rng.standard_normal(K).astype(np.float32)
    ext = rng.standard_normal((2, 2000 + K - 1)).astype(np.float32)
    ref = np.asarray(correlate(jnp.asarray(ext), taps))
    got = np.asarray(fir_apply_any(jnp.asarray(ext), taps, interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-3)


def test_toeplitz_structure():
    taps = np.array([1.0, 2.0, 3.0], np.float32)
    H = toeplitz_taps(taps, 4)
    assert H.shape == (6, 4)
    x = np.array([1, 0, 0, 0, 0, 0], np.float32)
    np.testing.assert_array_equal(x @ H, [1, 0, 0, 0])
    x2 = np.array([0, 1, 0, 0, 0, 0], np.float32)
    np.testing.assert_array_equal(x2 @ H, [2, 1, 0, 0])


def test_pallas_decim_fir_matches_correlate(rng):
    from sdrplusplusbrown_tpu.ops.pallas_fir import fir_decim_apply_any
    from sdrplusplusbrown_tpu.ops.fir import correlate
    import jax.numpy as jnp
    for D, K, C, T in ((2, 63, 8, 32768), (4, 99, 2, 65536)):
        x = (rng.standard_normal((C, T + K - 1))
             + 1j * rng.standard_normal((C, T + K - 1))
             ).astype(np.complex64)
        taps = np.hanning(K)
        y_ref = np.asarray(correlate(jnp.asarray(x), taps, stride=D))
        y_p = np.asarray(fir_decim_apply_any(jnp.asarray(x), taps, D,
                                             interpret=True))
        np.testing.assert_allclose(y_p, y_ref, atol=2e-4)


def test_pallas_poly_resampler_matches_conv(rng):
    from sdrplusplusbrown_tpu.ops.pallas_fir import poly_resample_apply_any
    from sdrplusplusbrown_tpu.ops.resampler import PolyphaseResampler
    from sdrplusplusbrown_tpu.ops import taps as taps_mod
    import jax.numpy as jnp
    for interp, decim in ((5, 6), (3, 4)):
        proto = taps_mod.low_pass(0.4 / max(interp, decim),
                                  0.1 / max(interp, decim), 1.0) * interp
        pr = PolyphaseResampler(interp, decim, proto)
        C, T = 4, 12 * 1024
        x = (rng.standard_normal((C, T))
             + 1j * rng.standard_normal((C, T))).astype(np.complex64)
        st = pr.init_state((C,))
        y_ref, _ = pr.apply(None, st, jnp.asarray(x))
        ext = jnp.concatenate([st, jnp.asarray(x)], axis=-1)
        y_p = poly_resample_apply_any(ext, pr.kernel, interp, decim,
                                      interpret=True)
        np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_ref),
                                   atol=2e-5)


def test_pallas_fused_mix_matches_complex_correlate(rng):
    from sdrplusplusbrown_tpu.ops.pallas_fir import fused_mix_decim_apply
    from sdrplusplusbrown_tpu.ops.fir import correlate
    import jax.numpy as jnp
    C, K, D, T = 8, 27, 2, 16384
    x = (rng.standard_normal(T + K - 1)
         + 1j * rng.standard_normal(T + K - 1)).astype(np.complex64)
    h = np.hanning(K)
    omega = np.linspace(-1.0, 1.0, C)
    g_c = h[None, :] * np.exp(1j * omega[:, None] * np.arange(K))
    ref = np.stack([np.asarray(correlate(
        jnp.asarray(x), g_c[c].astype(np.complex64), stride=D))
        for c in range(C)])
    g = np.zeros((2 * C, 2 * K), np.float32)
    g[:C, :K] = np.real(g_c)
    g[:C, K:] = -np.imag(g_c)
    g[C:, :K] = np.imag(g_c)
    g[C:, K:] = np.real(g_c)
    y = np.asarray(fused_mix_decim_apply(jnp.asarray(x),
                                         jnp.asarray(g), D,
                                         interpret=True))
    np.testing.assert_allclose(y, ref, atol=2e-5)


@pytest.mark.parametrize("batch", [3, 9])
@pytest.mark.parametrize("D,cplx_taps", [(1, False), (1, True),
                                         (2, False), (2, True),
                                         (4, False)])
def test_pallas_cplx_interleaved_matches_correlate(rng, D, cplx_taps,
                                                   batch):
    """Interleaved-complex banded kernel == conv correlate for complex
    input, real/complex taps, stride 1 and decimating."""
    from sdrplusplusbrown_tpu.ops.pallas_fir import fir_cplx_apply_any
    from sdrplusplusbrown_tpu.ops.fir import correlate
    K, M = 63, 2048
    T = M * D
    x = (rng.standard_normal((batch, T + K - 1))
         + 1j * rng.standard_normal((batch, T + K - 1))
         ).astype(np.complex64)
    h = np.hanning(K).astype(np.float32)
    if cplx_taps:
        h = (h * np.exp(1j * 0.21 * np.arange(K))).astype(np.complex64)
    ref = np.asarray(correlate(jnp.asarray(x), h, stride=D))
    got = np.asarray(fir_cplx_apply_any(jnp.asarray(x), h, D,
                                        interpret=True))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=3e-5)


def test_pallas_cplx_interleaved_large_k(rng):
    """Pilot-band shape: K=633 complex taps, stride 1 (tile budget picks
    a narrower tile automatically)."""
    from sdrplusplusbrown_tpu.ops.pallas_fir import (fir_cplx_apply_any,
                                                     cplx_pallas_ok)
    from sdrplusplusbrown_tpu.ops.fir import correlate
    K, T = 633, 8192
    t = cplx_pallas_ok(K, 1)
    assert t is not None
    x = (rng.standard_normal(T + K - 1)
         + 1j * rng.standard_normal(T + K - 1)).astype(np.complex64)
    h = (np.hanning(K) * np.exp(1j * 2 * np.pi * 0.038
                                * np.arange(K))).astype(np.complex64)
    ref = np.asarray(correlate(jnp.asarray(x), h))
    got = np.asarray(fir_cplx_apply_any(jnp.asarray(x), h, 1, tile=t,
                                        interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-4)


@pytest.mark.parametrize("batch", [1, 5])
@pytest.mark.parametrize("interp,decim", [(96, 125), (24, 25), (3, 5)])
def test_pallas_poly_roll_matches_resampler(rng, interp, decim, batch):
    """Roll-mode banded polyphase (coprime/odd ratios whose aligned mt
    would blow VMEM) == the conv reference path."""
    import jax
    from sdrplusplusbrown_tpu.ops.resampler import PolyphaseResampler
    from sdrplusplusbrown_tpu.ops import taps as taps_mod
    from sdrplusplusbrown_tpu.ops.pallas_fir import (
        poly_resample_apply_any, poly_pallas_ok)
    proto = taps_mod.low_pass(0.4 / decim, 0.1 / decim, 1.0) * interp
    pr = PolyphaseResampler(interp, decim, proto)
    T = decim * 256
    x = (rng.standard_normal((batch, T + pr.tpp - 1))
         + 1j * rng.standard_normal((batch, T + pr.tpp - 1))
         ).astype(np.complex64)
    kw = pr.kernel.shape[1]
    cfg = poly_pallas_ok(interp, decim, kw, m_out=T // decim)
    assert cfg is not None, (interp, decim, kw)
    mt, use_roll = cfg
    st = jnp.asarray(x[:, :pr.tpp - 1])
    y_ref, _ = pr.apply(None, st, jnp.asarray(x[:, pr.tpp - 1:]))
    ext = jnp.asarray(x)
    y_p = poly_resample_apply_any(ext, pr.kernel, interp, decim,
                                  mt=mt, use_roll=use_roll,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_ref),
                               atol=3e-5)


def test_pallas_poly_roll_forced(rng):
    """use_roll=True forced on an aligned-friendly ratio still matches
    (exercises the dynamic DMA-shift path at several supertiles)."""
    from sdrplusplusbrown_tpu.ops.resampler import PolyphaseResampler
    from sdrplusplusbrown_tpu.ops import taps as taps_mod
    from sdrplusplusbrown_tpu.ops.pallas_fir import poly_resample_apply_any
    interp, decim = 2, 5
    proto = taps_mod.low_pass(0.4 / decim, 0.1 / decim, 1.0) * interp
    pr = PolyphaseResampler(interp, decim, proto)
    T = decim * 2048
    x = rng.standard_normal(T + pr.tpp - 1).astype(np.float32)
    st = jnp.asarray(x[:pr.tpp - 1])
    y_ref, _ = pr.apply(None, st, jnp.asarray(x[pr.tpp - 1:]))
    y_p = poly_resample_apply_any(jnp.asarray(x), pr.kernel, interp,
                                  decim, mt=64, use_roll=True,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_ref),
                               atol=3e-5)
