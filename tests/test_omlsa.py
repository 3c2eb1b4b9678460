"""OM-LSA/MCRA audio noise reduction tests
(reference: misc_modules/noise_reduction_logmmse/src/omlsa_mcra/*)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sdrplusplusbrown_tpu.ops.omlsa import OMLSA


@pytest.mark.slow
def test_omlsa_suppresses_noise_keeps_speech(rng):
    fs = 16000
    nr = OMLSA(fs)
    assert nr.N == 256 and nr.hop == 128
    T = fs * 4
    t = np.arange(T) / fs
    clean = np.sin(2 * np.pi * 440 * t) * (np.sin(2 * np.pi * 0.5 * t) > 0)
    x = (clean + 0.3 * rng.standard_normal(T)).astype(np.float32)
    st = nr.init_state(())
    B = nr.hop * 20
    ap = jax.jit(lambda s, xx: nr.apply(None, s, xx))
    outs = []
    for i in range(T // B):
        y, st = ap(st, jnp.asarray(x[i * B:(i + 1) * B]))
        outs.append(np.asarray(y))
    y = np.concatenate(outs)
    sil = np.sin(2 * np.pi * 0.5 * t) <= -0.1
    act = np.sin(2 * np.pi * 0.5 * t) > 0.1
    sil[:T // 4] = False     # let MCRA minima converge
    supp = 10 * np.log10(np.mean(x[sil] ** 2) / np.mean(y[sil] ** 2))
    keep = 10 * np.log10(np.mean(x[act] ** 2) / np.mean(y[act] ** 2))
    assert supp > 15.0, f"suppression only {supp:.1f} dB"
    assert keep < 6.0, f"signal attenuated {keep:.1f} dB"


def test_omlsa_identity_on_silence(rng):
    """Pure reconstruction sanity: zero input stays zero, shapes align."""
    nr = OMLSA(8000)
    st = nr.init_state(())
    x = jnp.zeros(nr.hop * 6, jnp.float32)
    y, st = nr.apply(None, st, x)
    assert y.shape == x.shape
    assert float(jnp.max(jnp.abs(y))) < 1e-6


def test_omlsa_streaming_matches_batch(rng):
    fs = 8000
    nr = OMLSA(fs)
    T = nr.hop * 40
    x = (0.1 * rng.standard_normal(T)).astype(np.float32)
    st = nr.init_state(())
    y1, st = nr.apply(None, st, jnp.asarray(x[:T // 2]))
    y2, _ = nr.apply(None, st, jnp.asarray(x[T // 2:]))
    stream = np.concatenate([np.asarray(y1), np.asarray(y2)])
    st0 = nr.init_state(())
    yb, _ = nr.apply(None, st0, jnp.asarray(x))
    np.testing.assert_allclose(stream, np.asarray(yb), atol=1e-5)


def test_omlsa_cola_unity(rng):
    """sqrt-Hann analysis x synthesis must overlap-add to exactly 1:
    with all gains forced to ~1 (quiet scaling region), a constant input
    reconstructs without periodic amplitude ripple."""
    nr = OMLSA(8000)
    w2 = nr.win.astype(np.float64) ** 2
    hop = nr.hop
    cola = w2[:hop] + w2[hop:]
    np.testing.assert_allclose(cola, 1.0, atol=1e-6)


def test_omlsa_batched_matches_per_channel(rng):
    nr = OMLSA(8000)
    T = nr.hop * 24
    x = (0.1 * rng.standard_normal((2, T))).astype(np.float32)
    yb, _ = nr.apply(None, nr.init_state((2,)), jnp.asarray(x))
    for c in range(2):
        yc, _ = nr.apply(None, nr.init_state(()), jnp.asarray(x[c]))
        np.testing.assert_allclose(np.asarray(yb[c]), np.asarray(yc),
                                   rtol=1e-4, atol=1e-5)
