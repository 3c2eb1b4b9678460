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
