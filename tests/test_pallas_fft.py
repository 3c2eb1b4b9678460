"""4-step matmul FFT power kernel (ops/pallas_fft.py) vs jnp.fft."""

import numpy as np
import jax.numpy as jnp
import pytest

from sdrplusplusbrown_tpu.ops.pallas_fft import fft_power_db, _SQUARE


@pytest.mark.parametrize("n", [4096, 16384])
def test_fft_power_matches_jnp(n):
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((2, n)) + 1j * rng.standard_normal((2, n))
         ).astype(np.complex64)
    # add a strong tone so the dB range covers signal + noise floor
    t = np.arange(n)
    x[0] += 50.0 * np.exp(2j * np.pi * 0.1234 * t)
    got = np.asarray(fft_power_db(jnp.asarray(x), n, interpret=True))
    X = np.fft.fft(x, axis=-1)
    want = 10.0 * np.log10(np.maximum(np.abs(X) ** 2 / n ** 2, 1e-30))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=0.3)
    # bin of the tone must match exactly (ordering check)
    assert np.argmax(got[0]) == np.argmax(want[0])


def test_square_table():
    for n, n1 in _SQUARE.items():
        assert n1 * (n // n1) == n


def test_fft_power_windowed_interleaved():
    """Window folded in-kernel == outside multiply + jnp.fft."""
    n = 4096
    rng = np.random.default_rng(1)
    x = (rng.standard_normal((3, n)) + 1j * rng.standard_normal((3, n))
         ).astype(np.complex64)
    w = (np.hanning(n) * np.where(np.arange(n) % 2, -1.0, 1.0)
         ).astype(np.float32)
    got = np.asarray(fft_power_db(jnp.asarray(x), n, window=w,
                                  interpret=True))
    X = np.fft.fft(x * w, axis=-1)
    want = 10.0 * np.log10(np.maximum(np.abs(X) ** 2 / n ** 2, 1e-30))
    np.testing.assert_allclose(got, want, atol=0.3)


def test_spectrum_frames_in_kernel_framing():
    """spectrum_frames_db (in-kernel DMA framing, rectangular
    fft//128 x 128 4-step) == numpy FFT of frames taken at the
    documented 1024-aligned starts rup(f*interval, 1024)."""
    from sdrplusplusbrown_tpu.ops.pallas_fft import spectrum_frames_db

    fft, keep, interval = 4096, 3968, 6016     # keep<fft: pad branch
    n = 3
    T = n * interval + 128                      # 128-divisible
    assert T % 128 == 0
    rng = np.random.default_rng(7)
    xr = rng.standard_normal(T).astype(np.float32)
    xi = rng.standard_normal(T).astype(np.float32)
    t = np.arange(T)
    xr += (3.0 * np.cos(2 * np.pi * 0.0731 * t)).astype(np.float32)
    xi += (3.0 * np.sin(2 * np.pi * 0.0731 * t)).astype(np.float32)
    w = np.hanning(keep).astype(np.float32)

    got = np.asarray(spectrum_frames_db(
        jnp.asarray(xr), jnp.asarray(xi), keep, interval, fft,
        -300.0, w, interpret=True))

    frames = []
    for f in range(n):
        p = (f * interval + 1023) // 1024 * 1024
        fr = (xr[p:p + keep] + 1j * xi[p:p + keep]) * w
        frames.append(np.pad(fr, (0, fft - keep)))
    X = np.fft.fft(np.stack(frames), axis=-1)
    want = 10.0 * np.log10(np.maximum(np.abs(X) ** 2 / fft ** 2, 1e-30))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=0.3)
    assert np.argmax(got[0]) == np.argmax(want[0])
