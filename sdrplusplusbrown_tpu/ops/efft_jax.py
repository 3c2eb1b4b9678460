"""Device-side (jnp) EFFT lossy baseband compression.

Port of ops/efft.py (reference: core/src/dsp/compression/
experimental_fft_compressor.h) to jittable JAX so the masking/companding
can run ON the device that produced the baseband — used by the
host↔device feed path (io/feed.py) and the stream server to thin
transfers, as parallel/multihost.py:15-17 prescribes.

Everything is static-shape: the rolling MIN_RECENTS averaging queues and
the allowance EMA are explicit state; ``interpolate_holes`` is
reformulated as two cumulative-max gathers (previous/next nonzero index)
instead of np.interp over a dynamic index set; percentiles use
jnp.percentile (linear interpolation — same as numpy's default).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..runtime.block import Block
from .efft import blackman, EFFTCompressor


def centered_sma_j(x: jnp.ndarray, w: int) -> jnp.ndarray:
    """Centered moving average with edge-clamped counts (cumsum form —
    O(n) instead of a length-w convolution)."""
    w = max(int(w), 1)
    n = x.shape[-1]
    # np.convolve(x, ones(w), 'same')[i] sums x[i-L .. i+H] inclusive,
    # L = w-1-(w-1)//2, H = (w-1)//2
    H = (w - 1) // 2
    L = w - 1 - H
    c = jnp.concatenate([jnp.zeros(x.shape[:-1] + (1,), x.dtype),
                         jnp.cumsum(x, axis=-1)], axis=-1)
    idx_hi = jnp.clip(jnp.arange(n) + H + 1, 0, n)
    idx_lo = jnp.clip(jnp.arange(n) - L, 0, n)
    s = c[..., idx_hi] - c[..., idx_lo]
    cnt = (idx_hi - idx_lo).astype(x.dtype)
    return s / cnt


def moving_variance_j(x: jnp.ndarray, w: int) -> jnp.ndarray:
    m = centered_sma_j(x, w)
    d = x - m
    return centered_sma_j(d * d, w)


def interpolate_holes_j(a: jnp.ndarray) -> jnp.ndarray:
    """Linear interpolation across zero holes, edge-clamped — matches
    ops/efft.interpolate_holes (np.interp over the nonzero support)."""
    n = a.shape[-1]
    idx = jnp.arange(n)
    nz = a != 0.0
    # previous nonzero index (or -1), next nonzero index (or n)
    prev = jax.lax.cummax(jnp.where(nz, idx, -1))
    nxt = -jax.lax.cummax(jnp.where(nz, -idx, -(n))[::-1])[::-1]
    has_prev = prev >= 0
    has_next = nxt < n
    pv = a[jnp.clip(prev, 0, n - 1)]
    nv = a[jnp.clip(nxt, 0, n - 1)]
    span = jnp.maximum((nxt - prev).astype(a.dtype), 1.0)
    t = (idx - prev).astype(a.dtype) / span
    interp = pv + (nv - pv) * t
    out = jnp.where(has_prev & has_next, interp,
                    jnp.where(has_prev, pv,
                              jnp.where(has_next, nv, a)))
    return jnp.where(nz, a, out)


class EFFTCompressorJax(Block):
    """Batched jittable EFFT: x [T] → (frames [F, n] complex64, state).

    Frame semantics identical to ops/efft.EFFTCompressor.process: each
    emitted frame is the (MIN_RECENTS−1)-delayed clean spectrum, masked
    by the averaged-spectra noise-floor test and ∜-companded.
    ``in_multiple = fft_size``; T must be a multiple of it (use the host
    Rechunker upstream).
    """

    def __init__(self, samplerate: float, slice_msec: int = 50,
                 loss_rate: float = 4.0):
        ref = EFFTCompressor(samplerate, slice_msec, loss_rate)
        self.samplerate = float(samplerate)
        self.fft_size = ref.fft_size
        self.window = jnp.asarray(ref.window, jnp.float32)
        self.hz_tick = ref.hz_tick
        self.small_tick = ref.small_tick
        self.large_tick = ref.large_tick
        self.window_power_db = ref.window_power_db
        self.loss_rate = float(loss_rate)
        self.R = ref.MIN_RECENTS
        self.NOISE_NPOINTS = ref.NOISE_NPOINTS
        self.SIGNAL_WIDTH = ref.SIGNAL_WIDTH
        self.mask_sma = max(int(self.SIGNAL_WIDTH / 8), 1)
        self.in_multiple = self.fft_size

    def init_state(self, batch_shape=()):
        assert batch_shape == ()
        n, R = self.fft_size, self.R
        return {
            "clean_freq": jnp.zeros((R - 1, n), jnp.complex64),
            "clean_mag": jnp.zeros((R - 1, n), jnp.float32),
            "win_mag": jnp.zeros((R - 1, n), jnp.float32),
            "count": jnp.zeros((), jnp.int32),
            "prev_allowance": jnp.zeros((), jnp.float32),
        }

    def _db(self, spec):
        n = self.fft_size
        p = (jnp.abs(spec) ** 2) / (n * n)
        return (10.0 * jnp.log10(jnp.maximum(p, 1e-30))
                ).astype(jnp.float32)

    def apply(self, params, state, x):
        n = self.fft_size
        T = x.shape[-1]
        assert T % n == 0, (T, n)
        frames = x.reshape(-1, n)

        def step(st, frame):
            spec = jnp.fft.fftshift(jnp.fft.fft(frame)
                                    ).astype(jnp.complex64)
            wspec = jnp.fft.fftshift(jnp.fft.fft(frame * self.window))
            cf = jnp.concatenate([st["clean_freq"], spec[None]], axis=0)
            cm = jnp.concatenate([st["clean_mag"],
                                  self._db(spec)[None]], axis=0)
            wm = jnp.concatenate([st["win_mag"],
                                  self._db(wspec)[None]], axis=0)
            count = st["count"] + 1
            ready = count >= self.R

            emit = cf[0]
            wavg = jnp.mean(wm, axis=0)
            cavg = jnp.mean(cm, axis=0)

            # _filter_signal (ops/efft.py:105-134)
            mvar = moving_variance_j(wavg, self.NOISE_NPOINTS)
            new_allow = self.loss_rate * jnp.percentile(mvar, 15.0)
            allowance = jnp.where(
                ready,
                new_allow * 0.1 + st["prev_allowance"] * 0.9,
                st["prev_allowance"]).astype(jnp.float32)

            cma = centered_sma_j(wavg, self.large_tick)
            cma = jnp.where(mvar > allowance, 0.0, cma)
            cma = interpolate_holes_j(cma)
            cma = centered_sma_j(cma, self.large_tick)
            cmax = centered_sma_j(cma, 5 * self.large_tick)
            diff = jnp.abs(cma - cmax)
            cmax_allow = jnp.percentile(diff, 15.0)
            cma = jnp.where(diff > cmax_allow, 0.0, cma)
            cma = interpolate_holes_j(cma)
            cma = centered_sma_j(cma, self.large_tick)

            floor = cma - self.window_power_db
            mask = (cavg > floor + allowance).astype(jnp.float32)
            mask = centered_sma_j(mask, self.mask_sma)
            emit = jnp.where(mask == 0.0, 0.0 + 0.0j, emit)

            # ∜ companding
            amp = jnp.abs(emit)
            emit = jnp.where(amp > 0, emit * (amp ** 0.25)
                             / jnp.maximum(amp, 1e-30), emit)

            new_st = {"clean_freq": cf[1:], "clean_mag": cm[1:],
                      "win_mag": wm[1:],
                      "count": jnp.minimum(count, jnp.int32(1 << 30)),
                      "prev_allowance": allowance}
            return new_st, (emit.astype(jnp.complex64), ready)

        state, (emits, readys) = jax.lax.scan(step, dict(state), frames)
        return (emits, readys), state


def efft_decompress_j(frames: jnp.ndarray) -> jnp.ndarray:
    """[F, n] companded frames → [F·n] time-domain complex64."""
    amp = jnp.abs(frames)
    f = jnp.where(amp > 0, frames * (amp ** 4)
                  / jnp.maximum(amp, 1e-30), frames)
    td = jnp.fft.ifft(jnp.fft.ifftshift(f, axes=-1), axis=-1)
    return td.reshape(-1).astype(jnp.complex64)
