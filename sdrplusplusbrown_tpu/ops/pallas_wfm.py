"""Fused WFM stereo-section pallas kernel.

One kernel computes the ENTIRE post-discriminator stereo path at the
decimated MPX rate — pilot band-pass, normalize-mode VCO, one-sample
PLL lag, phase correction, L±R matrixing — exploiting two identities
that make the section all-real (the composite MPX is real):

    lmr[n] = 2·mpx[n-d]·Re(conj(vco[n])²)
    Re(conj(vco·c)²) = [ur·(a²-b²) + 2·ui·a·b] / max(a²+b², ε)

with (a, b) = re/im of the band-passed pilot LAGGED one sample (the
lag is a window-slice offset, free in-kernel), u = conj(c)² the folded
constant phase correction, and L/R = mpx[n-d]·(1 ± 2w).

The XLA lowering of the same section paid ~105 B/input-sample in the
WFM-8 chain (complex cast, complex-tap FIR call, normalize, lag,
two delays, complex stereo mix — each a separate HBM pass, measured
by scripts/wfm_demod_stages.py); this kernel's traffic is one window
DMA + two f32 output planes (~12 B/input-sample).

Behavioral contract: identical math to BroadcastFM's
``pll_mode="normalize"`` path (ops/wfm.py; reference
decoder_modules/radio/src/demodulators/wfm.h via broadcast_fm.h) up to
fp32 rounding — the division guard is max(|p|², 1e-20) instead of
max(|p|, 1e-12)², indistinguishable for any real pilot.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_fir import CB

TILE = 128
ROWS = 8
SUP = ROWS * TILE


def stereo_pilot_matrix(taps: np.ndarray, tile: int) -> np.ndarray:
    """Banded [tile-1+K, 2*tile] matrix: cols [0:tile] real-tap band,
    cols [tile:2*tile] imag-tap band — one matmul yields (a, b)."""
    taps = np.asarray(taps)
    K = taps.shape[-1]
    hr = np.real(taps).astype(np.float32)
    hi = np.imag(taps).astype(np.float32)
    H = np.zeros((tile - 1 + K, 2 * tile), np.float32)
    for j in range(tile):
        H[j:j + K, j] = hr
        H[j:j + K, tile + j] = hi
    return H


def _wfm_stereo_kernel(x_hbm, h_ref, o_ref, w, sem, *,
                       R, tile, K, d, pad_k, ur, ui, eps):
    c8 = pl.program_id(0)
    i = pl.program_id(1)
    sup = R * tile
    n_read = sup + pad_k
    cp = pltpu.make_async_copy(
        x_hbm.at[pl.ds(c8 * CB, CB), pl.ds(i * sup, n_read)],
        w.at[pl.ds(0, CB), pl.ds(0, n_read)], sem)
    cp.start()
    cp.wait()
    Lw = tile - 1 + K
    for r in range(R):
        # lagged pilot: p[n-1] needs mpx[n-K+k]; window col pad_k-K+n+k
        win_p = w[:, pl.ds(pad_k - K + r * tile, Lw)]      # [CB, Lw]
        pp = jnp.dot(win_p, h_ref[...],
                     preferred_element_type=jnp.float32)   # [CB, 2*tile]
        a = pp[:, :tile]
        b = pp[:, tile:]
        m2 = a * a + b * b
        wsub = (ur * (a * a - b * b) + (2.0 * ui) * (a * b)) \
            / jnp.maximum(m2, eps)
        lpr = w[:, pl.ds(pad_k - d + r * tile, tile)]      # mpx[n-d]
        two = 2.0 * wsub
        o_ref[0, 0, :, pl.ds(r * tile, tile)] = lpr * (1.0 + two)
        o_ref[1, 0, :, pl.ds(r * tile, tile)] = lpr * (1.0 - two)


def wfm_stereo_ok(C: int, T: int, K: int, d: int) -> bool:
    return (jax.default_backend() not in ("cpu",)
            and C >= CB and C % CB == 0 and T >= SUP
            and d <= K and tile_pad(K) <= SUP)


def tile_pad(K: int) -> int:
    return ((K + 127) // 128) * 128


def wfm_stereo_apply(ext: jnp.ndarray, taps: np.ndarray,
                     phase_corr: complex, d: int,
                     interpret: bool = False) -> jnp.ndarray:
    """ext: [C, K + T] float32 MPX with the last K pre-block samples as
    history (K = len(taps); covers the pilot FIR span incl. the
    one-sample lag and the d-sample L+R delay, d <= K).
    Returns [2, C, T] float32 — L plane then R plane."""
    taps = np.asarray(taps)
    K = int(taps.shape[-1])
    C, L = ext.shape
    T = L - K
    pad_k = tile_pad(K)
    M_pad = ((T + SUP - 1) // SUP) * SUP
    n_super = M_pad // SUP
    xp = jnp.pad(ext, ((0, 0), (pad_k - K, M_pad - T)))
    H = jnp.asarray(stereo_pilot_matrix(taps, TILE))
    u = np.conj(complex(phase_corr)) ** 2
    kern = functools.partial(_wfm_stereo_kernel, R=ROWS, tile=TILE,
                             K=K, d=int(d), pad_k=pad_k,
                             ur=float(np.real(u)), ui=float(np.imag(u)),
                             eps=1e-20)
    from .pallas_cost import costed_pallas_call
    out = costed_pallas_call(
        kern,
        grid=(C // CB, n_super),
        flops=int(2 * (TILE - 1 + K) * 2 * TILE * ROWS * C * n_super
                  + 12 * C * M_pad),
        # in-kernel DMA: one [CB, SUP + pad_k] window per (c8, i) step
        manual_bytes=int(C * n_super * (SUP + pad_k) * 4),
        label="wfm_stereo",
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((H.shape[0], 2 * TILE), lambda c, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, 1, CB, SUP), lambda c, i: (0, c, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, C // CB, CB, M_pad),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((CB, SUP + pad_k), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp.astype(jnp.float32), H)
    return out.reshape(2, C, M_pad)[:, :, :T]
