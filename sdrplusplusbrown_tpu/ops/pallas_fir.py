"""Pallas TPU kernel for overlap-save block FIR.

The conv path (ops/fir.py) expresses the FIR as conv_general_dilated with
1-2 feature channels — XLA pads those onto the 128-wide MXU, wasting most
of the systolic array.  This kernel instead computes each output tile as a
dense matmul against a banded Toeplitz tap matrix:

    W[r, :] = window r of the super-tile   (R rows per grid step)
    Y[r, :] = W[r, :] @ H     with H[j:j+K, j] = taps, H: [tile+K-1, tile]

so the MXU sees an [R, tile+K-1] × [tile+K-1, tile] product per step.
The input lives flattened in HBM (pl.ANY) and each super-tile window is
DMA'd into VMEM scratch — overlapping windows cannot be expressed as
non-overlapping BlockSpecs.  All DMA offsets/lengths are 128-aligned by
padding the K-1 sample history up to ``pad_k`` (a 1024-lane multiple).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# 1-D f32 arrays tile as (8,128) => DMA slices/offsets need 1024-elem alignment
ALIGN = 1024


def toeplitz_taps(taps: np.ndarray, tile: int) -> np.ndarray:
    K = len(taps)
    H = np.zeros((tile + K - 1, tile), np.float32)
    for j in range(tile):
        H[j:j + K, j] = taps
    return H


def _fir_kernel(x_hbm, h_ref, o_ref, w_scratch, sem, *,
                R, tile, K, pad_k, Lp):
    c = pl.program_id(0)
    i = pl.program_id(1)
    start = c * Lp + i * (R * tile)
    n_read = R * tile + pad_k
    cp = pltpu.make_async_copy(
        x_hbm.at[pl.ds(start, n_read)],
        w_scratch.at[pl.ds(0, n_read)], sem)
    cp.start()
    cp.wait()
    off = pad_k - (K - 1)
    rows = [w_scratch[pl.ds(off + r * tile, tile + K - 1)]
            for r in range(R)]
    W = jnp.stack(rows)                                   # [R, tile+K-1]
    o_ref[0] = jnp.dot(W, h_ref[...],
                       preferred_element_type=jnp.float32)


def fir_apply(xp: jnp.ndarray, taps: np.ndarray, tile: int = 512,
              rows: int = 8, interpret: bool = False) -> jnp.ndarray:
    """xp: [C, pad_k + T] float32 — pad_k = ceil((K-1)/128)·128 leading
    context samples (zeros + the K-1 overlap-save history), T a multiple
    of rows·tile.  Returns y [C, T]."""
    K = int(np.asarray(taps).shape[-1])
    assert K - 1 <= tile, (K, tile)
    pad_k = ((K - 1 + ALIGN - 1) // ALIGN) * ALIGN
    C, Lp = xp.shape
    T = Lp - pad_k
    sup = rows * tile
    assert T % sup == 0, (T, sup)
    assert Lp % ALIGN == 0, Lp
    H = jnp.asarray(toeplitz_taps(np.asarray(taps, np.float32), tile))
    n_super = T // sup
    kern = functools.partial(_fir_kernel, R=rows, tile=tile, K=K,
                             pad_k=pad_k, Lp=Lp)
    out = pl.pallas_call(
        kern,
        grid=(C, n_super),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((H.shape[0], tile), lambda c, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows, tile), lambda c, i: (c, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, n_super * rows, tile),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((rows * tile + pad_k,), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp.reshape(-1).astype(jnp.float32), H)
    return out.reshape(C, T)


def fir_apply_any(ext: jnp.ndarray, taps: np.ndarray, tile: int = 512,
                  rows: int = 8, interpret: bool = False) -> jnp.ndarray:
    """Drop-in for ops.fir.correlate (stride 1): ``ext`` is the
    overlap-save extended block [..., T + K - 1], real or complex;
    handles padding/alignment and re-assembles complex output."""
    K = int(np.asarray(taps).shape[-1])
    lead = ext.shape[:-1]
    L = ext.shape[-1]
    T = L - (K - 1)
    pad_k = ((K - 1 + ALIGN - 1) // ALIGN) * ALIGN
    cplx = jnp.iscomplexobj(ext)
    if cplx:
        xf = jnp.concatenate(
            [jnp.real(ext).reshape(-1, L), jnp.imag(ext).reshape(-1, L)],
            axis=0)
    else:
        xf = ext.reshape(-1, L)
    sup = rows * tile
    T_pad = ((T + sup - 1) // sup) * sup
    # [pad_k-(K-1) zeros | K-1 history | T samples | tail zeros]
    xf = jnp.pad(xf, ((0, 0), (pad_k - (K - 1), T_pad - T)))
    y = fir_apply(xf, taps, tile, rows, interpret)[:, :T]
    if cplx:
        h = y.shape[0] // 2
        out = jax.lax.complex(y[:h], y[h:])
    else:
        out = y
    return out.reshape(lead + (T,))
