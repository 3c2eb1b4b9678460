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
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_cost import costed_pallas_call

# 1-D f32 arrays tile as (8,128) => DMA slices/offsets need 1024-elem alignment
ALIGN = 1024


def real_pallas_tile(K: int, D: int = 1, m_out: int | None = None,
                     batch: int = 1, rows: int = 8,
                     vmem_budget: int = 10 << 20) -> int | None:
    """Pick the real-tap banded-kernel tile in {512, 256, 128}
    minimizing estimated HBM traffic.  The [Lw, tile] tap matrix is a
    FIXED per-call cost (it dwarfs the data at short audio-rate
    blocks: tile 512 → 1.3 MB of H for a 150 kB deemphasis block),
    while smaller tiles re-read the pad_k history more often — so the
    optimum depends on (K, m_out, batch).  ``None`` if nothing fits.

    The channel-blocked kernels (batch ≥ 4) have no K−1 ≤ tile
    constraint (the window Lw = (tile−1)·D + K covers all taps);
    the flat single-row kernel (batch < 4) requires K − 1 ≤ tile.
    """
    best, best_est = None, None
    for t in (512, 256, 128):
        Lw = (t - 1) * D + K
        h_bytes = Lw * t * 4
        if h_bytes > vmem_budget:
            continue
        if batch < 4 and K - 1 > t:
            continue
        if m_out is None:
            est = h_bytes
        else:
            pad_k = ((K - 1 + ALIGN - 1) // ALIGN) * ALIGN
            bp = ((batch + CB - 1) // CB) * CB if batch >= 4 else batch
            n_super = (m_out + rows * t - 1) // (rows * t)
            est = (h_bytes + bp * n_super * (rows * t * D + pad_k) * 4
                   + bp * n_super * rows * t * 4)
        if best_est is None or est < best_est:
            best, best_est = t, est
    return best


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
    out = costed_pallas_call(
        kern,
        grid=(C, n_super),
        flops=int(2 * (tile + K - 1) * tile * rows * C * n_super),
        # in-kernel DMA: one (rows·tile + pad_k) window per (c, i) step
        manual_bytes=int(C * n_super * (rows * tile + pad_k) * 4),
        label="fir_apply",
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
    Cr = xf.shape[0]
    if Cr >= 4:
        # stride-1 through the channel-blocked decim kernel (D=1):
        # zero relayout copies around the custom call
        Cp = ((Cr + CB - 1) // CB) * CB
        if Cp != Cr:
            xf = jnp.pad(xf, ((0, Cp - Cr), (0, 0)))
        y = _fir_decim_apply_cb(xf, taps, 1, tile, rows,
                                interpret)[:Cr, :T]
    else:
        y = fir_apply(xf, taps, tile, rows, interpret)[:, :T]
    if cplx:
        h = y.shape[0] // 2
        out = jax.lax.complex(y[:h], y[h:])
    else:
        out = y
    return out.reshape(lead + (T,))


# ----------------------------------------------------------------------
# Decimating variant: y[m] = sum_k ext[m*D + k] * taps[k]
#
# Same super-tile DMA structure; the banded matrix strides the taps by D
# per output column (H[j*D + k, j] = taps[k]), so the MXU computes a
# whole tile of decimated outputs per matmul.  The conv_general_dilated
# route for these stages moves ~9x the operand bytes on TPU (XLA pads
# the 1-2 feature dims onto the 128-lane MXU; measured in
# docs/fir_backend.md) — this kernel is what makes the decimation
# chain HBM-minimal.

def toeplitz_taps_decim(taps: np.ndarray, tile: int, D: int) -> np.ndarray:
    K = len(taps)
    Lw = (tile - 1) * D + K
    H = np.zeros((Lw, tile), np.float32)
    for j in range(tile):
        H[j * D:j * D + K, j] = taps
    return H


def _fir_decim_kernel(x_hbm, h_ref, o_ref, w_scratch, sem, *,
                      R, tile, K, D, pad_k, Lp):
    c = pl.program_id(0)
    i = pl.program_id(1)
    start = c * Lp + i * (R * tile * D)
    n_read = R * tile * D + pad_k
    cp = pltpu.make_async_copy(
        x_hbm.at[pl.ds(start, n_read)],
        w_scratch.at[pl.ds(0, n_read)], sem)
    cp.start()
    cp.wait()
    Lw = (tile - 1) * D + K
    off = pad_k - (K - 1)
    rows = [w_scratch[pl.ds(off + r * tile * D, Lw)] for r in range(R)]
    W = jnp.stack(rows)                                   # [R, Lw]
    o_ref[0] = jnp.dot(W, h_ref[...],
                       preferred_element_type=jnp.float32)


# Channel-blocked variant: the flat-operand kernels force XLA to
# materialize LAYOUT-CHANGE copies around the custom call (the tiled
# [C, Lp] -> [C*Lp] reshape and the [C, S, tile] -> [C, S*tile] output
# merge are physical relayouts — measured 523 B/sample of pure copy
# traffic in the WFM-8 chain).  Processing 8 channels per grid step
# keeps the operand 2-D (a [8, n] slice satisfies the (8,128) sublane
# tiling), and the [C/8, 8, S] output reshapes to [C, S] for free
# (major-dim merge).  Verified: zero `copy` ops in the compiled HLO.

CB = 8


def _fir_decim_cb_kernel(x_hbm, h_ref, o_ref, w, sem, *,
                         R, tile, K, D, pad_k):
    c8 = pl.program_id(0)
    i = pl.program_id(1)
    sup = R * tile * D
    n_read = sup + pad_k
    cp = pltpu.make_async_copy(
        x_hbm.at[pl.ds(c8 * CB, CB), pl.ds(i * sup, n_read)],
        w.at[pl.ds(0, CB), pl.ds(0, n_read)], sem)
    cp.start()
    cp.wait()
    Lw = (tile - 1) * D + K
    off = pad_k - (K - 1)
    for r in range(R):
        win = w[:, pl.ds(off + r * tile * D, Lw)]        # [CB, Lw]
        o_ref[0, :, pl.ds(r * tile, tile)] = jnp.dot(
            win, h_ref[...], preferred_element_type=jnp.float32)


def _fir_decim_apply_cb(xp: jnp.ndarray, taps: np.ndarray, D: int,
                        tile: int, rows: int,
                        interpret: bool) -> jnp.ndarray:
    """xp: [C, pad_k + T] float32 with C % 8 == 0; returns [C, T//D]."""
    K = int(np.asarray(taps).shape[-1])
    pad_k = ((K - 1 + ALIGN - 1) // ALIGN) * ALIGN
    C, Lp = xp.shape
    T = Lp - pad_k
    sup = rows * tile * D
    assert T % sup == 0 and C % CB == 0, (T, sup, C)
    H = jnp.asarray(toeplitz_taps_decim(np.asarray(taps, np.float32),
                                        tile, D))
    n_super = T // sup
    so = rows * tile
    kern = functools.partial(_fir_decim_cb_kernel, R=rows, tile=tile,
                             K=K, D=D, pad_k=pad_k)
    out = costed_pallas_call(
        kern,
        grid=(C // CB, n_super),
        flops=int(2 * ((tile - 1) * D + K) * tile * rows * C * n_super),
        # in-kernel DMA: one [CB, sup + pad_k] window per (c8, i) step
        manual_bytes=int(C * n_super * (sup + pad_k) * 4),
        label="fir_decim_cb",
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((H.shape[0], tile), lambda c, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, CB, so), lambda c, i: (c, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C // CB, CB, n_super * so),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((CB, sup + pad_k), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp.astype(jnp.float32), H)
    return out.reshape(C, T // D)


def fir_decim_apply(xp: jnp.ndarray, taps: np.ndarray, D: int,
                    tile: int = 256, rows: int = 8,
                    interpret: bool = False) -> jnp.ndarray:
    """xp: [C, pad_k + T] float32; T a multiple of rows·tile·D.
    Returns y [C, T//D]."""
    K = int(np.asarray(taps).shape[-1])
    pad_k = ((K - 1 + ALIGN - 1) // ALIGN) * ALIGN
    C, Lp = xp.shape
    T = Lp - pad_k
    sup = rows * tile * D
    assert T % sup == 0, (T, sup)
    assert Lp % ALIGN == 0, Lp
    H = jnp.asarray(toeplitz_taps_decim(np.asarray(taps, np.float32),
                                        tile, D))
    n_super = T // sup
    kern = functools.partial(_fir_decim_kernel, R=rows, tile=tile, K=K,
                             D=D, pad_k=pad_k, Lp=Lp)
    out = costed_pallas_call(
        kern,
        grid=(C, n_super),
        flops=int(2 * ((tile - 1) * D + K) * tile * rows * C * n_super),
        # in-kernel DMA: one (sup + pad_k) window per (c, i) step
        manual_bytes=int(C * n_super * (rows * tile * D + pad_k) * 4),
        label="fir_decim",
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
            pltpu.VMEM((rows * tile * D + pad_k,), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp.reshape(-1).astype(jnp.float32), H)
    return out.reshape(C, T // D)


def fir_decim_apply_any(ext: jnp.ndarray, taps: np.ndarray, D: int,
                        tile: int = 256, rows: int = 8,
                        interpret: bool = False) -> jnp.ndarray:
    """Drop-in for ops.fir.correlate with stride=D: ``ext`` is the
    overlap-save extended block [..., T + K - 1], real or complex."""
    K = int(np.asarray(taps).shape[-1])
    lead = ext.shape[:-1]
    L = ext.shape[-1]
    T = L - (K - 1)
    M = T // D
    pad_k = ((K - 1 + ALIGN - 1) // ALIGN) * ALIGN
    cplx = jnp.iscomplexobj(ext)
    if cplx:
        xf = jnp.concatenate(
            [jnp.real(ext).reshape(-1, L), jnp.imag(ext).reshape(-1, L)],
            axis=0)
    else:
        xf = ext.reshape(-1, L)
    sup = rows * tile * D
    T_pad = ((T + sup - 1) // sup) * sup
    xf = jnp.pad(xf, ((0, 0), (pad_k - (K - 1), T_pad - T)))
    Cr = xf.shape[0]
    if Cr >= 4:
        # channel-blocked path (zero relayout copies); row padding to
        # a multiple of 8 costs only extra window DMA
        Cp = ((Cr + CB - 1) // CB) * CB
        if Cp != Cr:
            xf = jnp.pad(xf, ((0, Cp - Cr), (0, 0)))
        y = _fir_decim_apply_cb(xf, taps, D, tile, rows,
                                interpret)[:Cr, :M]
    else:
        y = fir_decim_apply(xf, taps, D, tile, rows, interpret)[:, :M]
    if cplx:
        h = y.shape[0] // 2
        out = jax.lax.complex(y[:h], y[h:])
    else:
        out = y
    return out.reshape(lead + (M,))


# ----------------------------------------------------------------------
# One-call complex FIR/decimator through a banded matmul.
#
# Every complex-input FIR previously paid 3-4 full HBM passes of GLUE
# around the compute kernel: a re/im split per pallas call, a zero-pad
# copy, and the re + j*im recombine — measured 159 B/smp total for the
# WFM pilot band-pass whose kernel traffic is ~34.  This kernel takes
# the re and im PLANES ([C | C] row blocks, one fused split+pad pass),
# DMAs both windows, builds each matmul row as the aligned concat
# [re_window | im_window] (each piece padded to a lane multiple), and
# computes BOTH output parts with one MXU product whose tap matrix
# carries the complex cross terms:
#
#     cols [0:tile]      = Re y:  rows_re -> +hr, rows_im -> -hi
#     cols [tile:2*tile] = Im y:  rows_re -> +hi, rows_im -> +hr
#
# Output parts are block-contiguous (no interleaving anywhere), so the
# outside recombine is an aligned slice + lax.complex — one HBM pass.
# Real taps are the hi = 0 special case, so ONE kernel serves every
# complex-input stage: stride-1 channel filters, decimating halfbands,
# and complex-tap band-passes.

def toeplitz_taps_cplx(taps: np.ndarray, tile: int, D: int,
                       lw_pad: int) -> np.ndarray:
    taps = np.asarray(taps)
    K = taps.shape[-1]
    hr = np.real(taps).astype(np.float32)
    hi = (np.imag(taps).astype(np.float32)
          if np.iscomplexobj(taps) else None)
    H = np.zeros((2 * lw_pad, 2 * tile), np.float32)
    ks = np.arange(K)
    for j in range(tile):
        idx = j * D + ks
        H[idx, j] = hr
        H[lw_pad + idx, tile + j] = hr
        if hi is not None:
            H[lw_pad + idx, j] = -hi
            H[idx, tile + j] = hi
    return H


def _lw_pad(K: int, D: int, tile: int) -> int:
    return (((tile - 1) * D + K + 127) // 128) * 128


def cplx_pallas_ok(K: int, D: int, batch: int = 1,
                   m_out: int | None = None,
                   vmem_budget: int = 10 << 20):
    """Tile in {512, 256, 128} minimizing estimated HBM traffic (the
    tap matrix is a FIXED per-call cost, so short blocks prefer small
    tiles), or None if nothing fits the VMEM budget."""
    best, best_est = None, None
    for t in (512, 256, 128):
        lwp = _lw_pad(K, D, t)
        h_bytes = 2 * lwp * 2 * t * 4
        if h_bytes > vmem_budget:
            continue
        if m_out is None:
            return t
        hist = K - D
        pad_h = ((hist + ALIGN - 1) // ALIGN) * ALIGN
        n_super = (m_out + 8 * t - 1) // (8 * t)
        n_read = 8 * t * D + pad_h + ALIGN
        est = h_bytes + batch * n_super * 2 * n_read * 4
        if best_est is None or est < best_est:
            best, best_est = t, est
    return best


def _fir_cplx_kernel(x_hbm, h_ref, o_ref, wr, wi, sem_r, sem_i, *,
                     R, tile, K, D, pad_h, Lp, n_read, n_planes):
    c = pl.program_id(0)
    i = pl.program_id(1)
    adv = tile * D
    start = i * R * adv
    cp_r = pltpu.make_async_copy(
        x_hbm.at[pl.ds(c * Lp + start, n_read)],
        wr.at[pl.ds(0, n_read)], sem_r)
    cp_i = pltpu.make_async_copy(
        x_hbm.at[pl.ds((n_planes + c) * Lp + start, n_read)],
        wi.at[pl.ds(0, n_read)], sem_i)
    cp_r.start()
    cp_i.start()
    cp_r.wait()
    cp_i.wait()
    off = pad_h - (K - D)
    lwp = _lw_pad(K, D, tile)
    # Mosaic cannot concat slices taken deep inside a scratch ("input
    # offsets outside of the first tile"), so the [re | im] row split
    # becomes TWO matmuls against the top/bottom halves of H.
    Wr = jnp.stack([wr[pl.ds(off + r * adv, lwp)] for r in range(R)])
    Wi = jnp.stack([wi[pl.ds(off + r * adv, lwp)] for r in range(R)])
    o_ref[0] = (jnp.dot(Wr, h_ref[:lwp],
                        preferred_element_type=jnp.float32)
                + jnp.dot(Wi, h_ref[lwp:],
                          preferred_element_type=jnp.float32))


def _fir_cplx_cb_kernel(x_hbm, h_ref, ore_ref, oim_ref, wr, wi,
                        sem_r, sem_i, *, R, tile, K, D, pad_h,
                        n_read, n_planes):
    """Channel-blocked complex kernel: 8 complex channels per grid
    step (re rows [c8*8, 8], im rows [Cp + c8*8, 8]), both output
    parts stored to SEPARATE buffers (aligned lane slices of the
    [CB, 2*tile] product) — no relayout copies anywhere."""
    c8 = pl.program_id(0)
    i = pl.program_id(1)
    adv = tile * D
    start = i * R * adv
    cp_r = pltpu.make_async_copy(
        x_hbm.at[pl.ds(c8 * CB, CB), pl.ds(start, n_read)],
        wr.at[pl.ds(0, CB), pl.ds(0, n_read)], sem_r)
    cp_i = pltpu.make_async_copy(
        x_hbm.at[pl.ds(n_planes + c8 * CB, CB), pl.ds(start, n_read)],
        wi.at[pl.ds(0, CB), pl.ds(0, n_read)], sem_i)
    cp_r.start()
    cp_i.start()
    cp_r.wait()
    cp_i.wait()
    off = pad_h - (K - D)
    lwp = _lw_pad(K, D, tile)
    for r in range(R):
        win_r = wr[:, pl.ds(off + r * adv, lwp)]         # [CB, lwp]
        win_i = wi[:, pl.ds(off + r * adv, lwp)]
        res = (jnp.dot(win_r, h_ref[:lwp],
                       preferred_element_type=jnp.float32)
               + jnp.dot(win_i, h_ref[lwp:],
                         preferred_element_type=jnp.float32))
        ore_ref[0, :, pl.ds(r * tile, tile)] = res[:, :tile]
        oim_ref[0, :, pl.ds(r * tile, tile)] = res[:, tile:]


def _fir_cplx_apply_cb(ext: jnp.ndarray, taps: np.ndarray, D: int,
                       tile: int, rows: int,
                       interpret: bool) -> jnp.ndarray:
    """Channel-blocked complex FIR: ext [C, T + K - 1] complex64 with
    C >= 4; returns [C, T//D]."""
    taps = np.asarray(taps)
    K = int(taps.shape[-1])
    C, L = ext.shape
    T = L - (K - 1)
    M = T // D
    lwp = _lw_pad(K, D, tile)
    hist = K - D
    pad_h = ((hist + ALIGN - 1) // ALIGN) * ALIGN
    sup = rows * tile
    M_pad = ((M + sup - 1) // sup) * sup
    Cp = ((C + CB - 1) // CB) * CB
    Lp = pad_h + M_pad * D + ALIGN
    re = jnp.pad(jnp.real(ext), ((0, Cp - C),
                                 (pad_h - hist, Lp - (pad_h - hist) - L)))
    im = jnp.pad(jnp.imag(ext), ((0, Cp - C),
                                 (pad_h - hist, Lp - (pad_h - hist) - L)))
    xf = jnp.concatenate([re, im], axis=0)               # [2Cp, Lp]
    H = jnp.asarray(toeplitz_taps_cplx(taps, tile, D, lwp))
    n_super = M_pad // sup
    n_read = rows * tile * D + pad_h + ALIGN
    kern = functools.partial(_fir_cplx_cb_kernel, R=rows, tile=tile,
                             K=K, D=D, pad_h=pad_h, n_read=n_read,
                             n_planes=Cp)
    ore, oim = costed_pallas_call(
        kern,
        grid=(Cp // CB, n_super),
        flops=int(2 * (2 * lwp) * (2 * tile) * rows * Cp * n_super),
        # in-kernel DMA: re + im [CB, n_read] windows per (c8, i) step
        manual_bytes=int(Cp * n_super * 2 * n_read * 4),
        label="fir_cplx_cb",
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((2 * lwp, 2 * tile), lambda c, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, CB, sup), lambda c, i: (c, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CB, sup), lambda c, i: (c, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Cp // CB, CB, n_super * sup),
                                 jnp.float32),
            jax.ShapeDtypeStruct((Cp // CB, CB, n_super * sup),
                                 jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((CB, n_read), jnp.float32),
            pltpu.VMEM((CB, n_read), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xf, H)
    yr = ore.reshape(Cp, M_pad)[:C, :M]
    yi = oim.reshape(Cp, M_pad)[:C, :M]
    return jax.lax.complex(yr, yi)


def fir_cplx_apply_any(ext: jnp.ndarray, taps: np.ndarray, D: int = 1,
                       tile: int | None = None, rows: int = 8,
                       interpret: bool = False) -> jnp.ndarray:
    """Drop-in for ops.fir.correlate on COMPLEX input (real or complex
    taps, stride D): ``ext`` is the overlap-save extended block
    [..., T + K - 1] complex64 with T % D == 0; returns [..., T//D]."""
    taps = np.asarray(taps)
    K = int(taps.shape[-1])
    lead = ext.shape[:-1]
    L = ext.shape[-1]
    T = L - (K - 1)
    M = T // D
    if tile is None:
        tile = cplx_pallas_ok(K, D)
    assert tile is not None, (K, D)
    batch = int(np.prod(lead)) if lead else 1
    if batch >= 4:
        y = _fir_cplx_apply_cb(ext.reshape(-1, L), taps, D, tile,
                               rows, interpret)
        return y.reshape(lead + (M,))
    lwp = _lw_pad(K, D, tile)
    hist = K - D
    pad_h = ((hist + ALIGN - 1) // ALIGN) * ALIGN
    sup = rows * tile
    M_pad = ((M + sup - 1) // sup) * sup
    # per-plane length: pad_h history + M_pad*D samples + ALIGN slack
    # for the lane-rounded last window (DMA lengths stay 1024-aligned)
    Lp = pad_h + M_pad * D + ALIGN
    xf = jnp.concatenate([jnp.real(ext).reshape(-1, L),
                          jnp.imag(ext).reshape(-1, L)], axis=0)
    xf = jnp.pad(xf, ((0, 0), (pad_h - hist, Lp - (pad_h - hist) - L)))
    C2 = xf.shape[0]
    C = C2 // 2
    H = jnp.asarray(toeplitz_taps_cplx(taps, tile, D, lwp))
    n_super = M_pad // sup
    n_read = rows * tile * D + pad_h + ALIGN
    kern = functools.partial(_fir_cplx_kernel, R=rows, tile=tile, K=K,
                             D=D, pad_h=pad_h, Lp=Lp, n_read=n_read,
                             n_planes=C)
    out = costed_pallas_call(
        kern,
        grid=(C, n_super),
        flops=int(2 * (2 * lwp) * (2 * tile) * rows * C * n_super),
        # in-kernel DMA: re + im n_read windows per (c, i) step
        manual_bytes=int(C * n_super * 2 * n_read * 4),
        label="fir_cplx",
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((2 * lwp, 2 * tile), lambda c, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows, 2 * tile),
                               lambda c, i: (c, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, n_super * rows, 2 * tile),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((n_read,), jnp.float32),
            pltpu.VMEM((n_read,), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xf.reshape(-1), H)
    # rows hold [re_tile | im_tile] blocks: aligned slices, one combine
    o = out.reshape(C, M_pad // tile, 2, tile)
    yr = o[:, :, 0, :].reshape(C, M_pad)[:, :M]
    yi = o[:, :, 1, :].reshape(C, M_pad)[:, :M]
    return jax.lax.complex(yr, yi).reshape(lead + (M,))


# ----------------------------------------------------------------------
# Polyphase L/M resampler through the same banded-matmul structure.
#
# From ops/resampler.PolyphaseResampler: with the widened kernel
# k[r, l] (kw = taps_per_phase + decim - 1 columns, phase shift c_r
# embedded), output o = m*interp + r is
#     y[o] = sum_l ext[m*decim + l] * k[r, l]
# For an output tile of `mt` consecutive m (all interp phases), the
# banded matrix is H[m_loc*decim + l, m_loc*interp + r] = k[r, l], and
# one [R, Lw] x [Lw, mt*interp] matmul yields R*mt*interp outputs.

def banded_poly_matrix(widened: np.ndarray, interp: int, decim: int,
                       mt: int) -> np.ndarray:
    kw = widened.shape[1]
    Lw = (mt - 1) * decim + kw
    H = np.zeros((Lw, mt * interp), np.float32)
    for m in range(mt):
        for r in range(interp):
            H[m * decim:m * decim + kw, m * interp + r] = widened[r]
    return H


def banded_poly_matrix_chunks(widened: np.ndarray, interp: int,
                              decim: int, mt: int):
    """The banded polyphase matrix split into per-128-output-column
    chunks with per-chunk input-row windows: [(qoff, Hq[Lwq, 128])].

    A coprime interp forces mt = 128 and a [~(127·decim+kw), 128·interp]
    matrix whose tile area is mostly structural zeros (the band only
    spans ~kw rows per column) — e.g. the WFM 5/6 AF stage wastes ~71%
    of its MXU work on them.  Chunking keeps the SAME outputs (each
    chunk's dot covers exactly the band its 128 columns touch) while
    the summed tile area drops to ~(128·decim/interp + kw)·tile."""
    kw = widened.shape[1]
    tile = mt * interp
    assert tile % 128 == 0, tile
    out = []
    for q in range(tile // 128):
        j0 = q * 128
        m0, m1 = j0 // interp, (j0 + 127) // interp
        qoff = m0 * decim
        Lwq = (m1 - m0) * decim + kw
        Hq = np.zeros((Lwq, 128), np.float32)
        for jj in range(128):
            m, r = (j0 + jj) // interp, (j0 + jj) % interp
            row = (m - m0) * decim
            Hq[row:row + kw, jj] = widened[r]
        out.append((qoff, Hq))
    return out


def _banded_kernel(x_hbm, h_ref, o_ref, w_scratch, sem, *,
                   R, tile_out, row_adv, Lw, pad_k, Lp):
    c = pl.program_id(0)
    i = pl.program_id(1)
    start = c * Lp + i * (R * row_adv)
    n_read = R * row_adv + pad_k
    cp = pltpu.make_async_copy(
        x_hbm.at[pl.ds(start, n_read)],
        w_scratch.at[pl.ds(0, n_read)], sem)
    cp.start()
    cp.wait()
    # history needed left of each row = Lw - row_adv (kw - decim for
    # the polyphase; K-1 for plain FIR)
    hist = Lw - row_adv
    off = pad_k - hist
    rows = [w_scratch[pl.ds(off + r * row_adv, Lw)] for r in range(R)]
    W = jnp.stack(rows)                                   # [R, Lw]
    o_ref[0] = jnp.dot(W, h_ref[...],
                       preferred_element_type=jnp.float32)


def _roll_lwp(Lw: int) -> int:
    # rolled window: static residual (<128) + dynamic DMA-alignment
    # shift (<1024) precede the Lw useful lanes; wrap-around garbage
    # beyond them multiplies zero-padded H rows
    return ((Lw + 128 + ALIGN + 127) // 128) * 128


def poly_pallas_ok(interp: int, decim: int, kw: int,
                   m_out: int | None = None, batch: int = 1,
                   rows: int = 8, vmem_budget: int = 6 << 20):
    """Pick the banded polyphase config minimizing estimated HBM
    traffic: ``(mt, use_roll)`` or None (conv fallback).

    The ALIGNED path needs both mt·interp (output lanes) and mt·decim
    (stacked-row offsets) to be 128-multiples — coprime-odd ratios force
    mt = 128 and a giant tap matrix.  The ROLL path only needs
    mt·interp aligned: rows are loaded at 128-aligned bases and rotated
    by their (static + DMA-alignment) residual, so mt stays small.  The
    tap matrix is a fixed per-call cost, so short blocks pick small mt.
    """
    best = None
    best_est = None

    def consider(mt, use_roll):
        nonlocal best, best_est
        Lw = (mt - 1) * decim + kw
        h_bytes = ((((Lw + 127) // 128) * 128) if use_roll else Lw) \
            * (mt * interp) * 4
        if h_bytes > vmem_budget:
            return
        hist = kw - decim
        pad_k = ((hist + ALIGN - 1) // ALIGN) * ALIGN
        extra = (((_roll_lwp(Lw) + ALIGN - 1) // ALIGN) * ALIGN
                 if use_roll else 0)
        if m_out is None:
            est = h_bytes
        else:
            n_super = (m_out + rows * mt - 1) // (rows * mt)
            n_read = rows * mt * decim + pad_k + extra
            est = h_bytes + batch * n_super * n_read * 4
        if best_est is None or est < best_est:
            best, best_est = (mt, use_roll), est

    mt = 1
    while ((mt * interp) % 128 or (mt * decim) % 128) and mt <= 1024:
        mt += 1
    if mt <= 1024:
        consider(mt, False)
    mt0 = 128 // math.gcd(interp, 128)
    for j in range(6):
        consider(mt0 << j, True)
    return best


def _banded_roll_kernel(x_hbm, h_ref, o_ref, w_scratch, sem, *,
                        R, tile_out, row_adv, Lwp, pad_k, hist, Lp,
                        n_read):
    """Banded matmul with UNALIGNED row advance: the DMA starts at the
    1024-aligned floor of the super-tile offset and each row is loaded
    at the 128-aligned floor of its window, then lane-ROTATED by the
    residual (dynamic DMA shift + static row shift).  Wrap-around
    garbage lands on zero-padded H rows."""
    c = pl.program_id(0)
    i = pl.program_id(1)
    start = c * Lp + i * (R * row_adv)
    # (start // ALIGN) * ALIGN: the div-mul form is what Mosaic's
    # divisibility prover recognizes (start - start % ALIGN is not)
    start_al = (start // ALIGN) * ALIGN
    extra = start - start_al
    cp = pltpu.make_async_copy(
        x_hbm.at[pl.ds(start_al, n_read)],
        w_scratch.at[pl.ds(0, n_read)], sem)
    cp.start()
    cp.wait()
    off = pad_k - hist
    Lw128 = h_ref.shape[0]              # ceil(Lw/128)*128 << Lwp
    rows_ = []
    for r in range(R):
        o_r = off + r * row_adv
        b_r = (o_r // 128) * 128
        v = w_scratch[pl.ds(b_r, Lwp)][None, :]
        v = pltpu.roll(v, -((o_r - b_r) + extra), 1)
        # slice the roll slack away BEFORE the matmul so H only needs
        # ceil(Lw/128) row tiles (padding H to Lwp tripled its traffic)
        rows_.append(jax.lax.slice(v, (0, 0), (1, Lw128)))
    W = jnp.concatenate(rows_, axis=0)                # [R, Lw128]
    o_ref[0] = jnp.dot(W, h_ref[...],
                       preferred_element_type=jnp.float32)


def _banded_cb_kernel(x_hbm, h_ref, o_ref, w, sem, *,
                      R, tile_out, row_adv, Lw, pad_k, n_read):
    c8 = pl.program_id(0)
    i = pl.program_id(1)
    cp = pltpu.make_async_copy(
        x_hbm.at[pl.ds(c8 * CB, CB), pl.ds(i * (R * row_adv), n_read)],
        w.at[pl.ds(0, CB), pl.ds(0, n_read)], sem)
    cp.start()
    cp.wait()
    hist = Lw - row_adv
    off = pad_k - hist
    for r in range(R):
        win = w[:, pl.ds(off + r * row_adv, Lw)]         # [CB, Lw]
        o_ref[0, :, pl.ds(r * tile_out, tile_out)] = jnp.dot(
            win, h_ref[...], preferred_element_type=jnp.float32)


def _banded_roll_cb_kernel(x_hbm, h_ref, o_ref, w, sem, *,
                           R, tile_out, row_adv, Lwp, pad_k, hist,
                           n_read):
    """Channel-blocked roll variant: both the DMA lane offset and the
    per-row window offsets are floored to 128-lane boundaries and the
    residual handled by a lane rotate (2-D lane granularity is 128,
    not the 1-D 1024)."""
    c8 = pl.program_id(0)
    i = pl.program_id(1)
    start = i * (R * row_adv)
    start_al = (start // 128) * 128
    extra = start - start_al
    cp = pltpu.make_async_copy(
        x_hbm.at[pl.ds(c8 * CB, CB), pl.ds(start_al, n_read)],
        w.at[pl.ds(0, CB), pl.ds(0, n_read)], sem)
    cp.start()
    cp.wait()
    off = pad_k - hist
    Lw128 = h_ref.shape[0]
    for r in range(R):
        o_r = off + r * row_adv
        b_r = (o_r // 128) * 128
        win = w[:, pl.ds(b_r, Lwp)]                      # [CB, Lwp]
        win = pltpu.roll(win, -((o_r - b_r) + extra), 1)
        win = jax.lax.slice(win, (0, 0), (CB, Lw128))
        o_ref[0, :, pl.ds(r * tile_out, tile_out)] = jnp.dot(
            win, h_ref[...], preferred_element_type=jnp.float32)


def poly_resample_apply_any(ext: jnp.ndarray, widened: np.ndarray,
                            interp: int, decim: int, mt: int = 64,
                            rows: int = 8, use_roll: bool = False,
                            interpret: bool = False,
                            carry: jnp.ndarray | None = None
                            ) -> jnp.ndarray:
    """Drop-in for the PolyphaseResampler conv: ``ext`` is the extended
    block [..., T + tpp - 1] (tpp-1 = kw - decim carried samples),
    real or complex; returns [..., (T//decim)*interp].

    With ``carry`` given, ``ext`` is the BARE block [..., T] and carry
    the [..., tpp-1] history: the history concat, the alignment pads
    and the plane split then land in ONE fused XLA pass building the
    kernel operand, instead of a materialized concat + a separate pad
    sweep (measured ~11 B/in-sample of the WFM-8 audio tail)."""
    kw = widened.shape[1]
    hist = kw - decim                    # == tpp - 1
    lead = ext.shape[:-1]
    L = ext.shape[-1] + (hist if carry is not None else 0)
    T = L - hist
    M = T // decim                       # output m count
    if use_roll:
        # roll mode only needs the OUTPUT lanes aligned
        assert (mt * interp) % 128 == 0, (mt, interp)
    else:
        # lane alignment: BOTH tile_out = mt·interp (output columns)
        # and row_adv = mt·decim (stacked-row scratch offsets — Mosaic
        # cannot concat slices at misaligned lane offsets) must be
        # 128-multiples
        while (mt * interp) % 128 or (mt * decim) % 128:
            mt += 1
    tile_out = mt * interp
    row_adv = mt * decim
    Lw = (mt - 1) * decim + kw
    pad_k = ((hist + ALIGN - 1) // ALIGN) * ALIGN
    cplx = jnp.iscomplexobj(ext)
    sup_m = rows * mt
    M_pad = ((M + sup_m - 1) // sup_m) * sup_m
    if use_roll:
        Lwp = _roll_lwp(Lw)
        n_read = ((rows * row_adv + pad_k + Lwp + ALIGN + ALIGN - 1)
                  // ALIGN) * ALIGN
        tail_extra = n_read - (rows * row_adv + pad_k)
    else:
        Lwp = Lw
        n_read = rows * row_adv + pad_k
        tail_extra = 0
    base_len = (pad_k - hist) + L + (M_pad - M) * decim + tail_extra
    Lp = ((base_len + ALIGN - 1) // ALIGN) * ALIGN
    if carry is not None:
        B = int(np.prod(lead)) if lead else 1
        zl = jnp.zeros((B, pad_k - hist), jnp.float32)
        zr = jnp.zeros((B, Lp - (pad_k - hist) - L), jnp.float32)
        cs = carry.reshape(B, hist)
        xs = ext.reshape(B, ext.shape[-1])
        if cplx:
            xf = jnp.concatenate(
                [jnp.concatenate([zl, jnp.real(cs), jnp.real(xs), zr],
                                 axis=-1),
                 jnp.concatenate([zl, jnp.imag(cs), jnp.imag(xs), zr],
                                 axis=-1)], axis=0)
        else:
            xf = jnp.concatenate([zl, cs, xs, zr], axis=-1)
    else:
        if cplx:
            xf = jnp.concatenate(
                [jnp.real(ext).reshape(-1, L),
                 jnp.imag(ext).reshape(-1, L)], axis=0)
        else:
            xf = ext.reshape(-1, L)
        xf = jnp.pad(xf, ((0, 0), (pad_k - hist,
                                   Lp - (pad_k - hist) - L)))
    C = xf.shape[0]
    H = banded_poly_matrix(np.asarray(widened, np.float32),
                           interp, decim, mt)
    if use_roll:
        Lw128 = ((Lw + 127) // 128) * 128
        H = np.pad(H, ((0, Lw128 - Lw), (0, 0)))
    H = jnp.asarray(H)
    n_super = M_pad // sup_m
    if C >= 4:
        # channel-blocked path: no relayout copies around the call
        Cp = ((C + CB - 1) // CB) * CB
        if Cp != C:
            xf = jnp.pad(xf, ((0, Cp - C), (0, 0)))
        if use_roll:
            n_read_cb = ((rows * row_adv + pad_k + Lwp + 256)
                         // 128 + 1) * 128
            kern = functools.partial(_banded_roll_cb_kernel, R=rows,
                                     tile_out=tile_out,
                                     row_adv=row_adv, Lwp=Lwp,
                                     pad_k=pad_k, hist=hist,
                                     n_read=n_read_cb)
        else:
            n_read_cb = n_read
            kern = functools.partial(_banded_cb_kernel, R=rows,
                                     tile_out=tile_out,
                                     row_adv=row_adv, Lw=Lw,
                                     pad_k=pad_k, n_read=n_read_cb)
        so = rows * tile_out
        out = costed_pallas_call(
            kern,
            grid=(Cp // CB, n_super),
            flops=int(2 * H.shape[0] * tile_out * rows * Cp * n_super),
            # in-kernel DMA: one [CB, n_read_cb] window per (c8, i) step
            manual_bytes=int(Cp * n_super * n_read_cb * 4),
            label="poly_banded_cb",
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec((H.shape[0], tile_out),
                             lambda c, i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, CB, so), lambda c, i: (c, 0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Cp // CB, CB,
                                            n_super * so),
                                           jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((CB, n_read_cb), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
        )(xf, H)
        y = out.reshape(Cp, M_pad * interp)[:C, :M * interp]
    else:
        if use_roll:
            kern = functools.partial(_banded_roll_kernel, R=rows,
                                     tile_out=tile_out,
                                     row_adv=row_adv,
                                     Lwp=Lwp, pad_k=pad_k, hist=hist,
                                     Lp=Lp, n_read=n_read)
        else:
            kern = functools.partial(_banded_kernel, R=rows,
                                     tile_out=tile_out,
                                     row_adv=row_adv,
                                     Lw=Lw, pad_k=pad_k, Lp=Lp)
        out = costed_pallas_call(
            kern,
            grid=(C, n_super),
            flops=int(2 * H.shape[0] * tile_out * rows * C * n_super),
            # in-kernel DMA: one n_read window per (c, i) step
            manual_bytes=int(C * n_super * n_read * 4),
            label="poly_banded",
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec((H.shape[0], tile_out),
                             lambda c, i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, rows, tile_out),
                                   lambda c, i: (c, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((C, n_super * rows,
                                            tile_out),
                                           jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((n_read,), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
        )(xf.reshape(-1), H)
        y = out.reshape(C, M_pad * interp)[:, :M * interp]
    if cplx:
        h = y.shape[0] // 2
        yc = jax.lax.complex(y[:h], y[h:])
    else:
        yc = y
    return yc.reshape(lead + (M * interp,))


# ----------------------------------------------------------------------
# Fused mix-down + decimating FIR on a SHARED wideband with per-channel
# complex-modulated taps (ops/fused_frontend.py).  The taps g_c[k] are
# RUNTIME values (retune!), so the banded matrix cannot be baked; the
# kernel builds the strided window matrix S in VMEM and computes all
# channels with one [R·tile, 2K] × [2K, 2C] MXU matmul:
#
#     out_re_c = Sr·gr_c − Si·gi_c ;  out_im_c = Sr·gi_c + Si·gr_c
#
# Mosaic cannot shape-cast a 1-D vector to (N, D) in-kernel, so the
# stride-D window extraction is done by DE-INTERLEAVING the wideband
# into D phase planes on the host (one cheap pass over SHARED data):
# sample index off+k+(i·n_out+j)·D lives in plane (off+k)%D at element
# (off+k)//D + i·n_out + j — a contiguous slice per tap.

def _fused_mix_kernel(x_hbm, g_ref, s0_ref, o_ref, wr, wi, acc_ref,
                      sem_r, sem_i, *, K, D, pad_k, Lp, n_out, bs):
    i = pl.program_id(0)
    n2 = n_out * D
    start = i * n2
    n_read = n2 + pad_k
    cp_r = pltpu.make_async_copy(
        x_hbm.at[pl.ds(start, n_read)], wr.at[pl.ds(0, n_read)], sem_r)
    cp_i = pltpu.make_async_copy(
        x_hbm.at[pl.ds(Lp + start, n_read)], wi.at[pl.ds(0, n_read)],
        sem_i)
    cp_r.start()
    cp_i.start()
    cp_r.wait()
    cp_i.wait()
    off = pad_k - (K - 1)
    # stride-1 VPU tap accumulation over the INTERLEAVED window (every
    # slice contiguous), computing D× outputs.  The tap loop is a
    # fori_loop accumulating into an in-place VMEM scratch — Mosaic
    # gives every value of an UNROLLED add-chain its own stack slot, so
    # K × [2C, n2] temporaries blow the 16 MB scoped-VMEM limit at wide
    # channel counts.  Inside the loop the tap-k shifted window comes
    # from a dynamic lane ROTATE (Mosaic rejects unaligned dynamic
    # vector loads: "index in dimension 0 must be a multiple of 1024")
    # and the tap column from a one-hot iota matmul (no dynamic lane
    # slicing of loaded values).
    twoK = 2 * K
    acc_ref[...] = jnp.zeros((o_ref.shape[0], n2), jnp.float32)

    def _accumulate(w_ref, part):
        w2 = w_ref[...][None, :]                        # [1, n_read]

        def body(k, carry):
            sl = jax.lax.slice(pltpu.roll(w2, -(off + k), 1),
                               (0, 0), (1, n2))
            sel = (jax.lax.broadcasted_iota(jnp.int32, (twoK, 1), 0)
                   == part * K + k).astype(jnp.float32)
            gk = jnp.dot(g_ref[...], sel,
                         preferred_element_type=jnp.float32)  # [2C, 1]
            acc_ref[...] = acc_ref[...] + gk * sl
            return carry

        jax.lax.fori_loop(0, K, body, 0)

    _accumulate(wr, 0)
    _accumulate(wi, 1)
    # ...then keep every D-th column with a small static selection-matrix
    # matmul per block (Mosaic cannot lower strided lane slices/gathers)
    for b in range(n_out // bs):
        o_ref[:, b * bs:(b + 1) * bs] = jnp.dot(
            acc_ref[:, b * bs * D:(b + 1) * bs * D], s0_ref[...],
            preferred_element_type=jnp.float32)


def fused_mix_decim_apply(ext: jnp.ndarray, g: jnp.ndarray, D: int,
                          tile: int = 256, rows: int = 8,
                          interpret: bool = False) -> jnp.ndarray:
    """ext: [T + K - 1] complex64 shared wideband (overlap-save
    extended); g: [2C, 2K] float32 packed channel taps —
    row 2c = [gr_c | -gi_c], row 2c+1 = [gi_c | gr_c].
    Returns [C, T//D] complex64 (pre-twiddle)."""
    L = ext.shape[-1]
    twoC, twoK = g.shape
    K = twoK // 2
    C = twoC // 2
    T = L - (K - 1)
    M = T // D
    pad_k = ((K - 1 + ALIGN - 1) // ALIGN) * ALIGN
    sup = rows * tile                          # outputs per super-tile
    bs = 256                                   # downsample block columns
    assert sup % bs == 0
    M_pad = ((M + sup - 1) // sup) * sup
    # build the two planes FLAT via 1-D concat: reshaping a tiled
    # [2, Lp] to [2*Lp] is a physical relayout XLA materializes as a
    # full copy (~66 B/in-sample for the shared wideband)
    zf = jnp.zeros((pad_k - (K - 1),), jnp.float32)
    zt = jnp.zeros(((M_pad - M) * D + ALIGN,), jnp.float32)
    xf = jnp.concatenate([zf, jnp.real(ext), zt,
                          zf, jnp.imag(ext), zt])
    Lp = xf.shape[-1] // 2
    n_super = M_pad // sup
    # static selection matrix: S0[j·D, j] = 1  → acc @ S0 keeps every
    # D-th column
    s0 = np.zeros((bs * D, bs), np.float32)
    s0[np.arange(bs) * D, np.arange(bs)] = 1.0
    kern = functools.partial(_fused_mix_kernel, K=K, D=D, pad_k=pad_k,
                             Lp=Lp, n_out=sup, bs=bs)
    out = costed_pallas_call(
        kern,
        grid=(n_super,),
        flops=int(n_super * (2 * twoK * twoC * sup * D
                             + 2 * twoC * sup * D * bs)),
        # in-kernel DMA: re + im (sup·D + pad_k) windows per step
        manual_bytes=int(n_super * 2 * (sup * D + pad_k) * 4),
        label="fused_mix_decim",
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((twoC, twoK), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bs * D, bs), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((twoC, sup), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((twoC, M_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((sup * D + pad_k,), jnp.float32),
            pltpu.VMEM((sup * D + pad_k,), jnp.float32),
            pltpu.VMEM((twoC, sup * D), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xf, g, jnp.asarray(s0))
    # g rows are packed in BLOCKS (re rows [0:C], im rows [C:2C]) so
    # the complex recombine is a free row-block slice — interleaved
    # rows would need a sublane-strided gather (a relayout copy)
    y = out[:, :M]
    return jax.lax.complex(y[:C], y[C:])               # [C, M]


# ----------------------------------------------------------------------
# Plane-protocol stages: chain kernels WITHOUT per-stage split/pad/
# recombine HBM passes.
#
# Measured on the WFM-8 chain (scripts/frontend_breakdown.py): each
# complex stage paid ~2-4x its irreducible window+output traffic in
# GLUE — a re/im split pass, a zero-pad/history concat pass, the
# re + j*im recombine, and (for the fused stage) a separate twiddle
# pass over the full IF-rate array.  In the plane protocol every stage
# consumes and produces the SAME layout:
#
#     ext_planes: [P, head + M_pad]  float32   (P = 2C planes, P % 8 == 0;
#                 re planes rows [0:C], im planes rows [C:2C])
#
# where columns [head - pad_k, head) hold the stage's overlap-save
# history (written by the PREVIOUS kernel's head block, grid step 0)
# and M_pad >= M_valid columns of payload follow (garbage past
# M_valid).  Each kernel runs grid (planes/8, n_super + 1): step 0
# writes the HEAD BLOCK of its own output (zeros + the NEXT stage's
# carried history, passed as a small state operand), steps i >= 1
# compute output super-tile i-1.  The only full-rate HBM traffic left
# per stage is the window DMA + the output write.

def _plane_decim_kernel(x_hbm, h_ref, tail_ref, o_ref, w, sem, *,
                        R, tile, K, D, pad_k, x_base, head_pad):
    c8 = pl.program_id(0)
    i = pl.program_id(1)
    so = R * tile
    sup = so * D

    @pl.when(i == 0)
    def _head():
        o_ref[0] = jnp.zeros((CB, so), jnp.float32)
        o_ref[0, :, so - head_pad:] = tail_ref[...]

    @pl.when(i > 0)
    def _body():
        n_read = sup + pad_k
        cp = pltpu.make_async_copy(
            x_hbm.at[pl.ds(c8 * CB, CB),
                     pl.ds(x_base + (i - 1) * sup, n_read)],
            w.at[pl.ds(0, CB), pl.ds(0, n_read)], sem)
        cp.start()
        cp.wait()
        Lw = (tile - 1) * D + K
        off = pad_k - (K - 1)
        for r in range(R):
            win = w[:, pl.ds(off + r * tile * D, Lw)]    # [CB, Lw]
            o_ref[0, :, pl.ds(r * tile, tile)] = jnp.dot(
                win, h_ref[...], preferred_element_type=jnp.float32)


def fir_decim_planes(xp: jnp.ndarray, taps: np.ndarray, D: int,
                     x_base: int, m_pad_out: int, head_pad: int,
                     tail: jnp.ndarray, tile: int = 256, rows: int = 8,
                     interpret: bool = False) -> jnp.ndarray:
    """Plane-protocol decimating FIR stage.

    xp: [P, Lp] float32 planes; the stage's input data begins at column
    ``x_base + pad_k`` with its K-1 history immediately before it.
    Returns [P, so + m_pad_out] with the head block carrying ``tail``
    (the NEXT stage's history, [P, head_pad]) in its last columns.
    """
    K = int(np.asarray(taps).shape[-1])
    pad_k = ((K - 1 + 127) // 128) * 128   # 2-D DMA: 128-lane granularity
    P, Lp = xp.shape
    so = rows * tile
    sup = so * D
    assert P % CB == 0, P
    assert m_pad_out % so == 0, (m_pad_out, so)
    assert x_base % 128 == 0 and x_base >= 0, x_base
    assert head_pad % 128 == 0 and head_pad <= so, (head_pad, so)
    n_super = m_pad_out // so
    assert x_base + n_super * sup + pad_k <= Lp, \
        (x_base, n_super, sup, pad_k, Lp)
    H = jnp.asarray(toeplitz_taps_decim(np.asarray(taps, np.float32),
                                        tile, D))
    kern = functools.partial(_plane_decim_kernel, R=rows, tile=tile,
                             K=K, D=D, pad_k=pad_k, x_base=x_base,
                             head_pad=head_pad)
    out = costed_pallas_call(
        kern,
        grid=(P // CB, n_super + 1),
        flops=int(2 * ((tile - 1) * D + K) * tile * rows * P * n_super),
        # in-kernel DMA (i > 0 steps only): [CB, sup + pad_k] windows
        manual_bytes=int(P * n_super * (sup + pad_k) * 4),
        label="plane_decim",
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((H.shape[0], tile), lambda c, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CB, head_pad), lambda c, i: (c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, CB, so), lambda c, i: (c, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P // CB, CB,
                                        (n_super + 1) * so),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((CB, sup + pad_k), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp.astype(jnp.float32), H, tail.astype(jnp.float32))
    return out.reshape(P, (n_super + 1) * so)


def _plane_poly_kernel(x_hbm, h_ref, tail_ref, o_ref, w, sem, *,
                       R, tile_out, row_adv, Lw, pad_k, x_base,
                       head_pad, n_read):
    c8 = pl.program_id(0)
    i = pl.program_id(1)
    so = R * tile_out

    @pl.when(i == 0)
    def _head():
        o_ref[0] = jnp.zeros((CB, so), jnp.float32)
        o_ref[0, :, so - head_pad:] = tail_ref[...]

    @pl.when(i > 0)
    def _body():
        cp = pltpu.make_async_copy(
            x_hbm.at[pl.ds(c8 * CB, CB),
                     pl.ds(x_base + (i - 1) * (R * row_adv), n_read)],
            w.at[pl.ds(0, CB), pl.ds(0, n_read)], sem)
        cp.start()
        cp.wait()
        hist = Lw - row_adv
        off = pad_k - hist
        for r in range(R):
            win = w[:, pl.ds(off + r * row_adv, Lw)]     # [CB, Lw]
            o_ref[0, :, pl.ds(r * tile_out, tile_out)] = jnp.dot(
                win, h_ref[...], preferred_element_type=jnp.float32)


def _plane_poly_roll_kernel(x_hbm, h_ref, tail_ref, o_ref, w, sem, *,
                            R, tile_out, row_adv, Lwp, pad_k, hist,
                            x_base, head_pad, n_read):
    c8 = pl.program_id(0)
    i = pl.program_id(1)
    so = R * tile_out

    @pl.when(i == 0)
    def _head():
        o_ref[0] = jnp.zeros((CB, so), jnp.float32)
        o_ref[0, :, so - head_pad:] = tail_ref[...]

    @pl.when(i > 0)
    def _body():
        start = x_base + (i - 1) * (R * row_adv)
        start_al = (start // 128) * 128
        extra = start - start_al
        cp = pltpu.make_async_copy(
            x_hbm.at[pl.ds(c8 * CB, CB), pl.ds(start_al, n_read)],
            w.at[pl.ds(0, CB), pl.ds(0, n_read)], sem)
        cp.start()
        cp.wait()
        off = pad_k - hist
        Lw128 = h_ref.shape[0]
        for r in range(R):
            o_r = off + r * row_adv
            b_r = (o_r // 128) * 128
            win = w[:, pl.ds(b_r, Lwp)]
            win = pltpu.roll(win, -((o_r - b_r) + extra), 1)
            win = jax.lax.slice(win, (0, 0), (CB, Lw128))
            o_ref[0, :, pl.ds(r * tile_out, tile_out)] = jnp.dot(
                win, h_ref[...], preferred_element_type=jnp.float32)


def poly_resample_planes(xp: jnp.ndarray, widened: np.ndarray,
                         interp: int, decim: int, mt: int,
                         use_roll: bool, x_base: int, m_pad_out: int,
                         head_pad: int, tail: jnp.ndarray,
                         rows: int = 8,
                         interpret: bool = False) -> jnp.ndarray:
    """Plane-protocol polyphase L/M stage (banded matmul).

    ``m_pad_out`` counts OUTPUT samples (multiple of rows*mt*interp).
    The stage consumes rows*mt*decim input columns per super-tile from
    ``x_base + pad_k`` onward.
    """
    kw = widened.shape[1]
    hist = kw - decim
    pad_k = ((hist + 127) // 128) * 128    # 2-D DMA: 128-lane granularity
    P, Lp = xp.shape
    if use_roll:
        assert (mt * interp) % 128 == 0, (mt, interp)
    else:
        assert (mt * interp) % 128 == 0 and (mt * decim) % 128 == 0
    tile_out = mt * interp
    row_adv = mt * decim
    Lw = (mt - 1) * decim + kw
    so = rows * tile_out
    sup_in = rows * row_adv
    assert P % CB == 0 and m_pad_out % so == 0, (P, m_pad_out, so)
    assert x_base % 128 == 0 and x_base >= 0, x_base
    assert head_pad % 128 == 0 and head_pad <= so, (head_pad, so)
    n_super = m_pad_out // so
    H = banded_poly_matrix(np.asarray(widened, np.float32),
                           interp, decim, mt)
    if use_roll:
        Lwp = _roll_lwp(Lw)
        Lw128 = ((Lw + 127) // 128) * 128
        H = np.pad(H, ((0, Lw128 - Lw), (0, 0)))
        n_read = ((sup_in + pad_k + Lwp + 256) // 128 + 1) * 128
        kern = functools.partial(_plane_poly_roll_kernel, R=rows,
                                 tile_out=tile_out, row_adv=row_adv,
                                 Lwp=Lwp, pad_k=pad_k, hist=hist,
                                 x_base=x_base, head_pad=head_pad,
                                 n_read=n_read)
    else:
        n_read = sup_in + pad_k
        kern = functools.partial(_plane_poly_kernel, R=rows,
                                 tile_out=tile_out, row_adv=row_adv,
                                 Lw=Lw, pad_k=pad_k, x_base=x_base,
                                 head_pad=head_pad, n_read=n_read)
    assert x_base + (n_super - 1) * sup_in + n_read <= Lp, \
        (x_base, n_super, sup_in, n_read, Lp)
    H = jnp.asarray(H)
    out = costed_pallas_call(
        kern,
        grid=(P // CB, n_super + 1),
        flops=int(2 * H.shape[0] * tile_out * rows * P * n_super),
        # in-kernel DMA (i > 0 steps only): [CB, n_read] windows
        manual_bytes=int(P * n_super * n_read * 4),
        label="plane_poly",
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((H.shape[0], tile_out), lambda c, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CB, head_pad), lambda c, i: (c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, CB, so), lambda c, i: (c, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P // CB, CB,
                                        (n_super + 1) * so),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((CB, n_read), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp.astype(jnp.float32), H, tail.astype(jnp.float32))
    return out.reshape(P, (n_super + 1) * so)


def _fused_mix_planes_kernel(x_hbm, g_ref, s0_ref, om_ref, base_ref,
                             tail_ref, o_ref, wr, wi, acc_ref,
                             sem_r, sem_i, *, K, D, pad_k, Lp, n_out,
                             bs, C, head_pad):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _head():
        o_ref[...] = jnp.zeros(o_ref.shape, jnp.float32)
        o_ref[:, n_out - head_pad:] = tail_ref[...]

    @pl.when(i > 0)
    def _body():
        n2 = n_out * D
        start = (i - 1) * n2
        n_read = n2 + pad_k
        cp_r = pltpu.make_async_copy(
            x_hbm.at[pl.ds(start, n_read)], wr.at[pl.ds(0, n_read)],
            sem_r)
        cp_i = pltpu.make_async_copy(
            x_hbm.at[pl.ds(Lp + start, n_read)], wi.at[pl.ds(0, n_read)],
            sem_i)
        cp_r.start()
        cp_i.start()
        cp_r.wait()
        cp_i.wait()
        off = pad_k - (K - 1)
        twoK = 2 * K
        acc_ref[...] = jnp.zeros((o_ref.shape[0], n2), jnp.float32)

        def _accumulate(w_ref, part):
            w2 = w_ref[...][None, :]

            def body(k, carry):
                sl = jax.lax.slice(pltpu.roll(w2, -(off + k), 1),
                                   (0, 0), (1, n2))
                sel = (jax.lax.broadcasted_iota(jnp.int32, (twoK, 1), 0)
                       == part * K + k).astype(jnp.float32)
                gk = jnp.dot(g_ref[...], sel,
                             preferred_element_type=jnp.float32)
                acc_ref[...] = acc_ref[...] + gk * sl
                return carry

            jax.lax.fori_loop(0, K, body, 0)

        _accumulate(wr, 0)
        _accumulate(wi, 1)
        # decimate via the static selection matmul, then apply the
        # per-channel NCO twiddle IN-KERNEL (saves a full read+write
        # pass over the IF-rate array): ang = base[c, block] + om_d*jj
        for b in range(n_out // bs):
            ob = jnp.dot(acc_ref[:, b * bs * D:(b + 1) * bs * D],
                         s0_ref[...],
                         preferred_element_type=jnp.float32)  # [2C, bs]
            jj = jax.lax.broadcasted_iota(jnp.int32, (C, bs),
                                          1).astype(jnp.float32)
            ang = base_ref[:, b:b + 1] + om_ref[...] * jj     # [C, bs]
            cr = jnp.cos(ang)
            si = jnp.sin(ang)
            re = ob[:C]
            im = ob[C:]
            o_ref[0:C, b * bs:(b + 1) * bs] = re * cr - im * si
            o_ref[C:2 * C, b * bs:(b + 1) * bs] = re * si + im * cr


def fused_mix_decim_planes(xf: jnp.ndarray, g: jnp.ndarray, D: int,
                           om_col: jnp.ndarray, base: jnp.ndarray,
                           m_pad_out: int, head_pad: int,
                           tail: jnp.ndarray, tile: int = 256,
                           rows: int = 8,
                           interpret: bool = False) -> jnp.ndarray:
    """Plane-protocol fused mix+decim stage with in-kernel twiddle.

    xf: flat [2*Lp] float32 (re plane | im plane), data at column pad_k
    of each plane.  g: [2C, 2K] packed channel taps (fused_frontend
    layout).  om_col: [C, 1] per-channel decimated-rate omega; base:
    [C, (n_super+1)*nb] per-(super-tile, bs-block) carrier phases
    (column i*nb+b = phase at decimated index (i-1)*sup + b*bs; row 0
    garbage).  Returns [2C, sup + m_pad_out] planes (re rows [0:C]).
    """
    twoC, twoK = g.shape
    K = twoK // 2
    C = twoC // 2
    assert C % CB == 0, C
    Lp = xf.shape[-1] // 2
    pad_k = ((K - 1 + ALIGN - 1) // ALIGN) * ALIGN
    sup = rows * tile
    bs = 256
    assert sup % bs == 0
    nb = sup // bs
    assert m_pad_out % sup == 0, (m_pad_out, sup)
    n_super = m_pad_out // sup
    assert base.shape == (C, (n_super + 1) * nb), (base.shape, n_super)
    # Mosaic block last-dims must be 128-divisible (or full): stride the
    # per-super-tile base phases out to 128-lane blocks
    if nb != 128:
        base = jnp.pad(base.reshape(C, n_super + 1, nb),
                       ((0, 0), (0, 0), (0, 128 - nb))
                       ).reshape(C, (n_super + 1) * 128)
    assert m_pad_out * D + pad_k <= Lp, (m_pad_out, D, pad_k, Lp)
    assert head_pad % 128 == 0 and head_pad <= sup, (head_pad, sup)
    s0 = np.zeros((bs * D, bs), np.float32)
    s0[np.arange(bs) * D, np.arange(bs)] = 1.0
    kern = functools.partial(_fused_mix_planes_kernel, K=K, D=D,
                             pad_k=pad_k, Lp=Lp, n_out=sup, bs=bs,
                             C=C, head_pad=head_pad)
    out = costed_pallas_call(
        kern,
        grid=(n_super + 1,),
        flops=int(n_super * (2 * twoK * twoC * sup * D
                             + 2 * twoC * sup * D * bs)),
        # in-kernel DMA (i > 0 steps only): re + im windows
        manual_bytes=int(n_super * 2 * (sup * D + pad_k) * 4),
        transcendentals=int(n_super * 2 * C * sup),
        label="fused_mix_planes",
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((twoC, twoK), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bs * D, bs), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 128), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((twoC, head_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((twoC, sup), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((twoC, (n_super + 1) * sup),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((sup * D + pad_k,), jnp.float32),
            pltpu.VMEM((sup * D + pad_k,), jnp.float32),
            pltpu.VMEM((twoC, sup * D), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xf, g, jnp.asarray(s0), om_col.astype(jnp.float32),
      base.astype(jnp.float32), tail.astype(jnp.float32))
    return out
