"""Spectrum FFT as a single-pass pallas kernel (4-step matmul FFT).

XLA's jnp.fft on TPU lowers a 65536-point FFT to many radix passes,
each a full HBM round-trip — measured ~11.5 MB of traffic per 524 kB
frame (22 passes) in the WFM-8 bench spectrum branch.  For power
spectra the whole pipeline (window → FFT → |X|² → dB) is fused here
into ONE kernel using the row-column (Cooley-Tukey 4-step)
factorization N = N1·N2 with N1 = N2 = √N ≤ 512:

    A[n1, n2] = x[n1·N2 + n2]              (free reshape, row-major)
    B = F_N1 @ (W ∘ A)                     (window + DFT over n1)
    C = B ∘ T_N^(k1·n2)                    (twiddle)
    E[k2, k1] = Σ_n2 F_N2[k2,n2]·C[k1,n2]  (DFT over n2, transposed out)
    X[k1 + N1·k2] = E[k2, k1]              (free reshape)

The input is re/im PLANES [..., 2, N1, N2]: building them from the
complex frames is ONE fused XLA pass that also absorbs the upstream
reshaper slice (the window multiply moves in-kernel, so the previous
separate window and split passes disappear).  All matrices live in
VMEM as re/im planes (complex arithmetic as real MXU matmuls); per
frame the only HBM traffic is the plane read and the f32 dB write.
Do NOT route through ``.view(float32)`` — on TPU it lowers to a
per-element gather (measured 927 B/input-sample).

The dB conversion matches ops/spectrum.SpectrumFFT (reference
iq_frontend.cpp:282): 10·log10(max(|X|²/N², floor)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: supported 4-step factorizations: fft_size -> N1 (N2 = size // N1;
#: 1024 uses the rectangular 8x128 split so the lane dim stays wide)
_SQUARE = {1024: 8, 4096: 64, 16384: 128, 65536: 256, 262144: 512}


def fft_pow_pallas_ok(fft_size: int) -> bool:
    return (jax.default_backend() not in ("cpu",)
            and fft_size in _SQUARE)


def _dft_mats(n, m, denom):
    """e^{-2πj·r·c/denom} planes generated IN-KERNEL: the six
    [≤512, ≤512] DFT/twiddle matrices were ~1.8 MB of per-call HBM
    operands (7.5 B/in-sample at the bench spectrum config); as
    iota→mod→trig VPU work (~0.4 Mops/frame vs the FFT's 268 Mflops)
    they cost nothing.  The r·c product is reduced mod ``denom`` in
    EXACT int32 first, so the f32 angle is < 2π and the matrices match
    the float64-precomputed ones to f32 rounding."""
    r = jax.lax.broadcasted_iota(jnp.int32, (n, m), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, m), 1)
    p = jax.lax.rem(r * c, jnp.int32(denom))
    ang = p.astype(jnp.float32) * jnp.float32(-2.0 * np.pi / denom)
    return jnp.cos(ang), jnp.sin(ang)


def _fft_pow_kernel(xr_ref, xi_ref, w_ref, o_ref, *, N1, N2,
                    inv_n2, floor, windowed):
    f1r, f1i = _dft_mats(N1, N1, N1)
    twr, twi = _dft_mats(N1, N2, N1 * N2)
    f2r, f2i = _dft_mats(N2, N2, N2)
    # planes may arrive in the bf16 handoff storage dtype; math is f32
    ar = xr_ref[0].astype(jnp.float32)
    ai = xi_ref[0].astype(jnp.float32)
    if windowed:
        ar = ar * w_ref[...]
        ai = ai * w_ref[...]
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    br = dot(f1r, ar) - dot(f1i, ai)
    bi = dot(f1r, ai) + dot(f1i, ar)
    cr = br * twr - bi * twi
    ci = br * twi + bi * twr
    # E[k2, k1] = Σ_n2 F2[k2, n2] · C[k1, n2]  (contract both on axis 1)
    dg = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    er = dg(f2r, cr) - dg(f2i, ci)
    ei = dg(f2r, ci) + dg(f2i, cr)
    p = (er * er + ei * ei) * inv_n2
    db = (10.0 / np.log(10.0)) * jnp.log(jnp.maximum(p, floor))
    if N1 >= 128:
        o_ref[0] = db            # (N2, N1): minor ≥ 128, flat == k
        return
    # E is [k2, k1] (flat row-major == natural bin order k = k2·N1+k1).
    # A minor dim N1 < 128 pays a 128/N1-padded physical layout (16× at
    # fft=1024 — 64 HBM B/in-sample at the channelizer-64 spectrum
    # branch), and Mosaic cannot reshape (N2, N1)→(R, 128) in VMEM, so
    # regroup with one-hot matmuls into natural (fft//128, 128) rows:
    #   out[r, N1·j + k1] = db[q·r + j, k1],  q = 128//N1
    n = N1 * N2
    R = n // 128
    q = 128 // N1
    ri = jax.lax.broadcasted_iota(jnp.int32, (R, N2), 0)
    ii = jax.lax.broadcasted_iota(jnp.int32, (R, N2), 1)
    M1 = ((ii >= q * ri) & (ii < q * (ri + 1))).astype(jnp.float32)
    i2 = jax.lax.broadcasted_iota(jnp.int32, (N2, 128), 0)
    c2 = jax.lax.broadcasted_iota(jnp.int32, (N2, 128), 1)
    cbase = N1 * jax.lax.rem(i2, jnp.int32(q))
    acc = jnp.zeros((R, 128), jnp.float32)
    for k1 in range(N1):
        u = (jax.lax.broadcasted_iota(jnp.int32, (N1, 1), 0)
             == k1).astype(jnp.float32)
        e = jnp.dot(db, u, preferred_element_type=jnp.float32)  # (N2,1)
        M2 = (c2 == cbase + k1).astype(jnp.float32)
        acc = acc + jnp.dot(M1, e * M2,
                            preferred_element_type=jnp.float32)
    o_ref[0] = acc


def fft_power_db(x: jnp.ndarray, fft_size: int,
                 floor_db: float = -300.0,
                 window: np.ndarray | None = None,
                 interpret: bool = False) -> jnp.ndarray:
    """x: [..., F, fft_size] complex64 frames → [..., F, fft_size]
    float32 dB power, natural FFT bin order.  ``window`` (length
    fft_size, may embed the (−1)^i fftshift) is applied in-kernel."""
    lead = x.shape[:-1]
    # TWO separate plane operands: complex64 is stored SoA on TPU, so
    # real()/imag() are near-free views, while stack/concat into one
    # array is a 4 MB relayout (measured) — never merge the planes
    return fft_power_db_planes(
        jnp.real(x).astype(jnp.float32), jnp.imag(x).astype(jnp.float32),
        fft_size, floor_db, window=window,
        interpret=interpret).reshape(lead + (fft_size,))


def fft_power_db_planes(xr: jnp.ndarray, xi: jnp.ndarray, fft_size: int,
                        floor_db: float = -300.0,
                        window: np.ndarray | None = None,
                        interpret: bool = False) -> jnp.ndarray:
    """Plane-input variant: xr/xi [..., F, fft_size] float32 →
    [..., F, fft_size] dB power.  Callers that already hold (or can
    cheaply slice) re/im planes use this directly so the frame framing
    (reshaper keep/skip slice) fuses into the ONE plane-extraction pass
    feeding the kernel instead of materializing complex frames first
    (measured 24.8 → ~9 HBM B/in-sample at the bench spectrum branch)."""
    N1 = _SQUARE[fft_size]
    N2 = fft_size // N1
    if xr.shape[-2:] == (N1, N2):       # caller pre-tiled (fused slice)
        lead = xr.shape[:-2]
    else:
        lead = xr.shape[:-1]
    F = int(np.prod(lead)) if lead else 1
    xr = xr.reshape(F, N1, N2)
    xi = xi.reshape(F, N1, N2)
    if window is not None:
        w2 = jnp.asarray(np.asarray(window, np.float32)
                         .reshape(N1, N2))
    else:
        w2 = jnp.ones((1, 1), jnp.float32)  # unused placeholder
    kern = functools.partial(
        _fft_pow_kernel, N1=N1, N2=N2,
        inv_n2=1.0 / float(fft_size) ** 2,
        floor=10.0 ** (floor_db / 10.0), windowed=window is not None)
    oshape = (N2, N1) if N1 >= 128 else (fft_size // 128, 128)
    regroup = 0 if N1 >= 128 else \
        N1 * (2 * N2 * N1 + 2 * (fft_size // 128) * N2 * 128)

    def _const(shape):
        return pl.BlockSpec(shape, lambda f: (0,) * len(shape),
                            memory_space=pltpu.VMEM)
    from .pallas_cost import costed_pallas_call
    out = costed_pallas_call(
        kern,
        grid=(F,),
        flops=int(F * (fft_tile_flops(N1, N2) + regroup)),
        transcendentals=int(F * (fft_size
                                 + 2 * (N1 * N1 + N1 * N2 + N2 * N2))),
        label="fft_power_db",
        in_specs=[pl.BlockSpec((1, N1, N2), lambda f: (f, 0, 0),
                               memory_space=pltpu.VMEM)] * 2
        + [_const(w2.shape)],
        out_specs=pl.BlockSpec((1,) + oshape, lambda f: (f, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((F,) + oshape, jnp.float32),
        interpret=interpret,
    )(xr, xi, w2)
    # flat index is the natural bin order k = k2·N1 + k1 (see kernel)
    return out.reshape(lead + (fft_size,))


def _dft_n1_split(ar, ai, N1, m):
    """DFT over the N1 row axis as a DIT split N1 = m·128: shared
    128-point matmul DFT + DFT-m butterflies (m ∈ {2, 4}).  Rows
    n1 = m·c + a gather for free as a sublane reshape; output blocks
    k1 = k̄ + 128·s concatenate in natural order.  Cuts the N1-stage
    MACs by N1/128 (the 65536 spectrum's F1 was the WFM-8 headline's
    flop floor once the spectrum fused into the front-end kernel)."""
    n2 = ar.shape[-1]
    L = N1 // m                                   # 128
    # [N1, n2] -> [c, a, n2] (n1 = m·c + a) -> contract c
    xr = ar.reshape(L, m * n2)
    xi = ai.reshape(L, m * n2)
    fLr, fLi = _dft_mats(L, L, L)
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    yr = dot(fLr, xr) - dot(fLi, xi)              # [L, m·n2]
    yi = dot(fLr, xi) + dot(fLi, xr)
    yr = yr.reshape(L, m, n2)
    yi = yi.reshape(L, m, n2)
    # twiddle w_N1^{k̄·a}
    # twiddle w_N1^{k̄·a} computed from iotas (pallas kernels may not
    # capture host constants; two [L, m, n2] transcendentals are noise
    # next to the matmuls)
    kk = jax.lax.broadcasted_iota(jnp.int32, (L, m, 1), 0)
    aa = jax.lax.broadcasted_iota(jnp.int32, (L, m, 1), 1)
    ang = jnp.float32(-2.0 * np.pi / N1) * (kk * aa).astype(jnp.float32)
    twr = jnp.cos(ang)
    twi = jnp.sin(ang)
    tr = yr * twr - yi * twi
    ti = yr * twi + yi * twr
    # DFT-m butterflies over a, output block s: X[k̄ + L·s]
    outs_r, outs_i = [], []
    for ss in range(m):
        acc_r = jnp.zeros((L, n2), jnp.float32)
        acc_i = jnp.zeros((L, n2), jnp.float32)
        for a in range(m):
            th = -2.0 * np.pi * ss * a / m
            cr, ci = float(np.cos(th)), float(np.sin(th))
            ra, ia = tr[:, a, :], ti[:, a, :]
            if abs(cr - 1.0) < 1e-12 and abs(ci) < 1e-12:
                acc_r, acc_i = acc_r + ra, acc_i + ia
            elif abs(cr + 1.0) < 1e-12 and abs(ci) < 1e-12:
                acc_r, acc_i = acc_r - ra, acc_i - ia
            elif abs(cr) < 1e-12 and abs(ci + 1.0) < 1e-12:   # −j
                acc_r, acc_i = acc_r + ia, acc_i - ra
            elif abs(cr) < 1e-12 and abs(ci - 1.0) < 1e-12:   # +j
                acc_r, acc_i = acc_r - ia, acc_i + ra
            else:
                acc_r = acc_r + cr * ra - ci * ia
                acc_i = acc_i + cr * ia + ci * ra
        outs_r.append(acc_r)
        outs_i.append(acc_i)
    return (jnp.concatenate(outs_r, axis=0),
            jnp.concatenate(outs_i, axis=0))


def fft_tile_flops(N1: int, N2: int) -> int:
    """Real MACs of fft_pow_db_tile: N1-stage (split when N1 = m·128,
    m ∈ {2,4}) + N1×N2 twiddle + N2-stage."""
    n1c = 128 if (N1 > 128 and N1 % 128 == 0 and N1 // 128 in (2, 4)) \
        else N1
    return 8 * N1 * N2 * (n1c + N2) + 6 * N1 * N2


def fft_pow_db_tile(ar: jnp.ndarray, ai: jnp.ndarray, N1: int, N2: int,
                    inv_n2: float, floor: float) -> jnp.ndarray:
    """The rectangular (N1, N2) 4-step power-dB FFT on VMEM values —
    shared by the standalone spectrum kernels and the fused mono
    front end (windowing is the caller's job)."""
    twr, twi = _dft_mats(N1, N2, N1 * N2)
    f2r, f2i = _dft_mats(N2, N2, N2)
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    if N1 > 128 and N1 % 128 == 0 and N1 // 128 in (2, 4):
        br, bi = _dft_n1_split(ar, ai, N1, N1 // 128)
    else:
        f1r, f1i = _dft_mats(N1, N1, N1)
        br = dot(f1r, ar) - dot(f1i, ai)
        bi = dot(f1r, ai) + dot(f1i, ar)
    cr = br * twr - bi * twi
    ci = br * twi + bi * twr
    dg = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    er = dg(f2r, cr) - dg(f2i, ci)
    ei = dg(f2r, ci) + dg(f2i, cr)
    p2 = (er * er + ei * ei) * inv_n2
    return (10.0 / np.log(10.0)) * jnp.log(jnp.maximum(p2, floor))


def _fft_pow_frames_kernel(xr2_ref, xi2_ref, w_ref, o_ref,
                           wvr, wvi, sem_r, sem_i, *,
                           N1, N2, keep, interval, inv_n2, floor,
                           windowed):
    """Per-frame in-kernel framing: DMA the frame's rows straight from
    the [T/128, 128] bitcast planes (ANY space) at a 1024-aligned
    start, then the rectangular (fft//128, 128) 4-step power FFT."""
    f = pl.program_id(0)
    kr = keep // N2                        # rows holding real samples
    if kr < N1:                            # zero-pad region (keep<fft)
        z = jnp.zeros((N1 - kr, N2), jnp.float32)
        wvr[pl.ds(kr, N1 - kr), :] = z
        wvi[pl.ds(kr, N1 - kr), :] = z
    p = (f * interval + (1024 - 1)) // 1024 * 1024
    row = pl.multiple_of(p // N2, 8)
    cp_r = pltpu.make_async_copy(
        xr2_ref.at[pl.ds(row, kr), :], wvr.at[pl.ds(0, kr), :], sem_r)
    cp_i = pltpu.make_async_copy(
        xi2_ref.at[pl.ds(row, kr), :], wvi.at[pl.ds(0, kr), :], sem_i)
    cp_r.start()
    cp_i.start()
    cp_r.wait()
    cp_i.wait()

    ar = wvr[...]
    ai = wvi[...]
    if windowed:
        ar = ar * w_ref[...]
        ai = ai * w_ref[...]
    o_ref[0] = fft_pow_db_tile(ar, ai, N1, N2, inv_n2, floor)


#: spectrum-frame kernel needs the full F_N1 DFT pair in VMEM:
#: N1 = fft//128 ≤ 512 keeps them ≤ 2 MB
_FRAMES_MAX_FFT = 65536


def spectrum_frames_ok(fft_size: int, keep: int, interval: int,
                       T: int, n: int) -> bool:
    return (jax.default_backend() not in ("cpu",)
            and 1024 <= fft_size <= _FRAMES_MAX_FFT
            and fft_size % 128 == 0 and keep % 128 == 0
            and T % 128 == 0
            and ((n - 1) * interval + 1023) // 1024 * 1024 + keep <= T)


def spectrum_frames_db(xr: jnp.ndarray, xi: jnp.ndarray, keep: int,
                       interval: int, fft_size: int, floor_db: float,
                       window: np.ndarray | None,
                       interpret: bool = False) -> jnp.ndarray:
    """1-D plane feed variant with IN-KERNEL framing: frame f covers
    [rup(f·interval, 1024), +keep) — a ≤1023-sample (display-frame)
    shift versus the reshaper's f·interval start, in exchange for
    reading each frame's samples exactly once by aligned DMA from the
    planes' free [T/128, 128] bitcast (no full-plane staging copy, no
    materialized frame slices; measured ~25 B/in-sample of XLA glue at
    the WFM-8 bench config).  Callers guard with spectrum_frames_ok."""
    T = xr.shape[-1]
    n = T // interval
    N2 = 128
    N1 = fft_size // N2
    pad = fft_size - keep
    xr2 = xr.reshape(-1, N2)               # free bitcast (layout-equal)
    xi2 = xi.reshape(-1, N2)
    if window is not None:
        w_full = (np.concatenate([window, np.zeros(pad, np.float32)])
                  if pad else np.asarray(window, np.float32))
        w2 = jnp.asarray(w_full.reshape(N1, N2))
    else:
        w2 = jnp.ones((1, 1), jnp.float32)
    kern = functools.partial(
        _fft_pow_frames_kernel, N1=N1, N2=N2, keep=keep,
        interval=interval, inv_n2=1.0 / float(fft_size) ** 2,
        floor=10.0 ** (floor_db / 10.0), windowed=window is not None)
    from .pallas_cost import costed_pallas_call
    out = costed_pallas_call(
        kern,
        grid=(n,),
        flops=int(n * fft_tile_flops(N1, N2)),
        transcendentals=int(n * (fft_size
                                 + 2 * (N1 * N1 + N1 * N2 + N2 * N2))),
        manual_spec=[(2 * 4 * keep, n)],
        label="fft_power_frames",
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(w2.shape, lambda f: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, N2, N1), lambda f: (f, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, N2, N1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((N1, N2), jnp.float32),
                        pltpu.VMEM((N1, N2), jnp.float32),
                        pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(xr2, xi2, w2)
    # E rows are k2 (major), cols k1: flat index k2·N1 + k1 == k  ✓
    return out.reshape(n, fft_size)


def spectrum_path_db(x: jnp.ndarray, keep: int, interval: int,
                     fft_size: int, floor_db: float,
                     window: np.ndarray,
                     interpret: bool = False) -> jnp.ndarray:
    """Fused reshaper + windowed power FFT: wideband complex x
    [..., T] (T a multiple of ``interval``) → [..., T//interval,
    fft_size] dB spectra.  The keep/skip framing slice, the re/im
    split and the zero-pad all land in one XLA pass per plane feeding
    fft_power_db_planes."""
    in_planes = isinstance(x, tuple)
    x0 = x[0] if in_planes else x
    T = x0.shape[-1]
    n = T // interval
    lead = x0.shape[:-1]
    pad = fft_size - keep
    N1 = _SQUARE[fft_size]
    N2 = fft_size // N1

    # per-frame lax.slice beats reshape[..., :keep]: XLA fuses the
    # flat slice + real/imag + pad + (N1, N2) retile into one pass per
    # plane, while the 2-D strided-slice form first materializes a
    # FULL-length real(x) copy (measured 16.75 vs 13.11 B/in-sample
    # per plane at the bench config)
    def frames_of(p):
        if lead:                          # batched wideband: per row
            pf = p.reshape(-1, T)
            frs = [pf[:, None, f * interval:f * interval + keep]
                   for f in range(n)]
            return (jnp.concatenate(frs, 1) if n > 1
                    else frs[0]).reshape(-1, keep)
        frs = [jax.lax.slice(p, (f * interval,),
                             (f * interval + keep,))[None]
               for f in range(n)]
        return jnp.concatenate(frs, 0) if n > 1 else frs[0]

    def planes(p):
        if pad:
            p = jnp.pad(p, [(0, 0), (0, pad)])
        # emit [.., N1, N2] directly: the keep/skip slice and the
        # 2-D retiling fuse into ONE copy (a flat [F, fft] operand
        # would be re-tiled by a SECOND relayout inside the kernel
        # call — measured +27 B/in-sample at the bench config)
        nf = p.shape[0]
        return p.reshape(nf, N1, N2).astype(jnp.float32)

    w_full = (np.concatenate([window, np.zeros(pad, np.float32)])
              if pad else window)
    if in_planes:
        pr, pi = planes(frames_of(x[0])), planes(frames_of(x[1]))
    else:
        fr = frames_of(x)
        pr, pi = planes(jnp.real(fr)), planes(jnp.imag(fr))
    db = fft_power_db_planes(pr, pi, fft_size, floor_db, window=w_full,
                             interpret=interpret)
    return db.reshape(lead + (T // interval, fft_size))
