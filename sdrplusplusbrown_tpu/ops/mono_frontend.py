"""Monolithic shared VFO front end: the WHOLE decimation chain in one
pallas kernel, rolling inter-stage state in VMEM scratch.

The plane-protocol pipeline (ops/plane_frontend.py) already removed the
per-stage glue, but each stage still round-trips its output through
HBM: measured ~190 B/in-sample for the WFM-8 front end where the
irreducible traffic is the wideband read (~9 B) plus the final IF-rate
write (~13 B).  This kernel chains every stage inside one grid:

  grid = (n_super,), executed SEQUENTIALLY (dimension_semantics
  "arbitrary"); VMEM scratch persists across steps, so each stage's
  buffer carries its own overlap-save history from step i-1 to step i
  (copied in-VMEM — the context never touches HBM).  Step i DMAs one
  aligned wideband window, runs mix+decimate (+ in-kernel NCO twiddle),
  then every chained decimator / polyphase / bandwidth-FIR stage as
  banded matmuls between scratch buffers, and writes ONLY the final
  IF-rate planes.

Per-call HBM traffic: input planes once, output planes once, tap
matrices once, plus a [2C, 512]-per-stage tail extract — everything
else lives in VMEM.

State compatibility: consumes and produces the standard
SharedRxVFOBank state dict (fused tail/phase + per-stage complex
tails), so the mono, plane-chained and per-stage paths are freely
interchangeable (checkpoints, sharding rules, equality tests).

reference behavior: channel/rx_vfo.h:89-121 (xlate -> rational
resampler -> bandwidth FIR); the fusion algebra is documented in
ops/fused_frontend.py.
"""

from __future__ import annotations

import functools
from math import gcd
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .xlator import advance_phase, _TWO_PI

ALIGN1D = 1024       # 1-D f32 plane DMA offset granularity
BS = 256             # twiddle/selection block (matches plane pipeline)
SUP_SPAN = 2048      # omega_dec_sup span baked into fused params
MAX_ADVX = 1 << 18   # cap on full-rate samples per grid step
MIN_ADVX = 8192      # amortize the per-step DMA


def _rup(n: int, a: int) -> int:
    return ((n + a - 1) // a) * a


class _MonoStage:
    """Static config for one chained stage (decim FIR or polyphase)."""

    def __init__(self, **kw):
        self.__dict__.update(kw)


def _solve_geometry(stages_raw, D0: int):
    """Pick the per-grid-step output advance ``adv_f`` and per-stage
    advances so that every stage's inner loop count is integral, every
    scratch store offset is 128-aligned, the fused stage's decimated
    advance is a BS multiple, and the full-rate input advance is
    1024-aligned.  Returns (adv list INCLUDING adv0 at index 0, adv_x)
    or None."""
    for k in range(1, 4097):
        adv_f = 128 * k
        advs = [adv_f]
        ok = True
        for st in reversed(stages_raw):          # walk toward the input
            a = advs[0]
            if a % st["tile"]:
                ok = False
                break
            if st["kind"] == "poly":
                if a % st["interp"]:
                    ok = False
                    break
                a = a * st["decim"] // st["interp"]
            else:
                a = a * st["D"]
            if a % 128:
                ok = False
                break
            advs.insert(0, a)
        if not ok:
            continue
        adv0 = advs[0]
        adv_x = adv0 * D0
        if adv0 % BS or adv_x % ALIGN1D:
            continue
        if adv_x < MIN_ADVX:
            continue
        if adv_x > MAX_ADVX:
            return None
        return advs, adv_x
    return None


def _tail_planes(tail_c: jnp.ndarray, pad_k: int,
                 dtype=jnp.float32) -> jnp.ndarray:
    """[C, hist] complex -> [2C, pad_k] planes, left zero-padded
    (``dtype``: the kernel-handoff storage dtype — per-block state
    tails are the same precision class as the raw IF handoff)."""
    hist = tail_c.shape[-1]
    p = jnp.concatenate([jnp.real(tail_c), jnp.imag(tail_c)],
                        axis=0).astype(dtype)
    if hist < pad_k:
        p = jnp.pad(p, ((0, 0), (pad_k - hist, 0)))
    return p


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

def _mono_kernel(*refs, cfg):
    """refs = [xr_hbm, xi_hbm, edges, h0, om, base,
               tail_1..tail_n, H_1..H_n, y_out, tails_out,
               wr, wi, mbuf, buf_1..buf_n, sem_r, sem_i].

    ``xr_hbm``/``xi_hbm`` are the caller's float32 planes, UNPADDED —
    the first/last grid steps handle the edges in-kernel (edges block
    holds zeros + the carried inter-call tail; the last window's
    off-the-end region is zero-filled before its shorter DMA), so no
    host-side concat/pad pass over the wideband ever materializes."""
    n = len(cfg["stages"])
    it = iter(refs)
    xr_hbm = next(it)
    xi_hbm = next(it)
    edges_ref = next(it)
    h0_ref = next(it)
    om_ref = next(it)
    base_ref = next(it)
    tail_refs = [next(it) for _ in range(n)]
    h_refs = [[next(it) for _ in range(len(st.h_shapes))]
              for st in cfg["stages"]]
    sp = cfg.get("spec")
    if sp is not None:
        w_ref = next(it)      # appended after the tap operands
    o_ref = next(it)
    tails_o = next(it)
    spec_o = next(it) if sp is not None else None
    wr = next(it)
    wi = next(it)
    mbuf = next(it)
    bufs = [next(it) for _ in range(n)]
    if sp is not None:
        fvr = next(it)
        fvi = next(it)
    sem_r = next(it)
    sem_i = next(it)

    i = pl.program_id(0)
    C = cfg["C"]
    twoC = 2 * C
    K0, D0 = cfg["K0"], cfg["D0"]
    head0, adv_x = cfg["head0"], cfg["adv_x"]
    adv0 = cfg["adv0"]
    n_chunks = cfg["n_chunks"]
    CH = adv0 // n_chunks                 # decimated outputs per chunk
    CHX = CH * D0
    nb = adv0 // BS
    stages = cfg["stages"]

    # ---- roll per-stage context (VMEM only) ---------------------------
    for s, st in enumerate(stages):
        hp = st.hist_pad

        @pl.when(i == 0)
        def _init(s=s, hp=hp):
            bufs[s][:, :hp] = tail_refs[s][...].astype(jnp.float32)

        @pl.when(i > 0)
        def _roll(s=s, hp=hp, st=st):
            bufs[s][:, :hp] = bufs[s][:, st.adv_in:st.adv_in + hp]

    # ---- DMA the wideband window --------------------------------------
    # window i covers plane positions [i*adv_x - head0, i*adv_x + adv_x).
    # The head0 overlap between consecutive windows is ROLLED inside
    # VMEM (never re-read from the planes), so every input float is
    # DMA'd exactly once; the carried inter-call tail arrives through
    # the prepad block.  All DMA offsets are ALIGN1D-multiples (adv_x
    # is rounded by _solve_geometry, head0 == ALIGN1D) and are marked
    # with pl.multiple_of so Mosaic can PROVE the (1024)-tiled slices
    # legal — the r3 WIP form read at i*adv_x - head0 without the hint
    # and was rejected ("tile index … divisible by the tiling (1024)").
    ns = cfg["n_super_k"]
    Tv = cfg["T_valid"]
    last = ns - 1
    # fresh floats in the last window (clamped: flooring in the m-chain
    # can leave a few never-consumed inputs past ns*adv_x)
    rem2 = min(Tv - last * adv_x, adv_x)
    # Mosaic requires DMA slice SIZES 1024-aligned too: the last
    # window DMAs only its aligned part; the sub-ALIGN1D fragment
    # (zero-padded to one tile) rides in edges_ref rows 2:4.
    rem_al = rem2 // ALIGN1D * ALIGN1D

    def _dma(src_off, size):
        cp_r = pltpu.make_async_copy(
            xr_hbm.at[pl.ds(src_off, size)],
            wr.at[pl.ds(head0, size)], sem_r)
        cp_i = pltpu.make_async_copy(
            xi_hbm.at[pl.ds(src_off, size)],
            wi.at[pl.ds(head0, size)], sem_i)
        cp_r.start()
        cp_i.start()
        cp_r.wait()
        cp_i.wait()

    def _tail_frag():
        if rem_al < rem2:
            wr[pl.ds(head0 + rem_al, ALIGN1D)] = edges_ref[2, :]
            wi[pl.ds(head0 + rem_al, ALIGN1D)] = edges_ref[3, :]

    if ns == 1:
        # single window: scratch is uninitialized past the valid input;
        # zero the whole buffers first (NaN bit patterns in fresh VMEM
        # would poison valid banded-matmul outputs via 0·NaN)
        z = jnp.zeros((head0 + adv_x,), jnp.float32)
        wr[...] = z
        wi[...] = z
        wr[pl.ds(0, head0)] = edges_ref[0, :]
        wi[pl.ds(0, head0)] = edges_ref[1, :]
        if rem_al:
            _dma(0, rem_al)
        _tail_frag()
    else:
        @pl.when(i == 0)
        def _first():
            wr[pl.ds(0, head0)] = edges_ref[0, :]
            wi[pl.ds(0, head0)] = edges_ref[1, :]

        @pl.when(i > 0)
        def _roll_w():
            wr[pl.ds(0, head0)] = wr[pl.ds(adv_x, head0)]
            wi[pl.ds(0, head0)] = wi[pl.ds(adv_x, head0)]

        if rem2 == adv_x:
            _dma(pl.multiple_of(i * adv_x, ALIGN1D), adv_x)
        else:
            # past-the-end region of the last window keeps the previous
            # window's (finite) samples — every VALID output column and
            # carried tail reads only positions before the end-of-input
            # (plan geometry), so no zero-fill pass is needed
            @pl.when(i < last)
            def _mid():
                _dma(pl.multiple_of(i * adv_x, ALIGN1D), adv_x)

            @pl.when(i == last)
            def _last():
                if rem_al:
                    _dma(last * adv_x, rem_al)
                _tail_frag()

    # ---- stage 0: full-rate mix (VPU) + static banded decim (MXU) -----
    # mixed[t] = w[t]·e^{jθ(t)},  θ(t) = φ0 − ω(K0−1) + ω·(i·adv_x −
    # head0 + t)  — the per-channel NCO lives ENTIRELY in the mix
    # phase, so the decimating FIR taps are channel-independent and the
    # stage runs as the SAME static toeplitz banded matmul the chained
    # stages use.  This replaces the r3 one-hot full-rate accumulate +
    # selection-matmul + decimated twiddle (which computed the
    # correlation at FULL rate and threw 1−1/D0 of it away):
    # ~27.6k → ~6.6k flops/in-sample for the WFM-8 geometry, and the
    # filtering work lands on the MXU instead of K0 VPU passes.
    # Equivalence (fused_frontend.py algebra):
    #   Σ_k h[k]·x[mD+k]·e^{jθ(mD+k)} = e^{j(φ0+ω(mD−(K0−1)))}
    #                                   · Σ_k h[k]e^{jωk}·x[mD+k].
    off = head0 - (K0 - 1)
    hp1 = stages[0].hist_pad
    Lw0 = cfg["Lw0"]
    row0 = 128 * D0
    MB = ALIGN1D                          # mix block lanes
    nbw = (head0 + CHX) // MB             # mix blocks per chunk window

    for c in range(n_chunks):
        # mix wr/wi[c·CHX .. c·CHX + head0 + CHX) into mbuf
        for b in range(nbw):
            t0 = c * CHX + b * MB
            u = t0 // MB                  # window block (base_ref lane)
            jj = jax.lax.broadcasted_iota(jnp.int32, (C, MB), 1) \
                .astype(jnp.float32)
            ang = base_ref[:, u:u + 1] + om_ref[...] * jj
            cr = jnp.cos(ang)
            si = jnp.sin(ang)
            xrb = wr[pl.ds(t0, MB)][None, :]
            xib = wi[pl.ds(t0, MB)][None, :]
            mbuf[0:C, b * MB:(b + 1) * MB] = xrb * cr - xib * si
            mbuf[C:twoC, b * MB:(b + 1) * MB] = xrb * si + xib * cr
        # static banded decim matmul: [2C, Lw0] × [Lw0, 128] per tile
        for r in range(CH // 128):
            win = mbuf[:, off + r * row0:off + r * row0 + Lw0]
            col = hp1 + c * CH + r * 128
            bufs[0][:, col:col + 128] = jnp.dot(
                win, h0_ref[...].astype(jnp.float32),
                preferred_element_type=jnp.float32)

    # ---- chained stages -----------------------------------------------
    def _store(dst, dst_hp, col, width, res):
        if dst is not None:
            dst[:, dst_hp + col:dst_hp + col + width] = res
        else:
            if cfg["out_bf16"]:
                res = res.astype(jnp.bfloat16)
            o_ref[:, col:col + width] = res

    for s, st in enumerate(stages):
        dst = bufs[s + 1] if s + 1 < len(stages) else None
        dst_hp = stages[s + 1].hist_pad if s + 1 < len(stages) else 0
        for r in range(st.adv_out // st.tile):
            base = st.win0 + r * st.row_adv
            if st.h_offs is not None:
                # chunked polyphase: one narrow banded dot per 128
                # output columns (each chunk's window covers exactly
                # the input band those columns touch)
                for q, qoff in enumerate(st.h_offs):
                    Lwq = st.h_shapes[q][0]
                    win = bufs[s][:, base + qoff:base + qoff + Lwq]
                    res = jnp.dot(
                        win, h_refs[s][q][...].astype(jnp.float32),
                        preferred_element_type=jnp.float32)
                    _store(dst, dst_hp, r * st.tile + q * 128, 128, res)
            else:
                win = bufs[s][:, base:base + st.Lw]
                res = jnp.dot(win, h_refs[s][0][...].astype(jnp.float32),
                              preferred_element_type=jnp.float32)
                _store(dst, dst_hp, r * st.tile, st.tile, res)

    # ---- next-call tail extraction ------------------------------------
    for s, st in enumerate(stages):
        @pl.when(i == st.i_tail)
        def _tl(s=s, st=st):
            tails_o[:, st.tail_off:st.tail_off + st.tail_w] = \
                bufs[s][:, st.tail_al:st.tail_al + st.tail_w] \
                .astype(tails_o.dtype)

    # ---- fused spectrum branch (optional) ------------------------------
    # frame segments are copied VMEM->VMEM out of THIS step's wideband
    # window (the planes are already here — the standalone frames
    # kernel re-read them from HBM and forced a [T/128,128] relayout
    # copy of both planes, ~12.4 B/in-sample at the WFM-8 config)
    if sp is not None:
        from .pallas_fft import fft_pow_db_tile
        N1, N2 = sp["N1"], sp["N2"]
        kr = sp["keep"] // N2

        @pl.when(i == 0)
        def _zpad():
            if kr < N1:
                z = jnp.zeros((N1 - kr, N2), jnp.float32)
                fvr[pl.ds(kr, N1 - kr), :] = z
                fvi[pl.ds(kr, N1 - kr), :] = z

        for iw, segs, dones in sp["plan"]:
            @pl.when(i == iw)
            def _fill(segs=segs, dones=dones):
                for (src, dst_row, nrows) in segs:
                    fvr[pl.ds(dst_row, nrows), :] = \
                        wr[pl.ds(head0 + src, nrows * 128)] \
                        .reshape(nrows, 128)
                    fvi[pl.ds(dst_row, nrows), :] = \
                        wi[pl.ds(head0 + src, nrows * 128)] \
                        .reshape(nrows, 128)
                for _f in dones:
                    ar = fvr[...]
                    ai = fvi[...]
                    if sp["windowed"]:
                        ar = ar * w_ref[...]
                        ai = ai * w_ref[...]
                    spec_o[0] = fft_pow_db_tile(
                        ar, ai, N1, N2, sp["inv_n2"], sp["floor"])


# ---------------------------------------------------------------------------
# pipeline wrapper
# ---------------------------------------------------------------------------

class MonoVFOPipeline:
    """Built from a SharedRxVFOBank; ``supported`` is False when the
    chain shape can't use the monolithic kernel (fallback: the chained
    plane pipeline, then the per-stage kernels)."""

    def __init__(self, bank, C: int, interpret: bool = False):
        from .pallas_fir import (toeplitz_taps_decim, banded_poly_matrix,
                                 banded_poly_matrix_chunks)
        self.C = int(C)
        self.interpret = interpret
        self.supported = False
        if bank.fused is None or C % 4 != 0 or not (4 <= C <= 32):
            return
        self.fused_taps = np.asarray(bank.fused.taps, np.float64)
        self.K0 = len(self.fused_taps)
        self.D0 = int(bank.fused.decim)
        if self.K0 > 320:
            return
        blocks = list(bank.rest_decim) + [b for _, b in bank.rest]
        if bank.filter_needed:
            blocks.append(bank.base.fir)
        if not blocks:
            return
        raw = []
        for blk in blocks:
            if hasattr(blk, "interp"):
                kw = blk.kernel.shape[1]
                I, M = int(blk.interp), int(blk.decim)
                mt = 128 // gcd(I, 128)
                raw.append({"kind": "poly", "interp": I, "decim": M,
                            "kw": kw, "mt": mt, "tile": mt * I,
                            "hist": kw - M, "carry": blk.tpp - 1,
                            "blk": blk})
            else:
                if getattr(blk, "_complex_taps", False):
                    return
                K = int(blk.K)
                raw.append({"kind": "decim", "K": K, "D": int(blk.decim),
                            "tile": 128, "hist": K - 1, "carry": K - 1,
                            "blk": blk})
        sol = _solve_geometry(raw, self.D0)
        if sol is None:
            return
        advs, adv_x = sol
        self.adv0, self.adv_x = advs[0], adv_x
        self.adv_f = advs[-1]
        stages: List[_MonoStage] = []
        vmem = 0
        for s, st in enumerate(raw):
            adv_in, adv_out = advs[s], advs[s + 1]
            hist_pad = _rup(max(st["carry"], st["hist"]), 128)
            chunks = None
            if st["kind"] == "poly":
                H = banded_poly_matrix(
                    np.asarray(st["blk"].kernel, np.float32),
                    st["interp"], st["decim"], st["mt"])
                row_adv = st["mt"] * st["decim"]
                Lw = (st["mt"] - 1) * st["decim"] + st["kw"]
                if st["tile"] > 128:
                    # per-128-column chunk matrices: kills the banded
                    # matrix's structural-zero MXU tiles (the named
                    # round-4 flop floor — ~71% of this stage's work
                    # for the WFM 5/6 geometry)
                    chunks = banded_poly_matrix_chunks(
                        np.asarray(st["blk"].kernel, np.float32),
                        st["interp"], st["decim"], st["mt"])
            else:
                H = toeplitz_taps_decim(
                    np.asarray(st["blk"].taps, np.float32),
                    st["tile"], st["D"])
                row_adv = st["tile"] * st["D"]
                Lw = (st["tile"] - 1) * st["D"] + st["K"]
            tail_w = _rup(st["carry"] + 127, 128)
            if hist_pad + adv_in < max(Lw, tail_w):
                return
            stages.append(_MonoStage(
                kind=st["kind"], tile=st["tile"], adv_in=adv_in,
                adv_out=adv_out, hist=st["hist"], carry=st["carry"],
                hist_pad=hist_pad, row_adv=row_adv, Lw=Lw,
                win0=hist_pad - st["hist"], H=H, chunks=chunks,
                tail_w=tail_w, i_tail=0, tail_al=0, tail_off=0))
            vmem += (sum(h.size for _, h in chunks) if chunks
                     else H.size) * 4 \
                + 2 * C * (hist_pad + adv_in) * 4
        # stage-0 chunking bounds the mixed-plane buffer; chunk width
        # must stay ALIGN1D-aligned (the mix blocks read wr at
        # 1024-lane offsets)
        n_chunks = 0
        for d in range(min(16, self.adv0 // BS), 0, -1):
            if (self.adv0 % (BS * d) == 0
                    and BS * d * self.D0 <= 16384
                    and (BS * d * self.D0) % ALIGN1D == 0
                    and (BS * d) % 128 == 0):
                n_chunks = self.adv0 // (BS * d)
                break
        if not n_chunks:
            return
        self.n_chunks = n_chunks
        # static stage-0 banded matrix (channel-independent: the NCO
        # lives in the in-kernel mix phase)
        from .pallas_fir import toeplitz_taps_decim as _ttd
        self.Lw0 = 127 * self.D0 + self.K0
        self.H0 = _ttd(np.asarray(self.fused_taps, np.float32),
                       128, self.D0)
        assert self.H0.shape == (self.Lw0, 128), self.H0.shape
        vmem += (2 * (1024 + adv_x) * 4                    # wr/wi
                 + 2 * C * (ALIGN1D + adv_x // n_chunks) * 4   # mbuf
                 + self.Lw0 * 128 * 4                      # H0
                 + 2 * C * self.adv_f * 4 * 2)             # out blocks
        if vmem > 10 * (1 << 20):
            return
        off_t = 0
        for st in stages:
            st.tail_off = off_t
            off_t += st.tail_w
        self.tails_w_total = off_t
        self.stages = stages
        self.head0 = ALIGN1D
        self._plan_cache = {}
        self.supported = True

    # -- per-block-length plan ------------------------------------------
    def _plan(self, T: int):
        plan = self._plan_cache.get(T)
        if plan is not None:
            return plan
        # exact valid lengths (match the chained pipeline's shapes)
        m = [T // self.D0]
        for st in self.stages:
            if st.kind == "poly":
                assert m[-1] * st.adv_out % st.adv_in == 0, \
                    (m[-1], st.adv_in, st.adv_out)
                m.append(m[-1] * st.adv_out // st.adv_in)
            else:
                m.append(m[-1] // (st.adv_in // st.adv_out))
        n_super = -(-m[-1] // self.adv_f)
        # tail extraction spots: last `carry` VALID inputs of stage s
        # live in buf_s around column hist_pad + m_in - i*adv_in
        tails = []
        for s, st in enumerate(self.stages):
            m_in = m[s]
            i_t = min((m_in - 1) // st.adv_in, n_super - 1)
            end_local = st.hist_pad + m_in - i_t * st.adv_in
            al = max(0, (end_local - st.carry) // 128 * 128)
            al = min(al, st.hist_pad + st.adv_in - st.tail_w)
            assert al >= 0 and al + st.tail_w >= end_local >= st.carry, \
                (s, al, end_local, st.carry)
            tails.append((i_t, al, end_local))
        plan = {"m": m, "n_super": n_super, "tails": tails}
        self._plan_cache[T] = plan
        return plan

    # -- the call ---------------------------------------------------------
    def spectrum_ok(self, T: int, keep: int, interval: int,
                    fft_size: int) -> bool:
        """Can the fused spectrum branch cover this config?  Frames are
        the standalone kernel's (start = rup(f·interval, 1024)); every
        frame must end inside the DMA'd region."""
        if not (1024 <= fft_size <= 65536 and fft_size % 128 == 0
                and keep % 1024 == 0 and keep <= fft_size):
            return False
        plan = self._plan(T)
        n_super = plan["n_super"]
        rem_al = (min(T - (n_super - 1) * self.adv_x, self.adv_x)
                  // ALIGN1D * ALIGN1D)
        n = T // interval
        if n < 1:
            return False
        last_end = ((n - 1) * interval + 1023) // 1024 * 1024 + keep
        return last_end <= (n_super - 1) * self.adv_x + rem_al

    def _spec_plan(self, T: int, keep: int, interval: int):
        """Per-grid-step static copy/complete plan: [(i, segments,
        done_frames)] with segments (src_off_in_window, dst_row,
        n_rows)."""
        n = T // interval
        plan = []
        n_super = self._plan(T)["n_super"]
        for i in range(n_super):
            w0, w1 = i * self.adv_x, (i + 1) * self.adv_x
            segs = []
            dones = []
            for f in range(n):
                p0 = (f * interval + 1023) // 1024 * 1024
                lo, hi = max(p0, w0), min(p0 + keep, w1)
                if lo < hi:
                    segs.append((lo - w0, (lo - p0) // 128,
                                 (hi - lo) // 128))
                if w0 < p0 + keep <= w1:
                    dones.append(f)
            assert len(dones) <= 1, dones
            if segs or dones:
                plan.append((i, tuple(segs), tuple(dones)))
        return tuple(plan), n

    def apply(self, params, state, x, return_planes: bool = False,
              raw: bool = False, spectrum=None):
        """``x``: [T] complex wideband, or (xr, xi) float32 planes —
        the planes form skips the X64Split extraction passes entirely
        (real()/imag() of a c64 array are unfused custom calls on TPU,
        a full read each)."""
        C = self.C
        # bf16 handoff (ops/precision.py) applies only to the RAW
        # kernel-to-kernel buffer; trimmed plane/complex outputs stay
        # f32 for the chained consumers
        from .precision import get_handoff_dtype
        o_dtype = get_handoff_dtype() if raw else jnp.float32
        in_planes = isinstance(x, tuple)
        xr, xi = x if in_planes else (None, None)
        T = (xr if in_planes else x).shape[-1]
        plan = self._plan(T)
        n_super = plan["n_super"]
        K0, D0, head0 = self.K0, self.D0, self.head0

        # the kernel DMAs its windows STRAIGHT from the caller's planes
        # (edge steps handled in-kernel) — the old host-side flat-plane
        # concat was a full wideband HBM pass (write 8 + re-read 8
        # B/in-sample), and on the c64 feed the X64 split custom-calls
        # another ~24; with a (xr, xi) plane feed the wideband is now
        # read EXACTLY ONCE, by the kernel's own DMA
        tail = state["fused"]["tail"]
        off0 = head0 - (K0 - 1)
        if not in_planes:
            xr, xi = jnp.real(x), jnp.imag(x)
        xr = xr.astype(jnp.float32)
        xi = xi.astype(jnp.float32)
        zf = jnp.zeros((off0,), jnp.float32)
        # edges rows 0:2 — the head block (zeros + carried tail);
        # rows 2:4 — the last window's sub-ALIGN1D input fragment
        # (Mosaic DMA sizes must be tile-aligned, so the kernel DMAs
        # only rem_al floats there and stores this block for the rest)
        rem2 = min(T - (n_super - 1) * self.adv_x, self.adv_x)
        rem_al = rem2 // ALIGN1D * ALIGN1D
        fs = (n_super - 1) * self.adv_x + rem_al
        fl = rem2 - rem_al
        zfr = jnp.zeros((ALIGN1D - fl,), jnp.float32)
        edges = jnp.stack([
            jnp.concatenate([zf, jnp.real(tail).astype(jnp.float32)]),
            jnp.concatenate([zf, jnp.imag(tail).astype(jnp.float32)]),
            jnp.concatenate([xr[fs:fs + fl], zfr]),
            jnp.concatenate([xi[fs:fs + fl], zfr]),
        ])

        # per-(window, 1024-lane mix block) base phases: θ(t) = φ_state
        # + ω(i·adv_x − head0 + t) — the −ω(K0−1) tap-alignment shift of
        # the old decimated twiddle is absorbed by the −head0 term
        # (head0 = off0 + (K0−1)); every per-span advance is a host-f64
        # mod-reduced param so f32 never sees a large product
        omega = params["omega"]
        phase0 = jnp.mod(state["fused"]["phase"] + np.pi,
                         _TWO_PI) - np.pi
        a_sup, rem = divmod(self.adv0, SUP_SPAN)
        b_bs = rem // BS
        span_adv = (params["omega_dec_sup"] * a_sup
                    + params["omega_dec_bs"] * b_bs)    # mod(ω·adv_x)
        om_mb = params["omega_mb"]                      # mod(ω·1024)
        nbw_t = (head0 + self.adv_x) // ALIGN1D
        nbw_pad = _rup(nbw_t, 128)
        ii = jnp.arange(n_super, dtype=jnp.float32)
        uu = jnp.arange(nbw_t, dtype=jnp.float32)
        base = (phase0[:, None, None] - om_mb[:, None, None]
                + span_adv[:, None, None] * ii[None, :, None]
                + om_mb[:, None, None] * uu[None, None, :])
        base = jnp.pad(base, ((0, 0), (0, 0), (0, nbw_pad - nbw_t))) \
            .reshape(C, n_super * nbw_pad)

        # tap matrices and state tails ride HBM in the handoff STORAGE
        # dtype (bf16 halves both the operand reads and XLA's per-call
        # constant staging; all matmul math stays f32 — upcast at use).
        # Narrow banks keep f32 tails: at C < 16 the conversion ops cost
        # more than the operand bytes they save (multimode-8 measured
        # −0.7 B/smp worse with bf16 tails).
        h_dt = get_handoff_dtype()
        t_dt = h_dt if C >= 16 else jnp.float32
        tails_c = self._stage_tails(state)
        tail_ops = [_tail_planes(tails_c[s], st.hist_pad, t_dt)
                    for s, st in enumerate(self.stages)]
        h_ops = []
        for st in self.stages:
            if st.chunks is not None:
                h_ops += [jnp.asarray(h, h_dt) for _, h in st.chunks]
            else:
                h_ops.append(jnp.asarray(st.H, h_dt))

        n = len(self.stages)
        twoC = 2 * C
        spec_cfg = None
        n_frames = 0
        w2 = None
        if spectrum is not None:
            keep, interval = spectrum["keep"], spectrum["interval"]
            fft_size = spectrum["fft_size"]
            assert self.spectrum_ok(T, keep, interval, fft_size)
            N2 = 128
            N1 = fft_size // N2
            splan, n_frames = self._spec_plan(T, keep, interval)
            win = spectrum.get("window")
            if win is not None:
                wf = np.concatenate([np.asarray(win, np.float32),
                                     np.zeros(fft_size - keep,
                                              np.float32)])                     if keep < fft_size else np.asarray(win, np.float32)
                w2 = jnp.asarray(wf.reshape(N1, N2))
            else:
                w2 = jnp.ones((1, 1), jnp.float32)
            spec_cfg = {
                "N1": N1, "N2": N2, "keep": keep,
                "windowed": win is not None,
                "inv_n2": 1.0 / float(fft_size) ** 2,
                "floor": 10.0 ** (spectrum.get("floor_db", -200.0)
                                  / 10.0),
                "plan": splan,
            }
        cfg = {
            "spec": spec_cfg,
            "C": C, "K0": K0, "D0": D0, "head0": head0,
            "adv_x": self.adv_x, "adv0": self.adv0,
            "n_chunks": self.n_chunks, "Lw0": self.Lw0,
            "n_super_k": n_super, "T_valid": T,
            "out_bf16": o_dtype == jnp.bfloat16,
            "stages": [
                _MonoStage(**{**st.__dict__, "H": None,
                              "chunks": None,
                              "h_offs": ([q for q, _ in st.chunks]
                                         if st.chunks is not None
                                         else None),
                              "h_shapes": ([h.shape for _, h in st.chunks]
                                           if st.chunks is not None
                                           else [st.H.shape]),
                              "i_tail": plan["tails"][s][0],
                              "tail_al": plan["tails"][s][1]})
                for s, st in enumerate(self.stages)],
        }
        in_specs = [
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((4, ALIGN1D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((self.Lw0, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, nbw_pad), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ]
        for st in self.stages:
            in_specs.append(pl.BlockSpec((twoC, st.hist_pad),
                                         lambda i: (0, 0),
                                         memory_space=pltpu.VMEM))
        for st in self.stages:
            shapes = ([h.shape for _, h in st.chunks]
                      if st.chunks is not None else [st.H.shape])
            for shp in shapes:
                in_specs.append(pl.BlockSpec(shp, lambda i: (0, 0),
                                             memory_space=pltpu.VMEM))
        if spec_cfg is not None:
            in_specs.append(pl.BlockSpec(w2.shape, lambda i: (0, 0),
                                         memory_space=pltpu.VMEM))
        out_specs = [
            pl.BlockSpec((twoC, self.adv_f), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((twoC, self.tails_w_total), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        if spec_cfg is not None:
            N1, N2 = spec_cfg["N1"], spec_cfg["N2"]
            keep, interval = spectrum["keep"], spectrum["interval"]

            def _spec_idx(i, adv_x=self.adv_x, keep=keep,
                          interval=interval):
                # frames completed by the END of step i, minus 1,
                # clamped (non-completing steps keep the same block —
                # pallas flushes only on index change).  Pure python
                # arithmetic (abs-trick clamp) so the SAME expression
                # serves pallas tracers and the cost model's concrete
                # integer probes (jnp ops inside jit always trace).
                e = (i + 1) * adv_x - keep
                e = (e + abs(e)) // 2
                nf = (e // 1024 * 1024) // interval + 1
                return (nf - 1, 0, 0)
            out_specs.append(pl.BlockSpec((1, N2, N1), _spec_idx,
                                          memory_space=pltpu.VMEM))
        scratch = [
            pltpu.VMEM((head0 + self.adv_x,), jnp.float32),
            pltpu.VMEM((head0 + self.adv_x,), jnp.float32),
        ]
        scratch.append(pltpu.VMEM(
            (twoC, ALIGN1D + self.adv_x // self.n_chunks),
            jnp.float32))
        for st in self.stages:
            scratch.append(pltpu.VMEM((twoC, st.hist_pad + st.adv_in),
                                      jnp.float32))
        if spec_cfg is not None:
            scratch.append(pltpu.VMEM((spec_cfg["N1"], 128),
                                      jnp.float32))
            scratch.append(pltpu.VMEM((spec_cfg["N1"], 128),
                                      jnp.float32))
        scratch += [pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA]

        # stage 0: per-sample mix (4 mul + 2 add + 1 phase add over
        # [C, MB] blocks) + the static banded decim matmul
        mix_w = self.n_chunks * (ALIGN1D + self.adv_x // self.n_chunks)
        flops = n_super * (7 * C * mix_w
                           + 2 * self.Lw0 * self.adv0 * twoC)
        if spec_cfg is not None:
            from .pallas_fft import fft_tile_flops
            flops += n_frames * fft_tile_flops(spec_cfg["N1"],
                                               spec_cfg["N2"])
        for st in self.stages:
            if st.chunks is not None:
                per_tile = sum(h.shape[0] * 128 for _, h in st.chunks)
                flops += n_super * 2 * per_tile \
                    * (st.adv_out // st.tile) * twoC
            else:
                flops += n_super * 2 * st.Lw * st.adv_out * twoC
        # in-kernel DMA: every input float read EXACTLY ONCE (the head0
        # window overlap rolls inside VMEM); re + im planes
        rem2 = min(T - (n_super - 1) * self.adv_x, self.adv_x)
        if n_super == 1:
            mspec = [(2 * 4 * min(T, self.adv_x), 1)]
        elif rem2 == self.adv_x:
            mspec = [(2 * 4 * self.adv_x, n_super)]
        else:
            mspec = [(2 * 4 * self.adv_x, n_super - 1),
                     (2 * 4 * rem2, 1)]
        from .pallas_cost import costed_pallas_call
        out_shapes = [
            jax.ShapeDtypeStruct((twoC, n_super * self.adv_f),
                                 o_dtype),
            jax.ShapeDtypeStruct((twoC, self.tails_w_total),
                                 t_dt),
        ]
        if spec_cfg is not None:
            out_shapes.append(jax.ShapeDtypeStruct(
                (n_frames, spec_cfg["N2"], spec_cfg["N1"]),
                jnp.float32))
        outs = costed_pallas_call(
            functools.partial(_mono_kernel, cfg=cfg),
            grid=(n_super,),
            flops=int(flops),
            manual_spec=mspec,
            transcendentals=int(n_super * 2 * C * mix_w),
            label="mono_frontend",
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shapes,
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=self.interpret,
        )(xr, xi, edges, jnp.asarray(self.H0, h_dt),
          omega[:, None],
          base.astype(jnp.float32), *tail_ops, *h_ops,
          *(() if spec_cfg is None else (w2,)))
        if spec_cfg is not None:
            out, tails_out, spectra = outs
        else:
            out, tails_out = outs
            spectra = None

        M = plan["m"][-1]
        if spectrum is not None:
            # natural-order flat bins: k = k2·N1 + k1 (pallas_fft)
            spectra = spectra.reshape(n_frames, -1)
        if raw:
            # untrimmed [2C, n_super·adv_f] stacked planes + valid
            # width — feeds ops/wfm_kernel.py / ops/demod_kernel.py
            # without a slice/concat HBM pass (same contract as
            # ops/chan_frontend.py raw mode)
            y = (out, M)
        elif return_planes:
            y = (out[:C, :M], out[C:, :M])
        else:
            y = jax.lax.complex(out[:C, :M], out[C:, :M])

        new_state = {k: v for k, v in state.items()}
        new_phase = advance_phase(state["fused"]["phase"],
                                  params["omega"],
                                  params["omega_span"], T)
        new_state["fused"] = {
            "tail": (jax.lax.complex(xr[T - (K0 - 1):],
                                     xi[T - (K0 - 1):])
                     if in_planes and T >= K0 - 1 else
                     x[T - (K0 - 1):] if T >= K0 - 1
                     else jnp.concatenate(
                         [tail, jax.lax.complex(xr, xi)
                          if in_planes else x])[T:]),
            "phase": jnp.broadcast_to(new_phase, (C,)),
        }
        new_tails = []
        for s, st in enumerate(self.stages):
            _it, al, end_local = plan["tails"][s]
            seg = tails_out[:, st.tail_off:st.tail_off + st.tail_w] \
                .astype(jnp.float32)
            lo = end_local - al - st.carry
            tl = seg[:, lo:lo + st.carry]
            new_tails.append(jax.lax.complex(tl[:C], tl[C:]))
        self._write_tails(new_state, new_tails)
        if spectrum is not None:
            return (y, spectra), new_state
        return y, new_state

    # -- state plumbing (same layout as the plane pipeline) --------------
    def _stage_tails(self, state) -> List[jnp.ndarray]:
        tails = list(state.get("rest_decim", []))
        for name in self._rest_names:
            tails.append(state[name])
        if self._has_fir:
            tails.append(state["fir"])
        return tails

    def _write_tails(self, state, tails: List[jnp.ndarray]):
        i = 0
        n_rd = len(state.get("rest_decim", []))
        if n_rd:
            state["rest_decim"] = list(tails[:n_rd])
            i = n_rd
        for name in self._rest_names:
            state[name] = tails[i]
            i += 1
        if self._has_fir:
            state["fir"] = tails[i]


def build_mono_pipeline(bank, C: int,
                        interpret: bool = False
                        ) -> Optional[MonoVFOPipeline]:
    p = MonoVFOPipeline(bank, C, interpret=interpret)
    if not p.supported:
        return None
    p._rest_names = [n for n, _ in bank.rest]
    p._has_fir = bool(bank.filter_needed)
    n_stage_tails = (len(bank.rest_decim) + len(bank.rest)
                     + (1 if bank.filter_needed else 0))
    if n_stage_tails != len(p.stages):
        return None
    return p
