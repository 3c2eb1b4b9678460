"""Pallas 2×-oversampled PFB channelizer: wideband planes → bins planes
in ONE kernel pass.

The XLA lowering of OversampledChannelizer costs ~380 HBM B/in-sample
at M=48 (measured): the polyphase decompose is a [k, M]→[M, k]
transpose (59 B/smp each, two passes), the branch FIR and DFT matmuls
each round-trip HBM, and the A/B frame interleave is one more pass.
This kernel exploits the closed form (verified to 1.4e-7 against the
chained path):

    bins[m, F] = σ_m^{F+1} · Σ_ℓ G[m, ℓ] · x[F·h − K0 + h + ℓ]

with h = M/2, K0 = tpp·M, G[m, ℓ] = proto[ℓ]·e^{−2πimℓ/M} and
σ_m = (−1)^m on even (delayed-pass) frames — i.e. every output frame
is ONE window dot with a STATIC complex matrix, windows advancing h
per frame.  Feeding the MXU without forbidden unaligned slices:

  * outside, each wideband plane is the HOP-PAIR-major [CL, M] view of
    the history+x+pad stream (row c = hops 2c, 2c+1) — a FREE bitcast
    of the one fused f32 concat, no transpose pass (the r3 [M, CL]
    lane-major feed paid a full XLA transpose copy per plane, ~17
    B/in-sample at scanner-128); the kernel fetches two spec-pipelined
    [HL, M] half blocks per step (index maps i and i+1 — the feed's
    trailing +HL rows exist for the overlap) and transposes them to
    lane form in VMEM;
  * output frames are 2-way interleaved across the column axis
    (frame F = 2c + r), so the kernel builds two parity accumulators:
    for parity r and window shift d the operand is the hop-(r+d)%2
    row block lane-rolled by (r+d)//2 (Mosaic forbids unaligned lane
    slices; roll + aligned slice), contracted with the static
    [2M, h] tap slabs: acc_r += GRe_d @ re_rows + GIm_d @ im_rows —
    an ordinary MXU matmul per (shift, parity, plane);
  * the two accumulators are un-interleaved into the frame-major
    output by one-hot iota matmuls built in-kernel (no HBM traffic;
    Mosaic has no strided lane writes), with the delayed-pass (−1)^m
    sign folded into the even-parity accumulator.

HBM per call: the [M, CL] pair-major planes once in, bins planes once
out, taps once.  Output width is caller-chosen (padded), matching
exactly what the fused post-channelizer kernel (ops/chan_frontend.py)
wants to eat; the padded tail holds garbage frames the consumer
masks/trims.

State: consumes/produces the standard OversampledChannelizer state
dict (tail_a/tail_b/delay) via exact layout conversion of the last
K0−h wideband samples, so pallas and XLA channelizers interchange
freely mid-stream.

reference behavior: the reference runs one RxVFO per channel
(channel/rx_vfo.h:89-121); the PFB split is this repo's wide-bank
redesign (docs/benchmarks.md).
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_VMEM = 10 * (1 << 20)


def _rup(n: int, a: int) -> int:
    return ((n + a - 1) // a) * a


def _chz_kernel(ar0, ar1, ai0, ai1, gre_ref, gim_ref, sgn_ref, o_ref,
                blkr, blki, *, NF, ntpp, h, M):
    HL = NF // 2        # lanes (column pairs) per super-step
    # planes arrive HOP-MAJOR [CL, M] (the natural row-major view of
    # the history+x+pad stream — a free bitcast, no host transpose
    # pass).  The 2x-overlapped window is fetched as TWO spec-pipelined
    # [HL, M] half blocks (index maps i and i+1 — the feed's trailing
    # +1·HL rows exist exactly for this), each transposed to lane form
    # in VMEM (one VPU relayout; Mosaic DMA can't slice a <128 minor
    # dim, so manual row DMAs are not an option at M = 48/192)
    blkr[:, :HL] = ar0[...].T
    blkr[:, HL:] = ar1[...].T
    blki[:, :HL] = ai0[...].T
    blki[:, HL:] = ai1[...].T

    twoM = 2 * M
    # frame F = i·NF + 2c + r: parity-r accumulator over window shifts
    # d; shift d reads hop F+d = column c+(r+d)//2, hop parity (r+d)%2
    accs = []
    for r in range(2):
        acc = jnp.zeros((twoM, HL), jnp.float32)
        for d in range(ntpp):
            j = (r + d) % 2
            s = (r + d) // 2
            opsr = jax.lax.slice(
                pltpu.roll(blkr[j * h:(j + 1) * h, :], 2 * HL - s, 1),
                (0, 0), (h, HL))
            opsi = jax.lax.slice(
                pltpu.roll(blki[j * h:(j + 1) * h, :], 2 * HL - s, 1),
                (0, 0), (h, HL))
            # taps ride HBM in the handoff STORAGE dtype; math stays
            # f32 (upcast at the MXU)
            acc = acc + jax.lax.dot_general(
                gre_ref[d * twoM:(d + 1) * twoM, :].astype(jnp.float32),
                opsr,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = acc + jax.lax.dot_general(
                gim_ref[d * twoM:(d + 1) * twoM, :].astype(jnp.float32),
                opsi,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        accs.append(acc)

    # delayed-pass (−1)^m sign on even global frames (NF even → parity
    # r == global parity); un-interleave via one-hot iota matmuls
    # (Mosaic has no strided lane writes)
    a0 = accs[0] * sgn_ref[...]
    a1 = accs[1]
    cidx = jax.lax.broadcasted_iota(jnp.int32, (HL, NF), 0)
    fidx = jax.lax.broadcasted_iota(jnp.int32, (HL, NF), 1)
    u0 = (fidx == 2 * cidx).astype(jnp.float32)
    u1 = (fidx == 2 * cidx + 1).astype(jnp.float32)
    o_ref[...] = (
        jax.lax.dot_general(a0, u0,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        + jax.lax.dot_general(a1, u1,
                              dimension_numbers=(((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    ).astype(o_ref.dtype)


class PallasChannelizer:
    """Built from an OversampledChannelizer; ``supported`` False when
    the geometry can't use the kernel."""

    def __init__(self, chz, interpret: bool = False):
        self.chz = chz
        self.interpret = interpret
        self.M = M = int(chz.M)
        self.h = h = M // 2
        self.tpp = tpp = int(chz.tpp)
        self.K0 = K0 = tpp * M
        self.supported = False
        if h % 8 or tpp < 2:
            return
        # modulated prototype in natural order: G[m, ℓ] = proto[ℓ]·e^{−jθ}
        pn = np.zeros(K0)
        br = np.asarray(chz.branches, np.float64)     # [M, tpp]
        for p in range(M):
            pn[np.arange(tpp) * M + p] = br[p]
        ell = np.arange(K0)
        ang = -2.0 * np.pi * np.outer(np.arange(M), ell) / M
        gr = (pn[None, :] * np.cos(ang)).astype(np.float32)
        gi = (pn[None, :] * np.sin(ang)).astype(np.float32)
        # per-shift slabs: GRe_d multiplies the re rows of the window,
        # GIm_d the im rows; contraction is over the h in-hop samples
        self.ntpp = ntpp = 2 * tpp              # hops per K0 window
        gre = np.zeros((ntpp * 2 * M, h), np.float32)
        gim = np.zeros((ntpp * 2 * M, h), np.float32)
        for d in range(ntpp):
            grd = gr[:, d * h:(d + 1) * h]
            gid = gi[:, d * h:(d + 1) * h]
            gre[d * 2 * M:d * 2 * M + M] = grd
            gre[d * 2 * M + M:(d + 1) * 2 * M] = gid
            gim[d * 2 * M:d * 2 * M + M] = -gid
            gim[d * 2 * M + M:(d + 1) * 2 * M] = grd
        self.GRe, self.GIm = gre, gim
        sg = np.where(np.arange(M) % 2 == 0, 1.0, -1.0)
        self.sgn = np.concatenate([sg, sg]).astype(np.float32)[:, None]
        self.NF = NF = 256
        if ntpp // 2 > NF // 2:                 # lane shift must fit blk
            return
        vmem = (gre.size * 8                     # taps
                + 2 * M * NF * 4 * 2             # acc pair + out
                + 2 * h * NF * 4                 # plane blocks
                + 2 * (NF // 2) * NF * 4)        # iota one-hots
        if vmem > MAX_VMEM:
            return
        self.supported = True

    # ---- state layout conversions (tiny arrays) -------------------------
    def _state_to_xw(self, state):
        """chz state dict → last K0−h wideband samples (complex)."""
        tpp, M = self.tpp, self.M
        tb = jnp.swapaxes(state["tail_b"], -1, -2).reshape(
            state["tail_b"].shape[:-2] + ((tpp - 1) * M,))
        return jnp.concatenate([tb, state["delay"]], axis=-1)

    def _xw_to_state(self, xw):
        tpp, M, h = self.tpp, self.M, self.h
        n = (tpp - 1) * M
        tail_b = jnp.swapaxes(
            xw[..., :n].reshape(xw.shape[:-1] + (tpp - 1, M)), -1, -2)
        tail_a = jnp.swapaxes(
            xw[..., h:h + n].reshape(xw.shape[:-1] + (tpp - 1, M)), -1, -2)
        return {"tail_a": tail_a, "tail_b": tail_b,
                "delay": xw[..., n:n + h]}

    def apply(self, state, x, width_out: int, out_dtype=None):
        """x [T] complex wideband → (bins [2M, width_out] planes
        (re rows over im rows, zero-padded columns), state').
        width_out must be ≥ 2T/M and a multiple of NF.  ``out_dtype``
        defaults to the kernel-handoff storage dtype
        (ops/precision.py) — bins feed the post-channelizer kernel,
        which upcasts on read; pass jnp.float32 for chained XLA
        consumers."""
        from .precision import get_handoff_dtype
        if out_dtype is None:
            out_dtype = get_handoff_dtype()
        M, h, K0, NF = self.M, self.h, self.K0, self.NF
        if isinstance(x, tuple):
            x = jax.lax.complex(*x)
        T = x.shape[-1]
        assert T % M == 0, (T, M)
        Tb = 2 * T // M
        assert width_out >= Tb and width_out % NF == 0, (width_out, Tb, NF)
        n_super = width_out // NF
        HL = NF // 2

        xw = self._state_to_xw(state)
        # HOP-MAJOR planes [CL, M]: row c = hop pair 2c,2c+1 (M
        # samples).  One fused f32 concat per plane; the reshape is the
        # stream's natural row-major view (a free bitcast).  The old
        # [M, CL] lane-major feed paid a full transpose COPY per plane
        # here (~17 B/in-sample at scanner-128); the kernel now
        # transposes its own [2HL, M] row block in VMEM instead.
        CL = (n_super + 1) * HL
        pad = CL * M - (xw.shape[-1] + T)
        zt = jnp.zeros(max(pad, 0), jnp.float32)
        ar = jnp.concatenate([jnp.real(xw), jnp.real(x), zt]) \
            .reshape(CL, M)
        ai = jnp.concatenate([jnp.imag(xw), jnp.imag(x), zt]) \
            .reshape(CL, M)

        cfg = dict(NF=NF, ntpp=self.ntpp, h=h, M=M)
        from .pallas_cost import costed_pallas_call
        bins = costed_pallas_call(
            functools.partial(_chz_kernel, **cfg),
            grid=(n_super,),
            flops=int(2 * 2 * M * 2 * K0 * width_out
                      + 2 * 2 * M * HL * NF * n_super * 2),
            label="pfb_channelizer",
            in_specs=[
                pl.BlockSpec((HL, M), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((HL, M), lambda i: (i + 1, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((HL, M), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((HL, M), lambda i: (i + 1, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(self.GRe.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(self.GIm.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2 * M, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((2 * M, NF), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((2 * M, width_out),
                                           out_dtype),
            scratch_shapes=[
                pltpu.VMEM((M, NF), jnp.float32),
                pltpu.VMEM((M, NF), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=self.interpret,
        )(ar, ar, ai, ai,
          jnp.asarray(self.GRe, get_handoff_dtype()),
          jnp.asarray(self.GIm, get_handoff_dtype()),
          jnp.asarray(self.sgn))

        nh = K0 - h
        tail = (x[..., T - nh:] if T >= nh
                else jnp.concatenate([xw, x])[..., -nh:])
        new_state = self._xw_to_state(tail)
        return bins, new_state

    def ok_for(self, T: int, width_out: int) -> bool:
        return width_out % self.NF == 0


def chz2_init_slabs(sl_r, sl_i, pre_ref, pro_ref, pie_ref, pio_ref,
                    cfg):
    """Tap slabs built ONCE per call (grid-persistent scratch): the
    banded layout is the same for every bucket (rows [s·h, s·h+K0),
    cols [128s, 128(s+1)) ← the compact per-parity P operands), so the
    whole call ships 4 small (K0, 128) matrices instead of the spread
    toeplitz form."""
    h, K0, Bs = cfg["h"], cfg["K0"], cfg["Bs"]
    sl_r[...] = jnp.zeros_like(sl_r)
    sl_i[...] = jnp.zeros_like(sl_i)
    for s in range(Bs):
        pr = pre_ref if s % 2 == 0 else pro_ref
        pi_ = pie_ref if s % 2 == 0 else pio_ref
        sl_r[s * h:s * h + K0, 128 * s:128 * (s + 1)] = \
            pr[...].astype(jnp.float32)
        sl_i[s * h:s * h + K0, 128 * s:128 * (s + 1)] = \
            pi_[...].astype(jnp.float32)


def chz2_fill_rbuf(i, rb_r, rb_i, xr_ref, xi_ref, er_ref, ei_ref,
                   cfg, rows_blk):
    """Rolling stream rows: n_lead lookback rows + the current grid
    step's ``rows_blk`` rows (a multiple of cfg["rows_step"] — fused
    kernels write several PFB sub-blocks at once)."""
    nl, T = cfg["n_lead"], cfg["T"]

    @pl.when(i == 0)
    def _edge():
        rb_r[0:nl, :] = er_ref[...]
        rb_i[0:nl, :] = ei_ref[...]
        if rb_r.shape[0] > nl + rows_blk:
            # zero the sublane-pad rows once: a rolled select may wrap
            # into them (always under zero taps, but NaN·0 = NaN)
            pad0 = (nl + rows_blk) // 8 * 8
            rb_r[pad0:, :] = jnp.zeros_like(rb_r[pad0:, :])
            rb_i[pad0:, :] = jnp.zeros_like(rb_i[pad0:, :])

    @pl.when(i > 0)
    def _roll():
        rb_r[0:nl, :] = rb_r[rows_blk:rows_blk + nl, :]
        rb_i[0:nl, :] = rb_i[rows_blk:rows_blk + nl, :]

    # the last block may read past the stream (pallas pads OOB fetches
    # with unspecified values — NaN under interpret, and 0·NaN = NaN
    # would poison the one-hot select matmuls): zero invalid entries AT
    # THE WRITE, which also reproduces the chained path's zero-padded
    # ext semantics for the garbage tail frames
    vidx = (i * rows_blk * 128
            + 128 * jax.lax.broadcasted_iota(jnp.int32,
                                             (rows_blk, 128), 0)
            + jax.lax.broadcasted_iota(jnp.int32, (rows_blk, 128), 1))
    vok = vidx < T
    rb_r[nl:nl + rows_blk, :] = jnp.where(vok, xr_ref[...], 0.0)
    rb_i[nl:nl + rows_blk, :] = jnp.where(vok, xi_ref[...], 0.0)


def chz2_compute(rb_r, rb_i, sl_r, sl_i, cfg, row0=0):
    """One PFB super-step over rbuf rows [row0, row0 + rows_step + nl)
    → the (128, NF) bins value (rows ≥ 2M are garbage)."""
    n_r, n_g = cfg["n_r"], cfg["n_g"]
    Bs, n_b, Ws = cfg["Bs"], cfg["n_b"], cfg["Ws"]
    n_u, NF = cfg["n_u"], cfg["NF"]
    nrow_b, k_max = cfg["nrow_b"], cfg["k_max"]

    # ---- W_k = strided row-select (stride n_r, offset row0+k) of the
    # stream rows, one per lane-window row
    Wk = []
    if n_r == 1:
        # stride 1: W_k is just rows [row0+k, +n_u) — a sublane roll +
        # aligned slice, no matmul (wraps only land under zero taps)
        rbr = rb_r[...]
        rbi = rb_i[...]
        rp = rbr.shape[0]
        for k in range(k_max):
            o = row0 + k
            vr = pltpu.roll(rbr, rp - o, 0) if o else rbr
            vi = pltpu.roll(rbi, rp - o, 0) if o else rbi
            Wk.append((jax.lax.slice(vr, (0, 0), (n_u, 128)),
                       jax.lax.slice(vi, (0, 0), (n_u, 128))))
    else:
        # general stride: one-hot MXU matmuls (no Mosaic strided
        # sublane gather) over just this sub-block's row window (the
        # fused kernel's buffer holds n_sub blocks — selecting over the
        # whole buffer would multiply the select flops by n_sub)
        w = min(_rup(cfg["n_lead"] + cfg["rows_step"], 8),
                rb_r.shape[0] - row0)
        rbr = rb_r[row0:row0 + w, :]
        rbi = rb_i[row0:row0 + w, :]
        u_i = jax.lax.broadcasted_iota(jnp.int32, (n_u, w), 0)
        r_i = jax.lax.broadcasted_iota(jnp.int32, (n_u, w), 1)
        for k in range(k_max):
            Rk = (r_i == n_r * u_i + k).astype(jnp.float32)
            wr = jnp.dot(Rk, rbr, preferred_element_type=jnp.float32)
            wi = jnp.dot(Rk, rbi, preferred_element_type=jnp.float32)
            Wk.append((wr, wi))

    # ---- buckets: roll-aligned windows × the static banded slabs ----
    o_acc = jnp.zeros((128, NF), jnp.float32)
    cW = nrow_b * 128
    for q in range(n_b):
        a_q, c_q = cfg["aq"][q], cfg["cq"][q]
        wr4 = jnp.concatenate([Wk[a_q + k][0] for k in range(nrow_b)], 1)
        wi4 = jnp.concatenate([Wk[a_q + k][1] for k in range(nrow_b)], 1)
        if c_q:
            wr4 = pltpu.roll(wr4, cW - c_q, 1)
            wi4 = pltpu.roll(wi4, cW - c_q, 1)
        wrq = jax.lax.slice(wr4, (0, 0), (n_u, Ws))
        wiq = jax.lax.slice(wi4, (0, 0), (n_u, Ws))
        Oq = (jnp.dot(wrq, sl_r[...], preferred_element_type=jnp.float32)
              + jnp.dot(wiq, sl_i[...],
                        preferred_element_type=jnp.float32))
        # un-interleave: frame F = F0 + n_g·u + Bs·q + s; strided
        # lane writes are forbidden → transpose + one-hot spread
        for s in range(Bs):
            Qs = jax.lax.slice(Oq, (0, 128 * s), (n_u, 128 * (s + 1)))
            g = q * Bs + s
            Sg = (jax.lax.broadcasted_iota(jnp.int32, (n_u, NF), 1)
                  == n_g * jax.lax.broadcasted_iota(
                      jnp.int32, (n_u, NF), 0) + g).astype(jnp.float32)
            o_acc = o_acc + jnp.dot(Qs.T, Sg,
                                    preferred_element_type=jnp.float32)
    return o_acc


def _chz2_kernel(xr_ref, xi_ref, er_ref, ei_ref, pre_ref, pro_ref,
                 pie_ref, pio_ref, o_ref, rb_r, rb_i, sl_r, sl_i, *, cfg):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _slabs():
        chz2_init_slabs(sl_r, sl_i, pre_ref, pro_ref, pie_ref, pio_ref,
                        cfg)

    chz2_fill_rbuf(i, rb_r, rb_i, xr_ref, xi_ref, er_ref, ei_ref,
                   cfg, cfg["rows_step"])
    o_acc = chz2_compute(rb_r, rb_i, sl_r, sl_i, cfg)
    o_ref[...] = o_acc[0:cfg["twoM"], :].astype(o_ref.dtype)


class PallasChannelizerV2:
    """2×-oversampled PFB fed STRAIGHT from the wideband (xr, xi)
    planes' natural [T/128, 128] row view — a true free bitcast of the
    1-D stream, unlike the hop-major [CL, M] feed whose minor dim < 128
    forces XLA relayout passes (measured ~88 HBM B/in-sample of
    extract/reshape/concat glue at scanner-128).  The kernel assembles
    lane-windows itself:

      * strided row-selects (one-hot MXU matmuls) build per-superchunk
        window rows W_k from a rolling VMEM row buffer (n_lead lookback
        rows carried across grid steps; step 0 seeds them from the
        state-derived edge operand);
      * per bucket of Bs consecutive frames, a uniform lane roll aligns
        the window and ONE matmul against a static banded slab computes
        all Bs frames × all 2M bin planes — the slab (built once per
        call in scratch from 4 compact (K0, 128) operands) is identical
        for every bucket because the frame offset pattern repeats every
        Bs frames, and the delayed-pass (−1)^m sign folds into the
        even-parity columns;
      * the frame-interleaved output is un-interleaved by transpose +
        one-hot spread matmuls (Mosaic has no strided lane writes).

    Same output layout, state dict and numerical contract as
    PallasChannelizer (equality asserted in tests); HBM per call: the
    two f32 planes once, 4·(K0·128) taps, bins out in the handoff
    dtype.  reference behavior: channel/rx_vfo.h:89-121 (one RxVFO per
    channel); the PFB split is this repo's wide-bank redesign."""

    def __init__(self, chz, interpret: bool = False):
        self.chz = chz
        self.interpret = interpret
        self.M = M = int(chz.M)
        self.h = h = M // 2
        self.tpp = tpp = int(chz.tpp)
        self.K0 = K0 = tpp * M
        self.supported = False
        if tpp < 2 or not self._geom(h, bs_step=2):
            return
        # compact per-parity tap operands P[ℓ, m] (cols m: re-out from
        # this plane; cols M+m: im-out), zero-padded to 128 lanes;
        # G[m, ℓ] = proto_natural[ℓ]·e^{−2πimℓ/M}
        pn = np.zeros(K0)
        br = np.asarray(chz.branches, np.float64)
        for p in range(M):
            pn[np.arange(tpp) * M + p] = br[p]
        ell = np.arange(K0)
        ang = -2.0 * np.pi * np.outer(np.arange(M), ell) / M
        gr = pn[None, :] * np.cos(ang)
        gi = pn[None, :] * np.sin(ang)
        Pr, Pi = self._pack(gr, gi)
        # delayed-pass (−1)^m sign on EVEN frames (Bs even → frame
        # parity == in-bucket parity s)
        sg = np.where(np.arange(M) % 2 == 0, 1.0, -1.0)
        sg2 = np.ones(128, np.float32)
        sg2[:M] = sg
        sg2[M:2 * M] = sg
        self.Pro, self.Pio = Pr, Pi
        self.Pre, self.Pie = Pr * sg2[None, :], Pi * sg2[None, :]
        self.supported = True

    _state_to_xw = PallasChannelizer._state_to_xw
    _xw_to_state = PallasChannelizer._xw_to_state

    def _frames(self, T: int) -> int:
        return 2 * T // self.M

    def _geom(self, A: int, bs_step: int) -> bool:
        """Window geometry for frame advance A (= h oversampled,
        = M critically sampled): superchunk Lsc = lcm(A, 128) with n_g
        frames / n_r rows, n_lead lookback rows, and the bucket size Bs
        (a multiple of ``bs_step`` so any parity-dependent taps stay
        bucket-independent) minimizing the slab width."""
        from math import gcd
        M, K0 = self.M, self.K0
        self.A = A
        if A % 8 or K0 % 8 or 2 * M > 128:
            return False
        self.Lsc = Lsc = A * 128 // gcd(A, 128)
        self.n_g = n_g = Lsc // A
        self.n_r = Lsc // 128
        self.NF = NF = 256
        if NF % n_g or n_g % 2:
            return False
        self.n_u = NF // n_g
        hist = K0 - A
        self.n_lead = -(-hist // 128)
        self.rows_step = NF * A // 128
        best = None
        d = bs_step
        while d <= n_g:
            if n_g % d == 0:
                Ws = _rup(K0 + (d - 1) * A, 128)
                if best is None or (Ws, -d) < best[:2]:
                    best = (Ws, -d, d)
            d += bs_step
        if best is None:
            return False
        self.Ws, _, self.Bs = best
        self.n_b = n_g // self.Bs
        lead = self.n_lead * 128 - hist
        self.aq = tuple((lead + q * self.Bs * A) // 128
                        for q in range(self.n_b))
        self.cq = tuple((lead + q * self.Bs * A) % 128
                        for q in range(self.n_b))
        self.nrow_b = max(-(-(c + self.Ws) // 128) for c in self.cq)
        self.k_max = max(a + self.nrow_b for a in self.aq)
        return self.k_max <= self.n_lead + self.rows_step

    def _pack(self, gr, gi):
        """[M, K0] complex taps → (P_for_xr, P_for_xi) [K0, 128]."""
        M, K0 = self.M, self.K0
        Pr = np.zeros((K0, 128), np.float32)
        Pr[:, :M] = gr.T
        Pr[:, M:2 * M] = gi.T
        Pi = np.zeros((K0, 128), np.float32)
        Pi[:, :M] = (-gi).T
        Pi[:, M:2 * M] = gr.T
        return Pr, Pi

    def ok_for(self, T: int, width_out: int) -> bool:
        return (width_out % self.NF == 0 and T % 128 == 0
                and T % self.M == 0)

    def apply(self, state, x, width_out: int, out_dtype=None):
        """x: [T] complex wideband or (xr, xi) f32 planes →
        (bins [2M, width_out] planes in ``out_dtype`` (default: the
        kernel-handoff storage dtype), state')."""
        from .precision import get_handoff_dtype
        h_dt = get_handoff_dtype()
        if out_dtype is None:
            out_dtype = h_dt
        M, A, K0, NF = self.M, self.A, self.K0, self.NF
        if isinstance(x, tuple):
            xr, xi = x
            T = xr.shape[-1]
        else:
            T = x.shape[-1]
            xr = jnp.real(x)
            xi = jnp.imag(x)
        assert self.ok_for(T, width_out), (T, width_out, M, NF)
        Tb = self._frames(T)
        assert width_out >= Tb, (width_out, Tb)
        n_super = width_out // NF

        xw = self._state_to_xw(state)
        lead = self.n_lead * 128 - (K0 - A)
        er = jnp.pad(jnp.real(xw).astype(jnp.float32),
                     (lead, 0)).reshape(self.n_lead, 128)
        ei = jnp.pad(jnp.imag(xw).astype(jnp.float32),
                     (lead, 0)).reshape(self.n_lead, 128)
        xr2 = xr.astype(jnp.float32).reshape(-1, 128)
        xi2 = xi.astype(jnp.float32).reshape(-1, 128)

        cfg = dict(h=A, K0=K0, Lsc=self.Lsc, n_r=self.n_r,
                   n_g=self.n_g, Bs=self.Bs, n_b=self.n_b, Ws=self.Ws,
                   n_u=self.n_u, NF=NF, n_lead=self.n_lead,
                   rows_step=self.rows_step, nrow_b=self.nrow_b,
                   k_max=self.k_max, T=T, twoM=2 * M,
                   aq=self.aq, cq=self.cq)
        rows_tot = self.n_lead + self.rows_step
        rows_pad = _rup(rows_tot, 8)
        sel = (0 if self.n_r == 1                            # rolls
               else 2 * self.k_max * 2 * self.n_u * rows_tot * 128)
        flops = n_super * (
            sel
            + self.n_b * 2 * 2 * self.n_u * self.Ws * self.Bs * 128
            + self.n_g * 2 * 128 * self.n_u * NF)            # spread
        from .pallas_cost import costed_pallas_call
        bins = costed_pallas_call(
            functools.partial(_chz2_kernel, cfg=cfg),
            grid=(n_super,),
            flops=int(flops),
            label=self.LABEL,
            in_specs=[
                pl.BlockSpec((self.rows_step, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((self.rows_step, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((self.n_lead, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((self.n_lead, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ] + [pl.BlockSpec((K0, 128), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)] * 4,
            out_specs=pl.BlockSpec((2 * M, NF), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((2 * M, width_out),
                                           out_dtype),
            scratch_shapes=[
                pltpu.VMEM((rows_pad, 128), jnp.float32),
                pltpu.VMEM((rows_pad, 128), jnp.float32),
                pltpu.VMEM((self.Ws, self.Bs * 128), jnp.float32),
                pltpu.VMEM((self.Ws, self.Bs * 128), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=self.interpret,
        )(xr2, xi2, er, ei,
          jnp.asarray(self.Pre, h_dt), jnp.asarray(self.Pro, h_dt),
          jnp.asarray(self.Pie, h_dt), jnp.asarray(self.Pio, h_dt))

        nh = K0 - A
        if isinstance(x, tuple):
            tailx = (jax.lax.complex(xr[..., T - nh:], xi[..., T - nh:])
                     if T >= nh else None)
        else:
            tailx = x[..., T - nh:] if T >= nh else None
        tail = (tailx if tailx is not None
                else jnp.concatenate(
                    [xw, jax.lax.complex(xr, xi)])[..., -nh:])
        # barrier: without it the algebraic simplifier rewrites the
        # reshape-of-slice in _xw_to_state as a minor-48 reshape of the
        # WHOLE plane (two full relayout passes + staging copies,
        # measured 32 HBM B/in-sample at T=240k)
        tail = jax.lax.optimization_barrier(tail)
        new_state = self._xw_to_state(tail)
        return bins, new_state

    LABEL = "pfb_channelizer"


class PallasPolyChannelizer(PallasChannelizerV2):
    """Critically-sampled variant (ops/channelizer.py
    PolyphaseChannelizer): frame advance A = M, no delayed pass and no
    (−1)^m sign, so the even/odd P operands are identical and the same
    kernel body runs unchanged.  Closed form (matches the chained
    decompose → branch-FIR → FFT path to f32 epsilon):

        y[m, F] = Σ_t G[m, t] · ext[F·M + t],
        G[m, t] = branches[t%M, t//M] · e^{−2πim(t%M)/M}

    with ext = [last (tpp−1)·M samples | x].  Output is the [2M, W]
    re|im plane stack; the [M, tpp−1] complex branch-history state dict
    of the chained path is converted exactly, so the two interchange
    mid-stream."""

    LABEL = "poly_channelizer"

    def __init__(self, chz, interpret: bool = False):
        self.chz = chz
        self.interpret = interpret
        self.M = M = int(chz.M)
        self.tpp = tpp = int(chz.tpp)
        self.K0 = K0 = tpp * M
        self.supported = False
        if tpp < 2 or not self._geom(M, bs_step=1):
            return
        br = np.asarray(chz.branches, np.float64)   # [M, tpp]
        t = np.arange(K0)
        # _branch_fir is a CROSS-correlation (XLA conv, kernel
        # unflipped): v_p[k] = Σ_i br[p,i]·x_p[k−(tpp−1)+i], so window
        # sample t = i·M + p pairs with tap br[p, i] directly
        p = t % M
        proto_t = br[p, t // M]
        ang = -2.0 * np.pi * np.outer(np.arange(M), p) / M
        gr = proto_t[None, :] * np.cos(ang)
        gi = proto_t[None, :] * np.sin(ang)
        Pr, Pi = self._pack(gr, gi)
        self.Pre = self.Pro = Pr
        self.Pie = self.Pio = Pi
        self.supported = True

    def _frames(self, T: int) -> int:
        return T // self.M

    def _state_to_xw(self, state):
        """[M, tpp−1] branch history → last (tpp−1)·M samples."""
        tpp, M = self.tpp, self.M
        return jnp.swapaxes(state, -1, -2).reshape(
            state.shape[:-2] + ((tpp - 1) * M,))

    def _xw_to_state(self, xw):
        tpp, M = self.tpp, self.M
        return jnp.swapaxes(
            xw.reshape(xw.shape[:-1] + (tpp - 1, M)), -1, -2)


# ---------------------------------------------------------------------------
# V3: factorized phase-planar WOLA channelizer
# ---------------------------------------------------------------------------
#
# V2's banded slabs fuse the polyphase fold and the DFT into ONE tap
# matrix: every (frame, bin) output pays the FULL K0-tap window on the
# MXU (2·2·Ws·128 flops per frame — ~196k at M=48 where the factorized
# math needs ~20k).  V3 factorizes:
#
#   1. occurrence-planar view V[o, p] = x[o·M + p]: built from the
#      natural [rows, 128] stream tiles with rows_per_group one-hot
#      row-selects (shared across all lane groups) + uniform lane
#      rolls + a sublane interleave — done ONCE per super-step at the
#      stream rate;
#   2. polyphase fold: tpp sublane-shifted masked FMAs (VPU) give the
#      even-pass fold A_j[m] = Σ_i br[m,i]·V[j−tpp+1+i, m] and the
#      delayed-pass fold W_j (taps rolled by M/2 along the phase axis —
#      the hop-M/2 sample offset and the (−1)^m pre-FFT roll CANCEL
#      into same-lane reads with a row carry on lanes m ≥ M/2);
#   3. one DFT matmul: bins = [[C|S],[−S|C]]·[F_r|F_i]ᵀ over the
#      128-lane phase axis, frames already interleaved [W, A] by a
#      sublane reshape.
#
# Output layout, state dict and numerics identical to V2 (equality
# asserted in tests).  Flops at M=48: ~1.1k/input-sample vs V2's ~11.4k
# (the named round-4 one-hot-machinery floor).

def _chz3_geom(M: int, rows_step: int):
    """Per-lane-group V-construction plan: for s in [0, G) the rows
    3q+c1[s] (stride rows_per_grp) hold o=G·q+s's samples at lane
    offset lo[s], crossing into the next row at lane cross_p[s]."""
    from math import gcd
    G = 128 // gcd(M, 128)
    rpg = M * G // 128                     # stream rows per o-group
    n_q = (rows_step * 128) // (M * G)
    plan = []
    for s in range(G):
        c1 = (M * s) // 128
        lo = (M * s) % 128
        cross = lo + M > 128
        plan.append((c1, lo, (128 - lo) if cross else 128))
    return G, rpg, n_q, plan


def chz3_build_v(xr_rows, xi_rows, cfg, sel_refs):
    """[rows_step, 128] stream tiles (values) → (Vr, Vi) [k_occ, 128]
    occurrence-planar views (lanes ≥ M hold neighbour garbage — always
    under zero taps)."""
    G, rpg, n_q = cfg["G"], cfg["rpg"], cfg["n_q"]
    plan = cfg["splan"]
    # row-phase selects: rows c + rpg·q, one per distinct c (≤ rpg+1);
    # when rpg == 1 and only c == 0 is needed (M | 128, no lane
    # crossing) the select is the identity — use the rows directly
    sels_r, sels_i = {}, {}
    need_c = sorted({c1 for c1, _, _ in plan}
                    | {c1 + 1 for c1, lo, cp in plan if cp < 128})
    if rpg == 1 and need_c == [0] and n_q == xr_rows.shape[0]:
        sels_r[0], sels_i[0] = xr_rows, xi_rows
    else:
        for c in need_c:
            oh = sel_refs[c][...].astype(jnp.float32)
            sels_r[c] = jnp.dot(oh, xr_rows,
                                preferred_element_type=jnp.float32)
            sels_i[c] = jnp.dot(oh, xi_rows,
                                preferred_element_type=jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (n_q, 128), 1)
    Sr, Si = [], []
    for (c1, lo, cross_p) in plan:
        r = (128 - lo) % 128
        vr = pltpu.roll(sels_r[c1], r, 1) if r else sels_r[c1]
        vi = pltpu.roll(sels_i[c1], r, 1) if r else sels_i[c1]
        if cross_p < 128:
            wr = pltpu.roll(sels_r[c1 + 1], r, 1)
            wi = pltpu.roll(sels_i[c1 + 1], r, 1)
            vr = jnp.where(lane < cross_p, vr, wr)
            vi = jnp.where(lane < cross_p, vi, wi)
        Sr.append(vr)
        Si.append(vi)
    # V[G·q + s] = S[s][q]
    Vr = jnp.stack(Sr, axis=1).reshape(n_q * G, 128)
    Vi = jnp.stack(Si, axis=1).reshape(n_q * G, 128)
    return Vr, Vi


def chz3_compute(vr, vi, tA_ref, tWlo_ref, tWhi_ref, dfull_ref, cfg):
    """V scratch refs (tail_pad history rows + k_occ current rows) →
    bins [2M, NF] value."""
    tpp, tp = cfg["tpp"], cfg["tail_pad"]
    k_occ = cfg["k_occ"]

    def fold(taps_ref, off):
        fr = jnp.zeros((k_occ, 128), jnp.float32)
        fi = jnp.zeros((k_occ, 128), jnp.float32)
        for i in range(tpp):
            t = taps_ref[i, :][None, :].astype(jnp.float32)
            fr = fr + t * vr[off + i:off + i + k_occ, :]
            fi = fi + t * vi[off + i:off + i + k_occ, :]
        return fr, fi

    ar, ai = fold(tA_ref, tp - tpp + 1)
    if cfg.get("critical"):
        # critically sampled: one frame per occurrence, no delayed pass
        Fr, Fi = ar, ai
    else:
        wlr, wli = fold(tWlo_ref, tp - tpp + 1)
        whr, whi = fold(tWhi_ref, tp - tpp)
        wr = wlr + whr
        wi = wli + whi
        # frame interleave [W_j, A_j] then [F_r | F_i] lane concat
        Fr = jnp.stack([wr, ar], axis=1).reshape(2 * k_occ, 128)
        Fi = jnp.stack([wi, ai], axis=1).reshape(2 * k_occ, 128)
    F = jnp.concatenate([Fr, Fi], axis=1)          # [NF, 256]
    bins = jax.lax.dot_general(
        dfull_ref[...].astype(jnp.float32), F,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)        # [2M, NF]
    return bins


def chz3_step(i_glob, xr_ref, xi_ref, er_ref, ei_ref, vr, vi,
              tA, tWlo, tWhi, dfull, sel_refs, cfg, row0=0):
    """One V3 super-step: roll/seed the V tail, build this step's V
    rows from the stream tiles at sublane offset ``row0``, return the
    bins [2M, NF] value.  ``i_glob`` is the global super-step index
    (standalone: program_id; fused: i·n_sub + sub)."""
    tp, k_occ, rs = cfg["tail_pad"], cfg["k_occ"], cfg["rows_step"]

    @pl.when(i_glob == 0)
    def _seed():
        vr[0:tp, :] = er_ref[...]
        vi[0:tp, :] = ei_ref[...]

    @pl.when(i_glob > 0)
    def _roll():
        vr[0:tp, :] = vr[k_occ:k_occ + tp, :]
        vi[0:tp, :] = vi[k_occ:k_occ + tp, :]

    # zero invalid samples BEFORE the select matmuls (pallas OOB input
    # blocks hold unspecified values — NaN under interpret — and a NaN
    # survives a one-hot dot: NaN·0 = NaN)
    gidx = ((i_glob * rs
             + jax.lax.broadcasted_iota(jnp.int32, (rs, 128), 0)) * 128
            + jax.lax.broadcasted_iota(jnp.int32, (rs, 128), 1))
    ok = gidx < cfg["T"]
    xrr = jnp.where(ok, xr_ref[row0:row0 + rs, :], 0.0)
    xii = jnp.where(ok, xi_ref[row0:row0 + rs, :], 0.0)
    Vr, Vi = chz3_build_v(xrr, xii, cfg, sel_refs)
    vr[tp:tp + k_occ, :] = Vr
    vi[tp:tp + k_occ, :] = Vi
    return chz3_compute(vr, vi, tA, tWlo, tWhi, dfull, cfg)


def _chz3_kernel(xr_ref, xi_ref, er_ref, ei_ref, tA, tWlo, tWhi,
                 dfull, *rest, cfg):
    n_sel = cfg["n_sel"]
    sel_refs = list(rest[:n_sel])
    o_ref = rest[n_sel]
    vr, vi = rest[n_sel + 1], rest[n_sel + 2]
    i = pl.program_id(0)
    bins = chz3_step(i, xr_ref, xi_ref, er_ref, ei_ref, vr, vi,
                     tA, tWlo, tWhi, dfull, sel_refs, cfg)
    o_ref[...] = bins[0:cfg["twoM"], :].astype(o_ref.dtype)


class PallasChannelizerV3(PallasChannelizerV2):
    """Factorized phase-planar WOLA form of V2 (see the section
    comment above); interface, state dict and output contract are
    identical to V2."""

    LABEL = "pfb_channelizer"

    def __init__(self, chz, interpret: bool = False):
        self.chz = chz
        self.interpret = interpret
        self.M = M = int(chz.M)
        self.h = M // 2
        self.tpp = tpp = int(chz.tpp)
        self.K0 = tpp * M
        self.A = self.h
        self.NF = 256
        self.supported = False
        if tpp < 2 or M % 2 or 2 * M > 128:
            return
        self.k_occ = self.NF // 2
        if (self.k_occ * M) % 128:
            return
        self.rows_step = self.k_occ * M // 128
        G, rpg, n_q, splan = _chz3_geom(M, self.rows_step)
        if n_q * G != self.k_occ:
            return
        self.G, self.rpg, self.n_q, self.splan = G, rpg, n_q, splan
        self.tail_pad = _rup(tpp, 8)
        # fold taps: A-pass natural; W-pass rolled by M/2 with the
        # row-carry split into lane-masked lo/hi halves
        br = np.asarray(chz.branches, np.float32)      # [M, tpp]
        brw = np.roll(br, -self.h, axis=0)
        half = self.h
        tA = np.zeros((tpp, 128), np.float32)
        tWlo = np.zeros((tpp, 128), np.float32)
        tWhi = np.zeros((tpp, 128), np.float32)
        tA[:, :M] = br.T
        tWlo[:, :half] = brw[:half].T
        tWhi[:, half:M] = brw[half:].T
        self.tA, self.tWlo, self.tWhi = tA, tWlo, tWhi
        # DFT block matrix: [[C|S],[−S|C]] over 128-padded phase lanes
        ang = 2.0 * np.pi * np.outer(np.arange(M), np.arange(M)) / M
        Ce = np.zeros((M, 128), np.float32)
        Se = np.zeros((M, 128), np.float32)
        Ce[:, :M] = np.cos(ang)
        Se[:, :M] = np.sin(ang)
        D = np.zeros((2 * M, 256), np.float32)
        D[:M, :128] = Ce
        D[:M, 128:] = Se
        D[M:, :128] = -Se
        D[M:, 128:] = Ce
        self.Dfull = D
        # row-phase one-hot selects
        need_c = sorted({c1 for c1, _, _ in splan}
                        | {c1 + 1 for c1, lo, cp in splan if cp < 128})
        self.n_sel = max(need_c) + 1
        sels = []
        for c in range(self.n_sel):
            oh = np.zeros((n_q, self.rows_step), np.float32)
            for q in range(n_q):
                r = rpg * q + c
                if r < self.rows_step:
                    oh[q, r] = 1.0
            sels.append(oh)
        self.sels = sels
        self.supported = True

    def apply(self, state, x, width_out: int, out_dtype=None):
        from .precision import get_handoff_dtype
        h_dt = get_handoff_dtype()
        if out_dtype is None:
            out_dtype = h_dt
        M, K0, NF = self.M, self.K0, self.NF
        if isinstance(x, tuple):
            xr, xi = x
            T = xr.shape[-1]
        else:
            T = x.shape[-1]
            xr = jnp.real(x)
            xi = jnp.imag(x)
        assert self.ok_for(T, width_out), (T, width_out, M, NF)
        Tb = self._frames(T)
        assert width_out >= Tb, (width_out, Tb)
        n_super = width_out // NF

        xw = self._state_to_xw(state)          # last K0−A samples
        # V tail rows reshaped occurrence-planar, zero-padded to
        # (tail_pad, 128).  Oversampled: [zeros(h) | xw] → tpp rows
        # (the h pad lanes of the OLDEST row are never read — W only
        # reads its m ≥ h lanes).  Critical: tpp−1 whole rows.
        tp = self.tail_pad
        crit = getattr(self, "critical", False)
        n_hist = self.tpp - 1 if crit else self.tpp

        def vtail(plane):
            v = plane.astype(jnp.float32)
            if not crit:
                v = jnp.pad(v, (self.h, 0))
            v = v.reshape(n_hist, M)
            return jnp.pad(v, ((tp - n_hist, 0), (0, 128 - M)))
        er = vtail(jnp.real(xw))
        ei = vtail(jnp.imag(xw))
        xr2 = xr.astype(jnp.float32).reshape(-1, 128)
        xi2 = xi.astype(jnp.float32).reshape(-1, 128)

        cfg = dict(M=M, tpp=self.tpp, tail_pad=tp, k_occ=self.k_occ,
                   rows_step=self.rows_step, G=self.G, rpg=self.rpg,
                   n_q=self.n_q, splan=self.splan, T=T,
                   twoM=2 * M, n_sel=self.n_sel, critical=crit)
        # flops: selects + fold FMAs + the DFT matmul (rolls/selects
        # are data movement, the one-hots are the only select flops)
        n_c = len({c1 for c1, _, _ in self.splan}
                  | {c1 + 1 for c1, lo, cp in self.splan if cp < 128})
        n_folds = 1 if crit else 3
        flops = n_super * (
            n_c * 2 * 2 * self.n_q * self.rows_step * 128
            + n_folds * self.tpp * 2 * 2 * self.k_occ * 128
            + 2 * (2 * M) * 256 * NF)
        from .pallas_cost import costed_pallas_call
        in_specs = [
            pl.BlockSpec((self.rows_step, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((self.rows_step, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tp, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tp, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((self.tpp, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((self.tpp, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((self.tpp, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * M, 256), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec((self.n_q, self.rows_step), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)] * self.n_sel
        bins = costed_pallas_call(
            functools.partial(_chz3_kernel, cfg=cfg),
            grid=(n_super,),
            flops=int(flops),
            label=self.LABEL,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((2 * M, NF), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((2 * M, width_out),
                                           out_dtype),
            scratch_shapes=[
                pltpu.VMEM((tp + self.k_occ, 128), jnp.float32),
                pltpu.VMEM((tp + self.k_occ, 128), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=self.interpret,
        )(xr2, xi2, er, ei,
          jnp.asarray(self.tA, h_dt), jnp.asarray(self.tWlo, h_dt),
          jnp.asarray(self.tWhi, h_dt), jnp.asarray(self.Dfull, h_dt),
          *[jnp.asarray(s) for s in self.sels])

        nh = K0 - self.A
        if isinstance(x, tuple):
            tailx = (jax.lax.complex(xr[..., T - nh:], xi[..., T - nh:])
                     if T >= nh else None)
        else:
            tailx = x[..., T - nh:] if T >= nh else None
        tail = (tailx if tailx is not None
                else jnp.concatenate(
                    [xw, jax.lax.complex(xr, xi)])[..., -nh:])
        tail = jax.lax.optimization_barrier(tail)
        new_state = self._xw_to_state(tail)
        return bins, new_state


def build_pallas_channelizer(chz, interpret: bool = False
                             ) -> Optional[PallasChannelizer]:
    p3 = PallasChannelizerV3(chz, interpret=interpret)
    if p3.supported:
        return p3
    p2 = PallasChannelizerV2(chz, interpret=interpret)
    if p2.supported:
        return p2
    p = PallasChannelizer(chz, interpret=interpret)
    return p if p.supported else None


class PallasPolyChannelizerV3(PallasChannelizerV3):
    """Critically-sampled (advance M) V3: one frame per occurrence, no
    delayed pass — the fold is the single A-pass and the DFT matmul is
    unchanged.  State dict = the chained PolyphaseChannelizer's [M,
    tpp−1] branch history (converted exactly)."""

    LABEL = "poly_channelizer"

    def __init__(self, chz, interpret: bool = False):
        PallasChannelizerV3.__init__(self, chz, interpret=interpret)
        if not self.supported:
            return
        M = self.M
        self.A = M
        self.h = 0
        # one frame per occurrence: k_occ = NF frames per super-step
        self.k_occ = self.NF
        if (self.k_occ * M) % 128:
            self.supported = False
            return
        self.rows_step = self.k_occ * M // 128
        G, rpg, n_q, splan = _chz3_geom(M, self.rows_step)
        if n_q * G != self.k_occ:
            self.supported = False
            return
        self.G, self.rpg, self.n_q, self.splan = G, rpg, n_q, splan
        need_c = sorted({c1 for c1, _, _ in splan}
                        | {c1 + 1 for c1, lo, cp in splan if cp < 128})
        self.n_sel = max(need_c) + 1
        sels = []
        for c in range(self.n_sel):
            oh = np.zeros((n_q, self.rows_step), np.float32)
            for q in range(n_q):
                r = rpg * q + c
                if r < self.rows_step:
                    oh[q, r] = 1.0
            sels.append(oh)
        self.sels = sels

    critical = True

    def _frames(self, T: int) -> int:
        return T // self.M

    _state_to_xw = PallasPolyChannelizer._state_to_xw
    _xw_to_state = PallasPolyChannelizer._xw_to_state


def build_pallas_poly_channelizer(chz, interpret: bool = False
                                  ) -> Optional[PallasPolyChannelizer]:
    """For ops/channelizer.py:PolyphaseChannelizer instances."""
    p3 = PallasPolyChannelizerV3(chz, interpret=interpret)
    if p3.supported:
        return p3
    p = PallasPolyChannelizer(chz, interpret=interpret)
    return p if p.supported else None
