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


def build_pallas_channelizer(chz, interpret: bool = False
                             ) -> Optional[PallasChannelizer]:
    p = PallasChannelizer(chz, interpret=interpret)
    return p if p.supported else None
