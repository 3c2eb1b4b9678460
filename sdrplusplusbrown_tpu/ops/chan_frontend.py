"""Fused post-channelizer front end: bin gather + fine NCO + halfband
2:1 + bandwidth FIR (+ squelch magnitude sums) in ONE pallas kernel.

The PFB channelizer (ops/channelizer.py) splits the band once, but the
per-channel tail — gather the nearest bin, rotate by the residual
offset, 2:1 anti-alias decimate, bandwidth FIR — costs ~680 HBM
B/in-sample as chained XLA ops at C=128 (measured, scanner config):
the [C, 2T/M] gathered array is 2.7× LARGER than the wideband and
round-trips HBM once per stage.  Here all of it runs inside one
sequential-grid kernel:

  grid = (n_super,), dimension_semantics ("arbitrary",); the bins
  planes arrive as a [2M, adv0]-column block per step, the gather is a
  one-hot [C, M] MXU matmul (bin index is a runtime param — retune
  never recompiles), the rotate uses per-(step, block) base phases
  precomputed from float64 spans, and the two FIR stages are banded
  matmuls whose overlap-save history rolls forward in VMEM scratch.
  HBM sees the bins planes once, the IF planes once, the tap matrices,
  and a [2C, ·] tail extract per stage.

The squelch needs mean |y| over the WHOLE block before it can gate
(reference: noise_reduction/squelch.h:55-69), which forces a second
full pass in the chained path; the kernel instead accumulates per-
channel |y| partial sums into a [C, 128] output for free, and the
caller folds the gate into the demodulator's input pass
(models/radio.py:apply_channelized).

State compatibility: consumes/produces ChannelizedRxVFOBank's state
dict entries ("xl" NCO phase, "d2"/"fir" complex tails), so fused and
chained paths interchange freely.

reference behavior: channel/rx_vfo.h:89-121 (xlate -> resample ->
bandwidth FIR per channel); the PFB split is this repo's wide-bank
redesign (docs/benchmarks.md).
"""

from __future__ import annotations

import functools
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .xlator import advance_phase, _TWO_PI

BS = 128          # gather/rotate block (lane width)
SPAN = 2048       # baked span for the base-phase table (bin-rate smp)
MAX_VMEM = 10 * (1 << 20)


def _rup(n: int, a: int) -> int:
    return ((n + a - 1) // a) * a


def _tail_planes(tail_c: jnp.ndarray, pad_k: int,
                 dtype=jnp.float32) -> jnp.ndarray:
    """[C, hist] complex -> [2C, pad_k] planes, left zero-padded.
    ``dtype`` is the kernel-handoff STORAGE dtype (per-block state
    tails are the same precision class as the raw IF handoff)."""
    hist = tail_c.shape[-1]
    p = jnp.concatenate([jnp.real(tail_c), jnp.imag(tail_c)],
                        axis=0).astype(dtype)
    if hist < pad_k:
        p = jnp.pad(p, ((0, 0), (pad_k - hist, 0)))
    return p


class _Stage:
    def __init__(self, **kw):
        self.__dict__.update(kw)


def _chan_kernel(*refs, cfg):
    """refs = [bins, onehot, om, ph0, span_sup, span_bs,
               tail_1..n, H_1..n, y_out, tails_out, sq_out,
               buf_1..n, acc]"""
    n = len(cfg["stages"])
    it = iter(refs)
    bins_ref = next(it)
    oh_ref = next(it)
    om_ref = next(it)
    ph0_ref = next(it)
    spa_ref = next(it)
    sbs_ref = next(it)
    tail_refs = [next(it) for _ in range(n)]
    h_refs = [next(it) for _ in range(n)]
    o_ref = next(it)
    tails_o = next(it)
    sq_o = next(it)
    bufs = [next(it) for _ in range(n)]
    acc = next(it)
    chan_body(pl.program_id(0), bins_ref, oh_ref, om_ref, ph0_ref,
              spa_ref, sbs_ref, tail_refs, h_refs, o_ref, tails_o,
              sq_o, bufs, acc, cfg)


def chan_body(i, bins_ref, oh_ref, om_ref, ph0_ref, spa_ref, sbs_ref,
              tail_refs, h_refs, o_ref, tails_o, sq_o, bufs, acc, cfg):
    """One post-channelizer step: gather + NCO rotate + chained banded
    FIR stages + squelch partials + next-call tail extraction.
    ``bins_ref`` may be an input block or a VMEM scratch the caller
    just filled (the fused PFB+post kernel)."""
    n = len(cfg["stages"])
    C = cfg["C"]
    M = cfg["M"]
    twoC = 2 * C
    adv0 = cfg["adv0"]
    adv_f = cfg["adv_f"]
    m_out = cfg["m_out"]
    n_super = cfg["n_super"]
    stages = cfg["stages"]

    # ---- roll per-stage overlap-save context (VMEM only) ---------------
    for s, st in enumerate(stages):
        hp = st.hist_pad

        @pl.when(i == 0)
        def _init(s=s, hp=hp):
            bufs[s][:, :hp] = tail_refs[s][...].astype(jnp.float32)

        @pl.when(i > 0)
        def _roll(s=s, hp=hp, st=st):
            bufs[s][:, :hp] = bufs[s][:, st.adv_in:st.adv_in + hp]

    @pl.when(i == 0)
    def _zero_acc():
        acc[...] = jnp.zeros((C, BS), jnp.float32)

    # ---- gather + rotate into stage-0 input -----------------------------
    # NCO base phase computed IN-KERNEL from three per-channel scalars
    # (phase0 + span·i + bs·b — the old host-built [C, n_super·nb_pad]
    # table cost ~16 HBM B/in-sample of pad+copy glue at C=256)
    hp0 = stages[0].hist_pad
    fi = i.astype(jnp.float32)
    for b in range(adv0 // BS):
        # bins may arrive in the bf16 handoff storage dtype
        # (ops/pallas_channelizer.py emits it); math stays f32
        br = bins_ref[0:M, b * BS:(b + 1) * BS].astype(jnp.float32)
        bi = bins_ref[M:2 * M, b * BS:(b + 1) * BS].astype(jnp.float32)
        re = jnp.dot(oh_ref[...], br, preferred_element_type=jnp.float32)
        im = jnp.dot(oh_ref[...], bi, preferred_element_type=jnp.float32)
        jj = jax.lax.broadcasted_iota(jnp.int32, (C, BS),
                                      1).astype(jnp.float32)
        ang = (ph0_ref[...] + spa_ref[...] * fi
               + sbs_ref[...] * jnp.float32(b) + om_ref[...] * jj)
        cr = jnp.cos(ang)
        si = jnp.sin(ang)
        col = hp0 + b * BS
        bufs[0][0:C, col:col + BS] = re * cr - im * si
        bufs[0][C:twoC, col:col + BS] = re * si + im * cr

    # ---- chained FIR stages (banded matmuls) ----------------------------
    for s, st in enumerate(stages):
        dst = bufs[s + 1] if s + 1 < n else None
        dst_hp = stages[s + 1].hist_pad if s + 1 < n else 0
        for r in range(st.adv_out // 128):
            win = bufs[s][:, st.win0 + r * st.row_adv:
                          st.win0 + r * st.row_adv + st.Lw]
            res = jnp.dot(win, h_refs[s][...].astype(jnp.float32),
                          preferred_element_type=jnp.float32)
            if dst is not None:
                dst[:, dst_hp + r * 128:dst_hp + (r + 1) * 128] = res
            else:
                o_ref[:, r * 128:(r + 1) * 128] = res.astype(o_ref.dtype)
                # squelch partials: Σ|y| over VALID outputs only (the
                # padded tail of the last step is garbage)
                gidx = (i * adv_f + r * 128
                        + jax.lax.broadcasted_iota(jnp.int32, (C, BS), 1))
                mag = jnp.sqrt(res[:C] * res[:C] + res[C:] * res[C:])
                acc[...] = acc[...] + jnp.where(gidx < m_out, mag, 0.0)

    # ---- next-call tail extraction + squelch sums ------------------------
    for s, st in enumerate(stages):
        @pl.when(i == st.i_tail)
        def _tl(s=s, st=st):
            tails_o[:, st.tail_off:st.tail_off + st.tail_w] = \
                bufs[s][:, st.tail_al:st.tail_al + st.tail_w] \
                .astype(tails_o.dtype)

    @pl.when(i == n_super - 1)
    def _sq():
        sq_o[...] = acc[...]


class ChanPostPipeline:
    """Built from a ChannelizedRxVFOBank; ``supported`` is False when
    the geometry can't use the kernel (fallback: the chained XLA path)."""

    def __init__(self, bank, C: int, interpret: bool = False):
        from .pallas_fir import toeplitz_taps_decim
        self.C = int(C)
        self.M = int(bank.M)
        self.interpret = interpret
        self.supported = False
        if C % 8 or C < 8 or self.M % 4:
            return
        blocks = [("d2", bank.decim2, 2)]
        if bank.filter_needed:
            blocks.append(("fir", bank.fir, 1))
        raw = []
        for name, blk, D in blocks:
            if getattr(blk, "_complex_taps", False):
                return
            K = int(blk.K)
            if K > 2048:
                return
            raw.append({"name": name, "K": K, "D": int(blk.decim),
                        "taps": np.asarray(blk.taps, np.float32)})
            assert int(blk.decim) == D
        # geometry: final advance adv_f = 128k; walk back through decims
        best = None
        for k in (4, 8, 2, 16, 1):
            adv_f = 128 * k
            advs = [adv_f]
            for st in reversed(raw):
                advs.insert(0, advs[0] * st["D"])
            adv0 = advs[0]
            if adv0 % BS:
                continue
            vmem = 2 * self.M * adv0 * 4 + self.C * BS * 4
            stages = []
            ok = True
            for s, st in enumerate(raw):
                hist = st["K"] - 1
                hp = _rup(hist, 128)
                Lw = (128 - 1) * st["D"] + st["K"]
                tail_w = _rup(hist + 127, 128)
                if hp + advs[s] < max(Lw, tail_w):
                    ok = False
                    break
                H = toeplitz_taps_decim(st["taps"], 128, st["D"])
                stages.append(_Stage(
                    name=st["name"], adv_in=advs[s], adv_out=advs[s + 1],
                    hist=hist, hist_pad=hp, row_adv=128 * st["D"], Lw=Lw,
                    win0=hp - hist, H=H, tail_w=tail_w,
                    i_tail=0, tail_al=0, tail_off=0))
                vmem += (H.size * 4 + 2 * self.C * (hp + advs[s]) * 4
                         + 2 * self.C * hp * 4)
            if not ok:
                continue
            vmem += 2 * self.C * adv_f * 4 * 2
            if vmem > MAX_VMEM:
                continue
            best = (advs, stages)
            break
        if best is None:
            return
        self.advs, self.stages = best
        self.adv0, self.adv_f = self.advs[0], self.advs[-1]
        off = 0
        for st in self.stages:
            st.tail_off = off
            off += st.tail_w
        self.tails_w_total = off
        self._plan_cache = {}
        self.supported = True

    def _plan(self, Tb: int):
        plan = self._plan_cache.get(Tb)
        if plan is not None:
            return plan
        m = [Tb]
        for st in self.stages:
            m.append(m[-1] // (st.adv_in // st.adv_out))
        n_super = -(-m[-1] // self.adv_f)
        Tb_pad = n_super * self.adv0
        tails = []
        for s, st in enumerate(self.stages):
            m_in = m[s]
            i_t = min((m_in - 1) // st.adv_in, n_super - 1)
            end_local = st.hist_pad + m_in - i_t * st.adv_in
            al = max(0, (end_local - st.hist) // 128 * 128)
            al = min(al, st.hist_pad + st.adv_in - st.tail_w)
            assert al >= 0 and al + st.tail_w >= end_local >= st.hist, \
                (s, al, end_local, st.hist)
            tails.append((i_t, al, end_local))
        plan = {"m": m, "n_super": n_super, "Tb_pad": Tb_pad,
                "tails": tails}
        self._plan_cache[Tb] = plan
        return plan

    def apply(self, params, state, bins_planes, return_planes=False,
              Tb: int | None = None, raw: bool = False):
        """bins_planes: (yr, yi) [M, Tb] float32 planes from
        OversampledChannelizer.apply_planes, or the already-stacked
        padded [2M, Tb_pad] array it emits with ``pad_to`` (then pass
        the valid width as ``Tb``).  Returns
        ((y | (yr, yi)), sq_sums [C], state')."""
        C, M = self.C, self.M
        if isinstance(bins_planes, tuple):
            yr, yi = bins_planes
            Tb = yr.shape[-1]
            plan = self._plan(Tb)
            bins = jnp.concatenate([yr, yi], axis=0)
            if plan["Tb_pad"] > Tb:
                bins = jnp.pad(bins, ((0, 0), (0, plan["Tb_pad"] - Tb)))
        else:
            assert Tb is not None
            plan = self._plan(Tb)
            bins = bins_planes
            assert bins.shape == (2 * M, plan["Tb_pad"]), \
                (bins.shape, plan["Tb_pad"])
        n_super, Tb_pad = plan["n_super"], plan["Tb_pad"]
        m_out = plan["m"][-1]

        onehot = jax.nn.one_hot(params["bin"], M, dtype=jnp.float32)

        # NCO base phase = phase0 + span_adv·i + xl_bs·b, computed
        # IN-KERNEL from these three per-channel scalars (exact mod-2π
        # spans; the old host-built table was real HBM glue)
        om = params["xl"]["omega"]
        phase0 = state["xl"]
        a_sup, rem = divmod(self.adv0, SPAN)
        b_bs = rem // BS
        span_adv = params["xl_sup"] * a_sup + params["xl_bs"] * b_bs

        # tap matrices, state tails and the raw kernel-to-kernel output
        # ride HBM in the handoff storage dtype (math stays f32 —
        # upcast at use); the trimmed/planes forms feed chained f32
        # consumers
        from .precision import get_handoff_dtype
        h_dt = get_handoff_dtype()
        o_dtype = h_dt if raw else jnp.float32
        tail_ops = [_tail_planes(state[st.name], st.hist_pad, h_dt)
                    for st in self.stages]
        h_ops = [jnp.asarray(st.H, h_dt) for st in self.stages]

        n = len(self.stages)
        twoC = 2 * C
        cfg = {
            "C": C, "M": M, "adv0": self.adv0, "adv_f": self.adv_f,
            "m_out": m_out, "n_super": n_super,
            "stages": [
                _Stage(**{**st.__dict__, "H": None,
                          "i_tail": plan["tails"][s][0],
                          "tail_al": plan["tails"][s][1]})
                for s, st in enumerate(self.stages)],
        }
        in_specs = [
            pl.BlockSpec((2 * M, self.adv0), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, M), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec((C, 1), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)] * 4
        for st in self.stages:
            in_specs.append(pl.BlockSpec((twoC, st.hist_pad),
                                         lambda i: (0, 0),
                                         memory_space=pltpu.VMEM))
        for st in self.stages:
            in_specs.append(pl.BlockSpec(st.H.shape, lambda i: (0, 0),
                                         memory_space=pltpu.VMEM))
        out_specs = [
            pl.BlockSpec((twoC, self.adv_f), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((twoC, self.tails_w_total), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, BS), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        scratch = [pltpu.VMEM((twoC, st.hist_pad + st.adv_in), jnp.float32)
                   for st in self.stages]
        scratch.append(pltpu.VMEM((C, BS), jnp.float32))

        flops = n_super * (2 * 2 * C * M * self.adv0      # gather matmuls
                           + 10 * C * self.adv0)          # rotate
        for st in self.stages:
            flops += n_super * 2 * st.Lw * st.adv_out * twoC
        from .pallas_cost import costed_pallas_call
        out, tails_out, sq = costed_pallas_call(
            functools.partial(_chan_kernel, cfg=cfg),
            grid=(n_super,),
            flops=int(flops),
            transcendentals=int(n_super * 2 * C * self.adv0),
            label="chan_postpipe",
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=[
                jax.ShapeDtypeStruct((twoC, n_super * self.adv_f),
                                     o_dtype),
                jax.ShapeDtypeStruct((twoC, self.tails_w_total),
                                     h_dt),
                jax.ShapeDtypeStruct((C, BS), jnp.float32),
            ],
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=self.interpret,
        )(bins, onehot, om[:, None],
          phase0.astype(jnp.float32)[:, None],
          span_adv.astype(jnp.float32)[:, None],
          params["xl_bs"].astype(jnp.float32)[:, None],
          *tail_ops, *h_ops)

        if raw:
            # untrimmed [2C, n_super·adv_f] stacked planes + valid width
            # — feeds ops/demod_kernel.py without a concat/trim pass
            y = (out, m_out)
        elif return_planes:
            y = (out[:C, :m_out], out[C:, :m_out])
        else:
            y = jax.lax.complex(out[:C, :m_out], out[C:, :m_out])
        sq_sums = jnp.sum(sq, axis=-1)

        new_state = dict(state)
        new_state["xl"] = advance_phase(state["xl"], om,
                                        params["xl"]["omega_span"], Tb)
        for s, st in enumerate(self.stages):
            _it, al, end_local = plan["tails"][s]
            seg = tails_out[:, st.tail_off:st.tail_off + st.tail_w]
            lo = end_local - al - st.hist
            tl = seg[:, lo:lo + st.hist].astype(jnp.float32)
            new_state[st.name] = jax.lax.complex(tl[:C], tl[C:])
        return y, sq_sums, new_state


def build_chan_pipeline(bank, C: int,
                        interpret: bool = False
                        ) -> Optional[ChanPostPipeline]:
    p = ChanPostPipeline(bank, C, interpret=interpret)
    return p if p.supported else None


def _chan_fused_kernel_v3(*refs, cfg, pcfg, n_sub):
    """V3 (phase-planar WOLA) PFB sub-steps + the unchanged post body;
    the bins stack stays in VMEM (see _chan_fused_kernel)."""
    n = len(cfg["stages"])
    n_sel = pcfg["n_sel"]
    it = iter(refs)
    xr_ref = next(it)
    xi_ref = next(it)
    er_ref = next(it)
    ei_ref = next(it)
    tA = next(it)
    tWlo = next(it)
    tWhi = next(it)
    dfull = next(it)
    sel_refs = [next(it) for _ in range(n_sel)]
    oh_ref = next(it)
    om_ref = next(it)
    ph0_ref = next(it)
    spa_ref = next(it)
    sbs_ref = next(it)
    tail_refs = [next(it) for _ in range(n)]
    h_refs = [next(it) for _ in range(n)]
    o_ref = next(it)
    tails_o = next(it)
    sq_o = next(it)
    vr = next(it)
    vi = next(it)
    binsbuf = next(it)
    bufs = [next(it) for _ in range(n)]
    acc = next(it)

    from .pallas_channelizer import chz3_step
    i = pl.program_id(0)
    twoM, NF = pcfg["twoM"], pcfg["NF"]
    for s in range(n_sub):
        bins = chz3_step(i * n_sub + s, xr_ref, xi_ref, er_ref, ei_ref,
                         vr, vi, tA, tWlo, tWhi, dfull, sel_refs, pcfg,
                         row0=s * pcfg["rows_step"])
        binsbuf[:, s * NF:(s + 1) * NF] = bins[0:twoM, :]
    chan_body(i, binsbuf, oh_ref, om_ref, ph0_ref, spa_ref, sbs_ref,
              tail_refs, h_refs, o_ref, tails_o, sq_o, bufs, acc, cfg)


def _chan_fused_kernel(*refs, cfg, pcfg, n_sub):
    n = len(cfg["stages"])
    it = iter(refs)
    xr_ref = next(it)
    xi_ref = next(it)
    er_ref = next(it)
    ei_ref = next(it)
    pre = next(it)
    pro = next(it)
    pie = next(it)
    pio = next(it)
    oh_ref = next(it)
    om_ref = next(it)
    ph0_ref = next(it)
    spa_ref = next(it)
    sbs_ref = next(it)
    tail_refs = [next(it) for _ in range(n)]
    h_refs = [next(it) for _ in range(n)]
    o_ref = next(it)
    tails_o = next(it)
    sq_o = next(it)
    rb_r = next(it)
    rb_i = next(it)
    sl_r = next(it)
    sl_i = next(it)
    binsbuf = next(it)
    bufs = [next(it) for _ in range(n)]
    acc = next(it)

    from .pallas_channelizer import (chz2_init_slabs, chz2_fill_rbuf,
                                     chz2_compute)
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _slabs():
        chz2_init_slabs(sl_r, sl_i, pre, pro, pie, pio, pcfg)

    chz2_fill_rbuf(i, rb_r, rb_i, xr_ref, xi_ref, er_ref, ei_ref,
                   pcfg, n_sub * pcfg["rows_step"])
    twoM, NF = pcfg["twoM"], pcfg["NF"]
    for s in range(n_sub):
        oa = chz2_compute(rb_r, rb_i, sl_r, sl_i, pcfg,
                          row0=s * pcfg["rows_step"])
        binsbuf[:, s * NF:(s + 1) * NF] = oa[0:twoM, :]
    chan_body(i, binsbuf, oh_ref, om_ref, ph0_ref, spa_ref, sbs_ref,
              tail_refs, h_refs, o_ref, tails_o, sq_o, bufs, acc, cfg)


class ChanFusedPipeline:
    """PFB channelizer + post-channelizer front end in ONE kernel: the
    [2M, Tb_pad] bins plane stack never leaves VMEM (the HBM handoff
    between the two kernels was 16.4 B/in-sample at 2.4 MS/s, channel-
    count independent).  Per grid step the kernel runs n_sub PFB
    super-steps (ops/pallas_channelizer.py:chz2_compute over a shared
    rolling row buffer) into a bins scratch, then the unchanged
    post-channelizer body (chan_body).  Outputs, state contract and
    numerics are identical to PallasChannelizerV2 → ChanPostPipeline.

    reference behavior: one RxVFO chain per channel
    (core/src/dsp/channel/rx_vfo.h:89-121); the fused wide-bank form is
    this repo's TPU redesign."""

    def __init__(self, bank, C: int, interpret: bool = False):
        from .pallas_channelizer import (PallasChannelizerV2,
                                         PallasChannelizerV3)
        self.interpret = interpret
        self.supported = False
        self.post = ChanPostPipeline(bank, C, interpret=interpret)
        pz3 = PallasChannelizerV3(bank.chz, interpret=interpret)
        self.use_v3 = pz3.supported
        self.pz = pz3 if self.use_v3 \
            else PallasChannelizerV2(bank.chz, interpret=interpret)
        if not (self.post.supported and self.pz.supported):
            return
        post, pz = self.post, self.pz
        if post.adv0 % pz.NF:
            return
        self.n_sub = n_sub = post.adv0 // pz.NF
        self.rows_blk = rows_blk = n_sub * pz.rows_step
        twoM = 2 * pz.M
        if self.use_v3:
            vmem = (2 * (pz.tail_pad + pz.k_occ) * 128 * 4   # V pair
                    + twoM * post.adv0 * 4                   # bins
                    + 2 * 2 * rows_blk * 128 * 4)            # x blocks
        else:
            # last sub-block's select window must fit (chz2_compute
            # slices [row0, row0 + rup8(n_lead + rows_step)))
            self.rows_pad = max(
                _rup(pz.n_lead + rows_blk, 8),
                (n_sub - 1) * pz.rows_step
                + _rup(pz.n_lead + pz.rows_step, 8))
            vmem = (2 * self.rows_pad * 128 * 4          # rbuf pair
                    + 2 * pz.Ws * pz.Bs * 128 * 4        # slabs
                    + twoM * post.adv0 * 4               # bins scratch
                    + 2 * 2 * rows_blk * 128 * 4)        # x blocks (dbl)
        vmem += 2 * C * BS * 4                       # acc
        for s, st in enumerate(post.stages):
            vmem += (st.H.size * 4
                     + 2 * C * (st.hist_pad + post.advs[s]) * 4
                     + 2 * C * st.hist_pad * 4)
        vmem += 2 * C * post.adv_f * 4 * 2
        # scoped-VMEM hard limit is 16 MB; leave headroom for Mosaic's
        # own temporaries (the compile sweep exercises the big configs)
        if vmem > 12 * (1 << 20):
            return
        self.supported = True

    def ok_for(self, T: int, Tb_pad: int) -> bool:
        return (self.pz.ok_for(T, Tb_pad)
                and Tb_pad % self.post.adv0 == 0)

    def apply(self, params, state, x, return_planes=False,
              raw: bool = False):
        """x: [T] complex wideband or (xr, xi) f32 planes →
        ((y | planes | (raw, m_out)), sq_sums [C], state') — the
        ChanPostPipeline contract with state["chz"] updated too."""
        post, pz = self.post, self.pz
        C, M = post.C, post.M
        if isinstance(x, tuple):
            xr, xi = x
            T = xr.shape[-1]
        else:
            T = x.shape[-1]
            xr = jnp.real(x)
            xi = jnp.imag(x)
        Tb = 2 * T // pz.M
        plan = post._plan(Tb)
        Tb_pad = plan["Tb_pad"]
        assert self.ok_for(T, Tb_pad), (T, Tb_pad)
        n_super = Tb_pad // post.adv0
        m_out = plan["m"][-1]

        from .precision import get_handoff_dtype
        h_dt = get_handoff_dtype()
        o_dtype = h_dt if raw else jnp.float32

        # ---- PFB operands (ops/pallas_channelizer.py V3 / V2 form) -----
        K0, A = pz.K0, pz.A
        xw = pz._state_to_xw(state["chz"])
        xr2 = xr.astype(jnp.float32).reshape(-1, 128)
        xi2 = xi.astype(jnp.float32).reshape(-1, 128)
        if self.use_v3:
            tp = pz.tail_pad

            def vtail(plane):
                v = jnp.pad(plane.astype(jnp.float32), (pz.h, 0)) \
                    .reshape(pz.tpp, pz.M)
                return jnp.pad(v, ((tp - pz.tpp, 0), (0, 128 - pz.M)))
            er = vtail(jnp.real(xw))
            ei = vtail(jnp.imag(xw))
            pcfg = dict(M=pz.M, tpp=pz.tpp, tail_pad=tp,
                        k_occ=pz.k_occ, rows_step=pz.rows_step,
                        G=pz.G, rpg=pz.rpg, n_q=pz.n_q,
                        splan=pz.splan, T=T, twoM=2 * pz.M,
                        NF=pz.NF, n_sel=pz.n_sel)
        else:
            lead = pz.n_lead * 128 - (K0 - A)
            er = jnp.pad(jnp.real(xw).astype(jnp.float32),
                         (lead, 0)).reshape(pz.n_lead, 128)
            ei = jnp.pad(jnp.imag(xw).astype(jnp.float32),
                         (lead, 0)).reshape(pz.n_lead, 128)
            pcfg = dict(h=A, K0=K0, Lsc=pz.Lsc, n_r=pz.n_r, n_g=pz.n_g,
                        Bs=pz.Bs, n_b=pz.n_b, Ws=pz.Ws, n_u=pz.n_u,
                        NF=pz.NF, n_lead=pz.n_lead,
                        rows_step=pz.rows_step,
                        nrow_b=pz.nrow_b, k_max=pz.k_max, T=T,
                        twoM=2 * pz.M, aq=pz.aq, cq=pz.cq)

        # ---- post-channelizer operands (ChanPostPipeline.apply) --------
        onehot = jax.nn.one_hot(params["bin"], M, dtype=jnp.float32)
        om = params["xl"]["omega"]
        phase0 = state["xl"]
        a_sup, rem = divmod(post.adv0, SPAN)
        b_bs = rem // BS
        span_adv = params["xl_sup"] * a_sup + params["xl_bs"] * b_bs
        tail_ops = [_tail_planes(state[st.name], st.hist_pad, h_dt)
                    for st in post.stages]
        h_ops = [jnp.asarray(st.H, h_dt) for st in post.stages]
        n = len(post.stages)
        twoC = 2 * C
        cfg = {
            "C": C, "M": M, "adv0": post.adv0, "adv_f": post.adv_f,
            "m_out": m_out, "n_super": n_super,
            "stages": [
                _Stage(**{**st.__dict__, "H": None,
                          "i_tail": plan["tails"][s][0],
                          "tail_al": plan["tails"][s][1]})
                for s, st in enumerate(post.stages)],
        }

        in_specs = [
            pl.BlockSpec((self.rows_blk, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((self.rows_blk, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ]
        if self.use_v3:
            in_specs += [
                pl.BlockSpec((pz.tail_pad, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((pz.tail_pad, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ] + [pl.BlockSpec((pz.tpp, 128), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)] * 3 + [
                pl.BlockSpec((2 * M, 256), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ] + [pl.BlockSpec((pz.n_q, pz.rows_step), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)] * pz.n_sel
        else:
            in_specs += [
                pl.BlockSpec((pz.n_lead, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((pz.n_lead, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ] + [pl.BlockSpec((K0, 128), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)] * 4
        in_specs += [
            pl.BlockSpec((C, M), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec((C, 1), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)] * 4
        for st in post.stages:
            in_specs.append(pl.BlockSpec((twoC, st.hist_pad),
                                         lambda i: (0, 0),
                                         memory_space=pltpu.VMEM))
        for st in post.stages:
            in_specs.append(pl.BlockSpec(st.H.shape, lambda i: (0, 0),
                                         memory_space=pltpu.VMEM))
        out_specs = [
            pl.BlockSpec((twoC, post.adv_f), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((twoC, post.tails_w_total), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, BS), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        if self.use_v3:
            scratch = [
                pltpu.VMEM((pz.tail_pad + pz.k_occ, 128), jnp.float32),
                pltpu.VMEM((pz.tail_pad + pz.k_occ, 128), jnp.float32),
                pltpu.VMEM((2 * pz.M, post.adv0), jnp.float32),
            ]
        else:
            scratch = [
                pltpu.VMEM((self.rows_pad, 128), jnp.float32),
                pltpu.VMEM((self.rows_pad, 128), jnp.float32),
                pltpu.VMEM((pz.Ws, pz.Bs * 128), jnp.float32),
                pltpu.VMEM((pz.Ws, pz.Bs * 128), jnp.float32),
                pltpu.VMEM((2 * pz.M, post.adv0), jnp.float32),
            ]
        scratch += [pltpu.VMEM((twoC, st.hist_pad + st.adv_in),
                               jnp.float32) for st in post.stages]
        scratch.append(pltpu.VMEM((C, BS), jnp.float32))

        if self.use_v3:
            n_c = len({c1 for c1, _, _ in pz.splan}
                      | {c1 + 1 for c1, lo, cp in pz.splan if cp < 128})
            pfb_flops = self.n_sub * (
                n_c * 2 * 2 * pz.n_q * pz.rows_step * 128
                + 3 * pz.tpp * 2 * 2 * pz.k_occ * 128
                + 2 * (2 * M) * 256 * pz.NF)
        else:
            sub_w = _rup(pz.n_lead + pz.rows_step, 8)
            sel = (0 if pz.n_r == 1
                   else 2 * pz.k_max * 2 * pz.n_u * sub_w * 128)
            pfb_flops = self.n_sub * (
                sel + pz.n_b * 2 * 2 * pz.n_u * pz.Ws * pz.Bs * 128
                + pz.n_g * 2 * 128 * pz.n_u * pz.NF)
        flops = n_super * (pfb_flops
                           + 2 * 2 * C * M * post.adv0
                           + 10 * C * post.adv0)
        for st in post.stages:
            flops += n_super * 2 * st.Lw * st.adv_out * twoC
        from .pallas_cost import costed_pallas_call
        kern = _chan_fused_kernel_v3 if self.use_v3 \
            else _chan_fused_kernel
        if self.use_v3:
            pfb_ops = (jnp.asarray(pz.tA, h_dt),
                       jnp.asarray(pz.tWlo, h_dt),
                       jnp.asarray(pz.tWhi, h_dt),
                       jnp.asarray(pz.Dfull, h_dt),
                       *[jnp.asarray(m) for m in pz.sels])
        else:
            pfb_ops = (jnp.asarray(pz.Pre, h_dt),
                       jnp.asarray(pz.Pro, h_dt),
                       jnp.asarray(pz.Pie, h_dt),
                       jnp.asarray(pz.Pio, h_dt))
        out, tails_out, sq = costed_pallas_call(
            functools.partial(kern, cfg=cfg, pcfg=pcfg,
                              n_sub=self.n_sub),
            grid=(n_super,),
            flops=int(flops),
            transcendentals=int(n_super * 2 * C * post.adv0),
            label="chan_fused",
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=[
                jax.ShapeDtypeStruct((twoC, n_super * post.adv_f),
                                     o_dtype),
                jax.ShapeDtypeStruct((twoC, post.tails_w_total),
                                     h_dt),
                jax.ShapeDtypeStruct((C, BS), jnp.float32),
            ],
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=self.interpret,
        )(xr2, xi2, er, ei, *pfb_ops,
          onehot, om[:, None],
          phase0.astype(jnp.float32)[:, None],
          span_adv.astype(jnp.float32)[:, None],
          params["xl_bs"].astype(jnp.float32)[:, None],
          *tail_ops, *h_ops)

        if raw:
            y = (out, m_out)
        elif return_planes:
            y = (out[:C, :m_out], out[C:, :m_out])
        else:
            y = jax.lax.complex(out[:C, :m_out], out[C:, :m_out])
        sq_sums = jnp.sum(sq, axis=-1)

        new_state = dict(state)
        new_state["xl"] = advance_phase(state["xl"], om,
                                        params["xl"]["omega_span"], Tb)
        for s, st in enumerate(post.stages):
            _it, al, end_local = plan["tails"][s]
            seg = tails_out[:, st.tail_off:st.tail_off + st.tail_w]
            lo = end_local - al - st.hist
            tl = seg[:, lo:lo + st.hist].astype(jnp.float32)
            new_state[st.name] = jax.lax.complex(tl[:C], tl[C:])
        # chz state from the raw input tail (pallas_channelizer V2 rule)
        nh = K0 - A
        if T >= nh:
            tail = jax.lax.complex(xr[..., T - nh:], xi[..., T - nh:])
        else:
            tail = jnp.concatenate(
                [xw, jax.lax.complex(xr, xi)])[..., -nh:]
        tail = jax.lax.optimization_barrier(tail)
        new_state["chz"] = pz._xw_to_state(tail)
        return y, sq_sums, new_state


def build_chan_fused(bank, C: int, interpret: bool = False
                     ) -> Optional[ChanFusedPipeline]:
    p = ChanFusedPipeline(bank, C, interpret=interpret)
    return p if p.supported else None
