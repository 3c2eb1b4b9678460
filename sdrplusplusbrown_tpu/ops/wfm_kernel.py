"""Fused WFM demodulator kernel: FM discriminator → MPX predecimation
halfbands → stereo section (pilot FIR, normalize-VCO, L±R matrix) in
ONE pallas pass over the IF planes.

The chained WFM demod costs ~154 HBM B/in-sample in the WFM-8 chain
even with the stereo section already fused (ops/pallas_wfm.py): the
discriminator and each 500k/250k-rate halfband still round-trip HBM.
This kernel reads the IF planes once and writes the L/R planes at the
MPX rate once:

  * the discriminator angle(x[n]·conj(x[n−1])) uses a lane-roll for
    the one-sample history and the shared minimax-poly atan2
    (ops/demod_kernel.py — Mosaic has no atan primitive; 2.4e-7 rad);
  * the halfbands are banded matmuls with VMEM rolling overlap-save
    state (state-compatible with BroadcastFM's "mpx_decim" tails);
  * the stereo section reuses the ops/pallas_wfm.py identities —
    lmr[n] = 2·mpx[n−d]·Re(conj(vco[n])²) with the one-sample PLL lag
    and the pilot-phase correction folded into the window offset and a
    complex constant — on the in-VMEM MPX buffer ("mpx_hist" state,
    last K MPX samples, same as the standalone stereo kernel).

reference behavior: demod/quadrature.h:39-46 and
demod/broadcast_fm.h:144-215 via ops/wfm.py's normalize-mode path.
"""

from __future__ import annotations

import functools
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .demod_kernel import _atan2_poly
from .pallas_wfm import stereo_pilot_matrix

MAX_VMEM = 15 * (1 << 20)


def _rup(n: int, a: int) -> int:
    return ((n + a - 1) // a) * a


def _wfm_kernel(if_ref, qtail_ref, hist_ref, *rest, cfg):
    it = iter(rest)
    n_hb = cfg["n_hb"]
    hbt_refs = [next(it) for _ in range(n_hb)]
    hhb_refs = [next(it) for _ in range(n_hb)]
    hp_ref = next(it)
    o_ref = next(it)
    qtail_o = next(it)
    tails_o = next(it)
    qcarry = next(it)
    bufs = [next(it) for _ in range(n_hb)]
    bufm = next(it)

    i = pl.program_id(0)
    C = cfg["C"]
    twoC = 2 * C
    adv_if = cfg["adv_if"]
    adv_mpx = cfg["adv_mpx"]
    K = cfg["K"]
    d = cfg["d"]
    hpS = cfg["hpS"]

    # ---- roll histories --------------------------------------------------
    @pl.when(i == 0)
    def _init():
        qcarry[...] = qtail_ref[...].astype(jnp.float32)
        for s in range(n_hb):
            bufs[s][:, :cfg["hps"][s]] = \
                hbt_refs[s][...].astype(jnp.float32)
        bufm[:, :hpS] = hist_ref[...].astype(jnp.float32)

    @pl.when(i > 0)
    def _roll():
        for s in range(n_hb):
            a = cfg["advs"][s]
            bufs[s][:, :cfg["hps"][s]] = bufs[s][:, a:a + cfg["hps"][s]]
        bufm[:, :hpS] = bufm[:, adv_mpx:adv_mpx + hpS]

    # ---- masked IF in + quadrature ---------------------------------------
    gcol = (i * adv_if
            + jax.lax.broadcasted_iota(jnp.int32, (twoC, adv_if), 1))
    # IF planes may arrive bf16 (ops/precision.py handoff) — storage
    # only; upcast before any arithmetic
    cur = jnp.where(gcol < cfg["m_if"],
                    if_ref[...].astype(jnp.float32), 0.0)
    oh = (jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
          == 127).astype(jnp.float32)
    prev0 = jnp.dot(qcarry[...], oh, preferred_element_type=jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (twoC, adv_if), 1)
    prev = jnp.where(lane == 0, prev0, pltpu.roll(cur, 1, 1))
    er = cur[0:C, :]
    ei = cur[C:twoC, :]
    erp = prev[0:C, :]
    eip = prev[C:twoC, :]
    re = er * erp + ei * eip
    im = ei * erp - er * eip
    y = _atan2_poly(im, re) * jnp.float32(cfg["inv_dev"])
    bufs[0][:, cfg["hps"][0]:] = y
    qcarry[...] = jax.lax.slice(cur, (0, adv_if - 128), (twoC, adv_if))

    # ---- halfband chain (banded matmuls, decim 2) ------------------------
    for s in range(n_hb):
        dst = bufs[s + 1] if s + 1 < n_hb else bufm
        dst_hp = cfg["hps"][s + 1] if s + 1 < n_hb else hpS
        w0 = cfg["hps"][s] - cfg["hists"][s]
        out_adv = cfg["advs"][s] // 2
        for r in range(out_adv // 128):
            win = bufs[s][:, w0 + r * 256:w0 + r * 256 + cfg["Lws"][s]]
            dst[:, dst_hp + r * 128:dst_hp + (r + 1) * 128] = \
                jnp.dot(win, hhb_refs[s][...].astype(jnp.float32),
                        preferred_element_type=jnp.float32)

    # ---- stereo section on the in-VMEM MPX -------------------------------
    ur = jnp.float32(cfg["ur"])
    ui2 = jnp.float32(2.0 * cfg["ui"])
    for r in range(adv_mpx // 128):
        base = hpS + r * 128
        # lagged pilot: p[n−1] needs mpx[n−K+k], k∈[0,K)
        win_p = bufm[:, base - K:base - K + (127 + K)]
        pp = jnp.dot(win_p, hp_ref[...].astype(jnp.float32),
                     preferred_element_type=jnp.float32)   # [C, 256]
        a = pp[:, :128]
        b = pp[:, 128:]
        m2 = a * a + b * b
        wsub = (ur * (a * a - b * b) + ui2 * (a * b)) \
            / jnp.maximum(m2, 1e-20)
        lpr = bufm[:, base - d:base - d + 128]
        two = 2.0 * wsub
        left = lpr * (1.0 + two)
        right = lpr * (1.0 - two)
        if cfg["out_bf16"]:
            left = left.astype(jnp.bfloat16)
            right = right.astype(jnp.bfloat16)
        o_ref[0:C, r * 128:(r + 1) * 128] = left
        o_ref[C:twoC, r * 128:(r + 1) * 128] = right

    # ---- next-call tails --------------------------------------------------
    @pl.when(i == cfg["iq_t"])
    def _tq():
        qtail_o[...] = jax.lax.slice(
            cur, (0, cfg["alq"]),
            (twoC, cfg["alq"] + 128)).astype(qtail_o.dtype)

    off = 0
    for s in range(n_hb):
        @pl.when(i == cfg["ih_t"][s])
        def _th(s=s, off=off):
            tails_o[:, off:off + cfg["tws"][s]] = \
                bufs[s][:, cfg["alh"][s]:cfg["alh"][s] + cfg["tws"][s]] \
                .astype(tails_o.dtype)
        off += cfg["tws"][s]

    @pl.when(i == cfg["im_t"])
    def _tm(off=off):
        tails_o[:, off:off + cfg["twm"]] = \
            bufm[:, cfg["alm"]:cfg["alm"] + cfg["twm"]] \
            .astype(tails_o.dtype)


class WFMDemodPipeline:
    """Built from a BroadcastFM demod; ``supported`` False when the
    config can't use the kernel (scan-mode PLL, RDS tap, mono, odd
    geometry — fallback: the chained path + ops/pallas_wfm.py)."""

    def __init__(self, dem, C: int, interpret: bool = False):
        from .pallas_fir import toeplitz_taps_decim
        self.C = int(C)
        self.interpret = interpret
        self.supported = False
        if C % 4 or C < 4:
            return
        if (dem.pll_mode != "normalize" or not dem.stereo or dem.rds_out
                or not dem.mpx_stages):
            return
        self.inv_dev = float(dem.quad.inv_deviation)
        self.K = int(len(dem.pilot_taps))
        self.d = int(dem.lpr_delay.delay)
        if self.d > self.K:
            return
        u = np.conj(complex(dem.pilot_phase_corr)) ** 2
        self.ur, self.ui = float(np.real(u)), float(np.imag(u))
        self.Hp = stereo_pilot_matrix(np.asarray(dem.pilot_taps), 128)

        self.n_hb = len(dem.mpx_stages)
        self.Khb, self.Hhb = [], []
        for stg in dem.mpx_stages:
            if stg.decim != 2 or getattr(stg, "_complex_taps", False):
                return
            self.Khb.append(int(stg.K))
            self.Hhb.append(toeplitz_taps_decim(
                np.asarray(stg.taps, np.float32), 128, 2))

        self.adv_mpx = 512
        self.advs = [self.adv_mpx * (1 << (self.n_hb - s))
                     for s in range(self.n_hb)]      # per-hb input advance
        self.adv_if = self.advs[0]
        self.hists = [k - 1 for k in self.Khb]
        self.hps = [_rup(max(h, 1), 128) for h in self.hists]
        self.Lws = [(128 - 1) * 2 + k for k in self.Khb]
        self.hpS = _rup(max(self.K, self.d), 128)
        self.tws = [_rup(h + 127, 128) for h in self.hists]
        self.twm = _rup(self.K + 127, 128)
        C2 = 2 * self.C
        vmem = 4 * (C2 * 128 + C2 * self.adv_if * 2
                    + C2 * self.adv_mpx * 2
                    + sum(self.C * (hp + a)
                          for hp, a in zip(self.hps, self.advs))
                    + self.C * (self.hpS + self.adv_mpx)
                    + self.Hp.size + sum(h.size for h in self.Hhb))
        if vmem > MAX_VMEM:
            return
        for s in range(self.n_hb):
            if self.hps[s] + self.advs[s] < max(self.Lws[s],
                                                self.hists[s] + 255):
                return
        if self.hpS + self.adv_mpx < self.K + 127 + 128:
            return
        self._plan_cache = {}
        self.supported = True

    def _plan(self, m_if: int):
        plan = self._plan_cache.get(m_if)
        if plan is not None:
            return plan
        m_mpx = m_if >> self.n_hb
        n_super = -(-m_mpx // self.adv_mpx)

        def tail(m_in, adv_in, hist, hp, tw):
            i_t = min((m_in - 1) // adv_in, n_super - 1)
            end = hp + m_in - i_t * adv_in
            al = max(0, (end - hist) // 128 * 128)
            al = min(al, hp + adv_in - tw)
            assert al >= 0 and al + tw >= end >= hist, (al, end, hist)
            return i_t, al, end

        iq_t = min((m_if - 1) // self.adv_if, n_super - 1)
        loc = (m_if - 1) - iq_t * self.adv_if
        alq = min(loc // 128 * 128, self.adv_if - 128)
        m_in = m_if
        hbs = []
        for s in range(self.n_hb):
            hbs.append(tail(m_in, self.advs[s], self.hists[s],
                            self.hps[s], self.tws[s]))
            m_in //= 2
        mt = tail(m_mpx, self.adv_mpx, self.K, self.hpS, self.twm)
        plan = {"m_mpx": m_mpx, "n_super": n_super,
                "q": (iq_t, alq, loc - alq), "hb": hbs, "m": mt}
        self._plan_cache[m_if] = plan
        return plan

    def apply(self, state, iq, m_if: int, raw_audio: bool = False):
        """iq: (xr, xi) [C, ≥m_if] float32 IF planes, or the raw
        stacked [2C, ≥m_if] buffer.  Returns (lr2 [2, C, m_mpx],
        new_state) — state keys quad/mpx_decim/mpx_hist updated, all
        others passed through (same contract as the standalone stereo
        kernel path in ops/wfm.py).  With ``raw_audio`` the first
        return is the UNTRIMMED ([2C, W], m_mpx) L/R plane buffer for
        the MPXAudioPoly kernel (no slice pass)."""
        C = self.C
        plan = self._plan(m_if)
        n_super = plan["n_super"]
        m_mpx = plan["m_mpx"]
        # bf16 handoff only on the raw kernel-to-kernel route; the
        # trimmed lr2 feeds f32 chained consumers.  Tap matrices ride
        # HBM in the storage dtype regardless (math stays f32).
        from .precision import get_handoff_dtype
        h_dt = get_handoff_dtype()
        o_dtype = h_dt if raw_audio else jnp.float32
        if isinstance(iq, tuple):
            iq = jnp.concatenate(iq, axis=0)
        # narrower-than-grid raw handoffs are fine: pallas pads the
        # out-of-bounds blocks and the in-kernel gcol mask zeroes them

        q = state["quad"]
        qtail = jnp.zeros((2 * C, 128), jnp.float32)
        qtail = qtail.at[:C, 127].set(jnp.real(q[..., 0]))
        qtail = qtail.at[C:, 127].set(jnp.imag(q[..., 0]))
        qtail = qtail.astype(h_dt)

        def pad_tail(t, hp):
            # state tails ride HBM in the handoff storage dtype
            t = jnp.real(t) if jnp.iscomplexobj(t) else t
            t = t.astype(h_dt)
            return jnp.pad(t, ((0, 0), (hp - t.shape[-1], 0)))

        hb_tails = [pad_tail(state["mpx_decim"][s], self.hps[s])
                    for s in range(self.n_hb)]
        hist = pad_tail(state["mpx_hist"], self.hpS)

        cfg = {
            "C": C, "adv_if": self.adv_if, "adv_mpx": self.adv_mpx,
            "m_if": m_if, "inv_dev": self.inv_dev,
            "n_hb": self.n_hb, "advs": self.advs, "hps": self.hps,
            "hists": self.hists, "Lws": self.Lws,
            "K": self.K, "d": self.d, "hpS": self.hpS,
            "ur": self.ur, "ui": self.ui,
            "tws": self.tws, "twm": self.twm,
            "out_bf16": o_dtype == jnp.bfloat16,
            "iq_t": plan["q"][0], "alq": plan["q"][1],
            "ih_t": [t[0] for t in plan["hb"]],
            "alh": [t[1] for t in plan["hb"]],
            "im_t": plan["m"][0], "alm": plan["m"][1],
        }
        twoC = 2 * C
        in_specs = [
            pl.BlockSpec((twoC, self.adv_if), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((twoC, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, self.hpS), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        for s in range(self.n_hb):
            in_specs.append(pl.BlockSpec((C, self.hps[s]),
                                         lambda i: (0, 0),
                                         memory_space=pltpu.VMEM))
        for h in self.Hhb:
            in_specs.append(pl.BlockSpec(h.shape, lambda i: (0, 0),
                                         memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec(self.Hp.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        tw_total = sum(self.tws) + self.twm
        out_specs = [
            pl.BlockSpec((twoC, self.adv_mpx), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((twoC, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, tw_total), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        scratch = [pltpu.VMEM((twoC, 128), jnp.float32)]
        for s in range(self.n_hb):
            scratch.append(pltpu.VMEM((C, self.hps[s] + self.advs[s]),
                                      jnp.float32))
        scratch.append(pltpu.VMEM((C, self.hpS + self.adv_mpx),
                                  jnp.float32))

        flops = n_super * (40 * C * self.adv_if
                           + sum(2 * self.Lws[s] * (self.advs[s] // 2) * C
                                 for s in range(self.n_hb))
                           + 2 * (127 + self.K) * 256 * C
                           * (self.adv_mpx // 128)
                           + 12 * C * self.adv_mpx)
        from .pallas_cost import costed_pallas_call
        out, qtails, tails = costed_pallas_call(
            functools.partial(_wfm_kernel, cfg=cfg),
            grid=(n_super,),
            flops=int(flops),
            label="wfm_whole_demod",
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=[
                jax.ShapeDtypeStruct((twoC, n_super * self.adv_mpx),
                                     o_dtype),
                jax.ShapeDtypeStruct((twoC, 128), h_dt),
                jax.ShapeDtypeStruct((C, tw_total), h_dt),
            ],
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=self.interpret,
        )(iq, qtail, hist,
          *hb_tails, *[jnp.asarray(h, h_dt) for h in self.Hhb],
          jnp.asarray(self.Hp, h_dt))

        lr2 = (out, m_mpx) if raw_audio \
            else out[:, :m_mpx].reshape(2, C, m_mpx)

        new_state = dict(state)
        _iq, _alq, qcol = plan["q"]
        qtails = qtails.astype(jnp.float32)
        tails = tails.astype(jnp.float32)
        new_state["quad"] = jax.lax.complex(
            qtails[:C, qcol], qtails[C:, qcol])[..., None]
        off = 0
        hb_new = []
        for s in range(self.n_hb):
            _it, al, end = plan["hb"][s]
            lo = end - al - self.hists[s]
            hb_new.append(tails[:, off + lo:off + lo + self.hists[s]])
            off += self.tws[s]
        new_state["mpx_decim"] = hb_new
        _im, alm, endm = plan["m"]
        lom = endm - alm - self.K
        new_state["mpx_hist"] = tails[:, off + lom:off + lom + self.K]
        return lr2, new_state


def build_wfm_pipeline(dem, C: int,
                       interpret: bool = False
                       ) -> Optional[WFMDemodPipeline]:
    try:
        p = WFMDemodPipeline(dem, C, interpret=interpret)
    except Exception:
        return None
    return p if p.supported else None


# ----------------------------------------------------------------------
# MPX-rate audio tail: the (deemph-folded) AF polyphase as ONE streamed
# kernel over the whole-demod kernel's RAW [2C, W] L/R planes.
#
# The chained route pays a [2C, m_mpx] trim slice, the overlap-save
# ext/pad construction and the cb-kernel's flat window DMAs (~24
# B/in-sample measured on the WFM-8 chain).  Here the raw buffer
# streams through spec-pipelined [2C, adv_in] blocks into a rolling
# VMEM scratch (masked past m_mpx — pallas pads OOB input blocks with
# unspecified values), and each grid step emits [2C, adv_aud] audio by
# banded matmuls against the widened polyphase matrix — the same
# machinery as ops/demod_kernel.py's AF stage, minus the demod.

def _mpx_poly_kernel(x_ref, ptail_ref, hp_ref, o_ref, tails_o, bufp,
                     *, cfg):
    i = pl.program_id(0)
    adv_in = cfg["adv_in"]
    hpP = cfg["hpP"]

    @pl.when(i == 0)
    def _init():
        bufp[:, :hpP] = ptail_ref[...].astype(jnp.float32)

    @pl.when(i > 0)
    def _roll():
        bufp[:, :hpP] = bufp[:, adv_in:adv_in + hpP]

    gcol = (i * adv_in
            + jax.lax.broadcasted_iota(jnp.int32,
                                       (cfg["twoC"], adv_in), 1))
    bufp[:, hpP:] = jnp.where(gcol < cfg["m_in"],
                              x_ref[...].astype(jnp.float32), 0.0)

    w1 = hpP - cfg["hist"]
    for r in range(cfg["adv_aud"] // cfg["tileP"]):
        win = bufp[:, w1 + r * cfg["rowP"]:
                   w1 + r * cfg["rowP"] + cfg["LwP"]]
        o_ref[:, r * cfg["tileP"]:(r + 1) * cfg["tileP"]] = jnp.dot(
            win, hp_ref[...].astype(jnp.float32),
            preferred_element_type=jnp.float32)

    @pl.when(i == cfg["ip_t"])
    def _tp():
        tails_o[...] = bufp[:, cfg["alp"]:cfg["alp"] + cfg["tw"]] \
            .astype(tails_o.dtype)


class MPXAudioPoly:
    """Streamed polyphase audio tail over [2C, >=m_in] raw MPX planes."""

    def __init__(self, poly, C: int, interpret: bool = False):
        from .pallas_fir import banded_poly_matrix
        self.C = int(C)
        self.interpret = interpret
        self.supported = False
        if C % 4 or C < 4:
            return
        I, M = int(poly.interp), int(poly.decim)
        from math import gcd, lcm
        mt = 128 // gcd(I, 128)
        self.tileP = mt * I
        self.rowP = mt * M
        sol = None
        for j in range(1, 65):
            adv_aud = j * lcm(self.tileP, 128)
            if (adv_aud * M) % I:
                continue
            adv_in = adv_aud * M // I
            if adv_in % 128:
                continue
            sol = (adv_in, adv_aud)
            break
        if sol is None:
            return
        self.adv_in, self.adv_aud = sol
        kw = poly.kernel.shape[1]
        self.hist = poly.tpp - 1
        self.hpP = _rup(max(self.hist, 1), 128)
        self.LwP = (mt - 1) * M + kw
        self.Hp = banded_poly_matrix(
            np.asarray(poly.kernel, np.float32), I, M, mt)
        self.I, self.M = I, M
        if self.hpP + self.adv_in < max(self.LwP, self.hist + 128):
            return
        self.tw = _rup(self.hist + 127, 128)
        C2 = 2 * self.C
        vmem = 4 * (C2 * (self.hpP + self.adv_in)        # scratch
                    + C2 * self.adv_in * 2               # in (dbl)
                    + C2 * self.adv_aud * 2              # out (dbl)
                    + self.Hp.size)
        if vmem > MAX_VMEM:
            return
        self._plan_cache = {}
        self.supported = True

    def _plan(self, m_in: int):
        plan = self._plan_cache.get(m_in)
        if plan is not None:
            return plan
        assert m_in % self.M == 0, (m_in, self.M)
        m_aud = m_in * self.I // self.M
        n_super = -(-m_aud // self.adv_aud)
        i_t = min((m_in - 1) // self.adv_in, n_super - 1)
        end = self.hpP + m_in - i_t * self.adv_in
        al = max(0, (end - self.hist) // 128 * 128)
        al = min(al, self.hpP + self.adv_in - self.tw)
        assert al >= 0 and al + self.tw >= end >= self.hist
        plan = {"m_aud": m_aud, "n_super": n_super,
                "p": (i_t, al, end)}
        self._plan_cache[m_in] = plan
        return plan

    def apply(self, ars, raw, m_in: int):
        """ars: [2, C, hist] carried input history (Radio's
        state["demod"]["audio_rs"] layout); raw: [2C, >=m_in] float32
        L/R MPX planes (rows [0:C] = L).  Returns (audio [C, 2, m_aud],
        new_ars)."""
        C = self.C
        twoC = 2 * C
        plan = self._plan(m_in)
        n_super = plan["n_super"]
        cfg = {"twoC": twoC, "adv_in": self.adv_in,
               "adv_aud": self.adv_aud, "hpP": self.hpP,
               "hist": self.hist, "LwP": self.LwP, "rowP": self.rowP,
               "tileP": self.tileP, "m_in": m_in,
               "ip_t": plan["p"][0], "alp": plan["p"][1],
               "tw": self.tw}
        from .precision import get_handoff_dtype as _ghd
        _hp_dt = _ghd()
        ptail = jnp.concatenate([ars[0], ars[1]], axis=0)
        ptail = jnp.pad(ptail.astype(_hp_dt),
                        ((0, 0), (self.hpP - self.hist, 0)))
        # narrower-than-grid raw is fine: OOB blocks pad + gcol mask
        from .pallas_cost import costed_pallas_call
        audio, tails = costed_pallas_call(
            functools.partial(_mpx_poly_kernel, cfg=cfg),
            grid=(n_super,),
            flops=int(2 * self.LwP * self.tileP
                      * (self.adv_aud // self.tileP) * twoC * n_super),
            label="mpx_audio_poly",
            in_specs=[
                pl.BlockSpec((twoC, self.adv_in), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((twoC, self.hpP), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(self.Hp.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((twoC, self.adv_aud), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((twoC, self.tw), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((twoC, n_super * self.adv_aud),
                                     jnp.float32),
                jax.ShapeDtypeStruct((twoC, self.tw), _hp_dt),
            ],
            scratch_shapes=[
                pltpu.VMEM((twoC, self.hpP + self.adv_in), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=self.interpret,
        )(raw if raw.dtype in (jnp.float32, jnp.bfloat16)
          else raw.astype(jnp.float32), ptail,
          jnp.asarray(self.Hp, _hp_dt))
        m_aud = plan["m_aud"]
        lr = jnp.stack([audio[:C, :m_aud], audio[C:, :m_aud]], axis=1)
        _it, al, end = plan["p"]
        lo = end - al - self.hist
        t = tails[:, lo:lo + self.hist].astype(jnp.float32)
        new_ars = jnp.stack([t[:C], t[C:]], axis=0)
        return lr, new_ars


def build_mpx_audio_poly(poly, C: int, interpret: bool = False
                         ) -> Optional[MPXAudioPoly]:
    try:
        p = MPXAudioPoly(poly, C, interpret=interpret)
    except Exception:
        return None
    return p if p.supported else None
