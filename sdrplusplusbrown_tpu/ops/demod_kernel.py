"""Fused FM demod + audio chain kernel: squelch gate → quadrature
discriminator → audio lowpass FIR → AF polyphase resampler in ONE
pallas pass over the IF planes.

After the front-end kernels (ops/chan_frontend.py), the per-channel
audio tail still costs ~165 HBM B/in-sample as chained XLA ops at
C=128 (measured: demod 80.5 + af_resamp 54.3 + stereo stack 30.7) —
each stage round-trips the [C, T_if] arrays.  This kernel reads the
IF planes once and writes 48 kHz audio once:

  * the squelch gate (whole-block |y| mean computed by the front-end
    kernel) multiplies the IF as it enters VMEM — identical to the
    reference's gate-zeroes-IF-before-demod semantics
    (noise_reduction/squelch.h:55-69), including the gated carried
    sample;
  * the discriminator angle(x[n]·conj(x[n−1])) uses a lane-roll for
    the one-sample history and a degree-17 odd minimax polynomial for
    atan2 (Mosaic has no atan primitive; max error 2.4e-7 rad vs the
    XLA atan2, i.e. −130 dB — the reference itself ships a fast_atan2,
    core/src/dsp/math/fast_atan2.h).  A zeroed (squelched) input
    yields exact silence, matching ops/demod.py:Quadrature;
  * the audio FIR and the 24/25 AF polyphase are banded matmuls with
    VMEM rolling overlap-save state (same machinery as the front-end
    kernels).

State compatibility: consumes/produces Radio's state["demod"]
({"quad","fir"}) and state["af_resamp"] ({"resamp"}) entries, so the
kernel and the chained FMDemod.apply_planes + RationalResampler path
interchange freely.

reference behavior: demod/quadrature.h:39-46, demod/fm.h:25-80,
multirate/rational_resampler.h:128-173.
"""

from __future__ import annotations

import functools
from math import gcd
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_VMEM = 15 * (1 << 20)   # scoped-VMEM hard limit is 16 MB

# atan(z) = z·P(z²) on [0,1], degree-8 P (Chebyshev-node lstsq fit,
# max err 6.3e-9; full atan2 construction 2.4e-7 in float32)
_ATAN_C = (0.9999999055480192, -0.33332657866595233, 0.19986537719204336,
           -0.1416433501814265, 0.10507325890466393, -0.072479633550002,
           0.039899708900995264, -0.014458788993819372,
           0.0024682698535998596)


def _atan2_poly(im, re):
    a = jnp.abs(im)
    b = jnp.abs(re)
    mx = jnp.maximum(a, b)
    # guard ONLY exact zero: a floor like max(mx, 1e-30) distorts the
    # ratio for tiny-but-normal products (FM transients reach ~1e-32,
    # still inside float32's normal range)
    z = jnp.minimum(a, b) / jnp.where(mx == 0.0, 1.0, mx)
    z2 = z * z
    p = jnp.full_like(z, _ATAN_C[8])
    for k in range(7, -1, -1):
        p = p * z2 + jnp.float32(_ATAN_C[k])
    t = z * p
    t = jnp.where(a > b, jnp.float32(np.pi / 2) - t, t)
    t = jnp.where(re < 0, jnp.float32(np.pi) - t, t)
    t = jnp.where(im < 0, -t, t)
    return jnp.where((re == 0.0) & (im == 0.0), 0.0, t)


def _rup(n: int, a: int) -> int:
    return ((n + a - 1) // a) * a


def _demod_kernel(ir_ref, ii_ref, gate_ref, qtail_ref, ftail_ref,
                  ptail_ref, hf_ref, hp_ref, o_ref, qtail_o, tails_o,
                  qcarry, buff, bufp, *, cfg):
    # grid = (n_chunks, n_super): wide banks walk every chunk's super
    # steps inside ONE launch (i fastest), the per-chunk VMEM state
    # re-initializing at i == 0 of each chunk — the separate-launch
    # form cost a full audio-rate concat plus XLA double-counting the
    # whole raw IF operand per launch (scanner-256: ~113 B/smp)
    i = pl.program_id(1)
    C = cfg["C"]
    twoC = 2 * C
    adv = cfg["adv_if"]
    adv_aud = cfg["adv_aud"]

    # ---- roll histories -------------------------------------------------
    @pl.when(i == 0)
    def _init():
        qcarry[...] = qtail_ref[...].astype(jnp.float32)
        buff[:, :cfg["hpF"]] = ftail_ref[...].astype(jnp.float32)
        bufp[:, :cfg["hpP"]] = ptail_ref[...].astype(jnp.float32)

    @pl.when(i > 0)
    def _roll():
        buff[:, :cfg["hpF"]] = buff[:, adv:adv + cfg["hpF"]]
        bufp[:, :cfg["hpP"]] = bufp[:, adv:adv + cfg["hpP"]]

    # ---- gated IF in, as TWO row-block operands straight off the raw
    # [R·C, m] buffer (possibly the FULL wide-bank buffer — chunked
    # launches pass row-block indices, so no slice/concat pass exists
    # anywhere).  The last block may read past the IF array (pallas
    # pads out-of-bounds input blocks with unspecified values — NaN
    # under interpret) and NaN×0 would poison the banded matmuls: mask
    # invalid columns
    gcol = (i * adv
            + jax.lax.broadcasted_iota(jnp.int32, (C, adv), 1))
    ok = gcol < cfg["m_if"]
    er = jnp.where(ok, ir_ref[...].astype(jnp.float32)
                   * gate_ref[...], 0.0)
    ei = jnp.where(ok, ii_ref[...].astype(jnp.float32)
                   * gate_ref[...], 0.0)

    # ---- quadrature: lane-roll for the 1-sample history; the cross-
    # block sample sits at col 127 of qcarry (one-hot matmul extract —
    # unaligned lane slices are forbidden)
    oh = (jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
          == 127).astype(jnp.float32)
    prev0 = jnp.dot(qcarry[...], oh,
                    preferred_element_type=jnp.float32)     # [2C, 1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (C, adv), 1)
    erp = jnp.where(lane == 0, prev0[0:C], pltpu.roll(er, 1, 1))
    eip = jnp.where(lane == 0, prev0[C:twoC], pltpu.roll(ei, 1, 1))
    re = er * erp + ei * eip
    im = ei * erp - er * eip
    y = _atan2_poly(im, re) * jnp.float32(cfg["inv_dev"])
    buff[:, cfg["hpF"]:] = y
    qcarry[0:C, :] = jax.lax.slice(er, (0, adv - 128), (C, adv))
    qcarry[C:twoC, :] = jax.lax.slice(ei, (0, adv - 128), (C, adv))

    # ---- audio FIR (banded matmul) --------------------------------------
    w0 = cfg["hpF"] - cfg["histF"]
    for r in range(adv // 128):
        win = buff[:, w0 + r * 128:w0 + r * 128 + cfg["LwF"]]
        bufp[:, cfg["hpP"] + r * 128:cfg["hpP"] + (r + 1) * 128] = \
            jnp.dot(win, hf_ref[...].astype(jnp.float32),
                    preferred_element_type=jnp.float32)

    # ---- AF polyphase (banded matmul) -----------------------------------
    if cfg["has_poly"]:
        w1 = cfg["hpP"] - cfg["histP"]
        for r in range(adv_aud // cfg["tileP"]):
            win = bufp[:, w1 + r * cfg["rowP"]:
                       w1 + r * cfg["rowP"] + cfg["LwP"]]
            o_ref[:, r * cfg["tileP"]:(r + 1) * cfg["tileP"]] = \
                jnp.dot(win, hp_ref[...].astype(jnp.float32),
                        preferred_element_type=jnp.float32) \
                .astype(o_ref.dtype)
    else:
        o_ref[...] = bufp[:, cfg["hpP"]:cfg["hpP"] + adv_aud] \
            .astype(o_ref.dtype)

    # ---- next-call tails ------------------------------------------------
    @pl.when(i == cfg["iq_t"])
    def _tq():
        qtail_o[0:C, :] = jax.lax.slice(
            er, (0, cfg["alq"]), (C, cfg["alq"] + 128)) \
            .astype(qtail_o.dtype)
        qtail_o[C:twoC, :] = jax.lax.slice(
            ei, (0, cfg["alq"]), (C, cfg["alq"] + 128)) \
            .astype(qtail_o.dtype)

    @pl.when(i == cfg["if_t"])
    def _tf():
        tails_o[:, :cfg["tfw"]] = \
            buff[:, cfg["alf"]:cfg["alf"] + cfg["tfw"]] \
            .astype(tails_o.dtype)

    @pl.when(i == cfg["ip_t"])
    def _tp():
        tails_o[:, cfg["tfw"]:cfg["tfw"] + cfg["tpw"]] = \
            bufp[:, cfg["alp"]:cfg["alp"] + cfg["tpw"]] \
            .astype(tails_o.dtype)


class FMAudioPipeline:
    """Built from a Radio's FMDemod + AF RationalResampler;
    ``supported`` is False when the geometry can't use the kernel."""

    def __init__(self, demod, af_resamp, C: int, interpret: bool = False):
        from .pallas_fir import toeplitz_taps_decim, banded_poly_matrix
        self.C = int(C)
        self.interpret = interpret
        self.supported = False
        if C % 4 or C < 4:   # 2C rows must tile the 8-sublane granule
            return
        if not getattr(demod, "filtering", False):
            return
        fir = demod.fir
        if getattr(fir, "_complex_taps", False) or fir.decim != 1:
            return
        self.inv_dev = float(demod.quad.inv_deviation)
        self.Kf = int(fir.K)
        poly = None
        if af_resamp is not None:
            nb = af_resamp.chain.named_blocks
            if len(nb) != 1 or nb[0][0] != "resamp":
                return
            poly = nb[0][1]
        self.poly = poly
        if poly is not None:
            I, M = int(poly.interp), int(poly.decim)
            mt = 128 // gcd(I, 128)
            tileP = mt * I
            # adv_aud = j·lcm(tileP,128); adv_if = adv_aud·M/I integral,
            # 128-mult and rowP-mult
            lcmA = tileP * 128 // gcd(tileP, 128)
            sol = None
            for j in range(1, 65):
                adv_aud = j * lcmA
                if (adv_aud * M) % I:
                    continue
                adv_if = adv_aud * M // I
                if adv_if % 128 or adv_if % (mt * M):
                    continue
                sol = (adv_if, adv_aud)
                break
            if sol is None:
                return
            self.adv_if, self.adv_aud = sol
            kw = poly.kernel.shape[1]
            self.histP = poly.tpp - 1
            self.Hp = banded_poly_matrix(
                np.asarray(poly.kernel, np.float32), I, M, mt)
            self.rowP = mt * M
            self.LwP = (mt - 1) * M + kw
            self.tileP = tileP
            self.ratio_i, self.ratio_m = I, M
        else:
            self.adv_if = self.adv_aud = 3072
            self.histP = 0
            self.Hp = np.zeros((1, 1), np.float32)
            self.rowP = self.LwP = self.tileP = 128
            self.ratio_i = self.ratio_m = 1
        self.histF = self.Kf - 1
        self.hpF = _rup(max(self.histF, 1), 128)
        self.hpP = _rup(max(self.histP, 1), 128)
        self.Hf = toeplitz_taps_decim(np.asarray(fir.taps, np.float32),
                                      128, 1)
        self.LwF = 127 + self.Kf
        if self.hpF + self.adv_if < max(self.LwF, self.histF + 255):
            return
        if self.poly is not None and \
                self.hpP + self.adv_if < max(self.LwP, self.histP + 255):
            return
        C2 = 2 * self.C
        vmem = 4 * (C2 * 128                       # quad carry
                    + self.C * (self.hpF + self.adv_if)
                    + self.C * (self.hpP + self.adv_if)
                    + C2 * self.adv_if * 2         # in block (dbl-buf)
                    + self.C * self.adv_aud * 2    # out block (dbl-buf)
                    + self.Hf.size + self.Hp.size)
        if vmem > MAX_VMEM:
            return
        self.tfw = _rup(self.histF + 127, 128)
        self.tpw = _rup(self.histP + 127, 128)
        self._plan_cache = {}
        self.supported = True

    def _plan(self, m_if: int):
        plan = self._plan_cache.get(m_if)
        if plan is not None:
            return plan
        m_aud = m_if * self.ratio_i // self.ratio_m
        n_super = -(-m_aud // self.adv_aud)

        def tail(m_in, adv_in, hist, hp, tw):
            i_t = min((m_in - 1) // adv_in, n_super - 1)
            end = hp + m_in - i_t * adv_in
            al = max(0, (end - hist) // 128 * 128)
            al = min(al, hp + adv_in - tw)
            assert al >= 0 and al + tw >= end >= hist, (al, end, hist)
            return i_t, al, end

        # quad tail: col m_if−1 of the (masked, gated) input block at
        # step iq_t, sliced at a 128-aligned offset
        iq_t = min((m_if - 1) // self.adv_if, n_super - 1)
        loc = (m_if - 1) - iq_t * self.adv_if
        alq = min(loc // 128 * 128, self.adv_if - 128)
        plan = {"m_aud": m_aud, "n_super": n_super,
                "q": (iq_t, alq, loc - alq),
                "f": tail(m_if, self.adv_if, self.histF, self.hpF,
                          self.tfw),
                "p": tail(m_if, self.adv_if, self.histP, self.hpP,
                          self.tpw)}
        self._plan_cache[m_if] = plan
        return plan

    def apply(self, gate, dstate, astate, planes, m_if: int,
              row_blocks=None, raw_audio: bool = False,
              n_chunks: int = 1):
        """planes: (xr, xi) [C, ≥m_if] float32 IF planes — or a raw
        stacked [R·Ck, ≥m_if] buffer straight from the front-end
        kernel, read as row-block operands so no slice/concat pass
        exists anywhere.  ``n_chunks > 1`` runs a bank of
        C = n_chunks·Ck channels in ONE launch over a
        (n_chunks, n_super) grid: chunk c reads raw row blocks c
        (re) and n_chunks + c (im), and every per-channel operand /
        output is blocked along the channel dim.  gate [C] float32 or
        None.  Returns (audio [C, m_aud], new_demod_state,
        new_af_state); with ``raw_audio`` the audio is the untrimmed
        [C, n_super·adv_aud] block in the kernel-handoff storage dtype
        as (audio, m_aud) — the sink/pump trims host-side."""
        Ck = self.C
        C = Ck * n_chunks
        plan = self._plan(m_if)
        n_super = plan["n_super"]
        m_aud = plan["m_aud"]

        if isinstance(planes, tuple):
            assert n_chunks == 1
            iq_r, iq_i = planes
            rb_r = rb_i = 0
        elif Ck % 8:
            # a (Ck, adv) row-block needs Ck % 8 == 0 unless it spans
            # the whole first dim: small pipes materialize the two
            # halves (cheap at C < 8)
            assert n_chunks == 1
            r0, r1 = row_blocks if row_blocks is not None else (0, 1)
            iq_r = planes[r0 * Ck:(r0 + 1) * Ck]
            iq_i = planes[r1 * Ck:(r1 + 1) * Ck]
            rb_r = rb_i = 0
        else:
            iq_r = iq_i = planes
            rb_r, rb_i = row_blocks if row_blocks is not None \
                else (0, n_chunks)
        # tap matrices ride HBM in the handoff storage dtype (the input
        # block is upcast at read already — see _demod_kernel)
        from .precision import get_handoff_dtype
        _h_dt = get_handoff_dtype()
        o_dtype = _h_dt if raw_audio else jnp.float32
        # raw handoffs may be narrower OR wider than the grid walk:
        # pallas pads out-of-bounds input blocks (the in-kernel gcol
        # mask zeroes them) and never fetches blocks past n_super — a
        # host-side pad here would be a full extra IF-rate HBM copy
        gate2 = (jnp.ones((C, 1), jnp.float32) if gate is None
                 else gate[:, None])

        q = dstate["quad"]  # [C, 1] complex
        # chunk-interleaved rows: [c·2Ck .. c·2Ck+Ck) re, then Ck im
        qtail = jnp.zeros((n_chunks, 2, Ck, 128), jnp.float32)
        qr = jnp.real(q[:, 0]).reshape(n_chunks, Ck)
        qi = jnp.imag(q[:, 0]).reshape(n_chunks, Ck)
        qtail = qtail.at[:, 0, :, 127].set(qr)
        qtail = qtail.at[:, 1, :, 127].set(qi)
        qtail = qtail.reshape(2 * C, 128).astype(_h_dt)

        def pad_tail(t, hp):
            t = jnp.real(t) if jnp.iscomplexobj(t) else t
            t = t.astype(_h_dt)
            return jnp.pad(t, ((0, 0), (hp - t.shape[-1], 0)))

        ftail = pad_tail(dstate["fir"], self.hpF)
        if self.poly is not None:
            ptail = pad_tail(astate["resamp"], self.hpP)
        else:
            ptail = jnp.zeros((C, self.hpP), jnp.float32)

        cfg = {
            "C": Ck, "adv_if": self.adv_if, "adv_aud": self.adv_aud,
            "m_if": m_if,
            "inv_dev": self.inv_dev, "hpF": self.hpF, "hpP": self.hpP,
            "histF": self.histF, "histP": self.histP, "LwF": self.LwF,
            "LwP": self.LwP, "rowP": self.rowP, "tileP": self.tileP,
            "has_poly": self.poly is not None, "tfw": self.tfw,
            "tpw": self.tpw,
            "iq_t": plan["q"][0], "alq": plan["q"][1],
            "if_t": plan["f"][0], "alf": plan["f"][1],
            "ip_t": plan["p"][0], "alp": plan["p"][1],
        }
        twoCk = 2 * Ck
        in_specs = [
            pl.BlockSpec((Ck, self.adv_if),
                         lambda c, i, rb=rb_r: (rb + c, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Ck, self.adv_if),
                         lambda c, i, rb=rb_i: (rb + c, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Ck, 1), lambda c, i: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((twoCk, 128), lambda c, i: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Ck, self.hpF), lambda c, i: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Ck, self.hpP), lambda c, i: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(self.Hf.shape, lambda c, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(self.Hp.shape, lambda c, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_specs = [
            pl.BlockSpec((Ck, self.adv_aud), lambda c, i: (c, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((twoCk, 128), lambda c, i: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Ck, self.tfw + self.tpw), lambda c, i: (c, 0),
                         memory_space=pltpu.VMEM),
        ]
        flops = n_chunks * n_super * (30 * Ck * self.adv_if
                                      + 2 * self.LwF * self.adv_if * Ck
                                      + 2 * self.LwP * self.adv_aud * Ck)
        from .pallas_cost import costed_pallas_call
        audio, qtails, tails = costed_pallas_call(
            functools.partial(_demod_kernel, cfg=cfg),
            grid=(n_chunks, n_super),
            flops=int(flops),
            label="fm_demod_audio",
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=[
                jax.ShapeDtypeStruct((C, n_super * self.adv_aud),
                                     o_dtype),
                jax.ShapeDtypeStruct((2 * C, 128), _h_dt),
                jax.ShapeDtypeStruct((C, self.tfw + self.tpw),
                                     _h_dt),
            ],
            scratch_shapes=[
                pltpu.VMEM((twoCk, 128), jnp.float32),
                pltpu.VMEM((Ck, self.hpF + self.adv_if), jnp.float32),
                pltpu.VMEM((Ck, self.hpP + self.adv_if), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")),
            interpret=self.interpret,
        )(iq_r, iq_i, gate2, qtail, ftail, ptail,
          jnp.asarray(self.Hf, _h_dt), jnp.asarray(self.Hp, _h_dt))

        y = (audio, m_aud) if raw_audio else audio[:, :m_aud]

        _iq, _alq, qcol = plan["q"]
        qt4 = qtails.reshape(n_chunks, 2, Ck, 128).astype(jnp.float32)
        new_q = jax.lax.complex(qt4[:, 0, :, qcol],
                                qt4[:, 1, :, qcol]).reshape(C)[:, None]
        _if, alf, endf = plan["f"]
        lof = endf - alf - self.histF
        new_f = tails[:, lof:lof + self.histF].astype(jnp.float32)
        new_dstate = {"quad": new_q, "fir": new_f}
        if self.poly is not None:
            _ip, alp, endp = plan["p"]
            lop = endp - alp - self.histP
            new_astate = {"resamp": tails[:, self.tfw + lop:
                                          self.tfw + lop + self.histP]
                          .astype(jnp.float32)}
        else:
            new_astate = astate
        return y, new_dstate, new_astate


def apply_chunked(pipe: FMAudioPipeline, gate, dstate, astate, iq_raw,
                  m_if: int, C: int, raw_audio: bool = False):
    """Run a pipe built for Ck = pipe.C channels over C = n·Ck channels
    (the 16 MB scoped-VMEM limit caps one grid STEP at ~128 channels;
    channels are independent, so wide banks walk a (n_chunks, n_super)
    grid inside one launch — see FMAudioPipeline.apply(n_chunks=...).
    iq_raw: the raw [2C, W] stacked IF buffer, read as per-chunk
    row-block operands; no slice/concat pass exists anywhere."""
    Ck = pipe.C
    assert C % Ck == 0, (C, Ck)
    return pipe.apply(gate, dstate, astate, iq_raw, m_if,
                      raw_audio=raw_audio, n_chunks=C // Ck)


def build_fm_audio_pipeline(demod, af_resamp, C: int,
                            interpret: bool = False
                            ) -> Optional[FMAudioPipeline]:
    try:
        p = FMAudioPipeline(demod, af_resamp, C, interpret=interpret)
    except Exception:
        return None
    return p if p.supported else None
