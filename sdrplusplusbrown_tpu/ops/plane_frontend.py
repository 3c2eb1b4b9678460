"""Plane-chained shared VFO front end.

Drives the plane-protocol pallas stages (ops/pallas_fir.py:
``fused_mix_decim_planes`` / ``fir_decim_planes`` /
``poly_resample_planes``) as one pipeline: mix-down+first halfband →
remaining decimators → polyphase L/M → bandwidth FIR, with every
intermediate kept as ``[2C, head + M_pad]`` float32 planes.

Why: scripts/frontend_breakdown.py measured the kernel-per-stage front
end at 598 B/in-sample where the irreducible window+output traffic is
~190 — the rest was per-stage glue (re/im split, history concat,
re+j·im recombine) plus a separate full IF-rate twiddle pass.  In the
plane protocol each kernel writes its successor's history into a head
block (grid step 0) and the NCO twiddle runs inside the fused kernel,
so the only HBM traffic per stage is the window DMA and the output
write.

State stays in the standard SharedRxVFOBank layout (complex tails);
conversion to/from planes touches only K-1 samples per stage per call.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from .xlator import advance_phase, _TWO_PI

#: fused-stage kernel geometry (must match fused_mix_decim_planes)
TILE = 256
ROWS = 8
SUP = ROWS * TILE          # outputs per fused super-tile
BS = 256                   # twiddle block columns
ALIGN1D = 1024             # 1-D plane DMA alignment (stage 0 input)
PAD2D = 128                # 2-D plane DMA alignment (later stages)


def _pad_to(n: int, a: int) -> int:
    return ((n + a - 1) // a) * a


class _Stage:
    """Static per-stage config (everything except block length)."""

    def __init__(self, kind: str, **kw):
        self.kind = kind                    # "decim" | "poly"
        self.__dict__.update(kw)


class PlaneVFOPipeline:
    """Built from a SharedRxVFOBank; None-able via ``supported``."""

    def __init__(self, bank, C: int, interpret: bool = False):
        self.C = int(C)
        self.interpret = interpret
        self.supported = False
        if bank.fused is None or C % 8 != 0 or not (8 <= C <= 64):
            return
        self.fused_taps = np.asarray(bank.fused.taps, np.float64)
        self.K0 = len(self.fused_taps)
        self.D0 = int(bank.fused.decim)
        self.pad_k0 = _pad_to(self.K0 - 1, ALIGN1D)
        if self.K0 > 320:
            return                          # fused kernel tap-loop bound
        from .pallas_fir import poly_pallas_ok
        stages: List[_Stage] = []
        prev_so = SUP
        blocks = list(bank.rest_decim) + [b for _, b in bank.rest]
        if bank.filter_needed:
            blocks.append(bank.base.fir)
        for blk in blocks:
            if hasattr(blk, "interp"):      # PolyphaseResampler
                kw = blk.kernel.shape[1]
                hist = blk.tpp - 1
                cfg = poly_pallas_ok(blk.interp, blk.decim, kw,
                                     m_out=4096, batch=2 * C)
                if cfg is None:
                    return
                mt, use_roll = cfg
                pad_k = _pad_to(hist, PAD2D)
                so = ROWS * mt * blk.interp
                st = _Stage("poly", widened=np.asarray(blk.kernel,
                                                       np.float64),
                            interp=blk.interp, decim=blk.decim,
                            mt=mt, use_roll=use_roll, hist=hist,
                            tpp=blk.tpp, pad_k=pad_k, so=so,
                            sup_in=ROWS * mt * blk.decim)
            else:                           # FIR (decim >= 1, real taps)
                if getattr(blk, "_complex_taps", False):
                    return
                K = int(blk.K)
                pad_k = _pad_to(K - 1, PAD2D)
                st = _Stage("decim", taps=np.asarray(blk.taps,
                                                     np.float64),
                            K=K, D=int(blk.decim), pad_k=pad_k,
                            so=ROWS * TILE,
                            sup_in=ROWS * TILE * int(blk.decim))
            if st.pad_k > prev_so:
                return
            st.x_base = prev_so - st.pad_k
            stages.append(st)
            prev_so = st.so
        self.stages = stages
        self.head0 = stages[0].pad_k if stages else PAD2D
        self._plan_cache = {}
        self.supported = True

    # -- per-block-length plan (static shapes) --------------------------
    def _plan(self, T: int):
        plan = self._plan_cache.get(T)
        if plan is not None:
            return plan
        n = len(self.stages)
        m_valid = [T // self.D0]
        for st in self.stages:
            if st.kind == "decim":
                m_valid.append(m_valid[-1] // st.D)
            else:
                m_valid.append((m_valid[-1] // st.decim) * st.interp)
        # backwards M_pad chain: each stage's input must cover its
        # super-tile consumption (incl. the roll-variant read slack)
        m_pad = [0] * (n + 1)
        m_pad[n] = _pad_to(m_valid[n], self.stages[n - 1].so
                           if n else SUP)
        for s in range(n - 1, -1, -1):
            st = self.stages[s]
            n_super = m_pad[s + 1] // st.so
            if st.kind == "poly" and st.use_roll:
                from .pallas_fir import _roll_lwp
                Lw = (st.mt - 1) * st.decim + st.widened.shape[1]
                n_read = ((st.sup_in + st.pad_k + _roll_lwp(Lw) + 256)
                          // 128 + 1) * 128
            else:
                n_read = st.sup_in + st.pad_k
            need = (n_super - 1) * st.sup_in + n_read - st.pad_k
            so_prev = self.stages[s - 1].so if s else SUP
            m_pad[s] = _pad_to(max(m_valid[s], need), so_prev)
        plan = {"m_valid": m_valid, "m_pad": m_pad}
        self._plan_cache[T] = plan
        return plan

    # -- runtime params (extends fused_params with twiddle spans) -------
    @staticmethod
    def extra_params(offset_hz, samplerate: float, decim: int) -> dict:
        omega = -np.asarray(offset_hz, np.float64) * (_TWO_PI / samplerate)
        om_d = omega * decim
        return {
            "omega_dec_sup": jnp.asarray(np.mod(om_d * SUP, _TWO_PI),
                                         jnp.float32),
            "omega_dec_bs": jnp.asarray(np.mod(om_d * BS, _TWO_PI),
                                        jnp.float32),
        }

    # -- the pipeline ----------------------------------------------------
    def apply(self, params, state, x, return_planes: bool = False):
        """params: SharedRxVFOBank params["fused"] (with extra_params
        fields); state: the bank's standard state dict; x: [T] c64.
        Returns ([C, M_out] complex64, new bank state) — or, with
        ``return_planes``, (([C, M] re, [C, M] im) float32 slices of
        the last kernel's output, new state): consumers that are
        elementwise over re/im (the FM discriminator) skip the
        recombine-to-complex HBM pass entirely (~27 B/in-sample)."""
        from .pallas_fir import (fused_mix_decim_planes,
                                 fir_decim_planes, poly_resample_planes)
        C = self.C
        T = x.shape[-1]
        plan = self._plan(T)
        m_valid, m_pad = plan["m_valid"], plan["m_pad"]
        K0, D0, pad_k0 = self.K0, self.D0, self.pad_k0

        # ---- stage 0 input: flat re/im planes of [tail | x] ----------
        ext = jnp.concatenate([state["fused"]["tail"], x])
        Lx = T + K0 - 1
        off0 = pad_k0 - (K0 - 1)
        Lp0 = _pad_to(off0 + m_pad[0] * self.D0 + pad_k0 + ALIGN1D,
                      ALIGN1D)
        zt = jnp.zeros((Lp0 - off0 - Lx,), jnp.float32)
        zf = jnp.zeros((off0,), jnp.float32)
        xf = jnp.concatenate([zf, jnp.real(ext), zt,
                              zf, jnp.imag(ext), zt])

        # channel-modulated taps (runtime: retune without recompile)
        omega = params["omega"]
        k = jnp.arange(K0, dtype=jnp.float32)
        ang = omega[:, None] * k[None, :]
        h = jnp.asarray(self.fused_taps, jnp.float32)[None, :]
        gr = h * jnp.cos(ang)
        gi = h * jnp.sin(ang)
        g = jnp.concatenate(
            [jnp.concatenate([gr, -gi], axis=1),
             jnp.concatenate([gi, gr], axis=1)], axis=0)

        # twiddle base phases per (super-tile, bs-block)
        phase0 = jnp.mod(state["fused"]["phase"]
                         - omega * jnp.float32(K0 - 1) + np.pi,
                         _TWO_PI) - np.pi
        n_super0 = m_pad[0] // SUP
        nb = SUP // BS
        ii = jnp.arange(-1, n_super0, dtype=jnp.float32)
        bb = jnp.arange(nb, dtype=jnp.float32)
        base = (phase0[:, None, None]
                + params["omega_dec_sup"][:, None, None] * ii[None, :,
                                                              None]
                + params["omega_dec_bs"][:, None, None] * bb[None, None,
                                                             :])
        base = base.reshape(C, (n_super0 + 1) * nb)

        # stage-1 history as planes (tiny conversion from complex tails)
        new_state = {k2: v for k2, v in state.items()}
        tails_c = self._stage_tails(state)
        tail0 = self._tail_planes(tails_c[0], self.stages[0].pad_k) \
            if self.stages else jnp.zeros((2 * C, PAD2D), jnp.float32)

        cur = fused_mix_decim_planes(
            xf, g, D0, params["omega_dec"][:, None], base, m_pad[0],
            self.stages[0].pad_k if self.stages else PAD2D, tail0,
            tile=TILE, rows=ROWS, interpret=self.interpret)

        # ---- chained plane stages ------------------------------------
        new_tails = []
        prev_so = SUP
        for s, st in enumerate(self.stages):
            # this stage's NEXT-call history: last K-1 valid inputs
            hist_n = (st.K - 1) if st.kind == "decim" else st.hist
            lo = prev_so + m_valid[s] - hist_n
            new_tails.append(jax.lax.complex(
                cur[:C, lo:lo + hist_n], cur[C:, lo:lo + hist_n]))
            # the head content for the NEXT stage
            if s + 1 < len(self.stages):
                nxt = self.stages[s + 1]
                head_pad = nxt.pad_k
                tail_next = self._tail_planes(tails_c[s + 1], head_pad)
            else:
                head_pad = PAD2D
                tail_next = jnp.zeros((2 * C, PAD2D), jnp.float32)
            if st.kind == "decim":
                cur = fir_decim_planes(
                    cur, st.taps, st.D, st.x_base, m_pad[s + 1],
                    head_pad, tail_next, tile=TILE, rows=ROWS,
                    interpret=self.interpret)
            else:
                cur = poly_resample_planes(
                    cur, st.widened, st.interp, st.decim, st.mt,
                    st.use_roll, st.x_base, m_pad[s + 1], head_pad,
                    tail_next, rows=ROWS, interpret=self.interpret)
            prev_so = st.so

        # ---- output + state writeback --------------------------------
        M = m_valid[-1]
        if return_planes:
            y = (cur[:C, prev_so:prev_so + M],
                 cur[C:, prev_so:prev_so + M])
        else:
            y = jax.lax.complex(cur[:C, prev_so:prev_so + M],
                                cur[C:, prev_so:prev_so + M])
        new_phase = advance_phase(state["fused"]["phase"],
                                  params["omega"],
                                  params["omega_span"], T)
        new_state["fused"] = {
            "tail": ext[T:],
            "phase": jnp.broadcast_to(new_phase, (C,)),
        }
        self._write_tails(new_state, new_tails)
        return y, new_state

    # -- state plumbing (bank-layout complex tails <-> planes) ----------
    def _stage_tails(self, state) -> List[jnp.ndarray]:
        """Complex tails in stage order from the bank state layout:
        rest_decim list, then rest names in order, then 'fir'."""
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

    def _tail_planes(self, tail_c: jnp.ndarray, pad_k: int):
        """[C, hist] complex -> [2C, pad_k] planes, left zero-padded.
        Only the last hist columns are ever read by the kernel."""
        hist = tail_c.shape[-1]
        p = jnp.concatenate([jnp.real(tail_c), jnp.imag(tail_c)],
                            axis=0).astype(jnp.float32)
        if hist < pad_k:
            p = jnp.pad(p, ((0, 0), (pad_k - hist, 0)))
        return p


def build_plane_pipeline(bank, C: int,
                         interpret: bool = False
                         ) -> Optional[PlaneVFOPipeline]:
    """Factory: returns a pipeline or None if this bank/shape can't use
    the plane protocol (falls back to the per-stage kernels)."""
    p = PlaneVFOPipeline(bank, C, interpret=interpret)
    if not p.supported:
        return None
    # record the bank state layout for tail plumbing
    p._rest_names = [n for n, _ in bank.rest]
    p._has_fir = bool(bank.filter_needed)
    # rest_decim tails come first; sanity: stage order must match
    n_stage_tails = (len(bank.rest_decim) + len(bank.rest)
                     + (1 if bank.filter_needed else 0))
    if n_stage_tails != len(p.stages):
        return None
    return p
