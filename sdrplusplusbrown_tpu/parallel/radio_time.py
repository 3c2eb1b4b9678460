"""Mode-generic time×channel sharded radio pipeline.

Generalizes parallel/wfm_time.py to every demod mode (NFM/AM/USB/LSB/
DSB/CW and WFM mono/stereo): one wideband IQ stream time-sharded over the
mesh's ``"time"`` axis with ppermute halo exchange, VFO channels sharded
over ``"ch"``.  Exactness notes: FIR/resampler/quadrature/delay/FMIF are
exact (halo == state), de-emphasis/DC/noise-blanker are exact
(distributed affine scan), the SSB/CW/AM audio AGC is approximate under
time sharding (per-shard envelope from the previous global block — see
stream_shard.sharded_apply).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..models.radio import Radio, DEMOD_WFM
from ..ops.xlator import rotor, _TWO_PI
from ..ops.demod import FMDemod, AMDemod, SSBDemod, CWDemod
from ..ops.wfm import BroadcastFM
from .stream_shard import sharded_apply, init_carry

TIME_AXIS = "time"
CH_AXIS = "ch"


class DemodTail:
    """The IF → audio tail of a Radio chain under TIME sharding: demod
    (all modes), AF resampler, de-emphasis, optional RDS — each block
    routed through stream_shard.sharded_apply (halo rules for
    FIR/poly/quad/delay, affine scan for deemp/DC, sequential relay for
    the RDS recurrence, the documented AGC approximation for AM/SSB).

    Shared by ShardedRadioPipeline (fused-VFO front end) and
    ShardedChannelizedPipeline (PFB front end) so every demod mode
    scales out on BOTH front-end architectures
    (ref: core/src/server.cpp:84-180 scales any demod).
    """

    def __init__(self, radio: Radio, C: int, rds: bool = False,
                 rds_demod=None):
        self.radio = radio
        self.C = int(C)
        self.rds = bool(rds)
        self.rds_demod = rds_demod

    def demod_blocks(self):
        """(name, block, carry_batch_suffix, dtype) in apply order —
        mirrors each demod's own apply()."""
        d = self.radio.demod
        if isinstance(d, BroadcastFM):
            return None  # handled by the WFM-specific path
        out = []
        if isinstance(d, FMDemod):
            out.append(("quad", d.quad, (), jnp.complex64))
            if d.filtering:
                out.append(("fir", d.fir, (), jnp.float32))
        elif isinstance(d, AMDemod):
            if d.carrier_agc:
                out.append(("cagc", d.c_agc, (), None))
            out.append(("__env__", None, (), None))
            out.append(("dc", d.dc, (), jnp.float32))
            if not d.carrier_agc:
                out.append(("aagc", d.a_agc, (), None))
            out.append(("lpf", d.lpf, (), jnp.float32))
        elif isinstance(d, (SSBDemod, CWDemod)):
            out.append(("xl", d.xlator, (), None))
            out.append(("__real__", None, (), None))
            out.append(("agc", d.agc, (), None))
        else:
            raise TypeError(
                f"no sharded rule for demod {type(d).__name__}")
        return out

    def init_carry(self) -> dict:
        r, C = self.radio, self.C
        carry = {}
        d = r.demod
        if isinstance(d, BroadcastFM):
            carry.update({"quad": init_carry(d.quad, (C,))})
            if d.audio_fir is not None:
                carry["audio_fir"] = init_carry(d.audio_fir, (C, 2),
                                                jnp.float32)
            if d.audio_poly is not None:
                # channel-major so the dim-0 == C sharding rule applies
                carry["audio_rs"] = init_carry(d.audio_poly, (C, 2),
                                               jnp.float32)
            for i, s in enumerate(d.mpx_stages):
                carry[f"mpx{i}"] = init_carry(s, (C,), jnp.float32)
            if self.rds and d.rds_out:
                carry["rds_xl"] = init_carry(d.rds_xlator, (C,))
                carry["rds_rs"] = init_carry(d.rds_resamp, (C,),
                                             jnp.complex64)
                st0 = self.rds_demod.init_state(())
                carry["rds_demod"] = jax.tree.map(
                    lambda a: jnp.broadcast_to(
                        a, (C,) + a.shape).copy(), st0)
            if d.stereo:
                carry.update({
                    "pilot_fir": init_carry(d.pilot_fir, (C,)),
                    "pilot_lag": init_carry(d.pilot_lag, (C,)),
                    "lpr_delay": init_carry(d.lpr_delay, (C,),
                                            jnp.float32),
                    "lmr_delay": init_carry(d.lmr_delay, (C,)),
                })
        else:
            for name, blk, suffix, dtype in self.demod_blocks():
                if blk is None:
                    continue
                carry[f"d_{name}"] = init_carry(
                    blk, (C,) + suffix, dtype or jnp.complex64)
        shape_af = (C, 2) if r.demod_stereo else (C,)
        if r.af_resamp is not None:
            carry["af_rs"] = init_carry(r.af_resamp, shape_af, jnp.float32)
        if r.deemp is not None:
            carry["deemp"] = init_carry(r.deemp, shape_af)
        return carry

    def apply(self, carry, y, tl_if):
        """y [C_local, tl_if] (gated) IF → (audio [C_local, 2, T],
        rds_out | None, new_carry).  Runs under shard_map on the
        ``time`` axis."""
        r = self.radio
        d = r.demod
        ta = TIME_AXIS
        new = {}
        rds_out = None
        if isinstance(d, BroadcastFM):
            mpx, new["quad"] = sharded_apply(d.quad, y, ta, carry["quad"])
            for i, s in enumerate(d.mpx_stages):
                mpx, new[f"mpx{i}"] = sharded_apply(s, mpx, ta,
                                                    carry[f"mpx{i}"])
            if self.rds and d.rds_out:
                tl_mpx = mpx.shape[-1]
                rds_bb, new["rds_xl"] = sharded_apply(
                    d.rds_xlator, mpx.astype(jnp.complex64), ta,
                    carry["rds_xl"], t_local=tl_mpx)
                rds_bb, new["rds_rs"] = sharded_apply(
                    d.rds_resamp, rds_bb, ta, carry["rds_rs"])
                hards, valids, dsts = [], [], []
                for c in range(rds_bb.shape[0]):
                    stc = jax.tree.map(lambda a, c=c: a[c],
                                       carry["rds_demod"])
                    (hard, valid), stn = sharded_apply(
                        self.rds_demod, rds_bb[c], ta, stc)
                    hards.append(hard)
                    valids.append(valid)
                    dsts.append(stn)
                new["rds_demod"] = jax.tree.map(
                    lambda *ls: jnp.stack(ls), *dsts)
                rds_out = (jnp.stack(hards), jnp.stack(valids))
            if d.stereo:
                from ..ops.pll import pilot_normalize
                mpx_c = mpx.astype(jnp.complex64)
                pilot, new["pilot_fir"] = sharded_apply(
                    d.pilot_fir, mpx_c, ta, carry["pilot_fir"])
                vco = pilot_normalize(pilot)
                vco, new["pilot_lag"] = sharded_apply(
                    d.pilot_lag, vco, ta, carry["pilot_lag"])
                vco = vco * jnp.complex64(d.pilot_phase_corr)
                lpr, new["lpr_delay"] = sharded_apply(
                    d.lpr_delay, mpx, ta, carry["lpr_delay"])
                lmr_c, new["lmr_delay"] = sharded_apply(
                    d.lmr_delay, mpx_c, ta, carry["lmr_delay"])
                vco2 = jnp.conj(vco)
                lmr = jnp.real(lmr_c * vco2 * vco2) * 2.0
                lr2 = jnp.stack([lpr + lmr, lpr - lmr], axis=0)
            else:
                lr2 = jnp.stack([mpx, mpx], axis=0)
            if d.audio_poly is not None:
                ars = jnp.moveaxis(carry["audio_rs"], 1, 0)
                lr2, ars = sharded_apply(d.audio_poly, lr2, ta, ars)
                new["audio_rs"] = jnp.moveaxis(ars, 0, 1)
                lr = jnp.moveaxis(lr2, 0, -2)
            elif d.audio_fir is not None and d.low_pass:
                lr = jnp.moveaxis(lr2, 0, -2)
                lr, new["audio_fir"] = sharded_apply(
                    d.audio_fir, lr, ta, carry["audio_fir"])
            else:
                lr = jnp.moveaxis(lr2, 0, -2)
            y = lr
        else:
            for name, blk, _suffix, _dtype in self.demod_blocks():
                if name == "__env__":
                    y = jnp.abs(y).astype(jnp.float32)
                    continue
                if name == "__real__":
                    y = jnp.real(y).astype(jnp.float32)
                    continue
                y, new[f"d_{name}"] = sharded_apply(
                    blk, y, ta, carry[f"d_{name}"], t_local=tl_if)

        if r.af_resamp is not None:
            y, new["af_rs"] = sharded_apply(r.af_resamp, y, ta,
                                            carry["af_rs"])
        if r.deemp is not None:
            y, new["deemp"] = sharded_apply(r.deemp, y, ta, carry["deemp"])
        if not r.demod_stereo:
            y = jnp.stack([y, y], axis=-2)
        return y.astype(jnp.float32), rds_out, new


class ShardedRadioPipeline:
    def __init__(self, in_samplerate: float, mesh: Mesh, n_channels: int,
                 t_local: int, demod_id=DEMOD_WFM,
                 spectrum_fft: int = 0, spectrum_rate: float = 20.0,
                 **radio_kwargs):
        radio_kwargs.setdefault("pll_mode", "normalize")
        self.radio = Radio(in_samplerate, demod_id, **radio_kwargs)
        # RDS under time sharding: the tap (xlate −57 kHz → resample to
        # 5 kHz) shards exactly via the xlator/resampler rules; the
        # demod (AGC→Costas→FIR→Costas→MM→diff) is a nonlinear
        # per-sample recurrence and runs under the sequential relay
        # (stream_shard._relay_block) per channel — bit-consistent with
        # the unsharded models/rds.RDSDemod.
        # ref: decoder_modules/radio/src/rds_demod.cpp.
        self.rds = bool(radio_kwargs.get("rds"))
        self.rds_demod = None
        if self.rds:
            from ..models.rds import RDSDemod
            self.rds_demod = RDSDemod()
        # optional wideband spectrum branch computed per time shard (FFT
        # frames are shard-local, so this parallelizes for free)
        self.spectrum = None
        if spectrum_fft:
            from ..ops.spectrum import SpectrumPath
            self.spectrum = SpectrumPath(in_samplerate, spectrum_fft,
                                         spectrum_rate)
            assert t_local % self.spectrum.in_multiple == 0, (
                f"t_local {t_local} must also be a multiple of the "
                f"spectrum frame interval {self.spectrum.in_multiple}")
        self.mesh = mesh
        self.C = int(n_channels)
        self.nt = mesh.shape[TIME_AXIS]
        self.nc = mesh.shape[CH_AXIS]
        assert self.C % self.nc == 0, (self.C, self.nc)
        g = self.radio.in_multiple
        assert t_local % g == 0, (t_local, g)
        self.t_local = int(t_local)
        self.t_global = self.t_local * self.nt
        self.samplerate = float(in_samplerate)
        self.t_out_local = int(self.t_local * self.radio.ratio)
        self.tail = DemodTail(self.radio, self.C, self.rds,
                              self.rds_demod)
        self._step = self._build_step()

    # ------------------------------------------------------------------
    def make_params(self, offsets_hz, squelch_level=None) -> dict:
        """Same runtime-params contract as Radio.make_params (models/
        radio.py:225): retunes and squelch-level changes NEVER recompile
        the sharded step either."""
        offs = np.asarray(offsets_hz, np.float64)
        assert offs.shape == (self.C,), offs.shape
        omega = -offs * (_TWO_PI / self.samplerate)
        p = {
            "omega": jnp.asarray(omega, jnp.float32),
            "omega_span": jnp.asarray(np.mod(omega * 1024, _TWO_PI),
                                      jnp.float32),
            "omega_shard": jnp.asarray(np.mod(omega * self.t_local,
                                              _TWO_PI), jnp.float32),
        }
        if self.radio.squelch_enabled:
            lvl = squelch_level if squelch_level is not None \
                else self.radio.squelch.default_level
            p["squelch_level"] = jnp.float32(lvl)
        return p

    def _demod_blocks(self):
        return self.tail.demod_blocks()

    def init_carry(self) -> dict:
        r, C = self.radio, self.C
        carry = {
            "phase": jnp.zeros((C,), jnp.float32),
            "vfo_rs": init_carry(r.vfo.resamp, (C,), jnp.complex64),
        }
        if r.vfo.filter_needed:
            carry["vfo_fir"] = init_carry(r.vfo.fir, (C,), jnp.complex64)
        if r.nb_enabled:
            carry["nb"] = init_carry(r.nb, (C,))
        if r.fmif_enabled:
            carry["fmif"] = init_carry(r.fmif, (C,))
        carry.update(self.tail.init_carry())
        return carry

    # ------------------------------------------------------------------
    def _local_step(self, params, carry, x_local):
        r = self.radio
        d = r.demod
        ta = TIME_AXIS
        tl_if = None
        new = {}

        t_idx = jax.lax.axis_index(ta).astype(jnp.float32)
        phase0 = jnp.mod(carry["phase"]
                         + params["omega_shard"] * t_idx, _TWO_PI)
        rot = rotor(phase0, params["omega"], params["omega_span"],
                    self.t_local)
        y = x_local[None, :] * rot
        new["phase"] = jnp.mod(carry["phase"]
                               + params["omega_shard"] * self.nt, _TWO_PI)

        y, new["vfo_rs"] = sharded_apply(r.vfo.resamp, y, ta,
                                         carry["vfo_rs"])
        if r.vfo.filter_needed:
            y, new["vfo_fir"] = sharded_apply(r.vfo.fir, y, ta,
                                              carry["vfo_fir"])
        tl_if = y.shape[-1]
        if r.nb_enabled:
            y, new["nb"] = sharded_apply(r.nb, y, ta, carry["nb"])
        if r.squelch_enabled:
            # whole-block gate like the unsharded Squelch: the mean |x| is
            # computed over the *global* block via psum across time shards
            local_sum = jnp.sum(jnp.abs(y), axis=-1)
            total = jax.lax.psum(local_sum, ta)
            mean_amp = total / (tl_if * self.nt)
            power_db = 10.0 * jnp.log10(jnp.maximum(mean_amp, 1e-20))
            gate = (power_db >= params["squelch_level"]
                    ).astype(jnp.float32)
            y = y * gate[..., None]
        if r.fmif_enabled:
            y, new["fmif"] = sharded_apply(r.fmif, y, ta, carry["fmif"])

        y, rds_out, tail_new = self.tail.apply(carry, y, tl_if)
        new.update(tail_new)
        outs = [y.astype(jnp.float32)]
        if rds_out is not None:
            outs.append(rds_out)
        if self.spectrum is not None:
            spectra, _ = self.spectrum.apply(None, None, x_local)
            outs.append(spectra)
        return (outs[0] if len(outs) == 1 else tuple(outs)), new

    # ------------------------------------------------------------------
    def _specs(self, tree):
        def spec(leaf):
            leaf = jnp.asarray(leaf)
            if leaf.ndim >= 1 and leaf.shape[0] == self.C:
                return P(CH_AXIS, *([None] * (leaf.ndim - 1)))
            return P(*([None] * leaf.ndim))
        return jax.tree.map(spec, tree)

    def _build_step(self):
        params0 = self.make_params(np.zeros((self.C,)))
        carry0 = self.init_carry()
        audio_spec = P(CH_AXIS, None, TIME_AXIS)
        y_specs = [audio_spec]
        if self.rds:
            rds_spec = P(CH_AXIS, TIME_AXIS)
            y_specs.append((rds_spec, rds_spec))
        if self.spectrum is not None:
            y_specs.append(P(TIME_AXIS, None))
        out_specs = ((y_specs[0] if len(y_specs) == 1
                      else tuple(y_specs)),
                     self._specs(carry0))
        fn = jax.shard_map(
            self._local_step, mesh=self.mesh,
            in_specs=(self._specs(params0), self._specs(carry0),
                      P(TIME_AXIS)),
            out_specs=out_specs,
            check_vma=False)
        return jax.jit(fn)

    def step(self, params, carry, x):
        """x [t_global] complex64 → ([C, 2, T_audio_global], carry)."""
        return self._step(params, carry, x)
