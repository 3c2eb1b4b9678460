"""Fully sharded WFM broadcast pipeline: time × channel over a device mesh.

The flagship multi-chip configuration (BASELINE.md build targets): one
wideband IQ stream is sharded along *time* across the mesh's ``"time"`` axis
(each device takes a contiguous segment, halo-exchanging overlap-save tails
over ICI, see parallel/stream_shard.py) while the batched VFO channel axis
shards across ``"ch"``.  The per-global-block streaming carry (filter tails,
NCO phases, de-emphasis values) is an explicit pytree, replicated along
``time`` and sharded along ``ch``.

The composition mirrors models/radio.py (Radio WFM, which itself mirrors the
reference decoder_modules/radio/src/radio_module.h wiring): RxVFO
(xlate → rational resample → 150 kHz channel FIR) → BroadcastFM stereo
(quadrature → pilot bandpass → normalize-VCO → L±R matrixing → 15 kHz audio
FIRs) → AF resample to 48 kHz → 50 µs de-emphasis.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..models.radio import Radio, DEMOD_WFM
from ..ops.xlator import rotor, _TWO_PI
from .stream_shard import sharded_apply, init_carry

TIME_AXIS = "time"
CH_AXIS = "ch"


class ShardedWFMPipeline:
    def __init__(self, in_samplerate: float, mesh: Mesh, n_channels: int,
                 t_local: int, stereo: bool = True,
                 deemphasis: str = "50us"):
        self.radio = Radio(in_samplerate, DEMOD_WFM, stereo=stereo,
                           deemphasis=deemphasis, pll_mode="normalize")
        self.mesh = mesh
        self.C = int(n_channels)
        self.nt = mesh.shape[TIME_AXIS]
        self.nc = mesh.shape[CH_AXIS]
        assert self.C % self.nc == 0, (self.C, self.nc)
        g = self.radio.in_multiple
        assert t_local % g == 0, (
            f"t_local {t_local} must be a multiple of pipeline granularity {g}")
        self.t_local = int(t_local)
        self.t_global = self.t_local * self.nt
        self.samplerate = float(in_samplerate)
        r = self.radio
        self.t_out_local = int(self.t_local * r.ratio)
        self._step = self._build_step()

    # ------------------------------------------------------------------
    def make_params(self, offsets_hz) -> dict:
        """Host-side float64 NCO parameter computation (per-channel)."""
        offs = np.asarray(offsets_hz, np.float64)
        assert offs.shape == (self.C,), offs.shape
        omega = -offs * (_TWO_PI / self.samplerate)   # RxVFO rotates by -offset
        return {
            "omega": jnp.asarray(omega, jnp.float32),
            "omega_span": jnp.asarray(np.mod(omega * 1024, _TWO_PI),
                                      jnp.float32),
            "omega_shard": jnp.asarray(np.mod(omega * self.t_local, _TWO_PI),
                                       jnp.float32),
        }

    def init_carry(self) -> dict:
        r, C = self.radio, self.C
        d = r.demod
        carry = {
            "phase": jnp.zeros((C,), jnp.float32),
            "vfo_rs": init_carry(r.vfo.resamp, (C,), jnp.complex64),
            "quad": init_carry(d.quad, (C,), jnp.complex64),
        }
        if r.vfo.filter_needed:
            carry["vfo_fir"] = init_carry(r.vfo.fir, (C,), jnp.complex64)
        if d.stereo:
            carry.update({
                "pilot_fir": init_carry(d.pilot_fir, (C,), jnp.complex64),
                "pilot_lag": init_carry(d.pilot_lag, (C,), jnp.complex64),
                "lpr_delay": init_carry(d.lpr_delay, (C,), jnp.float32),
                "lmr_delay": init_carry(d.lmr_delay, (C,), jnp.complex64),
            })
        carry["audio_fir"] = init_carry(d.audio_fir, (C, 2), jnp.float32)
        if r.af_resamp is not None:
            carry["af_rs"] = init_carry(r.af_resamp, (C, 2), jnp.float32)
        if r.deemp is not None:
            carry["deemp"] = init_carry(r.deemp, (C, 2))
        return carry

    # ------------------------------------------------------------------
    def _local_step(self, params, carry, x_local):
        """Per-device computation: x_local [t_local] (this time shard,
        replicated over ch); per-channel leaves sliced to C/nc."""
        r = self.radio
        d = r.demod
        ta = TIME_AXIS
        nt = self.nt
        new = {}

        # --- frequency translation with globally-consistent phase
        t_idx = jax.lax.axis_index(ta).astype(jnp.float32)
        phase0 = jnp.mod(carry["phase"]
                         + params["omega_shard"] * t_idx, _TWO_PI)
        rot = rotor(phase0, params["omega"], params["omega_span"],
                    self.t_local)                       # [C_l, t_local]
        y = x_local[None, :] * rot
        new["phase"] = jnp.mod(carry["phase"]
                               + params["omega_shard"] * nt, _TWO_PI)

        # --- rational resample to 500 kHz IF, then channel FIR
        y, new["vfo_rs"] = sharded_apply(r.vfo.resamp, y, ta, carry["vfo_rs"])
        if r.vfo.filter_needed:
            y, new["vfo_fir"] = sharded_apply(r.vfo.fir, y, ta,
                                              carry["vfo_fir"])

        # --- WFM stereo demod (normalize-mode pilot recovery)
        mpx, new["quad"] = sharded_apply(d.quad, y, ta, carry["quad"])
        if d.stereo:
            mpx_c = mpx.astype(jnp.complex64)
            pilot, new["pilot_fir"] = sharded_apply(
                d.pilot_fir, mpx_c, ta, carry["pilot_fir"])
            from ..ops.pll import pilot_normalize
            vco = pilot_normalize(pilot)
            vco, new["pilot_lag"] = sharded_apply(
                d.pilot_lag, vco, ta, carry["pilot_lag"])
            lpr, new["lpr_delay"] = sharded_apply(
                d.lpr_delay, mpx, ta, carry["lpr_delay"])
            lmr_c, new["lmr_delay"] = sharded_apply(
                d.lmr_delay, mpx_c, ta, carry["lmr_delay"])
            vco2 = jnp.conj(vco)
            lmr = jnp.real(lmr_c * vco2 * vco2) * 2.0
            lr = jnp.stack([lpr + lmr, lpr - lmr], axis=-2)   # [C_l, 2, T]
        else:
            lr = jnp.stack([mpx, mpx], axis=-2)
        lr, new["audio_fir"] = sharded_apply(d.audio_fir, lr, ta,
                                             carry["audio_fir"])

        # --- AF resample to 48 kHz + de-emphasis
        if r.af_resamp is not None:
            lr, new["af_rs"] = sharded_apply(r.af_resamp, lr, ta,
                                             carry["af_rs"])
        if r.deemp is not None:
            lr, new["deemp"] = sharded_apply(r.deemp, lr, ta, carry["deemp"])
        return lr.astype(jnp.float32), new

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
        p_spec = self._specs(params0)
        c_spec = self._specs(carry0)
        x_spec = P(TIME_AXIS)
        out_audio_spec = P(CH_AXIS, None, TIME_AXIS)

        fn = jax.shard_map(
            self._local_step, mesh=self.mesh,
            in_specs=(p_spec, c_spec, x_spec),
            out_specs=(out_audio_spec, c_spec),
            check_vma=False)
        return jax.jit(fn)

    def step(self, params, carry, x):
        """x: [t_global] complex64 wideband block → ([C, 2, T_audio], carry)."""
        return self._step(params, carry, x)
