"""Time-sharded streaming application of DSP blocks.

For every overlap-save block the streaming state *is* the last few input
samples (reference keeps exactly this as mutable history,
core/src/dsp/filter/fir.h:84-86) — so under time sharding the state of
shard i is the left halo fetched from shard i-1 with ``ppermute``, and the
stream-level carry (state entering the next global block) is the global
tail broadcast from the last shard.  First-order IIR blocks (de-emphasis,
DC blocker) instead use the exact distributed affine scan.  Each helper
returns ``(y_local, new_carry)`` where ``new_carry`` is replicated over the
time axis and channel-sharded like the data.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.fir import FIR
from ..ops.resampler import PolyphaseResampler, PowerDecimator, RationalResampler
from ..ops.demod import Quadrature, Squelch
from ..ops.delay import Delay
from ..ops.recurrence import Deemphasis, DCBlocker, NoiseBlanker
from ..ops.fmif import FMIF
from ..ops.agc import AGC, ENVELOPE_LEN
from ..ops.xlator import FrequencyXlator, nco_params, _TWO_PI
from .halo import left_halo, last_shard_tail
from .dist_scan import sharded_linear_recurrence


def _halo_block(block, n_halo: int, x, axis_name: str, carry):
    """Blocks whose state == last ``n_halo`` input samples."""
    halo = left_halo(x, n_halo, axis_name, carry)
    y, _ = block.apply(None, halo, x)
    new_carry = last_shard_tail(x, n_halo, axis_name)
    return y, new_carry


def _broadcast_last_shard(value, axis_name: str):
    """Replicate the last time-shard's scalar/vector over the axis."""
    size = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    masked = jnp.where(idx == size - 1, value, jnp.zeros_like(value))
    return jax.lax.psum(masked, axis_name)


def _relay_block(block, x, axis_name: str, carry):
    """EXACT time-sharding for an arbitrary nonlinear per-sample
    recurrence (Costas loops, Mueller–Müller clock recovery, the whole
    RDS demod): sequential relay over shards, same pattern as the AGC
    rule below — every shard re-runs its own block each round, round i
    keeps its result only on shard i and broadcasts the final state
    into round i+1.  nt× the (scalar-lane, low-rate) work buys bit
    consistency with the unsharded pipeline."""
    size = jax.lax.axis_size(axis_name)
    t_idx = jax.lax.axis_index(axis_name)

    def bcast(leaf, sel):
        if jnp.iscomplexobj(leaf):
            re = jax.lax.psum(jnp.where(sel, jnp.real(leaf), 0.0),
                              axis_name)
            im = jax.lax.psum(jnp.where(sel, jnp.imag(leaf), 0.0),
                              axis_name)
            return jax.lax.complex(re, im).astype(leaf.dtype)
        return jax.lax.psum(jnp.where(sel, leaf, jnp.zeros_like(leaf)),
                            axis_name)

    y_sh, _ = jax.eval_shape(lambda s, xx: block.apply(None, s, xx),
                             carry, x)
    y_init = jax.tree.map(lambda a: jnp.zeros(a.shape, a.dtype), y_sh)

    def body(i, acc):
        st_in, y_acc = acc
        y_i, st_out = block.apply(None, st_in, x)
        sel = t_idx == i
        st_next = jax.tree.map(lambda a: bcast(a, sel), st_out)
        y_keep = jax.tree.map(lambda new, old: jnp.where(sel, new, old),
                              y_i, y_acc)
        return st_next, y_keep

    st_fin, y = jax.lax.fori_loop(0, size, body, (carry, y_init))
    return y, st_fin


def sharded_apply(block, x, axis_name: str, carry, t_local: int = 0,
                  params=None):
    """Dispatch on block type; mirrors Block.apply but time-sharded.

    ``t_local`` (this shard's input length) is needed by index-dependent
    blocks (FrequencyXlator's NCO phase, AGC's startup ramp).  ``params``
    carries the block's runtime knobs with the same schema as its
    unsharded ``apply`` (e.g. Squelch {"level": …}) so retunes never
    recompile sharded configs either.
    """
    if isinstance(block, FrequencyXlator):
        # exact global phase: per-shard start = carry + ω·t_local·idx,
        # with ω·t_local reduced mod 2π in host float64 (static values)
        assert t_local > 0, "xlator sharding needs t_local"
        omega = float(block.offset_hz) * _TWO_PI / float(block.samplerate)
        om_tl = float(np.mod(np.float64(omega) * t_local, _TWO_PI))
        t_idx = jax.lax.axis_index(axis_name).astype(jnp.float32)
        size = jax.lax.axis_size(axis_name)
        phase0 = jnp.mod(carry + om_tl * t_idx, _TWO_PI)
        from ..ops.xlator import rotor
        p = nco_params(block.offset_hz, block.samplerate)
        rot = rotor(phase0, p["omega"], p["omega_span"], t_local)
        y = x * rot
        new_carry = jnp.mod(carry + om_tl * size, _TWO_PI)
        return y, new_carry
    if isinstance(block, AGC):
        # EXACT time-sharding by sequential relay: the AGC envelope is a
        # nonlinear per-sample recurrence, so shard i's scan must start
        # from shard i-1's final envelope.  Loop over shards: every shard
        # re-runs its own (cheap, scalar-lane) scan each round, but only
        # round i's result is kept on shard i and its final envelope is
        # broadcast into round i+1 — nt× the scalar scan work buys bit-
        # consistency with the unsharded pipeline.
        assert t_local > 0, "AGC sharding needs t_local"
        t_idx = jax.lax.axis_index(axis_name)
        size = jax.lax.axis_size(axis_name)
        T = x.shape[-1]

        def body(i, acc):
            amp_in, y_acc = acc
            st = {"amp": amp_in, "env": carry["env"] + i * T}
            y_i, new = block.apply(None, st, x)
            sel = t_idx == i
            amp_out = jax.lax.psum(
                jnp.where(sel, new["amp"], jnp.zeros_like(new["amp"])),
                axis_name)
            y_acc = jnp.where(sel, y_i, y_acc)
            return amp_out, y_acc

        amp_fin, y = jax.lax.fori_loop(
            0, size, body, (carry["amp"], jnp.zeros_like(x)))
        return y, {"amp": amp_fin,
                   "env": jnp.minimum(carry["env"] + size * T,
                                      jnp.int32(1 << 30))}
    if isinstance(block, FMIF):
        return _halo_block(block, block.bins - 1, x, axis_name, carry)
    from ..ops.costas import Costas
    from ..ops.clock_recovery import MMClockRecovery, FDClockRecovery
    from ..models.rds import RDSDemod
    if isinstance(block, (Costas, MMClockRecovery, FDClockRecovery,
                          RDSDemod)):
        return _relay_block(block, x, axis_name, carry)
    if isinstance(block, Squelch):
        # whole-GLOBAL-block gate like the unsharded Squelch: mean |x|
        # over all time shards via psum; the level is a runtime param
        # (same schema as Squelch.apply, ops/demod.py:77-82)
        size = jax.lax.axis_size(axis_name)
        total = jax.lax.psum(jnp.sum(jnp.abs(x), axis=-1), axis_name)
        mean_amp = total / (x.shape[-1] * size)
        power_db = 10.0 * jnp.log10(jnp.maximum(mean_amp, 1e-20))
        level = params["level"] if params \
            else jnp.float32(block.default_level)
        gate = (power_db >= level).astype(jnp.float32)
        return x * gate[..., None], carry
    if isinstance(block, NoiseBlanker):
        amp_in = jnp.abs(x).astype(jnp.float32)
        nz = amp_in != 0.0
        r = jnp.float32(block.rate)
        a = jnp.where(nz, 1.0 - r, 1.0)
        b = jnp.where(nz, amp_in * r, 0.0)
        amp, final = sharded_linear_recurrence(a, b, carry, axis_name)
        excess = jnp.where(nz, amp_in / amp, 1.0)
        level = params["level"] if params \
            else jnp.float32(block.default_level)
        gain = jnp.where(excess > level, 1.0 / excess, 1.0)
        return x * gain.astype(jnp.float32), final
    if isinstance(block, FIR):
        return _halo_block(block, block.K - 1, x, axis_name, carry)
    if isinstance(block, PolyphaseResampler):
        return _halo_block(block, block.tpp - 1, x, axis_name, carry)
    if isinstance(block, Quadrature):
        # carry init must be the phasor 1+0j (reference starts phase at 0)
        return _halo_block(block, 1, x, axis_name, carry)
    if isinstance(block, Delay):
        return _halo_block(block, block.delay, x, axis_name, carry)
    if isinstance(block, PowerDecimator):
        new_carry = []
        for stage, c in zip(block.stages, carry):
            x, nc = _halo_block(stage, stage.K - 1, x, axis_name, c)
            new_carry.append(nc)
        return x, new_carry
    if isinstance(block, RationalResampler):
        new_carry = {}
        for name, blk in block.chain.named_blocks:
            x, new_carry[name] = sharded_apply(blk, x, axis_name, carry[name])
        return x, new_carry
    if isinstance(block, Deemphasis):
        a = jnp.float32(1.0 - block.alpha)
        b = x * jnp.float32(block.alpha)
        y, final = sharded_linear_recurrence(a, b, carry, axis_name)
        return y, final
    if isinstance(block, DCBlocker):
        r = jnp.float32(block.rate)
        offs, final = sharded_linear_recurrence(1.0 - r, x * r, carry,
                                                axis_name)
        halo = left_halo(offs, 1, axis_name, carry[..., None]
                         if carry.ndim == offs.ndim - 1 else carry)
        prev = jnp.concatenate([halo, offs[..., :-1]], axis=-1)
        return x - prev, final
    raise TypeError(f"no sharded rule for {type(block).__name__}")


def init_carry(block, batch_shape=(), dtype=jnp.complex64):
    """Stream-start carry for ``sharded_apply`` (matches a reset block)."""
    if isinstance(block, FrequencyXlator):
        return jnp.zeros(batch_shape, jnp.float32)
    if isinstance(block, AGC):
        return {"amp": jnp.full(batch_shape,
                                block.set_point / block.init_gain,
                                jnp.float32),
                "env": jnp.zeros((), jnp.int32)}
    if isinstance(block, FMIF):
        return jnp.zeros(batch_shape + (block.bins - 1,), jnp.complex64)
    if isinstance(block, Squelch):
        return jnp.zeros((), jnp.float32)      # stateless placeholder
    if isinstance(block, NoiseBlanker):
        return jnp.ones(batch_shape, jnp.float32)
    if isinstance(block, FIR):
        return jnp.zeros(batch_shape + (block.K - 1,), dtype)
    if isinstance(block, PolyphaseResampler):
        return jnp.zeros(batch_shape + (block.tpp - 1,), dtype)
    if isinstance(block, Quadrature):
        return jnp.ones(batch_shape + (1,), jnp.complex64)
    if isinstance(block, Delay):
        return jnp.zeros(batch_shape + (block.delay,), dtype)
    if isinstance(block, PowerDecimator):
        return [jnp.zeros(batch_shape + (s.K - 1,), dtype)
                for s in block.stages]
    if isinstance(block, RationalResampler):
        return {name: init_carry(blk, batch_shape, dtype)
                for name, blk in block.chain.named_blocks}
    if isinstance(block, (Deemphasis,)):
        return jnp.zeros(batch_shape, jnp.float32)
    if isinstance(block, DCBlocker):
        return jnp.zeros(batch_shape, dtype)
    from ..ops.costas import Costas
    from ..ops.clock_recovery import MMClockRecovery, FDClockRecovery
    from ..models.rds import RDSDemod
    if isinstance(block, (Costas, MMClockRecovery, FDClockRecovery,
                          RDSDemod)):
        # relay rule: the carry IS the block's own state pytree
        return block.init_state(batch_shape)
    raise TypeError(f"no carry rule for {type(block).__name__}")
