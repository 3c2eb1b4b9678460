"""PSK/GFSK demodulator loopback tests (TX mod → RX demod → bits)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sdrplusplusbrown_tpu.ops.mod import PSKMod, RRCInterpolator, GFSKMod
from sdrplusplusbrown_tpu.ops.demod_digital import PSKDemod, GFSKDemod


@pytest.mark.slow
def test_bpsk_loopback(rng):
    fs, baud = 48_000.0, 4800.0
    bits = rng.integers(0, 2, 1000)
    sym, _ = PSKMod(2).apply(None, None, jnp.asarray(bits))
    shaper = RRCInterpolator(baud, fs)
    tx, _ = shaper.apply(None, shaper.init_state(()), sym)
    # carrier offset + phase + noise
    T = tx.shape[-1]
    n = np.arange(T)
    ch = (np.asarray(tx) * np.exp(1j * (2 * np.pi * 3.0 * n / fs + 0.6))
          + 0.02 * (rng.standard_normal(T) + 1j * rng.standard_normal(T))
          ).astype(np.complex64)
    dem = PSKDemod(2, baud, fs)
    st = dem.init_state(())
    (sy, valid), st = dem.apply(None, st, jnp.asarray(ch))
    s = np.asarray(sy)[np.asarray(valid)]
    hard = (np.real(s) < 0).astype(int)
    # BPSK has 180° ambiguity; compare against both polarities after
    # discarding the sync transient
    # scan a generous alignment window: shaping+matched RRC group delay
    # is ~19 symbols, MM adds a few more
    got = hard[100:900]
    best = 0.0
    for pol in (0, 1):
        for off in range(-40, 41):
            lo = 100 + off
            if lo < 0:
                continue
            want = (bits[lo:lo + len(got)] ^ pol)
            m = min(len(want), len(got))
            if m < 500:
                continue
            best = max(best, float(np.mean(got[:m] == want[:m])))
    assert best > 0.98, best


@pytest.mark.slow
def test_gfsk_loopback(rng):
    fs, baud = 48_000.0, 1200.0
    sps = int(fs / baud)
    bits = rng.integers(0, 2, 300)
    nrz = (1.0 - 2.0 * bits).astype(np.float32).repeat(sps)
    mod = GFSKMod(fs, 1200.0, baud)
    tx, _ = mod.apply(None, mod.init_state(()), jnp.asarray(nrz))
    T = tx.shape[-1]
    ch = (np.asarray(tx)
          + 0.02 * (rng.standard_normal(T) + 1j * rng.standard_normal(T))
          ).astype(np.complex64)
    dem = GFSKDemod(baud, fs, 1200.0)
    st = dem.init_state(())
    (sy, valid), st = dem.apply(None, st, jnp.asarray(ch))
    s = np.asarray(sy)[np.asarray(valid)]
    hard = (s < 0).astype(int)
    got = hard[50:250]
    best = 0.0
    for off in range(-40, 41):
        lo = 50 + off
        if lo < 0:
            continue
        want = bits[lo:lo + len(got)]
        m = min(len(want), len(got))
        if m < 100:
            continue
        best = max(best, float(np.mean(got[:m] == want[:m])))
    assert best > 0.97, best


@pytest.mark.slow
def test_fd_clock_recovery_loopback(rng):
    from sdrplusplusbrown_tpu.ops.clock_recovery import FDClockRecovery
    fs, baud = 48_000.0, 4800.0
    bits = rng.integers(0, 2, 500)
    sym, _ = PSKMod(2).apply(None, None, jnp.asarray(bits))
    sh = RRCInterpolator(baud, fs)
    tx, _ = sh.apply(None, sh.init_state(()), sym)
    y = (np.real(np.asarray(tx))
         + 0.02 * rng.standard_normal(tx.shape[-1])).astype(np.float32)
    fd = FDClockRecovery(fs / baud)
    st = fd.init_state(())
    (s, valid), st = fd.apply(None, st, jnp.asarray(y))
    s = np.asarray(s)[np.asarray(valid)]
    assert abs(float(st["freq"]) - 10.0) < 0.1
    hard = (s < 0).astype(int)
    best = 0.0
    for off in range(-40, 41):
        lo = 100 + off
        if lo < 0:
            continue
        want = bits[lo:lo + len(hard) - 100]
        m = min(len(want), len(hard) - 100)
        if m < 300:
            continue
        best = max(best, float(np.mean(hard[100:100 + m] == want[:m])))
    assert best > 0.98, best


def test_pi4dqpsk_afc_positive_and_negative_offsets(rng):
    """Synthetic pi/4-DQPSK with both carrier-offset signs: the
    fourth-power AFC must land the clusters on the +/-45 deg grid (a
    positive offset used to alias one quadrant away)."""
    from sdrplusplusbrown_tpu.ops.demod_digital import Pi4DQPSKDemod
    fs, baud = 36_000.0, 9_000.0
    sps = int(fs / baud)
    n_sym = 4000
    dphases = (rng.integers(0, 4, n_sym) * (np.pi / 2)) + np.pi / 4
    phases = np.cumsum(dphases)
    sym = np.exp(1j * phases)
    tx = np.repeat(sym, sps)
    for off_hz in (+300.0, -300.0):
        n = np.arange(len(tx))
        ch = (tx * np.exp(2j * np.pi * off_hz * n / fs)
              + 0.02 * (rng.standard_normal(len(tx))
                        + 1j * rng.standard_normal(len(tx)))
              ).astype(np.complex64)
        dem = Pi4DQPSKDemod(baud, fs)
        st = dem.init_state(())
        (d, dibit, valid), st = dem.apply(None, st, jnp.asarray(ch))
        dd = np.asarray(d)[np.asarray(valid)][200:]
        ph = np.angle(dd / np.maximum(np.abs(dd), 1e-9))
        resid = ph - (np.pi / 4
                      + np.round((ph - np.pi / 4) / (np.pi / 2))
                      * (np.pi / 2))
        on_grid = np.mean(np.abs(resid) < np.pi / 8)
        assert on_grid > 0.9, (off_hz, on_grid)
