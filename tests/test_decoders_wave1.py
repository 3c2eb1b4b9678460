"""Decoder wave 1 golden tests: VOR bearing recovery and Meteor (O)QPSK
soft-symbol recovery from synthetic RF (reference oracle style:
tests/baseband_file_test.cpp — known signal in, assert decoded product).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sdrplusplusbrown_tpu.models.vor import (VORDecoder, synthesize_vor,
                                             VOR_IN_SR)
from sdrplusplusbrown_tpu.models.meteor import MeteorDemod, soft_to_int8
from sdrplusplusbrown_tpu.ops.mod import PSKMod, RRCInterpolator


@pytest.mark.slow
@pytest.mark.parametrize("az_deg", [0.0, 137.0, 289.5])
def test_vor_bearing_recovery(az_deg):
    dec = VORDecoder(1.0)
    x = synthesize_vor(np.deg2rad(az_deg), 6.0, noise=0.05)
    g = dec.in_multiple
    n = (len(x) // g) * g
    (bear, qual), _ = jax.jit(
        lambda s, xx: dec.apply(None, s, xx))(dec.init_state(()),
                                              jnp.asarray(x[:n]))
    b = np.rad2deg(np.asarray(bear))
    q = np.asarray(qual)
    # skip the settling windows (RxVFO 30 Hz filters are ~2.5 s long)
    err = np.abs(((b[-2:] - az_deg + 180.0) % 360.0) - 180.0)
    assert np.all(err < 2.0), (az_deg, b)
    assert np.all(q[-2:] > 0.9), q


@pytest.mark.slow
def test_vor_quality_collapses_on_noise():
    rng = np.random.default_rng(7)
    dec = VORDecoder(1.0)
    T = int(4 * VOR_IN_SR)
    x = (0.3 * (rng.standard_normal(T) + 1j * rng.standard_normal(T))
         ).astype(np.complex64)
    g = dec.in_multiple
    n = (len(x) // g) * g
    (bear, qual), _ = jax.jit(
        lambda s, xx: dec.apply(None, s, xx))(dec.init_state(()),
                                              jnp.asarray(x[:n]))
    assert np.all(np.asarray(qual)[-2:] < 0.5), np.asarray(qual)


def _shape_meteor(rng, sym):
    interp = RRCInterpolator(72_000, 150_000, beta=0.6, tap_count=33)
    iq, _ = interp.apply(None, interp.init_state((), jnp.complex64),
                         jnp.asarray(sym))
    iq = np.asarray(iq) * 0.5
    n = np.arange(len(iq))
    iq = iq * np.exp(1j * (2 * np.pi * 40.0 * n / 150e3 + 0.3))
    iq += 0.02 * (rng.standard_normal(iq.shape)
                  + 1j * rng.standard_normal(iq.shape))
    return iq.astype(np.complex64)


def _dibit(s):
    return (np.real(s) < 0).astype(int) * 2 + (np.imag(s) < 0).astype(int)


@pytest.mark.slow
def test_meteor_qpsk_symbol_recovery():
    rng = np.random.default_rng(3)
    bits = rng.integers(0, 2, 6000 * 2)
    tx_sym = np.asarray(PSKMod(4).apply(None, None, jnp.asarray(bits))[0])
    iq = _shape_meteor(rng, tx_sym)
    dem = MeteorDemod()
    (softs, valid), _ = jax.jit(
        lambda s, x: dem.apply(None, s, x))(dem.init_state(()),
                                            jnp.asarray(iq))
    soft = np.asarray(softs)[np.asarray(valid)]
    tail = soft[3000:]
    # constellation on the ±45° grid
    dev = np.abs((np.angle(tail) % (np.pi / 2)) - np.pi / 4)
    assert np.rad2deg(np.median(dev)) < 6.0
    # exact dibit recovery modulo QPSK 4-fold rotation and group delay
    best = 0.0
    for k in range(4):
        hr = _dibit(tail * np.exp(1j * np.pi / 2 * k))
        for lag in range(-80, 81):
            want = _dibit(tx_sym[3000 + lag: 3000 + lag + len(hr)])
            m = min(len(want), len(hr))
            if m > 1000:
                best = max(best, float((hr[:m] == want[:m]).mean()))
    assert best > 0.999, best
    # int8 writer matches reference scaling (main.cpp:199-202)
    i8 = soft_to_int8(tail[:4])
    assert i8.dtype == np.int8 and len(i8) == 8
    assert np.all(np.abs(i8.astype(int)) <= 127)


@pytest.mark.slow
def test_meteor_broken_modulation_lock():
    """MeteorM2-x asymmetric constellation: the 4-phase nearest-cluster
    detector (meteor_costas.h:33-51) must lock clusters onto the exact
    BROKEN_PHASES grid."""
    from sdrplusplusbrown_tpu.models.meteor import BROKEN_PHASES
    rng = np.random.default_rng(11)
    choice = rng.integers(0, 4, 6000)
    sym = np.exp(1j * np.asarray(BROKEN_PHASES)[choice]).astype(np.complex64)
    iq = _shape_meteor(rng, sym)
    dem = MeteorDemod(broken_modulation=True)
    (softs, valid), _ = jax.jit(
        lambda s, x: dem.apply(None, s, x))(dem.init_state(()),
                                            jnp.asarray(iq))
    soft = np.asarray(softs)[np.asarray(valid)]
    tail = soft[3000:]
    ang = np.angle(tail)
    dev = np.min(np.abs(((ang[:, None] - np.asarray(BROKEN_PHASES)[None, :]
                          + np.pi) % (2 * np.pi)) - np.pi), axis=1)
    # the asymmetric (DC-bearing) constellation at 2.08 samples/symbol has
    # inherent ISI scatter; uniform (unlocked) phase would median ≈ 41°
    assert np.rad2deg(np.median(dev)) < 25.0, np.rad2deg(np.median(dev))


@pytest.mark.slow
def test_meteor_oqpsk_roundtrip():
    """OQPSK: Q delayed half a symbol at TX; the demod's one-sample Q
    advance restores the constellation (meteor_demod.h:155-164)."""
    rng = np.random.default_rng(5)
    nsym = 6000
    bits = rng.integers(0, 2, nsym * 2)
    sym, _ = PSKMod(4).apply(None, None, jnp.asarray(bits))
    sym = np.asarray(sym)
    # 150 kHz / 72 kSym: build OQPSK by shaping I and Q separately with a
    # half-symbol stagger at the fine (interp) grid
    interp_i = RRCInterpolator(72_000, 150_000, beta=0.6, tap_count=33)
    interp_q = RRCInterpolator(72_000, 150_000, beta=0.6, tap_count=33)
    ii, _ = interp_i.apply(None, interp_i.init_state((), jnp.complex64),
                           jnp.asarray(sym.real.astype(np.complex64)))
    qq, _ = interp_q.apply(None, interp_q.init_state((), jnp.complex64),
                           jnp.asarray(sym.imag.astype(np.complex64)))
    ii, qq = np.asarray(ii).real, np.asarray(qq).real
    # half-symbol ≈ 1 sample at 2.08 sps (the demod compensates exactly
    # one sample, meteor_demod.h:157-161)
    iq = (ii[:-1] + 1j * qq[1:]) * 0.5
    iq += 0.02 * (rng.standard_normal(iq.shape)
                  + 1j * rng.standard_normal(iq.shape))
    dem = MeteorDemod(oqpsk=True)
    (softs, valid), _ = jax.jit(
        lambda s, x: dem.apply(None, s, x))(dem.init_state(()),
                                            jnp.asarray(
                                                iq.astype(np.complex64)))
    soft = np.asarray(softs)[np.asarray(valid)]
    tail = soft[3000:]
    dev = np.abs((np.angle(tail) % (np.pi / 2)) - np.pi / 4)
    assert np.rad2deg(np.median(dev)) < 10.0, np.rad2deg(np.median(dev))


@pytest.mark.slow
def test_vor_module_surface(tmp_path):
    """VOR module over the app: feed synthetic VOR baseband through the
    module's own channelizer path and read the bearing."""
    import json
    import os
    from sdrplusplusbrown_tpu.app import SDRApp
    root = str(tmp_path / "root")
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "config.json"), "w") as f:
        json.dump({"source": {"type": "none", "samplerate": 100_000.0},
                   "modules": {"VOR": {"type": "vor_receiver",
                                       "offset": 0.0}}}, f)
    app = SDRApp(root, run_pump=False)
    try:
        mod = app.modules["VOR"]
        az = np.deg2rad(211.0)
        x25 = synthesize_vor(az, 7.0, noise=0.03)
        # upsample 25k → 100k (the module's RxVFO channelizes back down)
        x100 = np.repeat(x25, 4)
        blk = mod.rc.out_len
        pad = (-len(x100)) % blk
        mod._on_baseband(np.concatenate(
            [x100, np.zeros(pad, np.complex64)]).astype(np.complex64))
        r = mod.handle_debug_command("get_bearing", "")
        assert r["windows"] >= 4, r
        err = abs(((r["bearing"] - 211.0 + 180.0) % 360.0) - 180.0)
        assert err < 4.0, r
    finally:
        app.shutdown()
