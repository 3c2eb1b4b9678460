"""DAB OFDM front end and KG-SSTV decoder tests
(reference decoder_modules/{dab,kg_sstv}_decoder)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sdrplusplusbrown_tpu.models import dab as D
from sdrplusplusbrown_tpu.models import kg_sstv as K


def test_dab_phase_reference_properties():
    Z = D.phase_reference_freq()
    ks = np.array([k for k in range(-768, 769) if k != 0])
    # 1536 unit-amplitude active carriers, DC empty
    active = Z[ks % D.TU]
    assert np.allclose(np.abs(active), 1.0)
    assert Z[0] == 0
    # phases on the QPSK grid
    q = np.angle(active) / (np.pi / 2)
    assert np.allclose(q, np.round(q), atol=1e-9)


@pytest.mark.slow
def test_dab_front_end_recovers_dqpsk(rng):
    """30 continuous frames with 400 Hz CFO + noise: frame sync sees the
    nulls, the CFO servo converges, and the last frame's per-carrier
    DQPSK dibits recover at >85%."""
    frames, all_dibits = [], []
    for _ in range(30):
        iq, dib = D.build_frame(10, rng)
        frames.append(iq)
        all_dibits.append(dib)
    sig = np.concatenate(frames)
    n = np.arange(len(sig))
    # keep the CFO under half a carrier spacing (1 kHz) — the
    # upstream servo has the usual integer-bin ambiguity above that
    sig = sig * np.exp(2j * np.pi * 350.0 * n / D.DAB_SR)
    sig = (sig + 0.005 * (rng.standard_normal(len(sig))
                          + 1j * rng.standard_normal(len(sig)))
           ).astype(np.complex64)
    cs = D.CyclicSync()
    cs.push(sig)
    ff = D.FrameFreqSync()
    for s, p in zip(cs.symbols, cs.positions):
        ff.push_symbol(s, pos=p)
    assert ff.frames_seen >= 25
    # servo converged near the injected −400 Hz
    assert abs(ff.last_cfo_hz + 350.0) < 60.0, ff.last_cfo_hz
    dm = ff.demap_time_differential()
    dib = all_dibits[-1]
    accs = [(dm[i] == dib[i]).mean()
            for i in range(min(len(dm), len(dib)))]
    assert len(accs) >= 8
    # front-end scope: residual CFO/timing leaves a few outer
    # carriers noisy; upstream decodes nothing beyond the display
    assert np.mean(accs) > 0.85, accs
    # upstream's display constellation exists per symbol
    assert len(ff.constellations[-1]) == 1534


@pytest.mark.slow
def test_dab_module_surface(rng, tmp_path):
    import json
    import os
    from sdrplusplusbrown_tpu.app import SDRApp
    root = str(tmp_path / "root")
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "config.json"), "w") as f:
        json.dump({"source": {"type": "none", "samplerate": D.DAB_SR},
                   "fftSize": 4096,
                   "modules": {"DAB": {"type": "dab_decoder"}}}, f)
    app = SDRApp(root, run_pump=False)
    try:
        mod = app.modules["DAB"]
        frames = [D.build_frame(8, rng)[0] for _ in range(12)]
        sig = np.concatenate(frames).astype(np.complex64)
        blk = mod.rc.out_len
        pad = (-len(sig)) % blk
        mod.process_iq(np.concatenate([sig,
                                       np.zeros(pad, np.complex64)]))
        st = mod.handle_debug_command("status", "")
        assert st["frames"] >= 8, st
        c = mod.handle_debug_command("get_constellation", "")
        assert len(c["points"]) == 256
        d = mod.handle_debug_command("get_dibits", "")
        assert len(d["dibits"]) == 128
    finally:
        app.shutdown()


def test_kgsstv_symbol_loopback(rng):
    payloads = [bytes([i] * 6) for i in (1, 0x5A, 0xFF)]
    syms = []
    for p in payloads:
        syms.append(np.concatenate(
            [2.0 * rng.integers(0, 2, 40).astype(np.float32) - 1.0,
             K.build_frame_symbols(p)]))
    stream = np.concatenate(
        syms + [2.0 * rng.integers(0, 2, 300).astype(np.float32) - 1.0])
    df = K.KGSSTVDeframer()
    df.push_symbols(stream)
    assert df.frames == payloads


def test_kgsstv_tolerates_sync_errors(rng):
    p = b"\x12\x34\x56\x78\x9a\xbc"
    syms = K.build_frame_symbols(p)
    # flip 3 sync symbols (≤4 allowed, kg_sstv_dsp.h:149)
    syms = syms.copy()
    syms[[3, 17, 41]] *= -1.0
    df = K.KGSSTVDeframer()
    df.push_symbols(np.concatenate(
        [2.0 * rng.integers(0, 2, 50).astype(np.float32) - 1.0, syms,
         np.zeros(120, np.float32)]))
    assert df.frames == [p]


@pytest.mark.slow
def test_kgsstv_rf_loopback(rng):
    fs = 48_000.0
    payloads = [bytes([i] * 6) for i in (7, 0xA5)]
    stream = np.concatenate(
        [np.concatenate([2.0 * rng.integers(0, 2, 40)
                         .astype(np.float32) - 1.0,
                         K.build_frame_symbols(p)]) for p in payloads]
        + [2.0 * rng.integers(0, 2, 300).astype(np.float32) - 1.0])
    sps = fs / K.KGSSTV_BAUD
    n_out = int(len(stream) * sps)
    sidx = np.minimum((np.arange(n_out) / sps).astype(np.int64),
                      len(stream) - 1)
    phase = 2 * np.pi * np.cumsum(stream[sidx]) \
        * K.KGSSTV_DEVIATION / fs
    iq = (np.exp(1j * (phase + 0.3)) + 0.02 * (
        rng.standard_normal(n_out) + 1j * rng.standard_normal(n_out))
    ).astype(np.complex64)
    dem = K.KGSSTVDemod(fs)
    (soft, valid), _ = jax.jit(
        lambda s, x: dem.apply(None, s, x))(dem.init_state(()),
                                            jnp.asarray(iq))
    df = K.KGSSTVDeframer()
    df.push_symbols(np.asarray(soft)[np.asarray(valid)])
    assert df.frames == payloads


@pytest.mark.slow
def test_kgsstv_module_surface(rng, tmp_path):
    import json
    import os
    from sdrplusplusbrown_tpu.app import SDRApp
    root = str(tmp_path / "root")
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "config.json"), "w") as f:
        json.dump({"source": {"type": "none", "samplerate": 48_000.0},
                   "modules": {"KG": {"type": "kg_sstv_decoder"}}}, f)
    app = SDRApp(root, run_pump=False)
    try:
        mod = app.modules["KG"]
        stream = np.concatenate(
            [2.0 * rng.integers(0, 2, 40).astype(np.float32) - 1.0,
             K.build_frame_symbols(b"\x11" * 6)])
        fs = 48_000.0
        sps = fs / K.KGSSTV_BAUD
        n_out = int(len(stream) * sps)
        sidx = np.minimum((np.arange(n_out) / sps).astype(np.int64),
                          len(stream) - 1)
        iq = np.exp(1j * 2 * np.pi * np.cumsum(stream[sidx])
                    * K.KGSSTV_DEVIATION / fs).astype(np.complex64)
        blk = mod.rc.out_len
        pad = (-len(iq)) % blk + blk
        mod.process_iq(np.concatenate([iq,
                                       np.zeros(pad, np.complex64)]))
        assert mod.handle_debug_command("status", "")["frames"] == 1
        assert mod.handle_debug_command("get_frames", "")["frames"] \
            == ["111111111111"]
    finally:
        app.shutdown()
