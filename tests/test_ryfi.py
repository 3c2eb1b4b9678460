"""RyFi data link: frame/packet layer vectors, FEC loopback under
errors, deframer rotations, full RF loopback
(reference decoder_modules/ryfi_decoder/src/ryfi/)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sdrplusplusbrown_tpu.models import ryfi as R
from sdrplusplusbrown_tpu.ops.mod import RRCInterpolator


def test_packet_frame_roundtrip(rng):
    pkts = [b"hello ryfi", bytes(range(200)), b"x" * 1500, b"tail"]
    frames = R.pack_packets(pkts)
    asm = R.PacketAssembler()
    for f in frames:
        asm.push_frame(f)
    assert asm.packets == [bytes(p) for p in pkts]


def test_packet_resync_after_lost_frame(rng):
    """A dropped frame cancels the partial packet; reassembly recovers
    at the next frame that starts a packet (receiver.cpp:95-118)."""
    pkts = [bytes(rng.integers(0, 256, 2000).tolist()),
            b"second", b"third"]
    frames = R.pack_packets(pkts)
    assert len(frames) >= 3
    asm = R.PacketAssembler()
    asm.push_frame(frames[0])
    # drop frames[1] (kills packet 1), push the rest
    for f in frames[2:]:
        asm.push_frame(f)
    assert asm.lost_frames >= 1
    assert bytes(pkts[0]) not in asm.packets
    # packets fully contained in surviving frames arrive intact
    assert all(p in [bytes(x) for x in pkts] for p in asm.packets)
    assert b"third" in asm.packets


def test_frame_coding_corrects_symbol_errors(rng):
    f = R.pack_packets([b"error correction test"])[0]
    syms = R.encode_frame_symbols(f)[R.SYNC_SYMS:].copy()
    # flip 40 random symbols entirely (both bits)
    idx = rng.choice(len(syms), 40, replace=False)
    syms[idx] = -syms[idx]
    dec = R.decode_frame_symbols(syms)
    assert dec is not None
    assert np.array_equal(dec.serialize(), f.serialize())


@pytest.mark.parametrize("rot", [0, 1, 2, 3])
def test_deframer_handles_rotations(rng, rot):
    pkts = [b"rotation test packet"]
    syms = R.transmit_packets(pkts)
    noise = (rng.standard_normal(500) + 1j * rng.standard_normal(500)
             ).astype(np.complex64) * 0.07
    stream = np.concatenate([noise, syms, noise[:200]])
    d = R.Deframer()
    d.push_symbols(stream * np.conj(R.SYM_ROTS[rot]))
    assert len(d.frames) == 1
    dec = R.decode_frame_symbols(d.frames[0])
    assert dec is not None and dec.first_packet == 0


@pytest.mark.slow
def test_ryfi_rf_loopback(rng):
    baud, fs = 240_000.0, 720_000.0
    pkts = [b"hello ryfi over the air",
            bytes(rng.integers(0, 256, 900).tolist())]
    syms = R.transmit_packets(pkts)
    idle = (rng.standard_normal(3000) + 1j * rng.standard_normal(3000)
            ).astype(np.complex64) * 0.05
    stream = np.concatenate([idle, syms, idle]).astype(np.complex64)
    sh = RRCInterpolator(baud, fs, beta=0.6, tap_count=31)
    tx, _ = sh.apply(None, sh.init_state((), jnp.complex64),
                     jnp.asarray(stream))
    tx = np.asarray(tx)
    n = np.arange(len(tx))
    tx = tx * np.exp(1j * (2 * np.pi * 80.0 * n / fs + 0.5))
    tx = (tx + 0.01 * (rng.standard_normal(len(tx))
                       + 1j * rng.standard_normal(len(tx)))
          ).astype(np.complex64)
    rx = R.RyfiReceiver(baud, fs)
    got = rx.process(tx)
    assert rx.frames_decoded >= 2 and rx.frames_bad == 0
    assert got == [bytes(p) for p in pkts]


@pytest.mark.slow
def test_ryfi_module_surface(rng, tmp_path):
    import json
    import os
    from sdrplusplusbrown_tpu.app import SDRApp
    root = str(tmp_path / "root")
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "config.json"), "w") as f:
        json.dump({"source": {"type": "none",
                              "samplerate": 720_000.0},
                   "fftSize": 4096,
                   "modules": {"RyFi": {"type": "ryfi_decoder",
                                        "baudrate": 240_000.0,
                                        "channel_sr": 720_000.0}}}, f)
    app = SDRApp(root, run_pump=False)
    try:
        mod = app.modules["RyFi"]
        pkts = [b"module packet"]
        syms = R.transmit_packets(pkts)
        idle = np.zeros(3000, np.complex64)
        stream = np.concatenate([idle, syms, idle]).astype(np.complex64)
        sh = RRCInterpolator(240_000.0, 720_000.0, beta=0.6,
                             tap_count=31)
        tx, _ = sh.apply(None, sh.init_state((), jnp.complex64),
                         jnp.asarray(stream))
        tx = np.asarray(tx).astype(np.complex64)
        blk = mod.rc.out_len
        pad = (-len(tx)) % blk
        mod.process_iq(np.concatenate([tx, np.zeros(pad, np.complex64)]))
        st = mod.handle_debug_command("status", "")
        assert st["packets"] == 1, st
        got = mod.handle_debug_command("get_packets", "4")
        assert got["packets"][-1] == pkts[0].hex()
    finally:
        app.shutdown()
