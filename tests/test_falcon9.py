"""Falcon-9 telemetry decoder: CCSDS FEC layers + full RF loopback
(reference decoder_modules/falcon9_decoder)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sdrplusplusbrown_tpu.models import falcon9 as F
from sdrplusplusbrown_tpu.ops.fec import (ReedSolomon, ccsds_randomizer,
                                          TO_DUAL_BASIS, FROM_DUAL_BASIS)


def test_generalized_rs_ccsds_config(rng):
    rs = ReedSolomon(16, 120, 11, 0x187)
    data = bytes(rng.integers(0, 256, 239).tolist())
    enc = rs.encode(data)
    assert rs.decode(enc) == data
    e = bytearray(enc)
    for p in rng.choice(255, 8, replace=False):
        e[p] ^= int(rng.integers(1, 256))
    assert rs.decode(bytes(e)) == data          # corrects t=8
    e = bytearray(enc)
    for p in rng.choice(255, 12, replace=False):
        e[p] ^= int(rng.integers(1, 256))
    assert rs.decode(bytes(e)) is None          # detects >t


def test_ccsds_tables_generated():
    # dual-basis map is a GF(2)-linear bijection
    assert np.array_equal(FROM_DUAL_BASIS[TO_DUAL_BASIS],
                          np.arange(256))
    a, b = 0x35, 0x8A
    assert TO_DUAL_BASIS[a ^ b] == TO_DUAL_BASIS[a] ^ TO_DUAL_BASIS[b]
    # randomizer head matches the spec sequence (falcon_fec.h randVals)
    assert ccsds_randomizer()[:4].tolist() == [0xFF, 0x48, 0x0E, 0xC0]


def test_falcon_rs_roundtrip_with_errors(rng):
    pkts = [F.make_packet(b"\x00" * 8 + b"hello"),
            F.make_packet(bytes(rng.integers(0, 256, 300).tolist()))]
    payload = F.build_frame_payload(1, b"".join(pkts), 0)
    wire = F.falcon_rs_encode(payload)
    w = wire.copy()
    idx = rng.choice(len(w) - 4, 15, replace=False) + 4
    w[idx] ^= rng.integers(1, 256, 15).astype(np.uint8)
    out = F.falcon_rs_decode(w)
    assert out is not None
    np.testing.assert_array_equal(out[:len(payload)], payload)
    ps = F.FalconPacketSync()
    ps.push_frame(out)
    assert ps.packets == pkts


def test_packet_spans_frames(rng):
    big = F.make_packet(bytes(rng.integers(0, 256, 1500).tolist()))
    small = F.make_packet(b"after")
    stream = big + small
    p1 = F.build_frame_payload(1, stream[:F.DATA_LEN], 0)
    p2 = F.build_frame_payload(
        2, stream[F.DATA_LEN:], len(big) - F.DATA_LEN)
    ps = F.FalconPacketSync()
    ps.push_frame(p1)
    ps.push_frame(p2)
    assert big in ps.packets and small in ps.packets


@pytest.mark.slow
def test_falcon9_rf_loopback(rng):
    pkts = [F.make_packet(b"\x00" * 8 + b"telemetry hello world")]
    payload = F.build_frame_payload(1, b"".join(pkts), 0)
    wire = F.falcon_rs_encode(payload)
    bits = np.concatenate([rng.integers(0, 2, 4000).astype(np.uint8),
                           F.ASM_BITS, np.unpackbits(wire),
                           rng.integers(0, 2, 2000).astype(np.uint8)])
    sps = F.FALCON_SR / F.FALCON_BAUD
    n_out = int(len(bits) * sps)
    bidx = np.minimum((np.arange(n_out) / sps).astype(np.int64),
                      len(bits) - 1)
    nrz = 2.0 * bits[bidx] - 1.0
    phase = 2 * np.pi * np.cumsum(nrz) * F.FALCON_DEV / F.FALCON_SR
    iq = (np.exp(1j * (phase + 0.2)) + 0.05 * (
        rng.standard_normal(n_out) + 1j * rng.standard_normal(n_out))
    ).astype(np.complex64)

    dem = F.FalconDemod()
    (soft, valid), _ = jax.jit(
        lambda s, x: dem.apply(None, s, x))(dem.init_state(()),
                                            jnp.asarray(iq))
    hard = (np.asarray(soft)[np.asarray(valid)] > 0).astype(np.uint8)
    df = F.FalconDeframer()
    df.push_bits(hard)
    assert len(df.frames) == 1
    out = F.falcon_rs_decode(df.frames[0])
    assert out is not None
    ps = F.FalconPacketSync()
    ps.push_frame(out)
    assert ps.packets == pkts


@pytest.mark.slow
def test_falcon9_module_surface(rng, tmp_path):
    import json
    import os
    from sdrplusplusbrown_tpu.app import SDRApp
    root = str(tmp_path / "root")
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "config.json"), "w") as f:
        json.dump({"source": {"type": "none", "samplerate": F.FALCON_SR},
                   "fftSize": 4096,
                   "modules": {"F9": {"type": "falcon9_decoder"}}}, f)
    app = SDRApp(root, run_pump=False)
    try:
        mod = app.modules["F9"]
        pkts = [F.make_packet(b"\x00" * 8 + b"module")]
        wire = F.falcon_rs_encode(
            F.build_frame_payload(1, b"".join(pkts), 0))
        bits = np.concatenate([rng.integers(0, 2, 4000).astype(np.uint8),
                               F.ASM_BITS, np.unpackbits(wire),
                               rng.integers(0, 2, 2000).astype(np.uint8)])
        sps = F.FALCON_SR / F.FALCON_BAUD
        n_out = int(len(bits) * sps)
        bidx = np.minimum((np.arange(n_out) / sps).astype(np.int64),
                          len(bits) - 1)
        phase = 2 * np.pi * np.cumsum(2.0 * bits[bidx] - 1.0) \
            * F.FALCON_DEV / F.FALCON_SR
        iq = np.exp(1j * phase).astype(np.complex64)
        blk = mod.rc.out_len
        pad = (-len(iq)) % blk
        mod.process_iq(np.concatenate([iq, np.zeros(pad, np.complex64)]))
        st = mod.handle_debug_command("status", "")
        assert st["frames_ok"] == 1 and st["packets"] == 1, st
        got = mod.handle_debug_command("get_packets", "4")
        assert got["packets"][-1] == pkts[0].hex()
    finally:
        app.shutdown()
