"""TETRA lower-MAC decode (VERDICT r2 item 7): burst sync, BSCH chain
(descramble → de-interleave → de-puncture → Viterbi → CRC) and AACH
RM(30,14), asserted on the reference golden capture down to decoded
FRAME FIELDS — not just constellation SNR.

reference: decoder_modules/ch_tetra_demodulator (osmo-tetra); protocol
constants are ETSI EN 300 392-2 data (models/tetra.py)."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sdrplusplusbrown_tpu.models import tetra as tt

RECDIR = "/root/reference/e2e/recordings"
CAP = os.path.join(RECDIR, "tetra_sample.wav")


def _encode_bsch(t1: np.ndarray) -> np.ndarray:
    """Reference-faithful type-1 → type-5 encoder (test oracle)."""
    r = tt.crc16_itut(t1)
    c = np.array([((r ^ 0xFFFF) >> (15 - i)) & 1 for i in range(16)],
                 np.uint8)
    t2 = np.concatenate([t1, c, np.zeros(4, np.uint8)])
    dd = np.zeros(4, np.int64)
    mom = []
    for b in t2:
        mom += [(b + dd[0] + dd[3]) % 2,
                (b + dd[1] + dd[2] + dd[3]) % 2,
                (b + dd[0] + dd[1] + dd[3]) % 2,
                (b + dd[0] + dd[2] + dd[3]) % 2]
        dd = np.roll(dd, 1)
        dd[0] = b
    mom = np.array(mom, np.uint8)
    t3 = np.zeros(120, np.uint8)
    for j in range(1, 121):
        blk = (j - 1) // 3
        t3[j - 1] = mom[8 * blk + (1, 2, 5)[(j - 3 * blk) - 1] - 1]
    t4 = np.zeros(120, np.uint8)
    for i in range(1, 121):
        t4[(11 * i) % 120] = t3[i - 1]
    return t4 ^ tt.scramble_sequence(tt.SCRAMB_INIT, 120)


def test_bsch_chain_round_trip_and_error_correction(rng):
    for trial in range(5):
        t1 = rng.integers(0, 2, 60).astype(np.uint8)
        t5 = _encode_bsch(t1)
        # clean round trip
        burst = np.zeros(tt.BURST_BITS, np.uint8)
        burst[tt.SB_BLK1_OFF:tt.SB_BLK1_OFF + 120] = t5
        t4 = t5 ^ tt.scramble_sequence(tt.SCRAMB_INIT, 120)
        t3 = tt.block_deinterleave(t4, 11)
        t2 = tt.viterbi_k5_r14(tt.depuncture_23(t3, 80))
        assert np.array_equal(t2[:60], t1)
        assert tt.crc16_itut(t2[:76]) == tt.TETRA_CRC_OK
        # the rate-2/3 RCPC corrects scattered channel errors
        t5e = t5.copy()
        for p in rng.choice(120, 2, replace=False):
            t5e[p] ^= 1
        t4e = t5e ^ tt.scramble_sequence(tt.SCRAMB_INIT, 120)
        t2e = tt.viterbi_k5_r14(
            tt.depuncture_23(tt.block_deinterleave(t4e, 11), 80))
        assert np.array_equal(t2e[:60], t1), trial


def test_rm3014_ml_decode(rng):
    for _ in range(20):
        data = rng.integers(0, 2, 14).astype(np.uint8)
        code = np.concatenate([data, data @ tt._RM_GEN % 2])
        got, dist = tt.rm3014_decode(code)
        assert dist == 0 and np.array_equal(got, data)
        # d_min = 6: ML corrects 2 errors
        codee = code.copy()
        for p in rng.choice(30, 2, replace=False):
            codee[p] ^= 1
        got, dist = tt.rm3014_decode(codee)
        assert np.array_equal(got, data) and dist == 2


@pytest.mark.skipif(not os.path.exists(CAP),
                    reason="reference recordings not mounted")
@pytest.mark.slow
def test_golden_capture_bsch_frame_fields():
    """The shipped tetra_sample.wav decodes to a consistent cell with
    CRC-clean SYNC PDUs and a correctly advancing TDMA clock."""
    from sdrplusplusbrown_tpu.io.wav import read_wav_iq
    from sdrplusplusbrown_tpu.ops.demod_digital import Pi4DQPSKDemod
    x, fs = read_wav_iq(CAP)
    dem = Pi4DQPSKDemod(18_000.0, fs)
    st = dem.init_state(())
    dec = tt.TetraDownlinkDecoder()
    B = 100_000
    for i in range(len(x) // B):
        (d, dibit, valid), st = dem.apply(
            None, st, jnp.asarray(x[i * B:(i + 1) * B]))
        dec.push(np.asarray(dibit)[np.asarray(valid)])

    assert dec.bursts_seen > 300
    # every synchronized burst yields a CRC-clean SYNC PDU
    assert len(dec.sync_infos) == dec.bursts_seen
    # one consistent cell across the whole capture
    cells = {(s.colour, s.mcc, s.mnc) for s in dec.sync_infos}
    assert cells == {(22, 250, 13)}, cells
    # TDMA clock advances: fn in 1..18, mn in 0..59, and the multiframe
    # number increments by one exactly when fn wraps 18 -> 1
    fns = [s.fn for s in dec.sync_infos]
    mns = [s.mn for s in dec.sync_infos]
    assert all(1 <= f <= 18 for f in fns)
    assert all(0 <= m <= 59 for m in mns)
    steps = 0
    for k in range(1, len(fns)):
        if mns[k] != mns[k - 1]:
            assert mns[k] == (mns[k - 1] % 60) + 1, (k, mns[k - 1],
                                                     mns[k])
            assert fns[k] < fns[k - 1]          # fn wrapped
            steps += 1
    assert steps > 5
    # AACH: broadcast blocks decode as exact RM(30,14) codewords under
    # the cell scrambling learned from the BSCH
    assert len(dec.aach) > 300
    dists = np.array([a[3] for a in dec.aach])
    assert np.mean(dists == 0) > 0.95


@pytest.mark.skipif(not os.path.exists(CAP),
                    reason="reference recordings not mounted")
@pytest.mark.slow
def test_tetra_module_decodes_capture(tmp_path):
    """App-level: file source + ch_tetra_demodulator module decodes the
    cell identity over the control plane."""
    import json
    from sdrplusplusbrown_tpu.app import SDRApp
    root = str(tmp_path / "root")
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "config.json"), "w") as f:
        json.dump({"source": {"type": "file", "path": CAP},
                   "fftSize": 4096,
                   "modules": {"Tetra": {
                       "type": "ch_tetra_demodulator", "offset": 0.0}}},
                  f)
    app = SDRApp(root, run_pump=False)
    try:
        mod = app.modules["Tetra"]
        from sdrplusplusbrown_tpu.io.wav import read_wav_iq
        x, fs = read_wav_iq(CAP)
        g = mod.rc.out_len
        n = (200_000 // g) * g
        app.baseband_event.emit(x[:n])
        st = mod.handle_debug_command("status", "")
        assert st["sync_decodes"] > 10, st
        assert st["cell"]["mcc"] == 250 and st["cell"]["mnc"] == 13
        assert st["cell"]["colour"] == 22
    finally:
        app.shutdown()


@pytest.mark.skipif(not os.path.exists(CAP),
                    reason="reference recordings not mounted")
def test_golden_capture_upper_mac_sysinfo():
    """Upper MAC (round-4): normal downlink bursts decode through the
    SCH/HD chain using the cell scrambling learned from the BSCH, and
    the MAC broadcast PDUs carry ONE consistent SYSINFO cell
    description (EN 300 392-2 21.4.4.1; reference: vendored osmo-tetra
    macpdu parsing)."""
    from sdrplusplusbrown_tpu.io.wav import read_wav_iq
    from sdrplusplusbrown_tpu.ops.demod_digital import Pi4DQPSKDemod
    x, fs = read_wav_iq(CAP)
    dem = Pi4DQPSKDemod(18_000.0, fs)
    st = dem.init_state(())
    dec = tt.TetraDownlinkDecoder()
    B = 100_000
    for i in range(len(x) // B):
        (d, dibit, valid), st = dem.apply(
            None, st, jnp.asarray(x[i * B:(i + 1) * B]))
        dec.push(np.asarray(dibit)[np.asarray(valid)])

    assert dec.ndb_seen > 500, dec.ndb_seen
    assert dec.sch_hd_decodes > 1000, dec.sch_hd_decodes
    assert len(dec.sysinfo) > 400, len(dec.sysinfo)
    assert len(dec.mac_resource) > 400, len(dec.mac_resource)
    # one consistent broadcast cell description across the capture
    assert {s["mainCarrier"] for s in dec.sysinfo} == {2725}
    assert {s["locationArea"] for s in dec.sysinfo} == {1030}
    assert {s["freqBand"] for s in dec.sysinfo} == {4}
    assert {s["subscriberClass"] for s in dec.sysinfo} == {65535}
    # SYSINFO dominantly rides the BNCH on block 2 of its burst
    blk2 = sum(1 for s in dec.sysinfo if s["blk"] == 2)
    assert blk2 > 0.8 * len(dec.sysinfo), (blk2, len(dec.sysinfo))
    # MAC-RESOURCE: mostly null PDUs (idle downlink filler), but real
    # SSI-addressed grants are present and repeat for the same
    # subscribers
    ssis = [m["ssi"] for m in dec.mac_resource if "ssi" in m]
    assert len(ssis) >= 5, ssis
    from collections import Counter
    repeats = [s for s, c in Counter(ssis).items() if c >= 2]
    assert repeats, ssis
