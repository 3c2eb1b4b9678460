"""M17 decoder tests: protocol-layer vectors and a full RF loopback
(reference: decoder_modules/m17_decoder — 4FSK → demux → conv/Golay FEC →
LSF callsigns + stream payloads)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sdrplusplusbrown_tpu.models import m17 as M
from sdrplusplusbrown_tpu.ops.mod import RRCInterpolator, QuadratureMod


def test_crc16_m17_spec_check():
    assert M.crc16_m17(b"123456789") == 0x772B


def test_base40_roundtrip():
    for cs in ("N0CALL", "SP5WWP", "AB1CDE-9"):
        assert M.decode_callsign_base40(
            M.encode_callsign_base40(cs)) == cs


def test_golay24_corrects_three_errors(rng):
    for _ in range(30):
        d = int(rng.integers(0, 4096))
        cw = M.golay24_encode(d)
        assert M.golay24_decode(cw) == d
        for nerr in (1, 2, 3):
            e = 0
            for p in rng.choice(24, nerr, replace=False):
                e |= 1 << int(p)
            assert M.golay24_decode(cw ^ e) == d


def test_interleaver_is_permutation():
    assert sorted(M.INTERLEAVER.tolist()) == list(range(368))
    # spec QPP spot values (match m17dsp.h:62 table)
    assert M.INTERLEAVER[0] == 0 and M.INTERLEAVER[1] == 137 \
        and M.INTERLEAVER[2] == 90


def test_lsf_frame_roundtrip():
    lsf = M.encode_lsf("SP5WWP", "N0CALL", type_word=0b101)
    dec = M.M17FrameDecoder()
    dec.push_bits(M.build_lsf_frame(lsf))
    assert dec.lsf is not None and dec.lsf.valid
    assert dec.lsf.dst == "SP5WWP" and dec.lsf.src == "N0CALL"
    assert dec.lsf.is_stream and dec.lsf.data_type == 2  # Voice


def test_lsf_bit_errors_corrected(rng):
    """The rate-1/2 K=5 conv code corrects scattered channel errors."""
    lsf = M.encode_lsf("SP5WWP", "N0CALL", type_word=0b101)
    frame = M.build_lsf_frame(lsf)
    # flip 4 scattered payload bits (past the sync word); the punctured
    # ~3/4-rate K=5 code has limited d_free, so keep errors sparse
    idx = 16 + rng.choice(368, 4, replace=False)
    frame = frame.copy()
    frame[idx] ^= 1
    dec = M.M17FrameDecoder()
    dec.push_bits(frame)
    assert dec.lsf is not None and dec.lsf.src == "N0CALL"


def test_lich_reassembles_lsf():
    lsf = M.encode_lsf("M17", "N0CALL")
    segs = M.build_lich(lsf)
    dec = M.M17FrameDecoder()
    for fn in range(6):
        dec.push_bits(M.build_stream_frame(segs[fn], fn, bytes(16)))
    assert dec.lsf is not None and dec.lsf.dst == "M17"
    assert [f[0] for f in dec.stream_frames] == list(range(6))


@pytest.mark.slow
def test_m17_rf_loopback(rng):
    """Full chain: 4FSK TX (RRC freq pulses → FM) → M17Demod →
    frame decoder; stream payloads recovered exactly and the LSF arrives
    via the LICH side channel."""
    fs = 14_400.0
    lsf = M.encode_lsf("SP5WWP", "N0CALL", type_word=0b101)
    segs = M.build_lich(lsf)
    bits = [np.tile([0, 1], 600)]          # preamble: outer-level toggles
    payloads = {}
    for fn in range(14):
        payloads[fn] = bytes([fn] * 16)
        bits.append(M.build_stream_frame(segs[fn % 6], fn, payloads[fn]))
    bits.append(np.tile([0, 1], 400))      # tail flush
    allbits = np.concatenate(bits)
    sym = M.bits_to_symbols(allbits)
    shaper = RRCInterpolator(4800, fs, beta=0.5, tap_count=31)
    g = shaper.in_multiple
    n = (len(sym) // g) * g
    shaped, _ = shaper.apply(None, shaper.init_state((), jnp.complex64),
                             jnp.asarray(sym[:n].astype(np.complex64)))
    fm = QuadratureMod(M.M17_DEVIATION, fs)
    iq, _ = fm.apply(None, fm.init_state(()),
                     jnp.asarray(np.asarray(shaped).real))
    iq = np.asarray(iq)
    iq = iq * np.exp(1j * 0.7) + 0.02 * (
        rng.standard_normal(len(iq)) + 1j * rng.standard_normal(len(iq)))

    dem = M.M17Demod(fs)
    (bits_o, valid), _ = jax.jit(
        lambda s, x: dem.apply(None, s, x))(dem.init_state(()),
                                            jnp.asarray(
                                                iq.astype(np.complex64)))
    b = np.asarray(bits_o)[np.asarray(valid)]
    fr = M.M17FrameDecoder()
    fr.push_bits(b)
    # at least 12 of 14 stream frames with exact payloads
    got = dict(fr.stream_frames)
    exact = sum(1 for fn, by in got.items()
                if payloads.get(fn) == by)
    assert exact >= 12, (len(got), exact)
    # LSF recovered through the Golay-coded LICH channel
    assert fr.lsf is not None and fr.lsf.valid
    assert fr.lsf.dst == "SP5WWP" and fr.lsf.src == "N0CALL"
