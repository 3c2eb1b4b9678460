"""Native FT8 codec + decoder tests.

Oracle style per the reference's signal-level tests: synthesize the RF
(here: GFSK audio-band FT8 signals + AWGN at known SNR), decode, and
assert the exact message text, frequency, and dt come back
(reference behavior: decoder_modules/ft8_decoder — vendored MSHV decode
of 15 s windows; tests/baseband_file_test.cpp oracle style).
"""

import numpy as np
import pytest

from sdrplusplusbrown_tpu.models.ft8 import (
    FT8NativeDecoder, crc14, ft8_tones, ft8_waveform, pack77, unpack77)
from sdrplusplusbrown_tpu.models.ft8_tables import (
    CHECK_VARS_174_91, COSTAS_7X7, LDPC_174_91_GENERATOR_HEX)

FS = 12_000.0
N15 = int(15 * FS)


# ---------------------------------------------------------------- codec

ROUNDTRIP_MSGS = [
    "CQ K1ABC FN42",
    "K1ABC W9XYZ EN37",
    "W9XYZ K1ABC -15",
    "K1ABC W9XYZ R-17",
    "W9XYZ K1ABC RR73",
    "K1ABC W9XYZ 73",
    "CQ DX JA1XYZ PM95",
    "CQ POTA K1ABC/R FN42",
    "KA1ABC G3AAA R IO91",
    "CQ 001 K1ABC",
    "TNX BOB 73 GL",          # free text (type 0.0)
]


@pytest.mark.parametrize("msg", ROUNDTRIP_MSGS)
def test_pack_unpack_roundtrip(msg):
    assert unpack77(pack77(msg)) == msg


def test_crc14_detects_corruption():
    bits = pack77("CQ K1ABC FN42")
    c = crc14(bits)
    assert 0 <= c < (1 << 14)
    flipped = list(bits)
    flipped[40] ^= 1
    assert crc14(flipped) != c


def test_ldpc_sparse_h_matches_generator():
    """Every generator-encoded codeword must satisfy the sparse checks
    (validates the Nm table from bpdecode_ft8_174_91.h:276-361 against
    the generator from gen_ft8.cpp)."""
    from sdrplusplusbrown_tpu.ops.ldpc import SystematicLDPC
    code = SystematicLDPC(LDPC_174_91_GENERATOR_HEX, 91,
                          check_adjacency=CHECK_VARS_174_91)
    rng = np.random.default_rng(0)
    msg = rng.integers(0, 2, (16, 91)).astype(np.uint8)
    cw = code.encode(msg)
    assert ((cw @ code.H.T) % 2).max() == 0
    # column weight exactly 3, row weight 6-7 (protocol structure)
    assert set(code.H.sum(axis=0)) == {3}
    assert set(code.H.sum(axis=1)) <= {6, 7}


def test_ldpc_decode_noisy():
    from sdrplusplusbrown_tpu.ops.ldpc import SystematicLDPC
    code = SystematicLDPC(LDPC_174_91_GENERATOR_HEX, 91,
                          check_adjacency=CHECK_VARS_174_91)
    rng = np.random.default_rng(1)
    msg = rng.integers(0, 2, (8, 91)).astype(np.uint8)
    cw = code.encode(msg).astype(np.float32)
    llr = (1.0 - 2.0 * cw) * 2.0 + rng.normal(0, 1.0, cw.shape)
    bits, ok = code.decode(llr)
    assert bool(np.all(np.asarray(ok)))
    assert np.array_equal(np.asarray(bits), cw.astype(np.uint8))


def test_tone_sequence_structure():
    t = ft8_tones("CQ K1ABC FN42")
    assert t.shape == (79,)
    for b in (0, 36, 72):
        assert list(t[b:b + 7]) == COSTAS_7X7


# ------------------------------------------------------------- decoder

def test_decode_three_signals_one_window():
    rng = np.random.default_rng(1)
    x = 0.05 * rng.standard_normal(N15).astype(np.float32)
    sigs = [("CQ K1ABC FN42", 1200.0, 0.5, 0.5),
            ("W9XYZ K1ABC RR73", 800.0, 0.2, 0.4),
            ("TNX BOB 73 GL", 2400.0, 1.0, 0.3)]
    for msg, f0, dt, amp in sigs:
        x += ft8_waveform(msg, f0, FS, N15, dt=dt, amplitude=amp)
    res = FT8NativeDecoder(FS).decode(x)
    by_msg = {r["message"]: r for r in res}
    for msg, f0, dt, _ in sigs:
        assert msg in by_msg, (msg, list(by_msg))
        assert abs(by_msg[msg]["freq"] - f0) <= 3.2
        assert abs(by_msg[msg]["dt"] - dt) <= 0.1


def test_decode_low_snr():
    """-15 dB (2500 Hz ref) must decode; the coarse half-tone/half-symbol
    candidate grid gives ~-16..-17 dB sensitivity (ft8lib-class; WSJT-X
    reaches ~-21 dB with fine sync + subtraction passes)."""
    dec = FT8NativeDecoder(FS)
    snr_db = -15.0
    amp = np.sqrt(2 * 10 ** (snr_db / 10) * 2500 / 6000)
    hits = 0
    for seed in range(3):
        rng = np.random.default_rng(seed)
        x = rng.standard_normal(N15).astype(np.float32)
        x += ft8_waveform("K1ABC W9XYZ R-17", 1500.0 + 7 * seed, FS, N15,
                          dt=0.4, amplitude=amp)
        res = dec.decode(x)
        hits += any(r["message"] == "K1ABC W9XYZ R-17" for r in res)
    assert hits == 3
    # and the SNR estimate should be in the right ballpark
    assert any(abs(r["snr"] - snr_db) < 5.0 for r in res
               if r["message"] == "K1ABC W9XYZ R-17")


def test_decode_empty_window_no_false_decodes():
    rng = np.random.default_rng(7)
    x = rng.standard_normal(N15).astype(np.float32)
    assert FT8NativeDecoder(FS).decode(x) == []


def test_module_native_decode_path():
    """FT8DecoderModule with no external command uses the native decoder
    (window → decode dicts in module table)."""
    from sdrplusplusbrown_tpu.modules.ft8_module import FT8DecoderModule

    class _App:
        modules: dict = {}

    mod = FT8DecoderModule("ft8", _App(), stream="none")
    rng = np.random.default_rng(2)
    x = 0.05 * rng.standard_normal(N15).astype(np.float32)
    x += ft8_waveform("CQ K1ABC FN42", 1000.0, FS, N15, dt=0.3,
                      amplitude=0.5)
    lines = mod._decode(x, FS, 0)
    mod._on_result(lines, 0)
    assert any(d.get("text") == "CQ K1ABC FN42" for d in mod.decodes)
    st = mod.handle_debug_command("decodes", "")
    assert any(d.get("text") == "CQ K1ABC FN42" for d in st["decodes"])
    mod.shutdown()


# ----------------------------------------------------------------- FT4

def test_ft4_tone_structure():
    from sdrplusplusbrown_tpu.models.ft8 import ft4_tones
    from sdrplusplusbrown_tpu.models.ft8_tables import FT4_SYNC_BLOCKS
    t = ft4_tones("CQ K1ABC FN42")
    assert t.shape == (103,)
    assert t.max() <= 3
    for p, pat in FT4_SYNC_BLOCKS:
        assert list(t[p:p + 4]) == pat


def test_ft4_whitening_differs_from_ft8():
    """FT4 whitens the payload with RVEC before CRC/LDPC — the data
    symbols must differ from a hypothetical unwhitened encoding."""
    from sdrplusplusbrown_tpu.models.ft8 import FT4_PROTO, _tones
    import copy
    proto_nowhiten = copy.copy(FT4_PROTO)
    proto_nowhiten.rvec = None
    a = _tones(FT4_PROTO, "CQ K1ABC FN42")
    b = _tones(proto_nowhiten, "CQ K1ABC FN42")
    assert np.any(a != b)


def test_ft4_decode_two_signals():
    from sdrplusplusbrown_tpu.models.ft8 import (FT4NativeDecoder,
                                                 ft4_waveform)
    N = int(7.5 * FS)
    rng = np.random.default_rng(3)
    x = 0.1 * rng.standard_normal(N).astype(np.float32)
    sigs = [("CQ K1ABC FN42", 1000.0, 0.5, 0.5),
            ("W9XYZ K1ABC RR73", 1800.0, 0.3, 0.4)]
    for msg, f0, dt, amp in sigs:
        x += ft4_waveform(msg, f0, FS, N, dt=dt, amplitude=amp)
    res = FT4NativeDecoder(FS).decode(x)
    by_msg = {r["message"]: r for r in res}
    for msg, f0, dt, _ in sigs:
        assert msg in by_msg, (msg, list(by_msg))
        assert abs(by_msg[msg]["freq"] - f0) <= 6.0
        assert abs(by_msg[msg]["dt"] - dt) <= 0.05


def test_module_ft4_mode():
    from sdrplusplusbrown_tpu.models.ft8 import ft4_waveform
    from sdrplusplusbrown_tpu.modules.ft8_module import FT8DecoderModule

    class _App:
        modules: dict = {}

    mod = FT8DecoderModule("ft4", _App(), stream="none", mode="FT4")
    assert mod.window_seconds == 7.5
    N = int(7.5 * FS)
    x = 0.05 * np.random.default_rng(9).standard_normal(N) \
        .astype(np.float32)
    x += ft4_waveform("K1ABC W9XYZ -07", 1500.0, FS, N, dt=0.4,
                      amplitude=0.5)
    lines = mod._decode(x, FS, 0)
    assert any(d["message"] == "K1ABC W9XYZ -07" for d in lines)
    mod.shutdown()
