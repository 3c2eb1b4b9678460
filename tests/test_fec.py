"""FEC tests: convolutional/Viterbi and Reed-Solomon
(reference: core/libcorrect)."""

import numpy as np
import pytest

from sdrplusplusbrown_tpu.ops.fec import (conv_encode, viterbi_decode,
                                          rs_encode, rs_decode)


def test_viterbi_clean_and_hard_errors(rng):
    bits = rng.integers(0, 2, 300).astype(np.uint8)
    enc = conv_encode(bits)
    assert len(enc) == 2 * (300 + 6)
    np.testing.assert_array_equal(viterbi_decode(enc.astype(np.float32)),
                                  bits)
    hard = enc.copy()
    flips = rng.choice(len(hard), 30, replace=False)
    hard[flips] ^= 1
    dec = viterbi_decode(hard.astype(np.float32))
    ber = np.mean(dec != bits)
    assert ber < 0.01, ber


def test_viterbi_soft_noise(rng):
    bits = rng.integers(0, 2, 300).astype(np.uint8)
    enc = conv_encode(bits).astype(np.float32)
    soft = enc + 0.35 * rng.standard_normal(len(enc)).astype(np.float32)
    dec = viterbi_decode(soft)
    assert np.mean(dec != bits) < 0.02


@pytest.mark.parametrize("n_err,ok", [(0, True), (1, True), (8, True),
                                      (16, True), (17, False)])
def test_rs_255_223(rng, n_err, ok):
    data = bytes(rng.integers(0, 256, 223, dtype=np.uint8))
    block = bytearray(rs_encode(data, 32))
    assert len(block) == 255
    for i in rng.choice(255, n_err, replace=False):
        block[i] ^= 0x55
    r = rs_decode(bytes(block), 32)
    if ok:
        assert r == data
    else:
        assert r is None


def test_rs_shorter_code(rng):
    """Shortened RS works too (e.g. RS(64,48) style blocks)."""
    data = bytes(rng.integers(0, 256, 48, dtype=np.uint8))
    block = bytearray(rs_encode(data, 16))
    for i in rng.choice(len(block), 8, replace=False):
        block[i] ^= 0xFF
    assert rs_decode(bytes(block), 16) == data
