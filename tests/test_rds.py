"""RDS tests: group codec, BPSK demod chain, and the full WFM stack.

reference: decoder_modules/radio/src/rds_demod.h + rds.{h,cpp}.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sdrplusplusbrown_tpu.models.radio import Radio, DEMOD_WFM
from sdrplusplusbrown_tpu.models.rds import (
    RDSDecoder, RDSDemod, identify_block, rds_checkword, rds_encode_block,
    rds_encode_group, rds_group_bits, rds_syndrome)
from sdrplusplusbrown_tpu.ops.digital import (
    DifferentialEncoder, DifferentialDecoder, manchester_encode,
    manchester_decode, binary_slice)

PS = "TESTFM  "


def make_ps_groups():
    groups = []
    for addr in range(4):
        chars = (ord(PS[addr * 2]) << 8) | ord(PS[addr * 2 + 1])
        groups.append(rds_encode_group(0xABCD, 0, False, 5, addr, 0, chars))
    return groups


def make_biphase(bits, fs, fbit=1187.5):
    enc = DifferentialEncoder().encode(bits)
    d = 1.0 - 2.0 * enc.astype(np.float64)
    T = int(len(bits) / fbit * fs) + 100
    t = np.arange(T) / fs
    bit_idx = np.minimum((t * fbit).astype(int), len(bits) - 1)
    frac = t * fbit - np.floor(t * fbit)
    return d[bit_idx] * np.where(frac < 0.5, 1.0, -1.0), T, t


def test_checkword_and_offsets():
    blk = rds_encode_block(0x1234, "A")
    assert identify_block(blk) == "A"
    assert rds_syndrome(blk ^ (1 << 13)) != 0x0FC  # bit error breaks it
    for kind in ("A", "B", "C", "Cp", "D"):
        assert identify_block(rds_encode_block(0xBEEF & 0xFFFF, kind)) \
            == kind


def test_group_decoder_ps_and_rt():
    groups = make_ps_groups()
    rt = "HELLO RADIO TEXT"
    for addr in range(4):
        c = rt[addr * 4:addr * 4 + 4].ljust(4)
        groups.append(rds_encode_group(
            0xABCD, 2, False, 5, addr,
            (ord(c[0]) << 8) | ord(c[1]), (ord(c[2]) << 8) | ord(c[3])))
    bits = np.concatenate([rds_group_bits(g) for g in groups])
    dec = RDSDecoder()
    dec.push_bits(np.concatenate([bits, bits]))
    st = dec.status()
    assert st["pi"] == 0xABCD and st["pty"] == 5
    assert st["ps"] == PS
    assert st["radiotext"].startswith("HELLO RADIO TEXT")


def test_differential_and_manchester(rng):
    bits = rng.integers(0, 2, 64).astype(np.uint8)
    enc = DifferentialEncoder().encode(bits)
    dec = DifferentialDecoder()
    out, _ = dec.apply(None, dec.init_state(()), jnp.asarray(enc))
    np.testing.assert_array_equal(np.asarray(out), bits)
    m = manchester_encode(bits)
    np.testing.assert_array_equal(manchester_decode(m), bits)
    assert binary_slice(np.array([-1.0, 0.5])).tolist() == [0, 1]


@pytest.mark.slow
def test_rds_demod_chain(rng):
    fs = 5000.0
    bits = np.tile(np.concatenate(
        [rds_group_bits(g) for g in make_ps_groups()]), 10)
    biphase, T, t = make_biphase(bits, fs)
    x = (biphase * np.exp(1j * 0.7)
         + 0.02 * (rng.standard_normal(T) + 1j * rng.standard_normal(T))
         ).astype(np.complex64)
    demod = RDSDemod()
    st = demod.init_state(())
    dec = RDSDecoder()
    ap = jax.jit(lambda s, xx: demod.apply(None, s, xx))
    B = 2500
    for i in range(T // B):
        (hard, valid), st = ap(st, jnp.asarray(x[i * B:(i + 1) * B]))
        dec.push_bits(np.asarray(hard)[np.asarray(valid)])
    st = dec.status()
    assert st["synced"] and st["pi"] == 0xABCD and st["ps"] == PS
    assert st["groups"] > 10


@pytest.mark.slow
def test_rds_through_wfm_stack(rng):
    """IQ at 1.2 MS/s → WFM demod → 57 kHz RDS tap → BPSK → groups."""
    fs = 1_200_000.0
    bits = np.tile(np.concatenate(
        [rds_group_bits(g) for g in make_ps_groups()]), 8)
    enc = DifferentialEncoder().encode(bits)
    d = 1.0 - 2.0 * enc.astype(np.float64)
    fbit = 1187.5
    T = int((len(bits) / fbit + 0.05) * fs)
    t = np.arange(T) / fs
    bit_idx = np.minimum((t * fbit).astype(int), len(bits) - 1)
    frac = t * fbit - np.floor(t * fbit)
    biphase = d[bit_idx] * np.where(frac < 0.5, 1.0, -1.0)
    mpx = (0.2 * np.sin(2 * np.pi * 1000 * t)
           + 0.1 * np.sin(2 * np.pi * 19000 * t)
           + 0.12 * biphase * np.cos(2 * np.pi * 57000 * t))
    x = np.exp(1j * (2 * np.pi * np.cumsum(75000 * mpx) / fs)
               ).astype(np.complex64)

    radio = Radio(fs, DEMOD_WFM, rds=True, pll_mode="normalize")
    assert radio.in_multiple <= 20000, \
        f"granularity {radio.in_multiple} exploded (predec rounding?)"
    B = ((int(fs * 0.25) + radio.in_multiple - 1)
         // radio.in_multiple) * radio.in_multiple
    rst = radio.init_state(())
    rp = radio.make_params(0.0)
    demod = RDSDemod()
    dst = demod.init_state(())
    dec = RDSDecoder()
    step = jax.jit(lambda p, s, xx: radio.apply(p, s, xx))
    dstep = jax.jit(lambda s, xx: demod.apply(None, s, xx))
    for i in range(T // B):
        (audio, rds), rst = step(rp, rst, jnp.asarray(x[i * B:(i + 1) * B]))
        (hard, valid), dst = dstep(dst, rds)
        dec.push_bits(np.asarray(hard)[np.asarray(valid)])
    st = dec.status()
    assert st["synced"] and st["pi"] == 0xABCD and st["ps"] == PS, st
