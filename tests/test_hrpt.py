"""NOAA HRPT weather-sat decoder: framing vectors + full RF loopback
(reference decoder_modules/weather_sat_decoder)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sdrplusplusbrown_tpu.models import hrpt as H


def _frames_signal(rng, frames, preamble=15_000):
    bits = [H.manchester_encode(rng.integers(0, 2, preamble))]
    for words in frames:
        bits.append(H.manchester_encode(H.words_to_bits(words)))
    bits.append(np.tile([1, 0], 2000))
    return np.concatenate(bits)


def test_framer_exact_roundtrip(rng):
    av1 = np.stack([(np.arange(2048) * k + 7) % 1024
                    for k in range(1, 6)])
    av2 = rng.integers(0, 1024, (5, 2048))
    tip = rng.integers(0, 1024, 520)
    fr = H.HRPTFramer()
    fr.push_symbols(_frames_signal(
        rng, [H.build_frame(av1, tip), H.build_frame(av2)], preamble=400))
    assert fr.frames == 2
    assert np.array_equal(fr.avhrr_lines[0], av1)
    assert np.array_equal(fr.avhrr_lines[1], av2)
    assert np.array_equal(fr.tip[0], tip)


def test_framer_streaming_chunks(rng):
    """Frames split across arbitrary push boundaries still decode."""
    av = rng.integers(0, 1024, (5, 2048))
    sig = _frames_signal(rng, [H.build_frame(av)], preamble=100)
    fr = H.HRPTFramer()
    for i in range(0, len(sig), 7777):
        fr.push_symbols(sig[i:i + 7777])
    assert fr.frames == 1
    assert np.array_equal(fr.avhrr_lines[0], av)


@pytest.mark.slow
def test_hrpt_rf_loopback(rng):
    """PM at 3 MS/s with carrier offset + noise → PMDemod → framer:
    both frames' 2048×5 pixels and the TIP words recover exactly."""
    av1 = np.stack([(np.arange(2048) * k + 7) % 1024
                    for k in range(1, 6)])
    av2 = rng.integers(0, 1024, (5, 2048))
    tip = rng.integers(0, 1024, 520)
    bits = _frames_signal(rng, [H.build_frame(av1, tip),
                                H.build_frame(av2)])
    iq = H.pm_modulate(bits)
    n = np.arange(len(iq))
    iq = iq * np.exp(1j * (2 * np.pi * 150.0 * n / 3e6 + 0.4))
    iq = (iq + 0.02 * (rng.standard_normal(len(iq))
                       + 1j * rng.standard_normal(len(iq)))
          ).astype(np.complex64)

    dem = H.PMDemod()
    (sym, valid), _ = jax.jit(
        lambda s, x: dem.apply(None, s, x))(dem.init_state(()),
                                            jnp.asarray(iq))
    hard = (np.asarray(sym)[np.asarray(valid)] > 0).astype(np.uint8)
    fr = H.HRPTFramer()
    fr.push_symbols(hard)
    assert fr.frames == 2, fr.frames
    assert np.array_equal(fr.avhrr_lines[0], av1)
    assert np.array_equal(fr.avhrr_lines[1], av2)
    assert np.array_equal(fr.tip[0], tip)


@pytest.mark.slow
def test_weather_sat_module_products(rng, tmp_path):
    """Module surface: feed channel IQ, read image lines + TIP over the
    debug command plane."""
    import json
    import os
    from sdrplusplusbrown_tpu.app import SDRApp

    root = str(tmp_path / "root")
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "config.json"), "w") as f:
        json.dump({"source": {"type": "none",
                              "samplerate": 3_000_000.0},
                   "fftSize": 4096,
                   "modules": {"Sat": {"type": "weather_sat_decoder"}}},
                  f)
    app = SDRApp(root, run_pump=False)
    try:
        sat = app.modules["Sat"]
        av = rng.integers(0, 1024, (5, 2048))
        tip = rng.integers(0, 1024, 520)
        bits = _frames_signal(rng, [H.build_frame(av, tip)])
        iq = H.pm_modulate(bits)
        # pad to a whole number of the module's rechunk blocks so the
        # tail of the frame flushes through
        blk = sat.rc.out_len
        pad = (-len(iq)) % blk
        iq = np.concatenate([iq, np.zeros(pad, np.complex64)])
        sat.process_iq(iq)
        st = sat.handle_debug_command("status", "")
        assert st["frames"] == 1 and st["lines"] == 1
        line = sat.handle_debug_command("get_line", "2,0")
        want = (av[2].astype(np.float32) * 255.0 / 1024.0
                ).astype(np.uint8)[:64]
        assert line["pixels"] == want.tolist()
        t = sat.handle_debug_command("get_tip", "0")
        assert t["tip"] == tip[:32].tolist()
        rgb = sat.rgb221_line(0)
        assert len(rgb) == 2048 and len(rgb[0]) == 3
    finally:
        app.shutdown()
