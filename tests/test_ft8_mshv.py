"""FT8 external-decoder contract proof: drive run_mshv_decoder and the
FT8 module against a reference-faithful fake ``sdrpp_ft8_mshv`` (same
argv/out-file framing as ft8_decoder.h:196-312), asserting decode
records round-trip into the module table."""

import os
import sys
import time

import numpy as np
import pytest

from sdrplusplusbrown_tpu.runtime.window_decoder import (
    run_mshv_decoder, parse_mshv_line)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FAKE = [sys.executable, os.path.join(ROOT, "tests", "fake_mshv.py")]


def test_parse_mshv_line_reference_example():
    # the exact example from ft8_decoder.h:267
    line = ("FT8_OUT\t1675635874870\t30\t{0}\t120000\t{1}\t-19\t{2}\t"
            "0.2\t{3}\t775\t{4}\tSQ9KWU DL1PP -14\t{5}\t? 0\t{6}\t"
            "0.1\t{7}\t1975")
    rec = parse_mshv_line(line)
    assert rec == {"type": "FT8_OUT", "when_ms": "120000",
                   "snr": "-19", "dt": "0.2", "freq": "775",
                   "message": "SQ9KWU DL1PP -14", "info": "? 0",
                   "dt2": "0.1", "freq2": "1975"}
    assert parse_mshv_line("DECODE_EOF") == {"type": "DECODE_EOF"}
    assert parse_mshv_line("ERROR\tboom")["message"] == "boom"
    assert parse_mshv_line("random noise") is None


@pytest.mark.slow
def test_run_mshv_decoder_roundtrip(tmp_path):
    fs = 12_000.0
    t = np.arange(int(2.0 * fs)) / fs
    tone_hz = 775.0
    audio = (0.5 * np.sin(2 * np.pi * tone_hz * t)).astype(np.float32)
    recs = run_mshv_decoder(FAKE, audio, fs, mode="FT8",
                            workdir=str(tmp_path))
    assert len(recs) == 2, recs
    assert recs[0]["type"] == "FT8_OUT"
    # the fake embeds the detected tone → the audio really flowed
    assert abs(float(recs[0]["freq"]) - tone_hz) < 10.0, recs[0]
    assert recs[0]["message"].startswith("CQ TEST K1ABC")
    assert recs[1]["message"] == "K1ABC W9XYZ -07"
    assert recs[0]["snr"] == "-12"


@pytest.mark.slow
def test_run_mshv_decoder_ft4_mode_and_bad_binary(tmp_path):
    fs = 12_000.0
    audio = np.zeros(int(fs), np.float32)
    recs = run_mshv_decoder(FAKE, audio, fs, mode="FT4",
                            workdir=str(tmp_path / "a"))
    assert recs and recs[0]["type"] == "FT4_OUT"
    # a failing binary surfaces as an ERROR record (ft8_decoder.h:222-228)
    os.makedirs(tmp_path / "b", exist_ok=True)
    recs = run_mshv_decoder(
        [sys.executable, "-c", "import sys; sys.exit(3)"], audio, fs,
        timeout=5.0, workdir=str(tmp_path / "b"))
    assert recs and recs[0]["type"] == "ERROR"


@pytest.mark.slow
def test_ft8_module_with_mshv_decoder(tmp_path):
    """The module slices windows and the MSHV records land in its
    decode table with message/snr/freq fields."""
    from tests.test_modules import _mk_app

    fs = 240_000.0
    T = int(fs * 2)
    n = np.arange(T)
    # NFM carrier whose demod audio is a 775 Hz tone
    audio = 0.8 * np.sin(2 * np.pi * 775.0 * n / fs)
    ph = 2 * np.pi * np.cumsum(2500 * audio) / fs
    rng = np.random.default_rng(5)
    cap = (0.6 * np.exp(1j * (2 * np.pi * 60e3 * n / fs + ph))
           + 0.005 * (rng.standard_normal(T)
                      + 1j * rng.standard_normal(T))).astype(np.complex64)
    app = _mk_app(tmp_path, {
        "Radio": {"type": "radio", "demod": "NFM", "offset": 60e3},
        "FT8": {"type": "ft8_decoder", "stream": "Radio",
                "decoder_cmd": FAKE, "decoder_style": "mshv",
                "window_seconds": 2.0},
    }, capture=cap)
    try:
        app.start()
        ft8 = app.modules["FT8"]
        deadline = time.time() + 90
        while time.time() < deadline:
            if ft8.decodes:
                break
            time.sleep(0.3)
        assert ft8.decodes, "no decodes arrived"
        d = ft8.decodes[0]
        assert d["type"] == "FT8_OUT"
        assert "message" in d and d["text"] == d["message"]
        assert abs(float(d["freq"]) - 775.0) < 30.0, d
    finally:
        app.shutdown()
