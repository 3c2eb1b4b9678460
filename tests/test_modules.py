"""App module tests: signal detector, scanner, frequency manager,
recorder — driven through the app object and its debug-command surface."""

import json
import os
import time

import numpy as np
import pytest

from sdrplusplusbrown_tpu.io.wav import write_wav, read_wav_iq
from sdrplusplusbrown_tpu.ops.detector import detect_signals, SignalDetector
from sdrplusplusbrown_tpu.app import SDRApp


def test_detect_signals_flags_carriers(rng):
    fs = 1_000_000.0
    n = 8192
    spec = -90.0 + rng.standard_normal(n)
    # two carriers: wide at +100 kHz, narrow at -200 kHz

    def put(freq, width_hz, level):
        c = int((freq / fs + 0.5) * n)
        w = max(int(width_hz / (fs / n)), 1)
        spec[c - w // 2:c + w // 2 + 1] = level

    put(100e3, 8000, -40.0)
    put(-200e3, 1500, -55.0)
    sigs = detect_signals(spec, fs)
    assert len(sigs) == 2
    by_freq = sorted(sigs, key=lambda s: s["start_hz"])
    assert abs((by_freq[0]["start_hz"] + by_freq[0]["stop_hz"]) / 2
               - (-200e3)) < 5e3
    assert abs((by_freq[1]["start_hz"] + by_freq[1]["stop_hz"]) / 2
               - 100e3) < 5e3
    assert by_freq[1]["snr_db"] > 30
    det = SignalDetector(fs)
    det.push_spectrum(spec)
    assert det.is_active(100e3, 10e3)
    assert not det.is_active(300e3, 10e3)


def _mk_app(tmp_path, modules, fs=240_000.0, capture=None):
    if capture is None:
        rng = np.random.default_rng(4)
        T = int(fs)
        n = np.arange(T)
        audio = 0.8 * np.sin(2 * np.pi * 1000 * n / fs)
        ph = 2 * np.pi * np.cumsum(2500 * audio) / fs
        capture = (0.6 * np.exp(1j * (2 * np.pi * 60e3 * n / fs + ph))
                   + 0.005 * (rng.standard_normal(T)
                              + 1j * rng.standard_normal(T))
                   ).astype(np.complex64)
    cap = str(tmp_path / "baseband_7100000Hz_09-00-00_02-02-2024.wav")
    write_wav(cap, capture, fs, bits=32)
    root = str(tmp_path / "root")
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "config.json"), "w") as f:
        json.dump({"source": {"type": "file", "path": cap, "loop": True},
                   "fftSize": 4096, "fftRate": 20,
                   "modules": modules}, f)
    return SDRApp(root)


@pytest.mark.slow
def test_scanner_finds_carrier(tmp_path):
    app = _mk_app(tmp_path, {
        "Radio": {"type": "radio", "demod": "NFM", "offset": -100e3},
        "Scanner": {"type": "scanner", "vfo": "Radio",
                    "start_freq": -100e3, "stop_freq": 100e3,
                    "interval": 20e3, "level": -40.0},
    })
    try:
        app.start()
        sc = app.modules["Scanner"]
        deadline = time.time() + 30
        while app.last_spectrum is None and time.time() < deadline:
            time.sleep(0.2)
        sc.handle_debug_command("start", "")
        status = {}
        while time.time() < deadline:
            status = sc.handle_debug_command("status", "")
            if status.get("receiving"):
                break
            time.sleep(0.3)
        assert status.get("receiving"), status
        assert abs(status["current"] - 60e3) < 1e3, status
    finally:
        app.shutdown()


def test_frequency_manager_bookmarks(tmp_path):
    app = _mk_app(tmp_path, {
        "Radio": {"type": "radio", "demod": "NFM", "offset": 0.0},
        "Freqs": {"type": "frequency_manager"},
    })
    try:
        fm = app.modules["Freqs"]
        r = fm.handle_debug_command("add", json.dumps(
            {"name": "repeater", "frequency": 7_105_000.0, "mode": "WFM"}))
        assert r["status"] == "ok"
        lst = fm.handle_debug_command("list", "")
        assert "repeater" in lst["bookmarks"]
        r = fm.handle_debug_command("apply", "repeater,Radio")
        assert r["status"] == "ok"
        # tuner NORMAL-mode semantics: in-span target moves the VFO,
        # center stays (reference gui/tuner.cpp)
        if abs(7_105_000.0 - app.frequency) < app.frontend.effective_sr / 2:
            assert app.modules["Radio"].offset_hz == \
                7_105_000.0 - app.frequency
        else:
            assert app.frequency == 7_105_000.0
        assert app.modules["Radio"].demod_id == 1  # WFM
        # persisted (list-structured format)
        with app.config.acquire(False) as conf:
            saved = conf["frequencyManager"]["Freqs"]
            assert "repeater" in saved["lists"][saved["selectedList"]]
        r = fm.handle_debug_command("remove", "repeater")
        assert r["status"] == "ok"
        assert fm.handle_debug_command("remove", "repeater")["error"]
    finally:
        app.shutdown()


@pytest.mark.slow
def test_recorder_records_audio(tmp_path):
    app = _mk_app(tmp_path, {
        "Radio": {"type": "radio", "demod": "NFM", "offset": 60e3},
        "Rec": {"type": "recorder"},
    })
    try:
        app.start()
        rec = app.modules["Rec"]
        deadline = time.time() + 30
        while app.blocks_processed < 2 and time.time() < deadline:
            time.sleep(0.2)
        r = rec.handle_debug_command("start", "Radio,audio")
        assert r["status"] == "ok"
        path = r["path"]
        b0 = app.blocks_processed
        while app.blocks_processed < b0 + 5 and time.time() < deadline:
            time.sleep(0.2)
        rec.handle_debug_command("stop", "")
        y, rate = read_wav_iq(path)
        assert rate == 48000
        assert len(y) > 10000
        # the 1 kHz NFM tone is in the recording
        a = np.real(y)
        nn = np.arange(len(a))
        tone = np.abs(np.mean(a * np.exp(-2j * np.pi * 1000 * nn / 48000)))
        assert tone > 0.05 * np.std(a)
    finally:
        app.shutdown()


def test_scheduler_runs_commands(tmp_path):
    app = _mk_app(tmp_path, {
        "Radio": {"type": "radio", "demod": "NFM", "offset": 0},
        "Sched": {"type": "scheduler"},
    })
    try:
        sc = app.modules["Sched"]
        r = sc.handle_debug_command("add", json.dumps(
            {"in": 0.3, "module": "Radio", "cmd": "set_demod",
             "args": "AM"}))
        assert r["status"] == "ok"
        assert len(sc.handle_debug_command("list", "")["tasks"]) == 1
        deadline = time.time() + 15
        while time.time() < deadline:
            if app.modules["Radio"].radio.demod_name == "AM":
                break
            time.sleep(0.1)
        assert app.modules["Radio"].radio.demod_name == "AM"
        assert sc.handle_debug_command("list", "")["tasks"] == []
        # removal + error paths
        r = sc.handle_debug_command("add", json.dumps(
            {"in": 3600, "module": "Radio", "cmd": "set_demod",
             "args": "NFM"}))
        assert sc.handle_debug_command("remove", str(r["id"]))["status"] \
            == "ok"
        assert "error" in sc.handle_debug_command("remove", "999")
        assert "error" in sc.handle_debug_command("add", "not json")
    finally:
        app.shutdown()


@pytest.mark.slow
def test_ft8_module_windows_and_decodes(tmp_path):
    """FT8-style module: audio → 12 kHz windows → isolated decode."""
    fs = 240_000.0
    T = int(fs)
    n = np.arange(T)
    # strong 1 kHz tone NFM carrier at +60 kHz (same as other tests)
    audio = 0.8 * np.sin(2 * np.pi * 1000 * n / fs)
    ph = 2 * np.pi * np.cumsum(2500 * audio) / fs
    cap = (0.6 * np.exp(1j * (2 * np.pi * 60e3 * n / fs + ph))
           ).astype(np.complex64)
    app = _mk_app(tmp_path, {
        "Radio": {"type": "radio", "demod": "NFM", "offset": 60e3},
        "FT8": {"type": "ft8_decoder", "stream": "Radio",
                "window_seconds": 0.5},
    }, capture=cap)
    try:
        app.start()
        ft8 = app.modules["FT8"]
        deadline = time.time() + 60
        status = {}
        while time.time() < deadline:
            status = ft8.handle_debug_command("status", "")
            if status.get("decodes", 0) > 0:
                break
            time.sleep(0.3)
        assert status.get("windows", 0) >= 1, status
        assert status.get("decodes", 0) >= 1, status
        decs = ft8.handle_debug_command("decodes", "")["decodes"]
        # the 1 kHz audio tone shows up as a detected tone line
        assert any("TONE 10" in d["text"] or "TONE 9" in d["text"]
                   for d in decs), decs
        assert ft8.handle_debug_command("clear", "")["status"] == "ok"
    finally:
        app.shutdown()
