"""End-to-end HTTP automation tests against the real headless app.

Mirrors the reference e2e suite patterns: test_lsb_startup.py's VFO
bandwidth regression check, test_radio_modes.py's list_demods, and the
baseband_file_test SNR oracle (>20 dB on a carrier, <20 dB off-carrier).
"""

import numpy as np
import pytest

from sdrplusplusbrown_tpu.io.wav import write_wav
from e2e_harness import AppContext


def make_capture(tmp_path, fs=240_000.0, seconds=2.0):
    """NFM carrier at +50 kHz with a 1 kHz tone in light noise."""
    rng = np.random.default_rng(9)
    T = int(fs * seconds)
    n = np.arange(T)
    audio = 0.8 * np.sin(2 * np.pi * 1000 * n / fs)
    phase = 2 * np.pi * np.cumsum(2500 * audio) / fs
    x = (0.6 * np.exp(1j * (2 * np.pi * 50e3 * n / fs + phase))
         + 0.01 * (rng.standard_normal(T) + 1j * rng.standard_normal(T))
         ).astype(np.complex64)
    p = str(tmp_path / "baseband_14000000Hz_10-00-00_01-01-2024.wav")
    write_wav(p, x, fs, bits=32)
    return p


@pytest.fixture(scope="module")
def app(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e")
    cap = make_capture(tmp)
    config = {
        "source": {"type": "file", "path": cap, "loop": True},
        "fftSize": 4096,
        "fftRate": 20,
        "modules": {
            "Radio": {"type": "radio", "demod": "NFM", "offset": 50e3},
            "Radio2": {"type": "radio", "demod": "NFM", "offset": -80e3},
        },
    }
    ctx = AppContext(str(tmp / "root"), config)
    ok = ctx.wait_ready(timeout=120)
    if not ok:
        print(ctx.log_tail())
    assert ok, "app did not become ready"
    yield ctx
    ctx.close()


def test_status_shape(app):
    st = app.get("/status")
    assert st["ready"] and st["mainLoopStarted"]


def test_list_demods(app):
    r = app.module_cmd("Radio", "list_demods")
    names = {d["name"] for d in r["demods"]}
    # reference radio_module_interface.h:6-16 enum order
    assert names == {"NFM", "WFM", "AM", "DSB", "USB", "CW", "LSB", "RAW"}
    ids = {d["name"]: d["id"] for d in r["demods"]}
    assert ids["NFM"] == 0 and ids["WFM"] == 1 and ids["RAW"] == 7


def test_get_set_demod_and_bandwidth(app):
    r = app.module_cmd("Radio", "get_demod")
    assert r["demod"] == "NFM"
    # reference test_lsb_startup.py: LSB default bandwidth ≈ 2.7-2.8 kHz
    r = app.module_cmd("Radio", "set_demod", "LSB")
    assert r["status"] == "ok" and r["demod"] == "LSB"
    bw = app.module_cmd("Radio", "get_vfo_bandwidth")
    assert 2000.0 <= bw["vfo_bandwidth"] <= 3500.0
    assert bw["min_bandwidth"] == 500.0
    r = app.module_cmd("Radio", "set_demod", "0")
    assert r["demod"] == "NFM"


def test_vfo_offset_and_snr_oracle(app):
    import time
    # on-carrier: SNR must exceed 20 dB (reference baseband_file_test oracle)
    app.get("/vfo/set_offset?name=Radio&offset=50000")
    deadline = time.time() + 60
    snr_on = -1
    while time.time() < deadline:
        snr_on = app.module_cmd("Radio", "get_snr")["snr"]
        if snr_on > 20.0:
            break
        time.sleep(0.5)
    assert snr_on > 20.0, f"on-carrier SNR {snr_on}"
    # off-carrier quiet frequency: SNR must stay below 20 dB
    app.get("/vfo/set_offset?name=Radio&offset=-80000")
    time.sleep(1.0)
    snr_off = app.module_cmd("Radio", "get_snr")["snr"]
    app.get("/vfo/set_offset?name=Radio&offset=50000")
    assert snr_off < 20.0, f"off-carrier SNR {snr_off}"


def test_get_spectrum(app):
    r = app.module_cmd("Radio", "get_spectrum", ",128")
    assert r["num_buckets"] == 128
    assert len(r["spectrum"]) == 128
    assert max(r["spectrum"]) <= 0.0 + 1e-6


def test_modules_streams_sinks(app):
    mods = app.get("/modules")
    assert mods["Radio"]["module"] == "radio"
    streams = app.get("/streams")
    assert streams["streams"][0]["name"] == "Radio"
    r = app.post("/sink/select", {"stream": "Radio",
                                  "sink": "null_audio_sink"})
    assert r["status"] == "ok"
    r = app.post("/sink/select", {"stream": "Nope", "sink": "x"})
    assert "error" in r


def test_proc_and_log(app):
    ls = app.get("/ls")
    assert "entries" in ls
    log = app.get("/log")
    assert "SDRApp started" in log["log"]


def test_sdr_status_progress(app):
    import time
    b0 = app.get("/sdr/status")["blocks"]
    time.sleep(1.5)
    b1 = app.get("/sdr/status")["blocks"]
    assert b1 > b0, "pump is not processing blocks"


def _wait_progress(app, n=2, timeout=45.0):
    import time
    b0 = app.get("/sdr/status")["blocks"]
    deadline = time.time() + timeout
    while time.time() < deadline:
        if app.get("/sdr/status")["blocks"] >= b0 + n:
            return True
        time.sleep(0.5)
    return False


def test_afnr_toggle(app):
    r = app.module_cmd("Radio", "set_afnr", "omlsa")
    assert r["status"] == "ok"
    assert app.module_cmd("Radio", "get_afnr")["afnr"] == "omlsa"
    assert _wait_progress(app), "pump stalled with OMLSA NR"
    r = app.module_cmd("Radio", "set_afnr", "logmmse")
    assert r["status"] == "ok"
    assert _wait_progress(app), "pump stalled with LogMMSE NR"
    r = app.module_cmd("Radio", "set_afnr", "off")
    assert r["status"] == "ok"
    assert "error" in app.module_cmd("Radio", "set_afnr", "bogus")


def test_if_chain_toggles(app):
    r = app.module_cmd("Radio", "set_squelch", "-80")
    assert r["status"] == "ok" and r["level"] == -80.0
    r = app.module_cmd("Radio", "set_nb", "on")
    assert r["status"] == "ok"
    r = app.module_cmd("Radio", "set_nb", "off")
    assert r["status"] == "ok"
    lvl = app.module_cmd("Radio", "get_level")
    assert "level_db" in lvl
    r = app.module_cmd("Radio", "set_volume", "0.5")
    assert r["volume"] == 0.5


def test_two_radios_simultaneously(app):
    """VFOManager parity: two radio instances demodulate concurrently
    off one baseband — the on-carrier one hears the signal, the quiet
    one doesn't."""
    import time
    mods = app.get("/modules")
    assert set(mods) >= {"Radio", "Radio2"}
    deadline = time.time() + 60
    snr1 = -1.0
    while time.time() < deadline:
        snr1 = app.module_cmd("Radio", "get_snr")["snr"]
        if snr1 > 20.0:
            break
        time.sleep(0.5)
    snr2 = app.module_cmd("Radio2", "get_snr")["snr"]
    assert snr1 > 20.0 and snr2 < 20.0, (snr1, snr2)


def test_sink_select_records(app):
    r = app.post("/sink/select", {"stream": "Radio", "sink": "recorder"})
    assert r["status"] == "ok"
    import time
    time.sleep(1.5)
    r = app.post("/sink/select", {"stream": "Radio",
                                  "sink": "null_audio_sink"})
    assert r["status"] == "ok"
    # a recording landed on disk
    import glob, os
    recs = glob.glob(os.path.join(app.root, "recordings", "sink_*.wav"))
    assert recs, "sink recorder produced no file"
    assert os.path.getsize(recs[0]) > 1000


def test_frequency_manager_http_e2e(tmp_path_factory):
    """Frequency-manager debug protocol over HTTP + a physical apply:
    create bookmark → apply → the decoder's SNR product confirms the
    radio actually landed on the carrier (reference
    e2e/test_frequency_manager.py + test_frequency_manager_tetra.py,
    which also asserts the stored-VFO targeting)."""
    import time
    tmp = tmp_path_factory.mktemp("fm_e2e")
    cap = make_capture(tmp)
    config = {
        "source": {"type": "file", "path": cap, "loop": True},
        "fftSize": 4096, "fftRate": 20,
        "modules": {
            "Radio": {"type": "radio", "demod": "NFM", "offset": -80e3},
            "Freqs": {"type": "frequency_manager"},
        },
    }
    app = AppContext(str(tmp / "root"), config)
    try:
        assert app.wait_ready(timeout=120), app.log_tail()
        # protocol surface (reference tests 1-7)
        r = app.module_cmd("Freqs", "get_lists")
        assert r["status"] == "ok" and "Default" in r["lists"]
        r = app.module_cmd("Freqs", "get_current_list")
        assert r["current_list"] == "Default"
        r = app.module_cmd("Freqs", "add_bookmark",
                           "Station1|14050000|12500|0|Radio")
        assert r["status"] == "ok"
        r = app.module_cmd("Freqs", "add_bookmark",
                           "Station2|14500000|12500|1")
        assert r["status"] == "ok"
        r = app.module_cmd("Freqs", "get_bookmarks")
        rows = {b["name"]: b for b in r["bookmarks"]}
        assert rows["Station1"]["frequency"] == 14050000.0
        assert rows["Station1"]["vfo"] == "Radio"
        assert rows["Station2"]["mode"] == "WFM"
        # ghost bookmark fails cleanly (tetra e2e scenario)
        r = app.module_cmd("Freqs", "apply_bookmark", "Ghost")
        assert "error" in r
        # off-carrier before apply
        snr_off = app.module_cmd("Radio", "get_snr")["snr"]
        # apply → in-span target moves the VFO onto the +50 kHz carrier
        r = app.module_cmd("Freqs", "apply_bookmark", "Station1")
        assert r["status"] == "ok" and r["vfo"] == "Radio"
        deadline = time.time() + 60
        snr_on = -1.0
        while time.time() < deadline:
            snr_on = app.module_cmd("Radio", "get_snr")["snr"]
            if snr_on > 20.0:
                break
            time.sleep(0.5)
        assert snr_on > 20.0, (snr_off, snr_on)
        # remove + list bookkeeping
        r = app.module_cmd("Freqs", "remove_bookmark", "Station2")
        assert r["status"] == "ok"
        r = app.module_cmd("Freqs", "get_bookmarks")
        assert len(r["bookmarks"]) == 1
    finally:
        app.close()
