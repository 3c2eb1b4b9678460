"""WAV IO, file source, recorder, and streaming pump tests."""

import os

import numpy as np
import pytest

from sdrplusplusbrown_tpu.io import (
    read_wav_iq, write_wav, parse_capture_filename, FileSource, WavRecorder)
from sdrplusplusbrown_tpu.models.iq_frontend import IQFrontEnd
from sdrplusplusbrown_tpu.models.radio_bank import RadioBank, VFOSpec
from sdrplusplusbrown_tpu.models.radio import DEMOD_NFM
from sdrplusplusbrown_tpu.runtime.pump import Rechunker, StreamPump


def test_wav_roundtrip_iq(tmp_path, rng):
    x = (rng.uniform(-0.9, 0.9, 1000)
         + 1j * rng.uniform(-0.9, 0.9, 1000)).astype(np.complex64)
    p = str(tmp_path / "iq.wav")
    write_wav(p, x, 48000, bits=16)
    y, rate = read_wav_iq(p)
    assert rate == 48000
    np.testing.assert_allclose(np.real(y), np.real(x), atol=1e-4)
    np.testing.assert_allclose(np.imag(y), np.imag(x), atol=1e-4)
    # float32 exact
    p2 = str(tmp_path / "iqf.wav")
    write_wav(p2, x, 96000, bits=32)
    y2, rate2 = read_wav_iq(p2)
    assert rate2 == 96000
    np.testing.assert_array_equal(y2, x)


def test_capture_filename():
    f, ts = parse_capture_filename("baseband_14100000Hz_17-42-35_04-08-2023.wav")
    assert f == 14100000.0
    assert (ts.year, ts.month, ts.day, ts.hour) == (2023, 8, 4, 17)
    f2, ts2 = parse_capture_filename("random.wav")
    assert f2 is None and ts2 is None


def test_file_source_blocks(tmp_path, rng):
    x = (rng.standard_normal(5000) + 1j * rng.standard_normal(5000)
         ).astype(np.complex64) * 0.1
    p = str(tmp_path / "baseband_7000000Hz_01-02-03_04-05-2023.wav")
    write_wav(p, x, 200000, bits=32)
    src = FileSource(p)
    assert src.samplerate == 200000
    assert src.block_len == 1000          # SR/200
    assert src.center_freq == 7000000.0
    blocks = list(src.blocks())
    assert len(blocks) == 5
    np.testing.assert_array_equal(np.concatenate(blocks), x)


def test_recorder_roundtrip(tmp_path, rng):
    p = str(tmp_path / "rec.wav")
    rec = WavRecorder(p, 48000, channels=2, bits=16)
    a = rng.standard_normal((2, 480)).astype(np.float32) * 0.3
    rec.write(a)
    rec.write(a)
    rec.close()
    y, rate = read_wav_iq(p)   # stereo read back as complex
    assert rate == 48000 and len(y) == 960
    np.testing.assert_allclose(np.real(y)[:480], a[0], atol=1e-4)


def test_rechunker():
    rc = Rechunker(100)
    out = rc.push(np.zeros(250, np.complex64))
    assert [len(o) for o in out] == [100, 100]
    out = rc.push(np.zeros(50, np.complex64))
    assert [len(o) for o in out] == [100]


@pytest.mark.slow
def test_stream_pump_end_to_end(tmp_path, rng):
    fs = 240_000.0
    T = int(fs * 1.0)
    n = np.arange(T)
    audio = 0.8 * np.sin(2 * np.pi * 1000 * n / fs)
    phase = 2 * np.pi * np.cumsum(2500 * audio) / fs
    x = (0.5 * np.exp(1j * (2 * np.pi * 50e3 * n / fs + phase))
         ).astype(np.complex64)
    p = str(tmp_path / "baseband_14000000Hz_10-00-00_01-01-2024.wav")
    write_wav(p, x, fs, bits=32)

    src = FileSource(p)
    fe = IQFrontEnd(fs, fft_size=4096, fft_rate=20.0)
    bank = RadioBank(fs, [VFOSpec("v0", DEMOD_NFM, 50e3)])
    pump = StreamPump(fe, bank, block_len=60_000)
    got = []
    rec_path = str(tmp_path / "audio.wav")
    rec = WavRecorder(rec_path, 48000)
    nspec = []
    nblocks = pump.run(src.blocks(),
                       sinks={DEMOD_NFM: lambda a: (got.append(a),
                                                    rec.write(a[0]))},
                       spectrum=lambda s: nspec.append(s.shape))
    rec.close()
    assert nblocks == 4
    a = np.concatenate([g[0, 0] for g in got])
    assert a.shape[0] == 48000
    sk = 24000
    nn = np.arange(len(a) - sk)
    tone = np.abs(np.mean(a[sk:] * np.exp(-2j * np.pi * 1000 * nn / 48000)))
    rms = np.sqrt(np.mean(a[sk:] ** 2))
    assert tone > 0.25 * rms
    # recorded audio file intact
    y, rate = read_wav_iq(rec_path)
    assert rate == 48000 and len(y) == 48000


# ---------------------------------------------------------------------
# Real-time pacing guard + elastic degradation (VERDICT r2 item 8;
# reference: noise_reduction_logmmse/src/if_nr.h:117-139)

def test_realtime_guard_policy():
    from sdrplusplusbrown_tpu.runtime.pump import RealTimeGuard
    g = RealTimeGuard(threshold=0.95, strikes_needed=2)
    assert not g.report(0.5, 1.0)       # plenty of headroom
    assert not g.report(0.96, 1.0)      # first strike
    assert g.report(1.2, 1.0)           # second strike -> fire once
    assert not g.report(1.2, 1.0)       # latched until re-armed
    assert g.rt_factor > 0.9
    assert g.seconds_behind > 0.0        # accumulated lag
    g.reset_policy()
    assert not g.report(0.1, 1.0)       # strike counter restarted
    assert not g.report(0.1, 1.0)
    # lag drains when running faster than real time
    for _ in range(10):
        g.report(0.1, 1.0)
    assert g.seconds_behind == 0.0
    assert g.rt_factor < 0.5


def test_pump_elastic_ifnr_degradation_and_recovery(tmp_path):
    """A simulated slow step makes the pump shed the IF NR (the
    reference's self-disable analog), after which processing recovers
    to real time and keeps flowing."""
    import json, os
    from sdrplusplusbrown_tpu.app import SDRApp

    root = str(tmp_path / "root")
    os.makedirs(root, exist_ok=True)
    sr = 192_000.0
    with open(os.path.join(root, "config.json"), "w") as f:
        json.dump({"source": {"type": "none", "samplerate": sr},
                   "ifnr": True, "fftSize": 4096, "modules": {}}, f)
    app = SDRApp(root, run_pump=False)
    try:
        assert app.ifnr_enabled and app.ifnr is not None

        n_blocks = 40
        g = app._granularity_all()
        B = ((int(sr // 20) + g - 1) // g) * g

        def fake_source():
            for _ in range(n_blocks):
                yield np.zeros(B, np.complex64)
        app._source_iter = fake_source

        class FakeClock:
            def __init__(self, outer):
                self.t = 0.0
                self.calls = 0
                self.outer = outer
            def __call__(self):
                self.calls += 1
                if self.calls % 2 == 0:   # end-of-step reading
                    budget = B / sr
                    # slow while (or before) NR runs; fast afterwards
                    self.t += (0.2 * budget
                               if not self.outer.ifnr_enabled
                               else 1.2 * budget)
                return self.t
        app._clock = FakeClock(app)

        app._pump_loop()                  # runs to source exhaustion

        assert not app.ifnr_enabled, "NR should have self-disabled"
        assert "Slow" in app.ifnr_stop_reason
        st = app.status()
        assert st["ifnrEnabled"] is False
        assert st["ifnrStopReason"]
        # recovery: the fast post-degradation blocks drained the lag
        assert app.rt_guard.seconds_behind == 0.0
        assert app.rt_guard.rt_factor < 1.0
        assert app.blocks_processed >= n_blocks - 1
    finally:
        app.shutdown()
