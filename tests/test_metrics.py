"""Metrics, volume/merge, and fault-fallback tests."""

import time

import numpy as np

from sdrplusplusbrown_tpu.utils.metrics import (
    StreamTracker, PeakLevelMeter, SpeedTester, volume_scale,
    merge_priority)


def test_stream_tracker_rate():
    t = StreamTracker(window_s=10.0)
    t.add(1000)
    time.sleep(0.05)
    t.add(1000)
    assert t.total == 2000
    assert t.rate() > 1000.0


def test_peak_level_meter():
    m = PeakLevelMeter()
    m.push(np.array([0.5, -1.0, 0.2]))
    assert abs(m.level_db() - 0.0) < 0.1
    for _ in range(50):
        m.push(np.array([0.001]))
    assert m.level_db() < -20.0
    assert m.peak == 1.0


def test_speed_tester():
    rate = SpeedTester.benchmark(lambda b: b * 2.0,
                                 np.zeros(10000, np.float32),
                                 duration_s=0.05)
    assert rate > 1e5


def test_volume_and_merge():
    a = np.ones(10)
    np.testing.assert_array_equal(volume_scale(a, 0.5), a * 0.5)
    assert volume_scale(a, 0.5, muted=True).sum() == 0.0
    # TX (priority 10) preempts RX default
    sel = merge_priority({"rx": True, "tx": True}, {"tx": 10}, "rx")
    assert sel == "tx"
    assert merge_priority({"rx": True, "tx": False}, {"tx": 10},
                          "rx") == "rx"
    assert merge_priority({"rx": False, "tx": False}, {}, "rx") is None


def test_source_failure_falls_back_to_null(tmp_path):
    """A source that dies mid-stream degrades to zeros instead of
    killing the pump (reference source.cpp:60-75)."""
    import json
    import os
    from sdrplusplusbrown_tpu.app import SDRApp
    from sdrplusplusbrown_tpu.io.wav import write_wav

    x = np.ones(24000, np.complex64) * 0.1
    cap = str(tmp_path / "baseband_1000000Hz_01-01-01_01-01-2024.wav")
    write_wav(cap, x, 240000.0, bits=32)
    root = str(tmp_path / "root")
    os.makedirs(root)
    with open(os.path.join(root, "config.json"), "w") as f:
        json.dump({"source": {"type": "file", "path": cap, "loop": True},
                   "fftSize": 4096,
                   "modules": {"Radio": {"type": "radio", "demod": "NFM",
                                         "offset": 0}}}, f)
    app = SDRApp(root)
    try:
        # sabotage the source after a few blocks
        orig = app.source.blocks

        def dying_blocks():
            it = orig()
            for i, b in enumerate(it):
                if i == 3:
                    raise IOError("device unplugged")
                yield b

        app.source.blocks = dying_blocks
        app.start()
        deadline = time.time() + 30
        while app.blocks_processed < 2 and time.time() < deadline:
            time.sleep(0.2)
        assert app.blocks_processed >= 1
        # pump must still be alive on the null source
        assert app._pump_thread.is_alive()
        from sdrplusplusbrown_tpu.utils.flog import flog
        assert "falling back to null source" in flog.dump()
    finally:
        app.shutdown()
