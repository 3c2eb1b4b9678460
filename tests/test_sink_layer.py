"""Sink layer: priority merger preemption, secondary substreams, and the
StreamHook bus (reference core/src/signal_path/sink.h:30-223,
core/src/dsp/routing/merger.h:35-186)."""

import numpy as np

from sdrplusplusbrown_tpu.runtime.routing import Merger
from sdrplusplusbrown_tpu.runtime.sink import (
    SinkStream, StreamRegistry, StreamHook, PRIO_TX_INJECT, PRIO_DEMOD,
    make_secondary_stream_name, is_secondary_stream,
    get_secondary_stream_index)


class FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t


def test_secondary_stream_names():
    assert make_secondary_stream_name("Radio", 0) == "Radio"
    assert make_secondary_stream_name("Radio", 2) == "Radio__##2"
    assert is_secondary_stream("Radio__##1")
    assert not is_secondary_stream("Radio")
    assert get_secondary_stream_index("Radio__##3") == ("Radio", 3)
    assert get_secondary_stream_index("Radio") == ("Radio", 0)


def test_merger_priority_preemption_and_resume():
    """RX (demod, prio 100) playing → TX inject (prio 0) preempts —
    losing stream's buffered data is dropped — and after the switch
    hysteresis expires with no TX data, RX resumes (merger.h:114-186)."""
    clk = FakeClock()
    m = Merger(time_fn=clk)
    rx = m.bind(PRIO_DEMOD)
    tx = m.bind(PRIO_TX_INJECT)

    m.push(rx, np.full(512, 1.0))
    out = m.pull()
    assert out is not None and np.all(out == 1.0)

    # TX arrives: wins immediately even though RX has queued data
    clk.t += 200.0
    m.push(rx, np.full(512, 1.0))
    m.push(tx, np.full(256, 2.0))
    out = m.pull()
    assert np.all(out == 2.0)
    # the preempted RX buffer was flushed (resumes live, not delayed)
    assert m.pull() is None

    # within the 100 ms hysteresis the TX priority floor is sticky: RX
    # data alone does not win back the output
    clk.t += 50.0
    m.push(rx, np.full(128, 1.0))
    assert m.pull() is None

    # after the hysteresis expires, RX resumes
    clk.t += 200.0
    m.push(rx, np.full(128, 1.0))
    out = m.pull()
    assert out is not None and np.all(out == 1.0)


def test_merger_chunks_large_blocks():
    m = Merger(time_fn=FakeClock())
    p = m.bind(0)
    m.push(p, np.arange(3000, dtype=np.float32))
    blocks = m.drain()
    assert [b.shape[-1] for b in blocks] == [1024, 1024, 952]
    assert np.array_equal(np.concatenate(blocks), np.arange(3000))


def test_sink_stream_volume_mute_and_inject():
    clk = FakeClock()
    s = SinkStream("Radio", 48000.0, time_fn=clk)
    got = []
    s.bind(lambda blk: got.append(blk))

    s.volume = 0.5
    s.push_demod(np.ones((2, 100), np.float32))
    assert len(got) == 1 and np.allclose(got[0], 0.5)

    # TX inject preempts the demod audio
    clk.t += 200.0
    port = s.inject(PRIO_TX_INJECT)
    s.volume = 1.0
    s.push(port, np.full((2, 64), 3.0, np.float32))
    assert np.allclose(got[-1], 3.0)

    clk.t += 200.0
    s.muted = True
    s.push_demod(np.ones((2, 50), np.float32))
    assert np.allclose(got[-1], 0.0)


def test_registry_substreams_mirror_base_audio():
    reg = StreamRegistry(time_fn=FakeClock())
    base = reg.register("Radio", 48000.0)
    added = []
    reg.on_add_substream.bind(added.append)
    sub = reg.add_substream("Radio")
    assert sub.name == "Radio__##1" and added == ["Radio__##1"]
    sub2 = reg.add_substream("Radio")
    assert sub2.name == "Radio__##2"
    # no substreams of substreams
    assert reg.add_substream("Radio__##1") is None

    got = []
    sub.bind(lambda blk: got.append(blk))
    base.push_demod(np.full((2, 10), 0.25, np.float32))
    assert len(got) == 1 and np.allclose(got[0], 0.25)

    assert reg.remove_substream("Radio__##2")
    assert reg.get("Radio__##2") is None
    assert not reg.remove_substream("Radio")      # not a substream


def test_stream_hook_bus():
    reg = StreamRegistry(time_fn=FakeClock())
    hooks = []
    reg.on_stream_data.bind(hooks.append)
    reg.publish(StreamHook(source="Radio",
                           source_type=StreamHook.SOURCE_DEMOD_OUTPUT,
                           priority=PRIO_DEMOD, samplerate=48000.0,
                           stereo_data=np.zeros((2, 8), np.float32)))
    assert len(hooks) == 1
    h = hooks[0]
    assert h.source == "Radio"
    assert h.source_type == StreamHook.SOURCE_DEMOD_OUTPUT
    assert h.stereo_data.shape == (2, 8) and h.iq_data is None


def test_app_substream_and_tx_preemption(tmp_path):
    """In-process app: demod audio flows through the sink layer (hooks
    fire, substream mirrors audio), and a TX inject preempts the demod
    audio on the live stream (reference merger.h wired into SinkManager,
    sink.h:62-64)."""
    import time
    from tests.test_modules import _mk_app
    from sdrplusplusbrown_tpu.runtime.sink import PRIO_TX_INJECT

    app = _mk_app(tmp_path, {
        "Radio": {"type": "radio", "demod": "NFM", "offset": 60e3},
    })
    try:
        hooks = []
        app.stream_registry.on_stream_data.bind(hooks.append)
        app.start()
        deadline = time.time() + 30
        while app.blocks_processed < 3 and time.time() < deadline:
            time.sleep(0.2)
        assert hooks, "StreamHook bus silent"
        assert hooks[0].source == "Radio"
        assert hooks[0].source_type == StreamHook.SOURCE_DEMOD_OUTPUT

        # secondary substream mirrors the base demod audio
        sub = app.add_substream("Radio")
        assert sub is not None and sub.name == "Radio__##1"
        got = []
        sub.bind(lambda blk: got.append(blk))
        b0 = app.blocks_processed
        while app.blocks_processed < b0 + 2 and time.time() < deadline:
            time.sleep(0.2)
        assert got, "substream got no audio"

        # TX inject preempts: while TX data flows, demod audio stops
        # reaching consumers and the injected samples do
        stream = app.stream_registry.get("Radio")
        heard = []
        stream.bind(lambda blk: heard.append(blk))
        port = stream.inject(PRIO_TX_INJECT)
        marker = np.full((2, 256), 7.5, np.float32)
        t_inject = time.time()      # hysteresis clock starts at the push
        stream.push(port, marker)
        assert any(np.allclose(b, 7.5) for b in heard[-4:])
        # demod audio immediately after the inject is suppressed
        # (within the merger's 100 ms switch hysteresis).  Only assert
        # when the whole observation verifiably fits inside the window
        # measured FROM THE INJECT — under full-suite load the bind/list
        # bookkeeping above can itself eat >100 ms
        n_before = len(heard)
        b0 = app.blocks_processed
        while app.blocks_processed < b0 + 1 and time.time() < deadline:
            time.sleep(0.05)
        if time.time() - t_inject < 0.1:
            new = [b for b in heard[n_before:] if not np.allclose(b, 7.5)]
            assert not new or time.time() - t_inject >= 0.1
        # after the hysteresis expires the demod stream resumes
        time.sleep(0.3)
        n_mid = len(heard)
        b0 = app.blocks_processed
        while app.blocks_processed < b0 + 2 and time.time() < deadline:
            time.sleep(0.1)
        assert len(heard) > n_mid, "demod audio did not resume after TX"
        stream.remove_input(port)
    finally:
        app.shutdown()
