"""Infra tests: ConfigManager (merge/autosave/acquire), Event, flog."""

import json
import os
import time

from sdrplusplusbrown_tpu.utils.config import ConfigManager, merge_defaults
from sdrplusplusbrown_tpu.utils.event import Event
from sdrplusplusbrown_tpu.utils.flog import flog


def test_merge_defaults_recursive():
    conf = {"a": 1, "nest": {"x": 5}}
    changed = merge_defaults(conf, {"a": 0, "b": 2, "nest": {"x": 0,
                                                             "y": 3}})
    assert changed
    assert conf == {"a": 1, "b": 2, "nest": {"x": 5, "y": 3}}
    assert not merge_defaults(conf, {"a": 0})


def test_config_load_repair_and_save(tmp_path):
    p = str(tmp_path / "config.json")
    with open(p, "w") as f:
        f.write('{"keep": true')        # corrupt JSON
    cm = ConfigManager()
    cm.set_path(p)
    cm.load({"fresh": 1})
    with cm.acquire(False) as conf:
        assert conf == {"fresh": 1}     # repaired from defaults
    with cm.acquire() as conf:
        conf["fresh"] = 42
    cm.save()
    cm2 = ConfigManager()
    cm2.set_path(p)
    cm2.load({"fresh": 0, "added": "x"})
    with cm2.acquire(False) as conf:
        assert conf["fresh"] == 42 and conf["added"] == "x"


def test_config_autosave(tmp_path):
    p = str(tmp_path / "c.json")
    cm = ConfigManager()
    cm.set_path(p)
    cm.load({"n": 0})
    cm.enable_autosave(interval_s=0.1)
    with cm.acquire() as conf:
        conf["n"] = 7
    deadline = time.time() + 5
    while time.time() < deadline:
        if os.path.exists(p) and json.load(open(p)).get("n") == 7:
            break
        time.sleep(0.05)
    cm.disable_autosave()
    assert json.load(open(p))["n"] == 7


def test_event_bind_unbind():
    ev = Event()
    got = []
    h = got.append
    ev.bind(h)
    ev.emit(1)
    ev.unbind(h)
    ev.emit(2)
    ev.unbind(h)               # double-unbind is a no-op
    assert got == [1]


def test_flog_ring():
    flog.info("infra test marker {}", 123)
    assert "infra test marker 123" in flog.dump()
