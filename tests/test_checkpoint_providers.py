"""Checkpoint/resume, demod-provider registry, and IF NR app wiring."""

import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sdrplusplusbrown_tpu.models.radio import (
    Radio, DEMOD_WFM, DEMOD_NFM, register_demod_provider, DEMOD_PROVIDERS,
    list_demods)
from sdrplusplusbrown_tpu.runtime.block import Block
from sdrplusplusbrown_tpu.runtime.checkpoint import save_state, load_state
from sdrplusplusbrown_tpu.ops.demod import FMDemod


def test_checkpoint_resume_bit_exact(tmp_path, rng):
    fs = 240_000.0
    radio = Radio(fs, DEMOD_NFM, offset_hz=50e3)
    g = radio.in_multiple
    T = ((g - 1 + 48000) // g) * g
    x = (rng.standard_normal(2 * T) + 1j * rng.standard_normal(2 * T)
         ).astype(np.complex64) * 0.2
    p = radio.make_params(50e3)

    st = radio.init_state(())
    y1, st = radio.apply(p, st, jnp.asarray(x[:T]))
    ck = str(tmp_path / "state.npz")
    save_state(ck, st, {"demod": "NFM"})

    # resume in a "new process": fresh pipeline object, load state
    radio2 = Radio(fs, DEMOD_NFM, offset_hz=50e3)
    st2, meta = load_state(ck, radio2.init_state(()))
    assert meta["demod"] == "NFM"
    y2a, _ = radio2.apply(p, st2, jnp.asarray(x[T:]))
    y2b, _ = radio.apply(p, st, jnp.asarray(x[T:]))
    np.testing.assert_array_equal(np.asarray(y2a), np.asarray(y2b))


def test_checkpoint_mismatch_rejected(tmp_path):
    fs = 240_000.0
    radio = Radio(fs, DEMOD_NFM)
    ck = str(tmp_path / "s.npz")
    save_state(ck, radio.init_state(()))
    other = Radio(fs, DEMOD_WFM)
    with pytest.raises(ValueError, match="mismatch"):
        load_state(ck, other.init_state(()))


def test_demod_provider_registry():
    def provider(bandwidth, audio_sr):
        return {"block": FMDemod(50_000.0, bandwidth or 9_000.0),
                "if_rate": 50_000.0, "stereo": False,
                "bandwidth": bandwidth or 9_000.0}

    register_demod_provider("DMR", provider)
    try:
        assert "DMR" in list_demods()
        radio = Radio(240_000.0, "DMR")
        assert radio.demod_name == "DMR"
        assert radio.if_rate == 50_000.0
        st = radio.init_state(())
        g = radio.in_multiple
        y, _ = radio.apply(radio.make_params(0.0), st,
                           jnp.zeros(((48000 + g - 1) // g) * g,
                                     jnp.complex64))
        assert y.shape[0] == 2      # mono → stereo
    finally:
        DEMOD_PROVIDERS.pop("DMR", None)


@pytest.mark.slow
def test_ifnr_app_wiring(tmp_path, rng):
    """App with ifnr: primes after NOISE_FRAMES·Slen samples, then runs
    the NR frontend."""
    from sdrplusplusbrown_tpu.io.wav import write_wav
    from sdrplusplusbrown_tpu.app import SDRApp
    fs = 96_000.0
    T = int(fs * 3)
    n = np.arange(T)
    x = (0.4 * np.exp(2j * np.pi * 10e3 * n / fs)
         + 0.1 * (rng.standard_normal(T) + 1j * rng.standard_normal(T))
         ).astype(np.complex64)
    cap = str(tmp_path / "baseband_7000000Hz_01-01-01_01-01-2024.wav")
    write_wav(cap, x, fs, bits=32)
    root = str(tmp_path / "root")
    os.makedirs(root)
    with open(os.path.join(root, "config.json"), "w") as f:
        json.dump({"source": {"type": "file", "path": cap, "loop": True},
                   "fftSize": 4096, "ifnr": True,
                   "modules": {"Radio": {"type": "radio", "demod": "USB",
                                         "offset": 10e3}}}, f)
    app = SDRApp(root)
    try:
        assert app.ifnr is not None
        app.start()
        deadline = time.time() + 60
        while not app.ifnr_primed and time.time() < deadline:
            time.sleep(0.3)
        assert app.ifnr_primed, "IF NR never primed"
        b0 = app.blocks_processed
        while app.blocks_processed < b0 + 2 and time.time() < deadline:
            time.sleep(0.3)
        assert app.blocks_processed > b0
    finally:
        app.shutdown()
