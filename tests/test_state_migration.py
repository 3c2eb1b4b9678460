"""State migration across live reconfiguration (VERDICT r2 item 4).

The reference preserves FIR history across tap-count changes for
click-free retune (core/src/dsp/filter/fir.h:33-54) and keeps loop
state through graph edits (radio_module.h:655-774).  Here the carried
pytree migrates via runtime/migrate.py: identical leaves carry exactly,
resized overlap-save tails align right (newest samples kept, older past
zero-filled), incompatible leaves re-init."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sdrplusplusbrown_tpu.runtime.migrate import migrate_state
from sdrplusplusbrown_tpu.models.radio import Radio, DEMOD_WFM, DEMOD_NFM


def tone_snr_db(x, f, fs):
    """SNR of a single real tone at f in x (fit amp+phase, residual)."""
    t = np.arange(len(x)) / fs
    c = np.exp(-2j * np.pi * f * t)
    a = 2 * np.mean(x * c)
    fit = np.real(a * np.exp(2j * np.pi * f * t))
    err = x - fit - np.mean(x - fit)
    p_sig = np.mean(fit ** 2)
    p_err = max(np.mean(err ** 2), 1e-30)
    return 10 * np.log10(p_sig / p_err)


def fm_modulate(mpx, deviation, fs):
    phase = np.cumsum(2 * np.pi * deviation * mpx / fs)
    return np.exp(1j * phase).astype(np.complex64)


# ---------------------------------------------------------------------
# unit rules

def test_migrate_leaf_rules():
    old = {"a": jnp.arange(6, dtype=jnp.float32),          # truncate
           "b": jnp.arange(3, dtype=jnp.float32),          # extend
           "c": jnp.float32(7.5),                          # scalar carry
           "d": jnp.arange(4, dtype=jnp.float32),          # exact carry
           "gone": jnp.zeros(5)}
    tpl = {"a": jnp.zeros(4, jnp.float32),
           "b": jnp.zeros(5, jnp.float32),
           "c": jnp.float32(0.0),
           "d": jnp.zeros(4, jnp.float32),
           "new": jnp.ones(2, jnp.float32)}
    out = migrate_state(old, tpl)
    np.testing.assert_array_equal(out["a"], [2, 3, 4, 5])   # newest kept
    np.testing.assert_array_equal(out["b"], [0, 0, 0, 1, 2])  # old past=0
    assert float(out["c"]) == 7.5
    np.testing.assert_array_equal(out["d"], [0, 1, 2, 3])
    np.testing.assert_array_equal(out["new"], [1, 1])       # fresh
    # rank / leading-dim mismatch -> fresh
    out2 = migrate_state({"x": jnp.zeros((2, 3))},
                         {"x": jnp.ones((3, 3))})
    np.testing.assert_array_equal(out2["x"], np.ones((3, 3)))
    # complex history into a real slot -> fresh (no silent real-cast)
    out3 = migrate_state({"x": jnp.ones(4, jnp.complex64)},
                         {"x": jnp.zeros(4, jnp.float32)})
    np.testing.assert_array_equal(out3["x"], np.zeros(4))


def test_migrate_identity_is_exact():
    """Same-config rebuild + migrate == never rebuilding (bit-exact)."""
    fs = 2_400_000.0
    r1 = Radio(fs, DEMOD_NFM)
    g = r1.in_multiple
    T = ((1 << 17) // g) * g
    rng = np.random.default_rng(5)
    x = (rng.standard_normal(T) + 1j * rng.standard_normal(T)
         ).astype(np.complex64)
    xa, xb = jnp.asarray(x[:T // 2]), jnp.asarray(x[T // 2:])
    p = r1.init_params()

    st = r1.init_state()
    y1a, st = r1.apply(p, st, xa)
    y1b, _ = r1.apply(p, st, xb)

    st = r1.init_state()
    y2a, st = r1.apply(p, st, xa)
    r2 = Radio(fs, DEMOD_NFM)                    # "rebuild"
    st = migrate_state(st, r2.init_state())
    y2b, _ = r2.apply(r2.init_params(), st, xb)

    np.testing.assert_array_equal(np.asarray(y1a), np.asarray(y2a))
    np.testing.assert_array_equal(np.asarray(y1b), np.asarray(y2b))


def test_wfm_bandwidth_change_is_click_free():
    """Play a tone through a live 150→120 kHz bandwidth change: the
    first post-switch audio block must already demodulate cleanly (the
    migrated FIR tails mean no warm-up transient)."""
    fs = 2_400_000.0
    r1 = Radio(fs, DEMOD_WFM, bandwidth=150_000.0)
    r2 = Radio(fs, DEMOD_WFM, bandwidth=120_000.0)
    g = int(np.lcm(r1.in_multiple, r2.in_multiple))
    T = ((1 << 18) // g) * g
    ftone = 800.0
    t = np.arange(2 * T) / fs
    mpx = 0.6 * np.sin(2 * np.pi * ftone * t)
    # 25 kHz deviation: Carson bandwidth ~32 kHz fits BOTH filter
    # settings (75 kHz would clip at 120 kHz and distort legitimately)
    x = fm_modulate(mpx, 25_000.0, fs)

    st = r1.init_state()
    y0, st = r1.apply(r1.init_params(), st, jnp.asarray(x[:T]))
    st = migrate_state(st, r2.init_state())
    y1, _ = r2.apply(r2.init_params(), st, jnp.asarray(x[T:]))

    fs48 = 48_000.0
    pre = np.asarray(y0)[0, -2000:]          # stereo [2, N]: L channel
    post = np.asarray(y1)[0, :2000]
    snr_pre = tone_snr_db(pre, ftone, fs48)
    snr_post0 = tone_snr_db(post, ftone, fs48)
    snr_post = tone_snr_db(np.asarray(y1)[0, 128:2128], ftone, fs48)
    assert snr_pre > 40.0, snr_pre
    # immediately post-switch: bounded settle only (the zero-filled
    # extension of the resized FIR tail — same rule as fir.h:33-54)
    assert snr_post0 > 12.0, snr_post0
    # by 128 samples the audio is back at steady-state quality
    assert snr_post > snr_pre - 3.0, (snr_pre, snr_post)
    # no amplitude glitch across the boundary
    edge = np.concatenate([pre[-16:], post[:16]])
    assert np.max(np.abs(np.diff(edge))) < 4.0 * np.max(np.abs(edge[:16]))


def test_app_set_bandwidth_migrates_and_records_latency(tmp_path):
    """App-level: set_bandwidth keeps the carried state object (filter
    tails preserved, not re-zeroed) and records the switch latency
    (reference logs µs on every switch, radio_module.h:474)."""
    from sdrplusplusbrown_tpu.app import SDRApp
    root = str(tmp_path / "root")
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "config.json"), "w") as f:
        json.dump({"source": {"type": "none", "samplerate": 2.4e6},
                   "modules": {"Radio0": {"type": "radio",
                                          "demod": "WFM"}}}, f)
    app = SDRApp(root, run_pump=False)
    try:
        mod = app.modules["Radio0"]
        # hand-poke a recognizable value into the carried FIR tail
        tail = np.asarray(mod.state["vfo"]["fir"])
        mod.state["vfo"]["fir"] = jnp.full_like(
            jnp.asarray(tail), 0.125 + 0.0625j)
        mod.set_bandwidth(120_000.0)
        new_tail = np.asarray(mod.state["vfo"]["fir"])
        # resized tail keeps the newest samples of the old one
        n_keep = min(len(tail), len(new_tail))
        assert np.all(new_tail[-n_keep:] == 0.125 + 0.0625j)
        assert mod.last_switch_us > 0.0
        assert mod.radio.bandwidth == 120_000.0
    finally:
        app.shutdown()
