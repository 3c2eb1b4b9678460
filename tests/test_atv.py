"""ATV decoder: line-sync PLL, level servo, field sync, and RF loopback
(reference decoder_modules/atv_decoder)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sdrplusplusbrown_tpu.models import atv as A

# field sync line sequences matching the 2-bit histories
# (main.cpp:163-167,241-244)
ODD_SEQ = ["short", "short", "short", "long", "long",
           "short", "short", "short"]
EVEN_SEQ = ["normal", "short", "short", "long", "long", "long",
            "short", "short"]


def _signal(pattern, n_normal=100, reps=3, rng=None):
    kinds = []
    for _ in range(reps):
        kinds += ["normal"] * n_normal + ODD_SEQ \
            + ["normal"] * n_normal + EVEN_SEQ
    lines = [A.make_line(k, video=pattern if k == "normal" else None)
             for k in kinds]
    return np.concatenate(lines), kinds


def test_linesync_locks_and_recovers_video(rng):
    pattern = np.linspace(0, 1, A.VISIBLE_W).astype(np.float32)
    sig, _ = _signal(pattern, rng=rng)
    t = np.arange(len(sig))
    # fractional delay + 5e-5 rate error + noise
    warped = np.interp(np.arange(0, len(sig) - 2, 1.00005) + 0.37,
                       t, sig) + 0.01 * rng.standard_normal(
        len(np.arange(0, len(sig) - 2, 1.00005)))
    ls = A.LineSync()
    fa = A.FrameAssembler()
    for line in ls.push(warped.astype(np.float32)):
        fa.push_line(line)
    assert ls.locked > 500
    assert fa.frames >= 1
    img = fa.image
    rows = img[img.max(axis=1) > 50]
    assert len(rows) > 100
    mid = rows[len(rows) // 2].astype(float)
    # the ramp pattern survives: rising left → right
    assert mid[-100:].mean() > mid[:100].mean() + 100


def test_field_sync_histories():
    fa = A.FrameAssembler()
    for k in EVEN_SEQ:
        fa.push_line(A.make_line(k))
    assert fa.ypos == 0 and fa.frames == 1      # even field swap
    fa2 = A.FrameAssembler()
    for k in ODD_SEQ:
        fa2.push_line(A.make_line(k))
    assert fa2.ypos == 1                        # odd field restart


@pytest.mark.slow
def test_atv_rf_loopback(rng):
    """AM (negative modulation) → front end → line sync → image."""
    pattern = (0.5 + 0.4 * np.sin(
        2 * np.pi * np.arange(A.VISIBLE_W) / 128.0)).astype(np.float32)
    # the level servo's time constant is ~1000 lines (64 ms of PAL);
    # send ~1.6 s-of-lines so it converges like in real reception
    sig, _ = _signal(pattern, n_normal=90, reps=12, rng=rng)
    # negative AM: carrier amplitude falls with signal level
    amp = 0.8 - 0.45 * sig
    iq = (amp * np.exp(1j * 0.3)).astype(np.complex64)
    iq += 0.004 * (rng.standard_normal(len(iq))
                   + 1j * rng.standard_normal(len(iq)))
    fe = A.ATVFrontEnd()
    v, _ = jax.jit(lambda s, x: fe.apply(None, s, x))(
        fe.init_state(()), jnp.asarray(iq))
    ls = A.LineSync()
    fa = A.FrameAssembler()
    for line in ls.push(np.asarray(v)):
        fa.push_line(line)
    assert ls.locked > 750, ls.locked
    # level servo normalized the sync/blank levels
    assert 0.1 < fa.gain < 10.0
    assert fa.frames >= 1, fa.frames
    img = fa.image
    rows = img[img.max(axis=1) > 40]
    assert len(rows) > 50, len(rows)
    mid = rows[len(rows) // 2].astype(float)
    # the sine pattern survives: correlate against the sent pattern
    c = np.corrcoef(mid, pattern)[0, 1]
    assert c > 0.9, c


@pytest.mark.slow
def test_atv_module_surface(rng, tmp_path):
    import json
    import os
    from sdrplusplusbrown_tpu.app import SDRApp
    root = str(tmp_path / "root")
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "config.json"), "w") as f:
        json.dump({"source": {"type": "none",
                              "samplerate": A.SAMPLE_RATE},
                   "fftSize": 4096,
                   "modules": {"ATV": {"type": "atv_decoder"}}}, f)
    app = SDRApp(root, run_pump=False)
    try:
        mod = app.modules["ATV"]
        pattern = np.full(A.VISIBLE_W, 0.8, np.float32)
        sig, _ = _signal(pattern, n_normal=60, reps=2, rng=rng)
        iq = ((0.8 - 0.45 * sig) * np.exp(1j * 0.1)).astype(np.complex64)
        blk = mod.rc.out_len
        pad = (-len(iq)) % blk
        mod.process_iq(np.concatenate([iq, np.zeros(pad, np.complex64)]))
        st = mod.handle_debug_command("status", "")
        assert st["lines"] > 100, st
        assert st["h_lock"] > 100, st
        row = mod.handle_debug_command("get_row", "100")
        assert "pixels" in row and len(row["pixels"]) == 64
    finally:
        app.shutdown()
