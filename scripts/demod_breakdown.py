"""Stage-level HBM byte breakdown of the WFM post-VFO chain (demod
internals, AF resampler, deemphasis) on the TPU, per wideband input
sample (T = 240000 at 2.4 MS/s → IF [8, 50000] @ 500 kHz)."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def ca(step, *args):
    import jax
    comp = jax.jit(step).lower(*args).compile()
    c = comp.cost_analysis()
    if isinstance(c, (list, tuple)):
        c = c[0]
    return float(c.get("bytes accessed", 0.0))


def main():
    import jax
    import jax.numpy as jnp
    from sdrplusplusbrown_tpu.models.radio import Radio, DEMOD_WFM

    fs = 2_400_000.0
    C = 8
    radio = Radio(fs, DEMOD_WFM, pll_mode="normalize")
    g = radio.in_multiple
    T = int(((240_000 + g - 1) // g) * g)
    rng = np.random.default_rng(0)
    T_if = int(T / fs * radio.if_rate)
    y_if = jnp.asarray((rng.standard_normal((C, T_if))
                        + 1j * rng.standard_normal((C, T_if))
                        ).astype(np.complex64) * 0.1)

    rows = {}
    dem = radio.demod
    dstate = dem.init_state((C,))
    rows["demod_total"] = ca(
        lambda s, yy: dem.apply(None, s, yy), dstate, y_if) / T

    # demod internals: walk the BroadcastFM sub-blocks if exposed
    print("# demod attrs:", [a for a in vars(dem) if not
                             a.startswith('_')], file=sys.stderr)

    out, _ = jax.eval_shape(lambda s, yy: dem.apply(None, s, yy),
                            dstate, y_if)
    if isinstance(out, tuple):
        audio_sd = out[0]
        print("# rds out:", out[1].shape, out[1].dtype, file=sys.stderr)
    else:
        audio_sd = out
    print("# demod audio out:", audio_sd.shape, audio_sd.dtype,
          file=sys.stderr)
    audio = jnp.zeros(audio_sd.shape, audio_sd.dtype)

    if radio.af_resamp is not None:
        rstate = radio.af_resamp.init_state(audio.shape[:-1])
        rows["af_resamp"] = ca(
            lambda s, yy: radio.af_resamp.apply(None, s, yy),
            rstate, audio) / T
        a2, _ = jax.eval_shape(
            lambda s, yy: radio.af_resamp.apply(None, s, yy),
            rstate, audio)
        audio2 = jnp.zeros(a2.shape, a2.dtype)
        print("# af out:", a2.shape, file=sys.stderr)
    else:
        audio2 = audio
    if radio.deemp is not None:
        dst = radio.deemp.init_state(audio2.shape[:-1])
        rows["deemp"] = ca(
            lambda s, yy: radio.deemp.apply(None, s, yy),
            dst, audio2) / T
    if radio.squelch_enabled:
        rows["squelch"] = ca(
            lambda yy: radio.squelch.apply(
                {"level": jnp.float32(-50.0)}, None, yy)[0], y_if) / T

    print(json.dumps({k: round(v, 1) for k, v in rows.items()}))


if __name__ == "__main__":
    main()
