"""Per-stage HBM byte breakdown of BroadcastFM internals on TPU.

Measures each sub-block in isolation (cost_analysis "bytes accessed"),
normalized per wideband input sample (T=240000 @ 2.4 MS/s, C=8 VFOs,
IF 500 kHz).  Guides the demod traffic work; numbers land in
docs/benchmarks.md.
"""

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
    from sdrplusplusbrown_tpu.ops.pll import pilot_normalize

    fs = 2_400_000.0
    C = 8
    radio = Radio(fs, DEMOD_WFM, pll_mode="normalize")
    dem = radio.demod
    g = radio.in_multiple
    T = int(((240_000 + g - 1) // g) * g)
    T_if = int(T / fs * radio.if_rate)
    rng = np.random.default_rng(0)
    y_if = jnp.asarray((rng.standard_normal((C, T_if))
                        + 1j * rng.standard_normal((C, T_if))
                        ).astype(np.complex64) * 0.1)

    rows = {}
    qst = dem.quad.init_state((C,))
    rows["quad"] = ca(lambda s, yy: dem.quad.apply(None, s, yy),
                      qst, y_if) / T
    mpx, _ = jax.eval_shape(lambda s, yy: dem.quad.apply(None, s, yy),
                            qst, y_if)
    mpx = jnp.zeros(mpx.shape, mpx.dtype)
    for i, stage in enumerate(dem.mpx_stages):
        sst = stage.init_state((C,), jnp.float32)
        rows[f"hb{i}"] = ca(lambda s, yy, st=stage: st.apply(None, s, yy),
                            sst, mpx) / T
        mpx, _ = jax.eval_shape(
            lambda s, yy, st=stage: st.apply(None, s, yy), sst, mpx)
        mpx = jnp.zeros(mpx.shape, mpx.dtype)
    print("# mpx:", mpx.shape, mpx.dtype, file=sys.stderr)

    mpx_c = mpx.astype(jnp.complex64)
    rows["cast_c"] = ca(lambda yy: yy.astype(jnp.complex64), mpx) / T
    pst = dem.pilot_fir.init_state((C,))
    rows["pilot_fir"] = ca(
        lambda s, yy: dem.pilot_fir.apply(None, s, yy), pst, mpx_c) / T
    pilot, _ = jax.eval_shape(
        lambda s, yy: dem.pilot_fir.apply(None, s, yy), pst, mpx_c)
    pilot = jnp.zeros(pilot.shape, pilot.dtype)
    rows["normalize"] = ca(pilot_normalize, pilot) / T
    lst = dem.pilot_lag.init_state((C,), jnp.complex64)
    rows["pilot_lag"] = ca(
        lambda s, yy: dem.pilot_lag.apply(None, s, yy), lst, pilot) / T
    dst = dem.lpr_delay.init_state((C,), jnp.float32)
    rows["lpr_delay"] = ca(
        lambda s, yy: dem.lpr_delay.apply(None, s, yy), dst, mpx) / T
    cst = dem.lmr_delay.init_state((C,), jnp.complex64)
    rows["lmr_delay"] = ca(
        lambda s, yy: dem.lmr_delay.apply(None, s, yy), cst, mpx_c) / T

    def stereo_mix(vco, lmr_c, lpr):
        vco2 = jnp.conj(vco)
        lmr = jnp.real(lmr_c * vco2 * vco2) * 2.0
        return jnp.stack([lpr + lmr, lpr - lmr], axis=-2)

    rows["stereo_mix"] = ca(stereo_mix, pilot, mpx_c, mpx) / T
    lr = jnp.zeros((C, 2, mpx.shape[-1]), jnp.float32)
    ast = dem.audio_fir.init_state((C, 2))
    rows["audio_fir"] = ca(
        lambda s, yy: dem.audio_fir.apply(None, s, yy), ast, lr) / T

    rows["sum_stages"] = sum(v for k, v in rows.items())
    dstate = dem.init_state((C,))
    rows["demod_total"] = ca(
        lambda s, yy: dem.apply(None, s, yy), dstate, y_if) / T
    print(json.dumps({k: round(v, 1) for k, v in rows.items()}))


if __name__ == "__main__":
    main()
