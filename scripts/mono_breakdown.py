"""Mono vs plane front-end HBM bytes (TPU cost_analysis roofline)."""
import json, os, sys
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
    from sdrplusplusbrown_tpu.ops.mono_frontend import build_mono_pipeline
    from sdrplusplusbrown_tpu.ops.plane_frontend import build_plane_pipeline

    fs = 2_400_000.0
    C = 8
    radio = Radio(fs, DEMOD_WFM, pll_mode="normalize")
    bank = radio._build_vfo_shared()
    g = radio.in_multiple
    T = int(((240_000 + g - 1) // g) * g)
    rng = np.random.default_rng(0)
    x = jnp.asarray((rng.standard_normal(T) + 1j * rng.standard_normal(T))
                    .astype(np.complex64) * 0.1)
    offs = np.linspace(-1.0e6, 1.0e6, C)
    params = radio.make_params_shared(offs)["vfo"]["fused"]
    state = radio.init_state_shared(C)["vfo"]

    rows = {}
    mono = build_mono_pipeline(bank, C)
    assert mono is not None
    rows["mono"] = ca(lambda p, s, xx: mono.apply(p, s, xx),
                      params, state, x) / T
    plane = build_plane_pipeline(bank, C)
    rows["plane"] = ca(lambda p, s, xx: plane.apply(p, s, xx),
                       params, state, x) / T
    print(json.dumps({k: round(v, 1) for k, v in rows.items()}))


if __name__ == "__main__":
    main()
