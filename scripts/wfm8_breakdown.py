"""Per-stage HBM byte breakdown of the bench WFM-8 chain.

Compiles each stage separately on the TPU and prints XLA cost_analysis
bytes/sample so the next optimization target is chosen on data (device
time is unobservable through the axon tunnel — docs/benchmarks.md).
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
    return float(c.get("bytes accessed", 0.0)), float(c.get("flops", 0.0))


def main():
    import jax
    import jax.numpy as jnp
    from sdrplusplusbrown_tpu.models.radio import Radio, DEMOD_WFM
    from sdrplusplusbrown_tpu.ops.spectrum import SpectrumPath

    fs = 2_400_000.0
    C = 8
    radio = Radio(fs, DEMOD_WFM, pll_mode="normalize")
    spectrum = SpectrumPath(fs, fft_size=65536, fft_rate=20.0)
    g = int(np.lcm(radio.in_multiple, spectrum.in_multiple))
    T = int(((240_000 + g - 1) // g) * g)
    rng = np.random.default_rng(0)
    x = jnp.asarray((rng.standard_normal(T) + 1j * rng.standard_normal(T))
                    .astype(np.complex64) * 0.1)
    offsets = np.linspace(-1.0e6, 1.0e6, C)
    params = radio.make_params_shared(offsets)
    state = radio.init_state_shared(C)

    rows = {}

    # full chain
    def full(params, state, xw):
        spectra, _ = spectrum.apply(None, None, xw)
        audio, st = radio.apply_shared(params, state, xw)
        return (audio, spectra), st
    b, f = ca(full, params, state, x)
    rows["full_chain"] = b / T

    # spectrum alone
    def spec_only(xw):
        s, _ = spectrum.apply(None, None, xw)
        return s
    b, f = ca(spec_only, x)
    rows["spectrum"] = b / T

    # shared VFO front end alone
    vs = radio._build_vfo_shared()
    def vfo_only(p, s, xw):
        return vs.apply(p, s, xw)
    b, f = ca(vfo_only, params["vfo"], state["vfo"], x)
    rows["vfo_frontend"] = b / T

    # demod + AF given IF input
    y_if, _ = jax.eval_shape(lambda p, s, xw: vs.apply(p, s, xw),
                             params["vfo"], state["vfo"], x)
    if_x = jnp.zeros(y_if.shape, y_if.dtype)
    def post(p, s, xw):
        st = dict(s)
        return radio._post_vfo(p, s, st, xw)
    b, f = ca(post, params, state, if_x)
    rows["post_vfo(demod+af)"] = b / T

    # demod internals: find the wfm block
    dem = radio.demod
    print("# demod type:", type(dem).__name__, file=sys.stderr)
    if hasattr(dem, "apply"):
        if_T = if_x.shape[-1]
        dstate = dem.init_state((C,))
        def dem_only(s, xw):
            return dem.apply(None, s, xw)
        try:
            b, f = ca(dem_only, dstate, if_x)
            rows["demod_only"] = b / T
        except Exception as e:
            print("# demod_only failed:", repr(e), file=sys.stderr)

    print(json.dumps({k: round(v, 1) for k, v in rows.items()}))


if __name__ == "__main__":
    main()
