"""Compare TPU roofline bounds: fused shared front end (apply_shared)
vs the 2x-oversampled PFB channelized front end (apply_channelized)
for an NFM bank at several channel counts.

Run on the real TPU (compile-only; device time unobservable through the
axon tunnel — see docs/benchmarks.md). Prints one JSON line per config.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bound(step, params, state, x):
    import jax
    comp = jax.jit(step).lower(params, state, x).compile()
    ca = comp.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    byts = float(ca.get("bytes accessed", 0.0))
    t = max(flops / 197e12, byts / 819e9)
    return flops, byts, t


def main():
    import jax
    import jax.numpy as jnp
    from sdrplusplusbrown_tpu.models.radio import Radio, DEMOD_NFM

    fs = float(sys.argv[1]) if len(sys.argv) > 1 else 2_400_000.0
    for C in (8, 32, 128):
        radio = Radio(fs, DEMOD_NFM, pll_mode="normalize")
        g = radio.in_multiple
        T = int(((int(fs * 0.1) + g - 1) // g) * g)
        rng = np.random.default_rng(0)
        x = (rng.standard_normal(T) + 1j * rng.standard_normal(T)
             ).astype(np.complex64) * 0.1
        offs = np.linspace(-0.4 * fs, 0.4 * fs, C) + 1917.0

        t0 = time.perf_counter()
        fl_s, by_s, t_s = bound(
            lambda p, s, b: radio.apply_shared(p, s, b),
            radio.make_params_shared(offs), radio.init_state_shared(C),
            jnp.asarray(x))
        t1 = time.perf_counter()
        fl_c, by_c, t_c = bound(
            lambda p, s, b: radio.apply_channelized(p, s, b),
            radio.make_params_channelized(offs),
            radio.init_state_channelized(C), jnp.asarray(x))
        t2 = time.perf_counter()
        print(json.dumps({
            "fs": fs, "C": C, "T": T,
            "shared": {"flops_per_sample": round(fl_s / T, 1),
                       "bytes_per_sample": round(by_s / T, 1),
                       "bound_msps": round(T / t_s / 1e6, 1),
                       "compile_s": round(t1 - t0, 1)},
            "channelized": {"flops_per_sample": round(fl_c / T, 1),
                            "bytes_per_sample": round(by_c / T, 1),
                            "bound_msps": round(T / t_c / 1e6, 1),
                            "compile_s": round(t2 - t1, 1)},
        }), flush=True)


if __name__ == "__main__":
    main()
