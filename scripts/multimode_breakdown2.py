"""Front-end vs demod-tail HBM bytes per multimode group (TPU)."""
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
    import jax.numpy as jnp
    from sdrplusplusbrown_tpu.models.radio import (Radio, DEMOD_NFM,
                                                   DEMOD_AM, DEMOD_USB)
    fs = 2_400_000.0
    rng = np.random.default_rng(0)
    rows = {}
    for name, d, C in [("nfm", DEMOD_NFM, 4), ("am", DEMOD_AM, 4),
                       ("usb", DEMOD_USB, 4)]:
        r = Radio(fs, d)
        g = r.in_multiple
        T = int(((240_000 + g - 1) // g) * g)
        x = jnp.asarray((rng.standard_normal(T)
                         + 1j * rng.standard_normal(T))
                        .astype(np.complex64) * 0.1)
        offs = np.linspace(-1e6, 1e6, C)
        p = r.make_params_shared(offs)
        s = r.init_state_shared(C)
        vs = r._build_vfo_shared()

        def fe(pp, ss, xx, _vs=vs):
            y, st = _vs.apply(pp["vfo"], ss["vfo"], xx)
            return y

        def full(pp, ss, xx, _r=r):
            y, st = _r.apply_shared(pp, ss, xx)
            return y

        rows[name] = {
            "T": T,
            "frontend_B": round(ca(fe, p, s, x) / T, 1),
            "full_B": round(ca(full, p, s, x) / T, 1),
        }
        print(name, rows[name], flush=True)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
