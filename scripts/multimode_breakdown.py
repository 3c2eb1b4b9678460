"""Per-group HBM bytes of the multimode-8 bench config (TPU cost_analysis).

Decomposes bench.build_multimode8's 102 B/in-sample: each mode group's
``Radio.apply_shared`` is compiled alone on the same wideband block, plus
the c64->planes split, so the per-group read/stage traffic is visible.
"""
import json, os, sys
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
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    step, params, state, x, T = bench.build_multimode8()
    rows = {}
    b, f = ca(step, params, state, x)
    rows["full_bank"] = {"B_per_smp": round(b / T, 1),
                         "kflop_per_smp": round(f / T / 1e3, 2)}

    from sdrplusplusbrown_tpu.models.radio_bank import RadioBank
    from sdrplusplusbrown_tpu.models.radio import (DEMOD_NFM, DEMOD_AM,
                                                   DEMOD_USB)
    bank_obj = None
    # rebuild the same bank to get per-group radios/params/state
    import bench as _b
    from sdrplusplusbrown_tpu.models.radio_bank import VFOSpec
    fs = 2_400_000.0
    vfos = ([VFOSpec(f"nfm{i}", DEMOD_NFM, -900e3 + 300e3 * i)
             for i in range(4)]
            + [VFOSpec(f"am{i}", DEMOD_AM, 300e3 + 200e3 * i)
               for i in range(2)]
            + [VFOSpec(f"usb{i}", DEMOD_USB, 800e3 + 100e3 * i)
               for i in range(2)])
    bank = RadioBank(fs, vfos)
    p = bank.make_params()
    s = bank.init_state()
    names = {DEMOD_NFM: "nfm4", DEMOD_AM: "am2pad4", DEMOD_USB: "usb2pad4"}
    for d, r in bank.radios.items():
        def gstep(pp, ss, xx, _r=r):
            y, ss2 = _r.apply_shared(pp, ss, xx)
            return (y,), ss2
        b, f = ca(gstep, p[d], s[d], x)
        rows[names[d]] = {"B_per_smp": round(b / T, 1),
                          "kflop_per_smp": round(f / T / 1e3, 2)}

    def split(xx):
        return jnp.real(xx), jnp.imag(xx)
    b, f = ca(split, x)
    rows["c64_split"] = {"B_per_smp": round(b / T, 1)}
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
