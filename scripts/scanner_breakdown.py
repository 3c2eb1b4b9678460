"""Per-stage HBM byte breakdown of the channelized scanner chain.

Compiles each stage of Radio.apply_channelized (C NFM channels over the
PFB front end) separately on the TPU and prints cost_analysis
bytes/input-sample, so the next optimization target is chosen on data
(device time is unobservable through the axon tunnel —
docs/benchmarks.md).
"""

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
    from sdrplusplusbrown_tpu.models.radio import Radio, DEMOD_NFM

    C = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    fs = 2_400_000.0
    radio = Radio(fs, DEMOD_NFM, squelch_enabled=True,
                  pll_mode="normalize")
    g = radio.in_multiple
    T = int(((240_000 + g - 1) // g) * g)
    rng = np.random.default_rng(3)
    x = jnp.asarray((rng.standard_normal(T) + 1j * rng.standard_normal(T))
                    .astype(np.complex64) * 0.1)
    offs = np.linspace(-1.1e6, 1.1e6, C) + 917.0
    params = radio.make_params_channelized(offs)
    state = radio.init_state_channelized(C)

    bank = radio._vfo_channelized
    pz = bank._pallas_chz(False)
    pipe = bank._chan_pipe(C)
    Tb = 2 * T // bank.M
    pad_to = pipe._plan(Tb)["Tb_pad"]

    rows = {}

    def full(params, state, xw):
        audio, st = radio.apply_channelized(params, state, xw)
        return audio, st
    b, f = ca(full, params, state, x)
    rows["full_chain"] = b / T

    # channelizer kernel incl. hop-major glue
    def chz_full(st, xw):
        return pz.apply(st, xw, pad_to)
    b, f = ca(chz_full, state["vfo"]["chz"], x)
    rows["pfb_kernel+glue"] = b / T

    # pair-major layout glue only (state->xw, concat, planes, transpose)
    def glue(st, xw):
        xwid = pz._state_to_xw(st)
        ext = jnp.concatenate([xwid, xw])
        n_super = pad_to // pz.NF
        CL = (n_super + 1) * (pz.NF // 2)
        pad = CL * pz.M - ext.shape[-1]
        extp = jnp.pad(ext, (0, pad)) if pad > 0 else ext
        return (jnp.real(extp).reshape(CL, pz.M).T,
                jnp.imag(extp).reshape(CL, pz.M).T)
    b, f = ca(glue, state["vfo"]["chz"], x)
    rows["pair_major_glue"] = b / T

    # post-channelizer kernel (bins -> IF planes) alone
    bins, chz_st = jax.eval_shape(lambda s, xx: pz.apply(s, xx, pad_to),
                                  state["vfo"]["chz"], x)
    binsv = jnp.zeros(bins.shape, bins.dtype)

    def post(params, st, bins):
        return pipe.apply(params, dict(st), bins, return_planes=True,
                          Tb=Tb, raw=True)
    b, f = ca(post, params["vfo"], state["vfo"], binsv)
    rows["post_chz_kernel"] = b / T

    # demod tail: full minus (pfb+post) is glue; also compile demod alone
    def fe_only(params, state, xw):
        out = bank.apply_fused(params["vfo"], state["vfo"], xw,
                               return_planes=True, raw=True)
        return out
    b, f = ca(fe_only, params, state, x)
    rows["front_end_total"] = b / T
    rows["demod+audio+glue"] = rows["full_chain"] - rows["front_end_total"]

    for k, v in rows.items():
        print(f"{k:24s} {v:9.1f} B/in-sample")


if __name__ == "__main__":
    main()
