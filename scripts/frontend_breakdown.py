"""Stage-level HBM byte breakdown inside the shared WFM-8 front end."""

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
    x = jnp.asarray((rng.standard_normal(T) + 1j * rng.standard_normal(T))
                    .astype(np.complex64) * 0.1)
    offsets = np.linspace(-1.0e6, 1.0e6, C)
    params = radio.make_params_shared(offsets)
    state = radio.init_state_shared(C)
    vs = radio._build_vfo_shared()

    rows = {}
    st = state["vfo"]
    p = params["vfo"]

    y, _ = jax.eval_shape(lambda pp, ss, xx: vs.fused.apply(pp, ss, xx),
                          p["fused"], st["fused"], x)
    rows["fused(mix+decim)"] = ca(
        lambda pp, ss, xx: vs.fused.apply(pp, ss, xx),
        p["fused"], st["fused"], x) / T
    cur = jnp.zeros(y.shape, y.dtype)
    print("# fused out:", y.shape, y.dtype, file=sys.stderr)

    for i, (blk, s) in enumerate(zip(vs.rest_decim, st["rest_decim"])):
        rows[f"rest_decim[{i}] K={blk.K} D={blk.decim}"] = ca(
            lambda ss, xx, b=blk: b.apply(None, ss, xx), s, cur) / T
        yy, _ = jax.eval_shape(lambda ss, xx, b=blk: b.apply(None, ss, xx),
                               s, cur)
        cur = jnp.zeros(yy.shape, yy.dtype)
        print(f"# rest_decim[{i}] out:", yy.shape, file=sys.stderr)

    for n, b in vs.rest:
        rows[f"rest:{n}"] = ca(
            lambda ss, xx, bb=b: bb.apply(None, ss, xx), st[n], cur) / T
        yy, _ = jax.eval_shape(lambda ss, xx, bb=b: bb.apply(None, ss, xx),
                               st[n], cur)
        cur = jnp.zeros(yy.shape, yy.dtype)
        print(f"# rest:{n} out:", yy.shape, file=sys.stderr)

    if vs.filter_needed:
        rows["bw_fir K=%d" % vs.base.fir.K] = ca(
            lambda ss, xx: vs.base.fir.apply(None, ss, xx),
            st["fir"], cur) / T
        yy, _ = jax.eval_shape(
            lambda ss, xx: vs.base.fir.apply(None, ss, xx), st["fir"], cur)
        print("# bw_fir out:", yy.shape, file=sys.stderr)

    rows["sum"] = sum(v for k, v in rows.items())
    print(json.dumps({k: round(v, 1) for k, v in rows.items()}))


if __name__ == "__main__":
    main()
