"""Pick the stride-1 FIR backend from the TPU-compiled executables'
cost_analysis (device time is unobservable through the axon tunnel —
docs/benchmarks.md — so the decision metric is XLA's own flop + HBM byte
counts per backend, i.e. the roofline bound of the code that would run).

Run on the real TPU:  python scripts/fir_backend_choice.py
Results recorded in docs/fir_backend.md.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

PEAK_FLOPS, PEAK_BW = 197e12, 819e9      # v5e bf16 / HBM


def measure(backend: str, C: int, T: int, K: int):
    from sdrplusplusbrown_tpu.ops import fir as fir_mod
    fir_mod.set_fir_backend(backend)
    taps = np.hanning(K)
    blk = fir_mod.FIR(taps)
    x = jnp.zeros((C, T), jnp.complex64)
    st = blk.init_state((C,))
    comp = jax.jit(lambda s, xx: blk.apply(None, s, xx)) \
        .lower(st, x).compile()
    ca = comp.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    bytes_ = float(ca.get("bytes accessed", 0.0))
    bound = max(flops / PEAK_FLOPS, bytes_ / PEAK_BW)
    return {"backend": backend, "C": C, "T": T, "K": K,
            "flops": flops, "bytes": bytes_,
            "bound_us": bound * 1e6,
            "bound_msps": C * T / bound / 1e6,
            "bound_by": "hbm" if bytes_ / PEAK_BW >= flops / PEAK_FLOPS
            else "mxu"}


def main():
    rows = []
    for C, T, K in ((8, 1 << 18, 301),     # WFM audio FIR shape
                    (8, 1 << 18, 63),      # short channel FIR
                    (1, 1 << 20, 1583),    # VOR subcarrier FIR shape
                    (256, 1 << 14, 301)):  # scanner bank shape
        for backend in ("conv", "toeplitz", "pallas"):
            try:
                r = measure(backend, C, T, K)
            except Exception as e:  # noqa: BLE001
                r = {"backend": backend, "C": C, "T": T, "K": K,
                     "error": repr(e)[:120]}
            rows.append(r)
            print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
