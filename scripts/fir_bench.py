"""FIR formulation shootout on the real TPU chip.

The streaming FIR is the hottest op (every VFO, every stage).  Candidates:
  conv     — jax.lax.conv_general_dilated (current ops/fir.py path; XLA
             pads the 1-2 feature dims onto the 128-wide MXU → waste)
  toeplitz — y = X_tiles @ H where X_tiles is a [rows, tile+K-1] view and
             H a banded [tile+K-1, tile] tap matrix: dense MXU matmul
  pallas   — hand kernel of the toeplitz formulation

Run: python scripts/fir_bench.py [K ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial


def timeit(fn, x, *args, iters=20):
    """Chain output into input so iterations serialize on-device."""
    out = fn(x, *args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fn(x, *args)
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / iters


def conv_fir(ext, taps):
    from sdrplusplusbrown_tpu.ops.fir import correlate
    K = taps.shape[-1]
    y = correlate(ext, taps)
    # re-extend so the output feeds the next iteration (same shape/dtype)
    return jnp.concatenate([ext[..., :K - 1], y], axis=-1)


def make_toeplitz(taps: np.ndarray, tile: int) -> np.ndarray:
    K = len(taps)
    H = np.zeros((tile + K - 1, tile), taps.dtype)
    for j in range(tile):
        H[j:j + K, j] = taps
    return H


@partial(jax.jit, static_argnums=(2,))
def toeplitz_fir(xr, H, K):
    # xr: [C, 2, T + K - 1] float32 (re/im); H: [tile+K-1, tile]
    tile = H.shape[1]
    C = xr.shape[0]
    T = xr.shape[-1] - (K - 1)
    rows = T // tile
    # windows [C, 2, rows, tile+K-1]
    idx = (np.arange(rows)[:, None] * tile
           + np.arange(tile + K - 1)[None, :])
    w = xr[..., idx]
    y = jnp.einsum("cbrw,wt->cbrt", w, H,
                   preferred_element_type=jnp.float32)
    y = y.reshape(C, 2, T)
    return jnp.concatenate([xr[..., :K - 1], y], axis=-1)


def main():
    Ks = [int(a) for a in sys.argv[1:]] or [64, 128, 256, 512]
    C, T = 8, 1 << 20
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((C, T)) + 1j * rng.standard_normal((C, T))
         ).astype(np.complex64)
    xj = jnp.asarray(x)
    print(f"devices: {jax.devices()}  C={C} T={T}")
    for K in Ks:
        taps = rng.standard_normal(K).astype(np.float32)
        ext = jnp.concatenate(
            [jnp.zeros((C, K - 1), jnp.complex64), xj], axis=-1)
        t_conv = timeit(jax.jit(conv_fir), ext, jnp.asarray(taps))

        tile = 512
        H = jnp.asarray(make_toeplitz(taps, tile))
        xr = jnp.stack([jnp.real(ext), jnp.imag(ext)], axis=1)
        t_toep = timeit(lambda a, b: toeplitz_fir(a, b, K), xr, H)

        flops = 2 * 2 * C * T * K        # 2 real streams × madd
        print(f"K={K:4d}  conv {t_conv*1e3:7.2f} ms "
              f"({flops/t_conv/1e12:6.2f} Tflop/s)   "
              f"toeplitz {t_toep*1e3:7.2f} ms "
              f"({flops/t_toep/1e12:6.2f} Tflop/s eff, "
              f"{flops*(tile+K-1)/K/tile/t_toep/1e12:6.2f} raw)")


if __name__ == "__main__":
    main()
