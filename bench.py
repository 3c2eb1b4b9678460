"""Throughput benchmark: IQ Msamples/s/chip through the full
xlate→resample→FIR→demod chain plus the FFT spectrum path.

Config 2 of BASELINE.md's build targets: 8 parallel WFM-stereo VFOs on one
2.4 MS/s wideband capture, with the 65536-bin/20 fps spectrum branch
running alongside (reference defaults, core/src/core.cpp:559-561).
``vs_baseline`` is the multiple of the real-time requirement (2.4 MS/s):
the reference is a real-time app, so 1.0 = "keeps up with the antenna";
higher = how many such receivers one chip could serve.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def bench_channelizer():
    """BASELINE config 4: 10 MS/s wideband → 64 polyphase channels →
    per-channel FFT spectra."""
    import jax
    import jax.numpy as jnp
    from sdrplusplusbrown_tpu.ops.channelizer import PolyphaseChannelizer

    fs = 10_000_000.0
    M = 64
    ch = PolyphaseChannelizer(fs, M)
    T = 1 << 21
    rng = np.random.default_rng(1)
    x = (rng.standard_normal(T) + 1j * rng.standard_normal(T)
         ).astype(np.complex64) * 0.1

    def step(state, xw):
        y, state = ch.apply(None, state, xw)
        spec = jnp.abs(jnp.fft.fft(
            y.reshape(M, -1, 1024), axis=-1)) ** 2
        return state, spec

    fn = jax.jit(step, donate_argnums=(0,))
    st = ch.init_state(())
    xd = jax.device_put(jnp.asarray(x))
    st, spec = fn(st, xd)
    jax.block_until_ready(spec)
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        st, spec = fn(st, xd)
    jax.block_until_ready((st, spec))
    dt = time.perf_counter() - t0
    return T * iters / dt / 1e6


def bench_multimode():
    """BASELINE config 2: NFM+AM+SSB multi-mode, 8 VFOs, 2.4 MS/s."""
    import jax
    import jax.numpy as jnp
    from sdrplusplusbrown_tpu.models.radio_bank import RadioBank, VFOSpec
    from sdrplusplusbrown_tpu.models.radio import (DEMOD_NFM, DEMOD_AM,
                                                   DEMOD_USB)

    fs = 2_400_000.0
    vfos = ([VFOSpec(f"nfm{i}", DEMOD_NFM, -900e3 + 300e3 * i)
             for i in range(4)]
            + [VFOSpec(f"am{i}", DEMOD_AM, 300e3 + 200e3 * i)
               for i in range(2)]
            + [VFOSpec(f"usb{i}", DEMOD_USB, 800e3 + 100e3 * i)
               for i in range(2)])
    bank = RadioBank(fs, vfos)
    g = bank.in_multiple
    T = int(((240_000 + g - 1) // g) * g)
    rng = np.random.default_rng(2)
    x = (rng.standard_normal(T) + 1j * rng.standard_normal(T)
         ).astype(np.complex64) * 0.1
    params = bank.make_params()
    state = bank.init_state()
    fn = jax.jit(lambda p, s, xw: bank.apply(p, s, xw),
                 donate_argnums=(1,))
    xd = jax.device_put(jnp.asarray(x))
    outs, state = fn(params, state, xd)
    jax.block_until_ready(outs)
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        outs, state = fn(params, state, xd)
    jax.block_until_ready((outs, state))
    dt = time.perf_counter() - t0
    return T * iters / dt / 1e6


def main():
    import jax
    import jax.numpy as jnp
    from sdrplusplusbrown_tpu.models.radio import Radio, DEMOD_WFM
    from sdrplusplusbrown_tpu.ops.spectrum import SpectrumPath
    from sdrplusplusbrown_tpu.ops import fir as fir_mod

    for a in sys.argv[1:]:
        if a.startswith("--fir="):
            fir_mod.set_fir_backend(a.split("=", 1)[1])

    fs = 2_400_000.0
    C = 8
    radio = Radio(fs, DEMOD_WFM, pll_mode="normalize")
    spectrum = SpectrumPath(fs, fft_size=65536, fft_rate=20.0)
    g = np.lcm(radio.in_multiple, spectrum.in_multiple)
    T = int(((240_000 + g - 1) // g) * g)       # ~0.1 s of IQ per step

    rng = np.random.default_rng(0)
    x = (rng.standard_normal(T) + 1j * rng.standard_normal(T)) \
        .astype(np.complex64) * 0.1

    offsets = np.linspace(-1.0e6, 1.0e6, C)
    params = radio.make_params(offsets)
    state = radio.init_state((C,))

    def step(params, state, xw):
        spectra, _ = spectrum.apply(None, None, xw)
        xb = jnp.broadcast_to(xw[None, :], (C, T))
        audio, new_state = radio.apply(params, state, xb)
        return audio, spectra, new_state

    fn = jax.jit(step, donate_argnums=(1,))
    xd = jax.device_put(jnp.asarray(x))

    # warmup / compile
    audio, spectra, state = fn(params, state, xd)
    jax.block_until_ready((audio, spectra))
    audio, spectra, state = fn(params, state, xd)
    jax.block_until_ready((audio, spectra))

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        audio, spectra, state = fn(params, state, xd)
    jax.block_until_ready((audio, spectra))
    dt = time.perf_counter() - t0

    msps = (T * iters) / dt / 1e6
    out = {
        "metric": "wfm8_vfo_chain_iq_throughput",
        "value": round(msps, 3),
        "unit": "Msamples/s/chip",
        "vs_baseline": round(msps / 2.4, 2),
    }
    if "--all" in sys.argv:
        out["details"] = {
            "channelizer64_10msps_fft": round(bench_channelizer(), 1),
            "multimode8_2p4msps": round(bench_multimode(), 1),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
