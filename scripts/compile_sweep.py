"""TPU compile sweep over every pallas kernel family (VERDICT r2 item 6).

The equality tests exercise the kernels in interpret mode on CPU; the
four bench configs compile only their own shapes on the real chip.
Mosaic's layout rules (lane alignment, scoped-VMEM, concat offsets) can
reject OTHER shapes at compile time, so this sweep lowers + compiles a
representative grid of every kernel variant on the attached TPU and
reports pass/fail per config.  Compile errors surface fine through the
axon tunnel (docs/benchmarks.md), so a green sweep is a real guarantee.

Run: python scripts/compile_sweep.py   (or bench.py --compile-sweep)
Exit code = number of failed configs.
"""

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _c(step, *args):
    import jax
    jax.jit(step).lower(*args).compile()


def sweep():
    import jax
    import jax.numpy as jnp
    from sdrplusplusbrown_tpu.ops import taps as taps_mod
    from sdrplusplusbrown_tpu.ops.pallas_fir import (
        fir_apply, fir_decim_apply_any, fir_cplx_apply_any,
        cplx_pallas_ok, poly_resample_apply_any, poly_pallas_ok,
        fused_mix_decim_apply)
    from sdrplusplusbrown_tpu.ops.pallas_fft import fft_power_db_planes
    from sdrplusplusbrown_tpu.ops.pallas_wfm import wfm_stereo_apply
    from sdrplusplusbrown_tpu.ops.resampler import (PolyphaseResampler,
                                                    fold_output_fir)
    from sdrplusplusbrown_tpu.ops.recurrence import Deemphasis

    rng = np.random.default_rng(0)
    cases = []

    def case(name, fn):
        cases.append((name, fn))

    # ---- real-tap FIR / decim --------------------------------------------
    for K in (17, 65, 129, 400):
        def f(K=K):
            taps = np.hanning(K).astype(np.float32)
            xp = jnp.zeros((2, 1024 + 8192), jnp.float32)
            _c(lambda a: fir_apply(a, taps), xp)
        case(f"fir_apply K={K}", f)
    for D in (2, 4):
        for C in (2, 8, 32):
            def f(D=D, C=C):
                taps = np.hanning(99).astype(np.float32)
                x = jnp.zeros((C, 32768 + 98), jnp.complex64)
                _c(lambda a: fir_decim_apply_any(a, taps, D), x)
            case(f"fir_decim D={D} C={C}", f)

    # ---- complex-tap banded ----------------------------------------------
    for K, D, B in ((63, 1, 1), (63, 2, 8), (633, 1, 1), (633, 1, 8)):
        def f(K=K, D=D, B=B):
            t = cplx_pallas_ok(K, D, batch=B, m_out=4096)
            assert t is not None, "tile solver rejected"
            h = (np.hanning(K) * np.exp(1j * 0.2 * np.arange(K))
                 ).astype(np.complex64)
            x = jnp.zeros((B, 4096 * D + K - 1), jnp.complex64)
            _c(lambda a: fir_cplx_apply_any(a, h, D, tile=t), x)
        case(f"fir_cplx K={K} D={D} B={B}", f)

    # ---- polyphase banded (incl. the folded-deemph audio ratios) --------
    for I, M, B in ((5, 6, 4), (24, 25, 8), (96, 125, 1), (3, 5, 2),
                    (48, 125, 16)):
        def f(I=I, M=M, B=B):
            proto = taps_mod.low_pass(0.4 / max(I, M), 0.1 / max(I, M),
                                      1.0) * I
            pr = PolyphaseResampler(I, M, proto)
            if (I, M) == (48, 125):  # the WFM AF path ships deemph-folded
                d = Deemphasis(50e-6, 48000.0)
                pr = fold_output_fir(pr, d.impulse())
            kw = pr.kernel.shape[1]
            mo = (M * 256) // M
            cfg = poly_pallas_ok(I, M, kw, m_out=mo, batch=B)
            assert cfg is not None, "poly solver rejected"
            mt, roll = cfg
            x = jnp.zeros((B, M * 256 + pr.tpp - 1), jnp.float32)
            _c(lambda a: poly_resample_apply_any(
                a, pr.kernel, I, M, mt=mt, use_roll=roll), x)
        case(f"poly I/M={I}/{M} B={B}", f)

    # ---- fused mix + decim ------------------------------------------------
    for C, K, D in ((8, 27, 2), (32, 27, 4)):
        def f(C=C, K=K, D=D):
            g = np.zeros((2 * C, 2 * K), np.float32)
            x = jnp.zeros((16384 * 1 + K - 1,), jnp.complex64)
            _c(lambda a: fused_mix_decim_apply(a, jnp.asarray(g), D), x)
        case(f"fused_mix C={C} D={D}", f)

    # ---- FFT power kernel (1024/4096 exercise the N1<128 natural-order
    # regroup; 65536+ the direct square write) ------------------------------
    for N in (1024, 4096, 65536, 262144):
        def f(N=N):
            F = 2
            xr = jnp.zeros((F, N), jnp.float32)
            w = np.hanning(N).astype(np.float32)
            _c(lambda a, b: fft_power_db_planes(a, b, N, window=w),
               xr, xr)
        case(f"fft_power N={N}", f)

    # ---- WFM stereo standalone --------------------------------------------
    def f_stereo():
        from sdrplusplusbrown_tpu.ops.wfm import BroadcastFM
        dem = BroadcastFM(75e3, 500e3, stereo=True, pll_mode="normalize")
        K = len(dem.pilot_taps)
        x = jnp.zeros((8, K + 8192), jnp.float32)
        _c(lambda a: wfm_stereo_apply(a, dem.pilot_taps,
                                      dem.pilot_phase_corr,
                                      dem.lpr_delay.delay), x)
    case("wfm_stereo C=8", f_stereo)

    # ---- whole pipelines at several channel counts -------------------------
    from sdrplusplusbrown_tpu.models.radio import (Radio, DEMOD_WFM,
                                                   DEMOD_NFM)

    for C in (4, 8, 16):
        def f(C=C):
            radio = Radio(2_400_000.0, DEMOD_WFM, pll_mode="normalize")
            g = radio.in_multiple
            T = ((240_000 + g - 1) // g) * g
            params = radio.make_params_shared(
                np.linspace(-1e6, 1e6, C))
            state = radio.init_state_shared(C)
            x = jnp.zeros(T, jnp.complex64)
            _c(lambda p, s, xx: radio.apply_shared(p, s, xx),
               params, state, x)
        case(f"apply_shared WFM C={C}", f)

    for C in (16, 64, 128, 256):
        def f(C=C):
            radio = Radio(2_400_000.0, DEMOD_NFM, squelch_enabled=True,
                          pll_mode="normalize")
            g = radio.in_multiple
            T = ((48 * 2500 + g - 1) // g) * g
            params = radio.make_params_channelized(
                np.linspace(-1.0e6, 1.0e6, C), squelch_level=-30.0)
            state = radio.init_state_channelized(C)
            x = jnp.zeros(T, jnp.complex64)
            _c(lambda p, s, xx: radio.apply_channelized(p, s, xx),
               params, state, x)
        case(f"apply_channelized NFM C={C}", f)

    # ---- in-kernel-framed spectrum (aligned DMA + rectangular 4-step) ----
    for N, keep, iv in ((65536, 65536, 120000), (4096, 3968, 6016),
                        (1024, 1024, 2048)):
        def f(N=N, keep=keep, iv=iv):
            from sdrplusplusbrown_tpu.ops.pallas_fft import (
                spectrum_frames_db)
            n_fr = 2
            T = ((n_fr * iv + 1023 + keep) // 128 + 1) * 128
            w = np.hanning(keep).astype(np.float32)
            xp = jnp.zeros((T,), jnp.float32)
            _c(lambda a, b: spectrum_frames_db(a, b, keep, iv, N,
                                               -300.0, w), xp, xp)
        case(f"fft_frames N={N} keep={keep}", f)

    # ---- the EXACT bench.py step functions (VERDICT r3 item 2a) ------------
    # spectrum-lcm block lengths and all: "sweep green" must imply
    # "bench compiles".  Imported from bench so the configs can never
    # drift apart.
    import bench as bench_mod

    for name in ("wfm8", "channelizer64", "multimode8", "scanner128",
                 "scanner256"):
        def f(name=name):
            step, params, state, x, T = bench_mod.BUILDERS[name]()
            _c(step, params, state, x)
        case(f"bench {name}", f)

    # ---- sharded channelized pipeline under Mosaic (r3 item 2b) ------------
    # a 1x1 device mesh on the attached chip: shard_map still lowers the
    # per-shard pallas kernels (PFB + post-channelizer + demod) through
    # Mosaic with the halo/relay plumbing in place, which interpret-mode
    # CPU tests cannot guarantee.
    def f_sharded():
        from jax.sharding import Mesh
        from sdrplusplusbrown_tpu.models.radio import Radio
        from sdrplusplusbrown_tpu.parallel.chan_time import (
            ShardedChannelizedPipeline)
        mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1),
                    ("time", "ch"))
        radio = Radio(2_400_000.0, DEMOD_NFM, squelch_enabled=True,
                      pll_mode="normalize")
        g = ShardedChannelizedPipeline.granularity(radio)
        t_local = ((48_000 + g - 1) // g) * g
        pipe = ShardedChannelizedPipeline(
            2_400_000.0, mesh, 64, t_local, DEMOD_NFM,
            squelch_enabled=True)
        params = pipe.make_params(np.linspace(-1.0e6, 1.0e6, 64))
        carry = pipe.init_carry()
        x = jnp.zeros((pipe.t_global,), jnp.complex64)
        _c(lambda p, c, xx: pipe.step(p, c, xx), params, carry, x)
    case("sharded_chan C=64 1x1", f_sharded)

    def f_sharded_wfm():
        from jax.sharding import Mesh
        from sdrplusplusbrown_tpu.models.radio import Radio, DEMOD_WFM
        from sdrplusplusbrown_tpu.parallel.chan_time import (
            ShardedChannelizedPipeline)
        mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1),
                    ("time", "ch"))
        fs = 8_000_000.0
        radio = Radio(fs, DEMOD_WFM, pll_mode="normalize",
                      squelch_enabled=False)
        g = ShardedChannelizedPipeline.granularity(radio)
        t_local = ((40_000 + g - 1) // g) * g
        pipe = ShardedChannelizedPipeline(
            fs, mesh, 16, t_local, DEMOD_WFM, squelch_enabled=False)
        params = pipe.make_params(np.linspace(-3.4e6, 3.4e6, 16))
        carry = pipe.init_carry()
        x = jnp.zeros((pipe.t_global,), jnp.complex64)
        _c(lambda p, c, xx: pipe.step(p, c, xx), params, carry, x)
    case("sharded_chan WFM-stereo 1x1", f_sharded_wfm)

    # ---- run ----------------------------------------------------------------
    fails = []
    for name, fn in cases:
        t0 = time.perf_counter()
        try:
            fn()
            status = "ok"
        except Exception as e:
            status = f"FAIL: {type(e).__name__}: {str(e)[:120]}"
            fails.append((name, traceback.format_exc(limit=3)))
        print(f"{name:34s} {status}  ({time.perf_counter()-t0:.1f}s)",
              flush=True)
    print(f"\n{len(cases) - len(fails)}/{len(cases)} configs compiled")
    for name, tb in fails:
        print(f"--- {name} ---\n{tb}", file=sys.stderr)
    return len(fails)


if __name__ == "__main__":
    sys.exit(sweep())
