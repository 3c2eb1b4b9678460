"""Application shell: config, sources, radio module instances, sinks, and
the streaming loop — the headless analog of the reference's
core.cpp/MainWindow wiring (reference: core/src/core.cpp:437-912,
gui/main_window.cpp:104-248) driven entirely through the HTTP control
plane (server/http_server.py).
"""

from __future__ import annotations

import json
import math
import os
import threading
import time
from typing import Dict, Optional

import numpy as np

from .utils.config import ConfigManager
from .utils.flog import flog
from .utils.event import Event
from .models.iq_frontend import IQFrontEnd
from .models.radio import (Radio, DEMOD_NAMES, DEMOD_IDS, DEMOD_IF_RATES)
from .ops.spectrum import calculate_vfo_signal_info
from .io.file_source import FileSource
from .io.recorder import WavRecorder
from .runtime.pump import Rechunker

# reference demodulators/*.h getMinBandwidth/getMaxBandwidth
DEMOD_BW_LIMITS = {
    0: (1000.0, 50_000.0),     # NFM: max = IF rate
    1: (50_000.0, 500_000.0),  # WFM
    2: (1000.0, 15_000.0),     # AM
    3: (1000.0, 12_000.0),     # DSB: IF/2
    4: (500.0, 12_000.0),      # USB
    5: (50.0, 500.0),          # CW
    6: (500.0, 12_000.0),      # LSB
    7: (48_000.0, 48_000.0),   # RAW
}

DEFAULT_CONFIG = {
    "version": 1,
    "frequency": 100_000_000.0,
    "source": {"type": "none", "path": "", "samplerate": 1_000_000.0},
    "fftSize": 65536,
    "fftRate": 20,
    "fftWindow": "nuttall",
    "decimation": 1,
    "dcBlocking": False,
    "invertIQ": False,
    "modules": {},
    "sinks": {},
    "streamVolumes": {},
}

SPECTRUM_BUF_SIZE = 16384  # IF spectrum ring (reference radio_module.h:78)


class ModuleComManager:
    """String-keyed cross-module interface registry
    (reference: core/src/module_com.h:13-25 — modules publish duck-typed
    interfaces other modules look up by name)."""

    def __init__(self):
        self._interfaces: Dict[str, object] = {}

    def register_interface(self, name: str, obj) -> bool:
        if name in self._interfaces:
            return False
        self._interfaces[name] = obj
        return True

    def unregister_interface(self, name: str):
        self._interfaces.pop(name, None)

    def interface_exists(self, name: str) -> bool:
        return name in self._interfaces

    def get_interface(self, name: str):
        return self._interfaces.get(name)


class ModuleInstance:
    """reference: ModuleManager::Instance (core/src/module.h:35-52)."""

    def __init__(self, name: str):
        self.name = name
        self._enabled = True

    def post_init(self):
        pass

    def enable(self):
        self._enabled = True

    def disable(self):
        self._enabled = False

    def is_enabled(self) -> bool:
        return self._enabled

    def module_type(self) -> str:
        return "unknown"

    def shutdown(self):
        pass

    def handle_debug_command(self, cmd: str, args: str) -> dict:
        return {"error": f"unknown command: {cmd}"}


class RadioModuleInstance(ModuleInstance):
    """The demodulation app module (reference decoder_modules/radio)."""

    def __init__(self, name: str, app: "SDRApp", demod: str = "WFM",
                 offset_hz: float = 0.0, bandwidth: Optional[float] = None,
                 rds: bool = False):
        super().__init__(name)
        self.app = app
        self._mtx = threading.RLock()
        self.rds_enabled = bool(rds)
        self.rds_demod = None
        self.rds_state = None
        self.rds_decoder = None
        # IF chain flags (reference radio_module.h:92-98)
        self.nb_enabled = False
        self.fmif_enabled = False
        self.squelch_level = -100.0
        self.volume = 1.0
        self.muted = False
        from .utils.metrics import PeakLevelMeter
        self.level_meter = PeakLevelMeter()
        # audio NR (reference AFNRLogMMSE / AFNR_OMLSA_MCRA toggles,
        # noise_reduction_logmmse/src/{af_nr.h,omlsa_mcra.h})
        self.afnr_mode = "off"            # off | logmmse | omlsa
        self.afnr = None
        self.afnr_state = None
        self.afnr_step = None
        self._afnr_buf = np.zeros((2, 0), np.float32)
        self._afnr_primed = False
        self.offset_hz = float(offset_hz)
        self.demod_id = DEMOD_IDS.get(demod.upper(), demod) \
            if isinstance(demod, str) else int(demod)
        self.bandwidth = bandwidth
        self.radio: Optional[Radio] = None
        self.state = None
        self.params = None
        self.spectrum_ring = np.zeros(SPECTRUM_BUF_SIZE, np.complex64)
        self.audio_event: Event = Event()
        self.last_switch_us = 0.0
        self._build()

    def module_type(self) -> str:
        return "radio"

    def _build(self, migrate: bool = False):
        """(Re)build the jitted pipeline.  With ``migrate=True`` the
        carried DSP state (filter tails, NCO/PLL/AGC) survives the
        reconfiguration via runtime.migrate resize rules — the
        reference's click-free retune (fir.h:33-54,
        radio_module.h:655-774)."""
        import jax
        from .runtime.migrate import migrate_state
        t0 = time.perf_counter()
        with self._mtx:
            old_state = self.state if migrate else None
            old_rds_state = self.rds_state if migrate else None
            use_rds = self.rds_enabled and self.demod_id == 1  # WFM only
            radio = Radio(self.app.samplerate, self.demod_id,
                          bandwidth=self.bandwidth,
                          offset_hz=self.offset_hz,
                          squelch_enabled=True,
                          squelch_level=self.squelch_level,
                          nb_enabled=self.nb_enabled,
                          fmif_enabled=self.fmif_enabled, rds=use_rds)
            self.radio = radio
            self.state = migrate_state(old_state, radio.init_state(()))
            self.params = radio.make_params(self.offset_hz)
            self.bandwidth = radio.bandwidth
            self.jit_step = jax.jit(
                lambda p, s, x: radio.apply(p, s, x))
            if use_rds:
                from .models.rds import RDSDemod, RDSDecoder
                self.rds_demod = RDSDemod()
                self.rds_state = migrate_state(
                    old_rds_state, self.rds_demod.init_state(()))
                self.rds_decoder = RDSDecoder()
                self.rds_step = jax.jit(
                    lambda s, x: self.rds_demod.apply(None, s, x))
            else:
                self.rds_demod = None
                self.rds_state = None
                self.rds_decoder = None
        self.last_switch_us = (time.perf_counter() - t0) * 1e6
        # reference logs demod-switch latency in µs (radio_module.h:474)
        flog.info("Radio[{}]: demod {} ready in {:.0f} us", self.name,
                  self.radio.demod_name, self.last_switch_us)
        self.app.invalidate_pipeline()

    def set_offset(self, offset_hz: float):
        self.offset_hz = float(offset_hz)
        # keep the runtime squelch level across retunes
        self.params = self.radio.make_params(
            self.offset_hz, squelch_level=self.squelch_level)

    def set_bandwidth(self, bandwidth_hz: float):
        self.bandwidth = float(bandwidth_hz)
        self._build(migrate=True)

    def select_demod(self, demod_id):
        """int id or provider name (plugin demods register via
        models.radio.register_demod_provider)."""
        old = (self.demod_id, self.bandwidth)
        self.demod_id = int(demod_id) if not isinstance(demod_id, str) \
            else demod_id
        self.bandwidth = None  # take the new demod's default
        try:
            self._build(migrate=True)
        except Exception:
            # keep the module consistent on a bad demod id
            self.demod_id, self.bandwidth = old
            self._build()
            raise

    def _afnr_process(self, audio: np.ndarray) -> np.ndarray:
        """Run the selected audio NR with its own block alignment; output
        lags by the buffered remainder (like the reference's worker
        accumulation, af_nr.h:290-340)."""
        import jax.numpy as jnp
        nr = self.afnr
        if nr is None:
            return audio
        self._afnr_buf = np.concatenate([self._afnr_buf, audio], axis=-1)
        core = getattr(nr, "core", None)
        if core is not None and not self._afnr_primed:
            need = core.NOISE_FRAMES * core.Slen
            if self._afnr_buf.shape[-1] < need:
                return np.zeros((2, 0), np.float32)
            self.afnr_state = {
                **self.afnr_state,
                **nr.prime({k: v for k, v in self.afnr_state.items()},
                           jnp.asarray(self._afnr_buf[..., :need]
                                       .astype(np.complex64)))}
            self._afnr_primed = True
        g = nr.in_multiple
        n = (self._afnr_buf.shape[-1] // g) * g
        if n == 0:
            return np.zeros((2, 0), np.float32)
        blk, self._afnr_buf = (self._afnr_buf[..., :n],
                               self._afnr_buf[..., n:])
        x = blk.astype(np.complex64) if core is not None \
            else blk.astype(np.float32)
        y, self.afnr_state = self.afnr_step(self.afnr_state,
                                            jnp.asarray(x))
        out = np.asarray(y)
        return np.real(out).astype(np.float32) if np.iscomplexobj(out) \
            else out

    def push_if_spectrum(self, iq_block: np.ndarray):
        n = min(len(iq_block), SPECTRUM_BUF_SIZE)
        self.spectrum_ring = np.roll(self.spectrum_ring, -n)
        self.spectrum_ring[-n:] = iq_block[-n:]

    # ------------------------------------------------------------------
    def handle_debug_command(self, cmd: str, args: str) -> dict:
        if cmd in ("set_demod", "set_demodulator"):
            from .models.radio import DEMOD_PROVIDERS
            name = args.strip().upper()
            if name in DEMOD_IDS:
                self.select_demod(DEMOD_IDS[name])
                return {"status": "ok", "demod": name,
                        "id": DEMOD_IDS[name]}
            if name in DEMOD_PROVIDERS:
                self.select_demod(name)
                return {"status": "ok", "demod": name, "id": -1}
            try:
                did = int(args)
                self.select_demod(did)
                return {"status": "ok", "demod": DEMOD_NAMES[did],
                        "id": did}
            except (ValueError, IndexError, KeyError):
                return {"error": f"unknown demod '{args}'"}
        if cmd == "set_vfo_bandwidth":
            try:
                self.set_bandwidth(float(args))
                return {"status": "ok", "bandwidth": self.bandwidth}
            except ValueError:
                return {"error": f"bad bandwidth '{args}'"}
        if cmd == "get_demod":
            return {"demod": self.radio.demod_name,
                    "id": -1 if self.demod_id is None else self.demod_id}
        if cmd == "list_demods":
            from .models.radio import DEMOD_PROVIDERS
            demods = [{"name": n, "id": i}
                      for i, n in enumerate(DEMOD_NAMES)]
            demods += [{"name": n, "id": -1}
                       for n in sorted(DEMOD_PROVIDERS)]
            return {"radio": self.name, "demods": demods}
        if cmd == "get_vfo_bandwidth":
            lo, hi = DEMOD_BW_LIMITS.get(
                self.demod_id, (0.0, self.radio.if_rate))
            return {"vfo_bandwidth": self.bandwidth,
                    "lower_offset": self.offset_hz - self.bandwidth / 2,
                    "upper_offset": self.offset_hz + self.bandwidth / 2,
                    "module_bandwidth": self.bandwidth,
                    "min_bandwidth": lo, "max_bandwidth": hi}
        if cmd == "set_freq":
            try:
                freq = float(args)
            except ValueError:
                return {"error": f"invalid frequency: '{args}'"}
            self.app.tune(freq)
            return {"status": "ok", "frequency": freq}
        if cmd == "set_squelch":
            try:
                self.squelch_level = float(args)
            except ValueError:
                return {"error": f"bad level '{args}'"}
            self.params = self.radio.make_params(
                self.offset_hz, squelch_level=self.squelch_level)
            return {"status": "ok", "level": self.squelch_level}
        if cmd in ("set_nb", "set_fmif"):
            on = args.strip().lower() in ("1", "true", "on")
            if cmd == "set_nb":
                self.nb_enabled = on
            else:
                self.fmif_enabled = on
            self._build()
            return {"status": "ok", cmd[4:]: on}
        if cmd == "set_volume":
            try:
                self.volume = float(args)
                return {"status": "ok", "volume": self.volume}
            except ValueError:
                return {"error": f"bad volume '{args}'"}
        if cmd == "get_level":
            return {"level_db": round(self.level_meter.level_db(), 2)}
        if cmd == "set_afnr":
            import jax
            mode = args.strip().lower() or "off"
            if mode not in ("off", "logmmse", "omlsa"):
                return {"error": f"unknown afnr mode '{args}'"}
            # build outside the module mutex (the pump may be inside a
            # long XLA compile while holding it), swap atomically after
            nr, state, step = None, None, None
            if mode == "omlsa":
                from .ops.omlsa import OMLSA
                nr = OMLSA(self.radio.audio_samplerate)
            elif mode == "logmmse":
                from .ops.logmmse import AFNRLogMMSE
                nr = AFNRLogMMSE(self.radio.audio_samplerate)
            if nr is not None:
                state = nr.init_state((2,))
                step = jax.jit(lambda s, x: nr.apply(None, s, x))
            self.afnr_mode = mode
            self.afnr_state = state
            self.afnr_step = step
            self._afnr_buf = np.zeros((2, 0), np.float32)
            self._afnr_primed = False
            self.afnr = nr
            return {"status": "ok", "afnr": mode}
        if cmd == "get_afnr":
            return {"afnr": self.afnr_mode}
        if cmd == "set_rds":
            self.rds_enabled = args.strip().lower() in ("1", "true", "on")
            self._build()
            return {"status": "ok", "rds": self.rds_enabled}
        if cmd == "get_rds":
            if self.rds_decoder is None:
                return {"error": "rds not enabled"}
            return self.rds_decoder.status()
        if cmd == "get_snr":
            snr = self.app.vfo_snr(self.name)
            return {"snr": snr if snr is not None else -1.0}
        if cmd == "get_spectrum":
            num_buckets = 256
            if "," in args:
                try:
                    num_buckets = int(args.split(",")[1])
                except ValueError:
                    pass
            num_buckets = max(8, min(2048, num_buckets))
            snap = self.spectrum_ring
            n = len(snap)
            win = 0.5 * (1 - np.cos(2 * np.pi * np.arange(n) / (n - 1)))
            power = np.abs(np.fft.fftshift(np.fft.fft(snap * win))) ** 2
            # the ring holds wideband baseband; slice this VFO's passband
            # (the reference rings post-VFO IF samples — same product:
            # "what's inside my passband", radio_module.h:78-89)
            sr = self.app.frontend.effective_sr
            half_span = max(self.bandwidth, sr / num_buckets * 8)
            lo = int((max(self.offset_hz - half_span, -sr / 2) / sr + 0.5)
                     * n)
            hi = int((min(self.offset_hz + half_span, sr / 2) / sr + 0.5)
                     * n)
            seg = power[max(lo, 0):max(hi, 1)]
            if len(seg) < num_buckets:
                seg = np.pad(seg, (0, num_buckets - len(seg)),
                             constant_values=seg.min() if len(seg) else 1e-30)
            maxp = max(float(seg.max()), 1e-30)
            bpb = len(seg) // num_buckets
            avg = seg[:bpb * num_buckets].reshape(num_buckets, bpb).mean(1)
            db = 10 * np.log10(avg / maxp + 1e-10)
            return {"spectrum": [round(float(v), 3) for v in db],
                    "num_buckets": num_buckets, "fft_size": n,
                    "span_hz": 2 * half_span, "max_bin": maxp}
        return super().handle_debug_command(cmd, args)


class SDRApp:
    def __init__(self, root: str, run_pump: bool = True):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self.config = ConfigManager()
        self.config.set_path(os.path.join(root, "config.json"))
        self.config.load(DEFAULT_CONFIG)
        self.config.enable_autosave()

        with self.config.acquire(False) as conf:
            src = conf["source"]
            self.samplerate = float(src.get("samplerate", 1_000_000.0))
            self.frequency = float(conf.get("frequency", 100e6))
            self._fft_size = int(conf.get("fftSize", 65536))
            self._fft_rate = float(conf.get("fftRate", 20))
            self._fft_window = conf.get("fftWindow", "nuttall")
            self._decim = int(conf.get("decimation", 1))
            self._dc = bool(conf.get("dcBlocking", False))
            self._inv = bool(conf.get("invertIQ", False))
            mod_conf = dict(conf.get("modules", {}))
            self.sink_sel = dict(conf.get("sinks", {}))

        self.source = None
        with self.config.acquire(False) as conf:
            src = dict(conf["source"])
        stype = src.get("type")
        if stype == "file" and src.get("path"):
            self.source = FileSource(src["path"],
                                     loop=bool(src.get("loop", True)))
            self.samplerate = self.source.samplerate
            if self.source.center_freq:
                self.frequency = self.source.center_freq
        elif stype == "network":
            # raw UDP/TCP IQ (reference source_modules/network_source)
            from .io.network_source import NetworkSource
            self.source = NetworkSource(
                host=src.get("host", "localhost"),
                port=int(src.get("port", 1234)),
                protocol=src.get("protocol", "udp"),
                sample_type=src.get("sampleType", "int16"),
                samplerate=float(src.get("samplerate", 1_000_000.0)))
            self.samplerate = self.source.samplerate
        elif stype == "rtl_tcp":
            # rtl_tcp protocol client (reference source_modules/rtl_tcp_source)
            from .io.network_source import RtlTcpSource
            self.source = RtlTcpSource(
                host=src.get("host", "localhost"),
                port=int(src.get("port", 1234)),
                samplerate=float(src.get("samplerate", 2_400_000.0)))
            self.samplerate = self.source.samplerate
            self.source.tune(self.frequency)
        elif stype == "spyserver":
            # SpyServer protocol client (reference source_modules/spyserver_source)
            from .io.spyserver_source import SpyServerSource
            self.source = SpyServerSource(
                host=src.get("host", "localhost"),
                port=int(src.get("port", 5555)),
                srate_index=int(src.get("sampleRateId", 0)),
                gain=int(src.get("gain", 0)))
            self.samplerate = self.source.samplerate
            self.source.start_stream(self.frequency)
        elif stype == "kiwisdr":
            # remote KiwiSDR IQ (reference source_modules/kiwisdr_source)
            from .io.kiwisdr_source import KiwiSDRSource
            self.source = KiwiSDRSource(
                host=src.get("host", "localhost"),
                port=int(src.get("port", 8073)),
                freq_hz=self.frequency)
            self.samplerate = self.source.samplerate
        elif stype == "hl2":
            # Hermes Lite 2 TRX (reference source_modules/hl2_source) —
            # also installs itself as the app transmitter below, the way
            # the reference sets sigpath::transmitter (main.cpp).
            from .io.hl2_source import HL2Source
            self.source = HL2Source(
                host=src.get("host", "localhost"),
                port=int(src.get("port", 1024)),
                samplerate=int(src.get("samplerate", 384_000)),
                adc_gain=int(src.get("adcGain", 0)))
            self.samplerate = self.source.samplerate
            self.source.tune(self.frequency)
        elif stype == "sdrpp_server":
            # remote StreamServer (reference source_modules/sdrpp_server_source)
            from .server.stream_client import StreamClient
            self.source = StreamClient(
                src.get("host", "localhost"), int(src.get("port", 5259)),
                password=src.get("password", ""),
                compression=src.get("compression", "none"))
            self.samplerate = float(self.source.samplerate)

        self.frontend = IQFrontEnd(
            self.samplerate, decim_ratio=self._decim, dc_blocking=self._dc,
            invert_iq=self._inv, fft_size=self._fft_size,
            fft_rate=self._fft_rate, fft_window=self._fft_window)

        # optional baseband (IF) noise reduction preprocessor
        # (reference: IFNRLogMMSE registered on the IQ front end,
        # noise_reduction_logmmse/src/main.cpp:165,227-231)
        with self.config.acquire(False) as conf:
            self.ifnr_enabled = bool(conf.get("ifnr", False))
        self.ifnr = None
        self.frontend_nr = None
        self.ifnr_primed = False
        self.ifnr_stop_reason = ""
        if self.ifnr_enabled:
            from .ops.logmmse import IFNRLogMMSE
            self.ifnr = IFNRLogMMSE(self.frontend.effective_sr)
            self.frontend_nr = IQFrontEnd(
                self.samplerate, decim_ratio=self._decim,
                dc_blocking=self._dc, invert_iq=self._inv,
                fft_size=self._fft_size, fft_rate=self._fft_rate,
                fft_window=self._fft_window,
                preprocessors=[("ifnr", self.ifnr)])

        self.baseband_event: Event = Event()
        self.spectrum_event: Event = Event()
        self.module_com = ModuleComManager()
        # sink layer: per-module streams with priority merger + secondary
        # substreams + the StreamHook bus (reference SinkManager, sink.h)
        from .runtime.sink import StreamRegistry
        self.stream_registry = StreamRegistry()

        # TX hardware (reference trx.h; loopback for tests/headless)
        self.transmitter = None
        from .models.trx import Transmitter
        if isinstance(self.source, Transmitter):
            self.transmitter = self.source      # HL2: source IS the TRX
        with self.config.acquire(False) as conf:
            txc = conf.get("transmitter", {})
            if txc.get("type") == "loopback":
                from .models.trx import LoopbackTransmitter
                self.transmitter = LoopbackTransmitter()

        self.modules: Dict[str, ModuleInstance] = {}
        for name, mc in mod_conf.items():
            mtype = mc.get("type", "radio")
            if mtype == "radio":
                self.modules[name] = RadioModuleInstance(
                    name, self, demod=mc.get("demod", "WFM"),
                    offset_hz=mc.get("offset", 0.0),
                    bandwidth=mc.get("bandwidth"),
                    rds=mc.get("rds", False))
            elif mtype == "scanner":
                from .modules.scanner import ScannerModule
                self.modules[name] = ScannerModule(
                    name, self, vfo=mc.get("vfo", "Radio"),
                    **{k: mc[k] for k in
                       ("start_freq", "stop_freq", "interval", "level")
                       if k in mc})
            elif mtype == "frequency_manager":
                from .modules.frequency_manager import FrequencyManagerModule
                self.modules[name] = FrequencyManagerModule(
                    name, self, bookmarks=mc.get("bookmarks"))
            elif mtype == "recorder":
                from .modules.recorder_module import RecorderModule
                self.modules[name] = RecorderModule(
                    name, self, directory=mc.get("directory"))
            elif mtype == "ft8_decoder":
                from .modules.ft8_module import FT8DecoderModule
                self.modules[name] = FT8DecoderModule(
                    name, self, stream=mc.get("stream", "Radio"),
                    decoder_cmd=mc.get("decoder_cmd"),
                    decoder_style=mc.get("decoder_style", "pipe"),
                    mode=mc.get("mode", "FT8"),
                    window_seconds=mc.get("window_seconds", 15.0),
                    my_grid=mc.get("my_grid", ""),
                    psk_upload=mc.get("psk_upload"))
            elif mtype == "iq_exporter":
                from .modules.iq_exporter import IQExporterModule
                self.modules[name] = IQExporterModule(
                    name, self, port=mc.get("port", 0),
                    mode=mc.get("mode", "baseband"),
                    stream=mc.get("stream", "Radio"),
                    pcm=mc.get("pcm", "i16"))
            elif mtype == "scheduler":
                from .modules.scheduler import SchedulerModule
                self.modules[name] = SchedulerModule(name, self)
            elif mtype == "vor_receiver":
                from .modules.vor_module import VORReceiverModule
                self.modules[name] = VORReceiverModule(
                    name, self, offset_hz=mc.get("offset", 0.0),
                    integration_time=mc.get("integration_time", 1.0))
            elif mtype == "ch_tetra_demodulator":
                from .modules.tetra_module import TetraDemodulatorModule
                self.modules[name] = TetraDemodulatorModule(
                    name, self, offset_hz=mc.get("offset", 0.0))
            elif mtype == "ch_extravhf_decoder":
                from .modules.extravhf_module import (
                    ExtraVhfDecoderModule)
                self.modules[name] = ExtraVhfDecoderModule(
                    name, self, offset_hz=mc.get("offset", 0.0))
            elif mtype == "meteor_demodulator":
                from .modules.meteor_module import MeteorDemodulatorModule
                self.modules[name] = MeteorDemodulatorModule(
                    name, self, offset_hz=mc.get("offset", 0.0),
                    symbolrate=mc.get("symbolrate", 72_000.0),
                    broken_modulation=mc.get("broken", False),
                    oqpsk=mc.get("oqpsk", False),
                    directory=mc.get("directory"))
            elif mtype == "m17_decoder":
                from .modules.m17_module import M17DecoderModule
                self.modules[name] = M17DecoderModule(
                    name, self, offset_hz=mc.get("offset", 0.0))
            elif mtype == "tci_server":
                from .modules.tci_module import TCIServerModule
                self.modules[name] = TCIServerModule(
                    name, self, port=mc.get("port", 0),
                    vfo=mc.get("vfo", "Radio"))
            elif mtype == "weather_sat_decoder":
                from .modules.weather_sat_module import \
                    WeatherSatDecoderModule
                self.modules[name] = WeatherSatDecoderModule(
                    name, self, offset_hz=mc.get("offset", 0.0))
            elif mtype == "ryfi_decoder":
                from .modules.ryfi_module import RyfiDecoderModule
                self.modules[name] = RyfiDecoderModule(
                    name, self, offset_hz=mc.get("offset", 0.0),
                    baudrate=mc.get("baudrate", 720_000.0),
                    channel_sr=mc.get("channel_sr", 1_500_000.0))
            elif mtype == "atv_decoder":
                from .modules.atv_module import ATVDecoderModule
                self.modules[name] = ATVDecoderModule(
                    name, self, offset_hz=mc.get("offset", 0.0))
            elif mtype == "falcon9_decoder":
                from .modules.falcon9_module import Falcon9DecoderModule
                self.modules[name] = Falcon9DecoderModule(
                    name, self, offset_hz=mc.get("offset", 0.0))
            elif mtype == "dab_decoder":
                from .modules.dab_module import DABDecoderModule
                self.modules[name] = DABDecoderModule(
                    name, self, offset_hz=mc.get("offset", 0.0))
            elif mtype == "kg_sstv_decoder":
                from .modules.kg_sstv_module import KGSSTVDecoderModule
                self.modules[name] = KGSSTVDecoderModule(
                    name, self, offset_hz=mc.get("offset", 0.0))
            elif mtype == "websdr_view":
                from .modules.websdr_module import WebSDRViewModule
                self.modules[name] = WebSDRViewModule(
                    name, self, receivers=mc.get("receivers"),
                    receive_duration=mc.get("receive_duration", 30.0))
            elif mtype == "reports_monitor":
                from .modules.reports_monitor import ReportsMonitorModule
                self.modules[name] = ReportsMonitorModule(
                    name, self, callsign=mc.get("callsign", ""),
                    rbn_host=mc.get("rbn_host",
                                    "telnet.reversebeacon.net"),
                    rbn_port=mc.get("rbn_port", 7000),
                    autostart_rbn=mc.get("autostart_rbn", False))
            elif mtype == "discord_integration":
                from .modules.discord_module import \
                    DiscordIntegrationModule
                self.modules[name] = DiscordIntegrationModule(
                    name, self, vfo=mc.get("vfo", "Radio"),
                    webhook_url=mc.get("webhook_url", ""),
                    interval_s=mc.get("interval_s", 10.0))
            elif mtype == "signal_detector":
                from .modules.signal_detector_module import \
                    SignalDetectorModule
                self.modules[name] = SignalDetectorModule(
                    name, self, margin_db=mc.get("margin_db", 6.0))
            else:
                flog.warn("unknown module type '{}' for '{}'", mtype, name)

        self.sinks: Dict[str, object] = {}   # stream name -> recorder etc.
        from .utils.metrics import StreamTracker
        from .models.waterfall import Waterfall
        self.input_tracker = StreamTracker()
        self.waterfall = Waterfall(self._fft_size)
        self.last_spectrum: Optional[np.ndarray] = None
        from .runtime.pump import RealTimeGuard
        self.rt_guard = RealTimeGuard()
        self._clock = time.perf_counter   # injectable for pacing tests
        self.running = False
        self.main_loop_started = False
        self._pump_thread: Optional[threading.Thread] = None
        # pump mode "manual": no pump thread — the control plane steps
        # the pipeline synchronously via /pump/step (wall-clock-free e2e:
        # progress is counted in processed blocks, never in sleeps, so a
        # starved host just takes longer instead of skipping)
        with self.config.acquire(False) as conf:
            self.pump_manual = (conf.get("pump", "thread") == "manual")
        self._pump_gen = None
        self._pump_step_lock = threading.Lock()
        self._stop_evt = threading.Event()
        self._lock = threading.RLock()
        self._granularity_dirty = True
        self.run_pump = run_pump
        self.blocks_processed = 0

    # ------------------------------------------------------------------
    def invalidate_pipeline(self):
        self._granularity_dirty = True

    def _granularity(self) -> int:
        g = self.frontend.in_multiple
        for m in self.modules.values():
            if isinstance(m, RadioModuleInstance) and m.is_enabled():
                need = int(m.radio.in_multiple / self.frontend.ratio)
                g = math.lcm(g, need)
        return g

    def tune(self, freq: float):
        self.frequency = float(freq)
        # hardware-backed sources get the retune (reference
        # SourceManager::tune → source tuneHandler, source.cpp:127-135)
        tuner = getattr(self.source, "tune", None)
        if callable(tuner):
            tuner(freq)
        with self.config.acquire() as conf:
            conf["frequency"] = freq

    def set_vfo_offset(self, name: str, offset_hz: float) -> bool:
        m = self.modules.get(name)
        if not isinstance(m, RadioModuleInstance):
            return False
        m.set_offset(offset_hz)
        return True

    def select_sink(self, stream: str, sink: str, **sink_conf) -> bool:
        """Attach a sink to a module's audio stream (or a secondary
        substream 'Name__##N'): 'recorder' records to WAV, 'network'
        streams int16 PCM to a host:port (reference
        sink_modules/network_sink), 'null_audio_sink'/'None' discards
        (reference SinkManager::setStreamSink, sink.h)."""
        from .runtime.sink import get_secondary_stream_index
        base, idx = get_secondary_stream_index(stream)
        m = self.modules.get(base)
        if not isinstance(m, RadioModuleInstance):
            return False
        if idx > 0 and self.stream_registry.get(stream) is None:
            return False
        old = self.sinks.pop(stream, None)
        if hasattr(old, "close"):
            old.close()
        new_sink = None
        if sink == "recorder":
            rec_dir = os.path.join(self.root, "recordings")
            os.makedirs(rec_dir, exist_ok=True)
            path = os.path.join(rec_dir, WavRecorder.capture_name(
                f"sink_{stream}", self.frequency))
            # capture_name has 1 s resolution: two selects inside the
            # same second (the sync-pump e2e retries do this) must not
            # silently overwrite the first recording
            stem, ext = os.path.splitext(path)
            k = 1
            while os.path.exists(path):
                path = f"{stem}_{k}{ext}"
                k += 1
            new_sink = WavRecorder(
                path, m.radio.audio_samplerate, channels=2)
        elif sink == "network":
            from .io.network_sink import NetworkSink
            with self.config.acquire(False) as conf:
                nc = dict(conf.get("network_sink", {}))
            nc.update(sink_conf)
            try:
                new_sink = NetworkSink(
                    host=nc.get("host", "localhost"),
                    port=int(nc.get("port", 7355)),
                    protocol=nc.get("protocol", "udp"),
                    stereo=bool(nc.get("stereo", False)))
            except OSError as e:
                flog.error("network sink connect failed: {}", repr(e))
                return False
        elif sink == "mpeg":
            # MPEG-1 Layer I frames over TCP (the mpeg_adts_sink
            # analog, io/mpeg_sink.py; ref sink_modules/mpeg_adts_sink)
            from .io.mpeg_sink import MpegNetworkSink
            with self.config.acquire(False) as conf:
                nc = dict(conf.get("mpeg_sink", {}))
            nc.update(sink_conf)
            try:
                new_sink = MpegNetworkSink(
                    host=nc.get("host", "localhost"),
                    port=int(nc.get("port", 2020)),
                    samplerate=int(m.radio.audio_samplerate),
                    bitrate_kbps=int(nc.get("bitrate_kbps", 288)))
            except (OSError, AssertionError) as e:
                flog.error("mpeg sink connect failed: {}", repr(e))
                return False
        if new_sink is not None:
            self.sinks[stream] = new_sink
            if idx > 0:
                # substream sinks consume via the registry fan-out (the
                # pump only writes base-stream sinks directly)
                s = self.stream_registry.get(stream)
                s.bind(lambda blk, _r=new_sink: _r.write(blk))
        self.sink_sel[stream] = sink
        with self.config.acquire() as conf:
            conf.setdefault("sinks", {})[stream] = sink
        return True

    def add_substream(self, base: str):
        """Create 'base__##N' (reference sink.h:117-135)."""
        if self.stream_registry.get(base) is None:
            m = self.modules.get(base)
            if not isinstance(m, RadioModuleInstance):
                return None
            self.stream_registry.register(base, m.radio.audio_samplerate)
        return self.stream_registry.add_substream(base)

    def set_ifnr_enabled(self, enabled: bool):
        """Enable/disable the IF NR preprocessor at runtime, building it
        lazily if the app started without one."""
        if enabled and self.ifnr is None:
            from .ops.logmmse import IFNRLogMMSE
            self.ifnr = IFNRLogMMSE(self.frontend.effective_sr)
            self.frontend_nr = IQFrontEnd(
                self.samplerate, decim_ratio=self._decim,
                dc_blocking=self._dc, invert_iq=self._inv,
                fft_size=self._fft_size, fft_rate=self._fft_rate,
                fft_window=self._fft_window,
                preprocessors=[("ifnr", self.ifnr)])
            self.ifnr_primed = False
        self.ifnr_enabled = bool(enabled)
        if enabled:
            self.ifnr_stop_reason = ""

    def vfo_snr(self, name: str):
        m = self.modules.get(name)
        if self.last_spectrum is None or not isinstance(
                m, RadioModuleInstance):
            return None
        out = calculate_vfo_signal_info(
            self.last_spectrum, m.offset_hz, m.bandwidth,
            self.frontend.effective_sr)
        if out is None:
            return None
        return float(out[1])

    # ------------------------------------------------------------------
    def start(self):
        with self._lock:
            if self.running:
                return
            self.running = True
            self._stop_evt.clear()
            if self.pump_manual:
                # synchronous mode: ready immediately; blocks flow only
                # through explicit pump_step() calls
                self.main_loop_started = True
            elif self.run_pump and self.source is not None:
                self._pump_thread = threading.Thread(
                    target=self._pump_loop, daemon=True)
                self._pump_thread.start()
            flog.info("SDRApp started (SR={} Hz)", self.samplerate)

    def stop(self):
        with self._lock:
            if not self.running:
                return
            self.running = False
        self._stop_evt.set()
        if self._pump_thread:
            # long timeout: the pump may be inside a slow XLA compile
            self._pump_thread.join(timeout=60)
            if self._pump_thread.is_alive():
                flog.warn("pump thread still busy at stop (XLA compile?)")
            self._pump_thread = None
        flog.info("SDRApp stopped")

    def _source_iter(self):
        """Source blocks with failure fallback: a dead source degrades to
        a null source so the pipeline keeps running (reference
        source.cpp:60-75 nullSource fallback)."""
        import time as _time
        try:
            yield from self.source.blocks()
        except Exception as e:  # noqa: BLE001 — any source fault
            flog.error("source failed: {} — falling back to null source",
                       repr(e))
            B = max(int(self.samplerate // 200), 1024)
            while not self._stop_evt.is_set():
                _time.sleep(B / self.samplerate)
                yield np.zeros(B, np.complex64)

    def _granularity_all(self) -> int:
        g = self._granularity()
        if self.ifnr_enabled and self.frontend_nr is not None:
            g = math.lcm(g, self.frontend_nr.in_multiple)
        return g

    def _pump_loop(self):
        for _ in self._pump_iter():
            pass

    def pump_step(self, n: int = 1) -> int:
        """Synchronously process up to ``n`` pipeline blocks (manual pump
        mode).  Returns the number actually processed (< n only at end of
        a non-looping source).  Serialized: concurrent HTTP calls queue
        on the step lock."""
        with self._pump_step_lock:
            if self._pump_gen is None:
                self._pump_gen = self._pump_iter()
            done = 0
            for _ in range(int(n)):
                try:
                    next(self._pump_gen)
                except StopIteration:
                    break
                done += 1
            return done

    def _pump_iter(self):
        """The pump as a generator: yields once per processed block so it
        can be driven by the pump thread (free-running) or stepped
        synchronously from the control plane (manual mode)."""
        import jax
        import jax.numpy as jnp
        fe_step = jax.jit(lambda s, x: self.frontend.apply(None, s, x))
        fstate = self.frontend.init_state(())
        fe_nr_step = None
        fstate_nr = None
        self.ifnr_primed = False    # (re)prime per pump session
        primer = np.zeros(0, np.complex64)
        # real-time pacing guard + elastic degradation (reference
        # if_nr.h:117-139: self-disable at >=95% of the real-time
        # budget twice in a row); rt_factor/blocks-behind exposed at
        # /status for observability
        from .runtime.pump import RealTimeGuard
        self.rt_guard = RealTimeGuard()
        rc: Optional[Rechunker] = None
        gran = None
        blocks = self._source_iter()
        self.main_loop_started = True
        for blk in blocks:
            if self._stop_evt.is_set():
                break
            g = self._granularity_all()
            if rc is None or g != gran:
                gran = g
                block_len = ((max(g, int(self.samplerate // 20)) + g - 1)
                             // g) * g
                self.pump_block_len = block_len
                rc = Rechunker(block_len)
            for chunk in rc.push(blk):
                use_nr = False
                if self.ifnr_enabled and self.ifnr is not None:
                    if not self.ifnr_primed:
                        primer = np.concatenate([primer, chunk])
                        need = self.ifnr.core.NOISE_FRAMES \
                            * self.ifnr.core.Slen
                        if len(primer) >= need:
                            st0 = self.frontend_nr.init_state(())
                            st0["pre_ifnr"] = self.ifnr.prime(
                                st0["pre_ifnr"], jnp.asarray(primer[:need]))
                            fstate_nr = st0
                            fe_nr_step = jax.jit(
                                lambda s, x: self.frontend_nr.apply(
                                    None, s, x))
                            self.ifnr_primed = True
                            flog.info("IF NR primed ({} samples)", need)
                    use_nr = self.ifnr_primed
                t_start = self._clock()
                if use_nr:
                    (bb, spectra), fstate_nr = fe_nr_step(
                        fstate_nr, jnp.asarray(chunk))
                else:
                    (bb, spectra), fstate = fe_step(fstate,
                                                    jnp.asarray(chunk))
                budget = len(chunk) / self.samplerate
                elapsed = self._clock() - t_start
                fire = self.rt_guard.report(elapsed, budget)
                if fire:
                    if use_nr:
                        # elastic degradation: shed the heaviest
                        # optional stage when we can't keep real-time
                        self.ifnr_enabled = False
                        self.ifnr_stop_reason = \
                            "Slow processing. Reduce sample rate."
                        flog.warn("IF NR self-disabled: {}",
                                  self.ifnr_stop_reason)
                    # re-arm either way: with nothing left to shed the
                    # guard keeps reporting rt_factor/blocks-behind
                    self.rt_guard.reset_policy()
                bb_np = np.asarray(bb)
                lines = np.asarray(spectra)
                for ln in lines:
                    self.waterfall.push_fft(ln)
                self.last_spectrum = lines[-1]
                self.baseband_event.emit(bb_np)
                self.spectrum_event.emit(self.last_spectrum)
                with self._lock:
                    mods = [m for m in self.modules.values()
                            if isinstance(m, RadioModuleInstance)
                            and m.is_enabled()]
                for m in mods:
                    with m._mtx:
                        if bb.shape[-1] % m.radio.in_multiple:
                            # demod switched mid-block; samples drop until
                            # the rechunker realigns (the analog of the
                            # reference's tempStop re-splice gap)
                            continue
                        y, m.state = m.jit_step(m.params, m.state, bb)
                        if isinstance(y, tuple):
                            y, rds_bb = y
                            (hard, valid), m.rds_state = m.rds_step(
                                m.rds_state, rds_bb)
                            hv, vv = np.asarray(hard), np.asarray(valid)
                            m.rds_decoder.push_bits(hv[vv])
                    audio = np.asarray(y)
                    m.level_meter.push(audio)
                    if m.afnr is not None:
                        try:
                            with m._mtx:
                                audio = m._afnr_process(audio)
                        except Exception as e:  # NR swap race/misconfig:
                            flog.warn("afnr error, disabling: {}", repr(e))
                            m.afnr = None
                            continue
                        if audio.shape[-1] == 0:
                            continue
                    m.push_if_spectrum(bb_np)
                    # route through the sink layer: priority merger (TX
                    # inject preempts) → volume/mute → fan-out (reference
                    # SinkManager::Stream, sink.h:30-92)
                    from .runtime.sink import StreamHook, PRIO_DEMOD
                    stream = self.stream_registry.get(m.name)
                    if stream is None:
                        stream = self.stream_registry.register(
                            m.name, m.radio.audio_samplerate)
                    stream.volume = m.volume
                    stream.muted = m.muted
                    sink = self.sinks.get(m.name)
                    for blk in stream.push_demod(audio):
                        m.audio_event.emit(blk)
                        if hasattr(sink, "write"):
                            sink.write(blk)
                    self.stream_registry.publish(StreamHook(
                        source=m.name,
                        source_type=StreamHook.SOURCE_DEMOD_OUTPUT,
                        priority=PRIO_DEMOD,
                        samplerate=m.radio.audio_samplerate,
                        stereo_data=audio))
                self.input_tracker.add(len(chunk))
                self.blocks_processed += 1
                yield self.blocks_processed
        self.main_loop_started = True

    # ------------------------------------------------------------------
    def status(self) -> dict:
        return {"ready": True, "httpListening": True,
                "mainLoopStarted": bool(self.main_loop_started
                                        or not self.run_pump
                                        or self.source is None),
                # real-time pacing observability (runtime/pump.py
                # RealTimeGuard; reference if_nr.h:117-139 analog)
                "rtFactor": round(self.rt_guard.rt_factor, 4),
                "secondsBehind": round(self.rt_guard.seconds_behind, 4),
                "ifnrEnabled": bool(self.ifnr_enabled),
                "ifnrStopReason": getattr(self, "ifnr_stop_reason", "")}

    def shutdown(self):
        self.stop()
        for m in self.modules.values():
            m.shutdown()
        for s in self.sinks.values():
            if hasattr(s, "close"):
                s.close()
        closer = getattr(self.source, "close", None)
        if callable(closer):
            closer()
        self.config.disable_autosave()
