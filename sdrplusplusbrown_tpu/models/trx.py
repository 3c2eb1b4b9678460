"""Transmit path: Transmitter interface, TX audio chain, prebuffer.

reference: core/src/trx.h:14-47 (abstract Transmitter: PTT, gains, tune,
SWR/power telemetry — implemented by hl2_source), server.cpp:113-123 (the
server TX path: 6 kHz wire-rate client audio → upsample to 48 kHz →
Prebuffer → Packer → transmitter), dsp/buffer/prebuffer.h.
"""

from __future__ import annotations

import threading
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..runtime.block import Block
from ..ops.mod import QuadratureMod, SSBMod, AMMod
from ..ops.resampler import RationalResampler
from ..ops.agc import AGC

TX_WIRE_SAMPLERATE = 6000.0   # reference server_protocol.h:11


class Transmitter:
    """Abstract TX hardware interface (reference trx.h:14-47)."""

    def set_ptt(self, ptt: bool):
        raise NotImplementedError

    def get_ptt(self) -> bool:
        raise NotImplementedError

    def set_tx_frequency(self, freq: float):
        raise NotImplementedError

    def set_tx_gain(self, gain: float):
        raise NotImplementedError

    def send_iq(self, iq: np.ndarray):
        """Push a block of TX baseband IQ at 48 kHz."""
        raise NotImplementedError

    # telemetry (reference trx.h:39-43)
    def get_forward_power(self) -> float:
        return 0.0

    def get_reflected_power(self) -> float:
        return 0.0

    def get_swr(self) -> float:
        fwd, ref = self.get_forward_power(), self.get_reflected_power()
        if fwd <= 0:
            return 1.0
        rho = min(np.sqrt(ref / fwd), 0.999)
        return float((1 + rho) / (1 - rho))


class LoopbackTransmitter(Transmitter):
    """Captures TX IQ in memory (tests / null hardware)."""

    def __init__(self):
        self.ptt = False
        self.freq = 0.0
        self.gain = 1.0
        self.blocks = []
        self._mtx = threading.Lock()

    def set_ptt(self, ptt: bool):
        self.ptt = bool(ptt)

    def get_ptt(self) -> bool:
        return self.ptt

    def set_tx_frequency(self, freq: float):
        self.freq = float(freq)

    def set_tx_gain(self, gain: float):
        self.gain = float(gain)

    def send_iq(self, iq: np.ndarray):
        with self._mtx:
            self.blocks.append(np.asarray(iq))

    def get_forward_power(self) -> float:
        return 10.0 * self.gain


class TxChain(Block):
    """Audio (real 48 kHz) → modulated TX baseband IQ.

    Modes: FM (quadrature phasor), USB/LSB (analytic band-pass), AM.
    """

    def __init__(self, mode: str = "USB", samplerate: float = 48_000.0,
                 bandwidth: float = 2_800.0, fm_deviation: float = 5_000.0):
        self.mode = mode.upper()
        self.samplerate = float(samplerate)
        self.agc = AGC(set_point=1.0, attack=50.0 / samplerate,
                       decay=5.0 / samplerate, max_gain=100.0)
        if self.mode == "FM" or self.mode == "NFM":
            self.mod = QuadratureMod(fm_deviation, samplerate)
        elif self.mode == "USB":
            self.mod = SSBMod(SSBMod.USB, bandwidth, samplerate)
        elif self.mode == "LSB":
            self.mod = SSBMod(SSBMod.LSB, bandwidth, samplerate)
        elif self.mode == "AM":
            self.mod = AMMod()
        else:
            raise ValueError(f"unknown TX mode {mode}")

    def init_state(self, batch_shape=()):
        return {"agc": self.agc.init_state(batch_shape),
                "mod": self.mod.init_state(batch_shape)}

    def apply(self, params, state, audio):
        y, ags = self.agc.apply(None, state["agc"], audio)
        iq, ms = self.mod.apply(None, state["mod"], y)
        return iq, {"agc": ags, "mod": ms}


class Prebuffer:
    """Latency buffer: hold ``prebuffer_ms`` of samples before releasing a
    steady stream (reference dsp/buffer/prebuffer.h — smooths network
    jitter on the TX path)."""

    def __init__(self, samplerate: float, prebuffer_ms: float = 200.0):
        self.samplerate = float(samplerate)
        self.target = int(samplerate * prebuffer_ms / 1000.0)
        self._buf = np.zeros(0, np.complex64)
        self._primed = False

    def push(self, x: np.ndarray):
        self._buf = np.concatenate([self._buf, np.asarray(x)])

    def pull(self, n: int) -> Optional[np.ndarray]:
        if not self._primed:
            if len(self._buf) < self.target:
                return None
            self._primed = True
        if len(self._buf) < n:
            self._primed = False     # underrun: re-prime
            return None
        out, self._buf = self._buf[:n], self._buf[n:]
        return out


class ServerTxPath:
    """Server-side TX: 6 kHz wire audio → 48 kHz → modulator → transmitter
    (reference server.cpp:113-123)."""

    def __init__(self, transmitter: Transmitter, mode: str = "USB",
                 prebuffer_ms: float = 200.0):
        self.transmitter = transmitter
        self.resamp = RationalResampler(TX_WIRE_SAMPLERATE, 48_000.0)
        self.rs_state = self.resamp.init_state((), jnp.complex64)
        self.prebuffer = Prebuffer(48_000.0, prebuffer_ms)
        self._step = jax.jit(lambda s, x: self.resamp.apply(None, s, x))

    def push_wire_block(self, iq6k: np.ndarray):
        n = len(iq6k)
        g = self.resamp.in_multiple
        n_pad = ((n + g - 1) // g) * g
        if n_pad != n:
            iq6k = np.pad(iq6k, (0, n_pad - n))
        up, self.rs_state = self._step(self.rs_state, jnp.asarray(iq6k))
        self.prebuffer.push(np.asarray(up))
        # drain in 20 ms packets (the reference Packer granularity)
        while True:
            pkt = self.prebuffer.pull(960)
            if pkt is None:
                break
            self.transmitter.send_iq(pkt)
