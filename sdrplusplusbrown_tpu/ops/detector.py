"""Signal detector — baseband preprocessor that smooths the spectrum and
flags active carriers.

reference: core/src/dsp/detector/signal_detector.{h,cpp} (613 LoC, Brown
addition used by the scanner and the signal_detection e2e test).  The
reference combines a smoothed-spectrum threshold detector with a harmonic-
interval scorer (lag products over candidate comb spacings,
signal_detector.cpp:74-146).  Here:

  * ``detect_signals`` — noise floor from the median, threshold at
    floor + margin, hysteresis-merged intervals (the detector's product:
    [start_bin, stop_bin, peak_db] per signal).
  * ``harmonic_interval_scores`` — the lag-product comb scorer as one
    batched tensor op ([D, N] products), for RTTY/CW-comb style signals.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def smooth_spectrum(db: jnp.ndarray, window: int = 9) -> jnp.ndarray:
    """Centered moving average along bins (edge-clamped)."""
    w = max(int(window), 1)
    n = db.shape[-1]
    pad = [(0, 0)] * (db.ndim - 1) + [(w // 2, w - 1 - w // 2)]
    s = jnp.cumsum(jnp.pad(db, pad, mode="edge"), axis=-1)
    out = (s[..., w - 1:] - jnp.concatenate(
        [jnp.zeros_like(s[..., :1]), s[..., :-w]], axis=-1)[..., :n]) / w
    return out


def harmonic_interval_scores(spectrum: jnp.ndarray, min_interval: int,
                             max_interval: int):
    """Lag-product comb scores (reference findDominantHarmonicIntervals,
    signal_detector.cpp:74-146): response[d, i] = max(0,s[i])·max(0,s[i+d]).

    Returns (dominant_interval [N], confidence [N])."""
    s = jnp.maximum(spectrum, 0.0)
    n = s.shape[-1]
    ds = np.arange(min_interval, max_interval + 1)
    idx = np.minimum(np.arange(n)[None, :] + ds[:, None], n - 1)
    valid = (np.arange(n)[None, :] + ds[:, None]) < n
    resp = s[None, :] * s[idx] * jnp.asarray(valid, s.dtype)
    k = jnp.argmax(resp, axis=0)
    conf = jnp.max(resp, axis=0)
    return jnp.asarray(ds)[k], conf


def detect_signals(spectrum_db: np.ndarray, samplerate: float,
                   margin_db: float = 6.0, smooth: int = 9,
                   min_width_hz: float = 100.0,
                   merge_gap_hz: float = 200.0) -> List[dict]:
    """Flag active carriers in a DC-centered dB spectrum.

    Returns a list of {"start_hz", "stop_hz", "peak_db", "snr_db"} dicts,
    frequencies relative to center.
    """
    db = np.asarray(smooth_spectrum(jnp.asarray(spectrum_db), smooth))
    n = db.shape[-1]
    floor = float(np.median(db))
    thresh = floor + margin_db
    active = db > thresh
    bin_hz = samplerate / n
    min_bins = max(int(min_width_hz / bin_hz), 1)
    gap_bins = max(int(merge_gap_hz / bin_hz), 1)

    sigs = []
    i = 0
    while i < n:
        if not active[i]:
            i += 1
            continue
        j = i
        gap = 0
        end = i
        while j < n and gap <= gap_bins:
            if active[j]:
                end = j
                gap = 0
            else:
                gap += 1
            j += 1
        if end - i + 1 >= min_bins:
            peak = float(db[i:end + 1].max())
            sigs.append({
                "start_hz": (i - n / 2) * bin_hz,
                "stop_hz": (end + 1 - n / 2) * bin_hz,
                "peak_db": peak,
                "snr_db": peak - floor,
            })
        i = j
    return sigs


class SignalDetector:
    """Streaming wrapper: feed spectra frames, keep the latest detections
    (the app registers it as an IQFrontEnd spectrum consumer)."""

    def __init__(self, samplerate: float, margin_db: float = 6.0):
        self.samplerate = float(samplerate)
        self.margin_db = float(margin_db)
        self.detections: List[dict] = []
        self.enabled = True

    def push_spectrum(self, spectrum_db: np.ndarray):
        if not self.enabled:
            return
        self.detections = detect_signals(spectrum_db, self.samplerate,
                                         self.margin_db)

    def is_active(self, freq_hz: float, bw_hz: float) -> bool:
        lo, hi = freq_hz - bw_hz / 2, freq_hz + bw_hz / 2
        return any(s["stop_hz"] > lo and s["start_hz"] < hi
                   for s in self.detections)
