"""Human-readable frequency formatting/parsing.

reference: ``core/src/utils/hrfreq.{h,cpp}`` — ``toString`` picks the
GHz/MHz/KHz/Hz scale, prints with scale-dependent decimals and strips
trailing zeros (hrfreq.cpp:7-47); ``fromString`` skips leading
non-numeric text, reads digits/sign/dot (commas ignored), and scales by
the first letter after the number (G/M/K/H, hrfreq.cpp:53-119 — no
unit means Hz). Used by control surfaces that accept typed
frequencies (frequency manager, rigctl-style tuning)."""

from __future__ import annotations

from typing import Optional


def to_string(freq: float) -> str:
    if freq >= 1e9:
        num, decimals, suffix = freq / 1e9, 9, "GHz"
    elif freq >= 1e6:
        num, decimals, suffix = freq / 1e6, 6, "MHz"
    elif freq >= 1e3:
        num, decimals, suffix = freq / 1e3, 3, "KHz"
    else:
        num, decimals, suffix = freq, 0, "Hz"
    s = f"{num:.{decimals}f}"
    if decimals:
        s = s.rstrip("0").rstrip(".")
    return s + suffix


def from_string(s: str) -> Optional[float]:
    """Parse a human-typed frequency; returns None on failure
    (reference returns false)."""
    def numeric(c: str) -> bool:
        return c.isdigit() or c in "+-.,"

    i = 0
    while i < len(s) and not numeric(s[i]):
        i += 1
    num = []
    while i < len(s):
        c = s[i]
        if c.isalpha():
            break
        if numeric(c) and c != ",":   # comma skipped: dot is the point
            num.append(c)
        i += 1
    try:
        value = float("".join(num))
    except ValueError:
        return None
    if i == len(s):
        return value                  # no unit → Hz
    scale = s[i].upper()
    return value * {"G": 1e9, "M": 1e6, "K": 1e3}.get(scale, 1.0)
