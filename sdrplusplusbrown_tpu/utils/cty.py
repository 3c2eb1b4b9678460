"""Amateur-radio country (CTY) database, Maidenhead locators and
great-circle bearing/distance.

Re-implements the behavior of reference ``core/src/utils/cty.{h,cpp}``:

* ``grid_to_latlng`` — Maidenhead 4/6-char locator to lat/lon
  (cty.cpp:36-58; 4-char locators get the subsquare center ``ll``).
* ``bearing_distance`` — haversine distance (km, R=6371) + initial
  bearing in *radians* (cty.cpp:81-107 returns the raw atan2 azimuth).
* ``CTY`` — DXCC entity list parsed from the AD1C ``cty.dat`` format
  (cty.cpp:165-207): header lines ``Name: CQ: ITU: Cont: lat: lon: tz:
  prefixes;`` (longitude stored negated — cty.dat uses +west), prefix
  continuation lines with ``=exact``, ``{continent}``, ``<lat/lon>``,
  ``[itu]`` and ``(cq)`` override suffixes.
* ``CTY.find_callsign`` — exact match wins; otherwise the longest (and
  among equals, the *last*) prefix match, with the entity lat/lon
  (cty.cpp:219-246; note the reference resolves coordinates from the
  DXCC entity even when a prefix carries its own ``<lat/lon>``).
* ``load_all_cty`` — the same regional file set the reference loads
  from ``res/cty/`` (cty.cpp:250-260), with "weird" multi-dash entity
  names excluded from regional files.

The FT8 decoder module uses this to annotate decodes with country /
continent / distance-from-own-grid, mirroring
``decoder_modules/ft8_decoder/src/main.cpp:1232-1272``.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, field, replace
from typing import List, Optional

from .flog import flog

EARTH_RADIUS_KM = 6371.0


@dataclass(frozen=True)
class LatLng:
    lat: float
    lon: float

    def is_valid(self) -> bool:
        return -90 <= self.lat <= 90 and -180 <= self.lon <= 180

    @staticmethod
    def invalid() -> "LatLng":
        return LatLng(-1000.0, 0.0)


@dataclass(frozen=True)
class BearingDistance:
    bearing: float      # initial bearing, radians in [0, 2π)
    distance: float     # great-circle distance, km


def grid_to_latlng(locator: str) -> LatLng:
    """Maidenhead locator → lat/lon (cty.cpp:36-58)."""
    if len(locator) == 4:
        locator = locator + "ll"            # subsquare center
    if len(locator) > 6:
        locator = locator[:6]
    if len(locator) != 6:
        return LatLng.invalid()
    lo = locator.lower()
    if not ("a" <= lo[0] <= "r" and "a" <= lo[1] <= "r"
            and lo[2].isdigit() and lo[3].isdigit()
            and "a" <= lo[4] <= "x" and "a" <= lo[5] <= "x"):
        return LatLng.invalid()
    up = locator.upper()
    field_lng = (ord(up[0]) - 65) * 20
    field_lat = (ord(up[1]) - 65) * 10
    square_lng = int(up[2]) * 2
    square_lat = int(up[3])
    sub_lng = (ord(up[4]) - 65 + 0.5) / 12
    sub_lat = (ord(up[5]) - 65 + 0.5) / 24
    return LatLng(field_lat + square_lat + sub_lat - 90,
                  field_lng + square_lng + sub_lng - 180)


def _deg_to_rad(d: float) -> float:
    return (d % 360.0) * math.pi / 180.0


def bearing_distance(frm: LatLng, to: LatLng) -> BearingDistance:
    """Haversine distance + initial bearing (cty.cpp:81-107)."""
    d_lat = _deg_to_rad(to.lat - frm.lat)
    d_lon = _deg_to_rad(to.lon - frm.lon)
    lat1 = _deg_to_rad(frm.lat)
    lat2 = _deg_to_rad(to.lat)
    a = (math.sin(d_lat / 2) ** 2
         + math.sin(d_lon / 2) ** 2 * math.cos(lat1) * math.cos(lat2))
    a = min(1.0, max(0.0, a))
    c = 2 * math.atan2(math.sqrt(a), math.sqrt(1 - a))
    y = math.sin(d_lon) * math.cos(lat2)
    x = (math.cos(lat1) * math.sin(lat2)
         - math.sin(lat1) * math.cos(lat2) * math.cos(d_lon))
    az = math.atan2(y, x)
    if az < 0:
        az += 2 * math.pi
    return BearingDistance(az, c * EARTH_RADIUS_KM)


# ----------------------------------------------------------------------
# cty.dat database

@dataclass
class Callsign:
    exact: bool = False
    ll: LatLng = field(default_factory=LatLng.invalid)
    continent: str = ""
    value: str = ""
    dxccname: str = ""


@dataclass
class DXCC:
    ll: LatLng
    name: str
    continent: str
    prefixes: List[Callsign] = field(default_factory=list)


def _is_weird_name(name: str) -> bool:
    """Names with ≥2 dashes are region-file noise entries
    (cty.cpp:10-18)."""
    return name.count("-") > 1


def _parse_callsign(txt: str) -> Callsign:
    """One prefix token with optional override suffixes
    (cty.cpp:122-163)."""
    cs = Callsign()
    i = 0
    if txt and txt[0] == "=":
        cs.exact = True
        i = 1
    value = []
    end_value = False
    while i < len(txt):
        ch = txt[i]
        if ch in "{<[(":
            close = {"{": "}", "<": ">", "[": "]", "(": ")"}[ch]
            j = txt.find(close, i + 1)
            part = txt[i + 1:j] if j >= 0 else txt[i + 1:]
            i = (j if j >= 0 else len(txt)) + 1
            end_value = True
            if ch == "{":
                cs.continent = part
            elif ch == "<":
                bits = part.split("/")
                if len(bits) == 2:
                    try:
                        cs.ll = LatLng(float(bits[0]), -float(bits[1]))
                    except ValueError:
                        pass
            continue
        if not end_value:
            value.append(ch)
        i += 1
    cs.value = "".join(value)
    return cs


class CTY:
    def __init__(self):
        self.dxcc: List[DXCC] = []

    def load(self, path: str, region: str = ""):
        """Parse one cty.dat file, appending entities
        (cty.cpp:165-207). ``region`` is a display-name suffix for the
        regional files; when non-empty, weird multi-dash entity names
        are skipped."""
        exclude_weird = bool(region)
        is_weird_section = False
        with open(path, "r", errors="replace") as f:
            for line in f:
                if not line.strip():
                    continue
                if line[0] != " ":
                    parts = [p.strip() for p in line.split(":")]
                    if len(parts) >= 8:
                        name = parts[0]
                        is_weird_section = _is_weird_name(name)
                        if not exclude_weird or not is_weird_section:
                            try:
                                ll = LatLng(float(parts[4]),
                                            -float(parts[5]))
                            except ValueError:
                                ll = LatLng.invalid()
                            self.dxcc.append(DXCC(ll, name + region,
                                                  parts[3]))
                    continue
                if exclude_weird and is_weird_section:
                    continue
                if not self.dxcc:
                    continue
                for tok in line.replace(",", " ").replace(";", " ") \
                               .split():
                    cs = _parse_callsign(tok)
                    if cs.value:
                        self.dxcc[-1].prefixes.append(cs)

    def find_callsign(self, callsign: str) -> Callsign:
        """Exact match first; then longest-prefix (ties: last wins),
        coordinates always from the owning DXCC entity
        (cty.cpp:219-246)."""
        rv = Callsign()
        found = False
        for ent in self.dxcc:
            for p in ent.prefixes:
                if p.exact and callsign == p.value:
                    rv = replace(p, ll=ent.ll, continent=ent.continent,
                                 dxccname=ent.name)
                    found = True
        if found:
            return rv
        for ent in self.dxcc:
            for p in ent.prefixes:
                if p.exact or not callsign.startswith(p.value):
                    continue
                if len(p.value) >= len(rv.value):
                    rv = replace(p, ll=ent.ll, continent=ent.continent,
                                 dxccname="")
                if not rv.dxccname or not _is_weird_name(ent.name):
                    rv.dxccname = ent.name
        return rv


#: file set the reference loads (cty.cpp:250-260): (filename, suffix)
CTY_FILES = [
    ("cty.dat", ""),
    ("AF_cty.dat", ", AF"),
    ("BY_cty.dat", ", CN"),
    ("EU_cty.dat", ", EU"),
    ("NA_cty.dat", ", NA"),
    ("SA_cty.dat", ", SA"),
    ("VK_cty.dat", ", VK"),
    ("cty_rus.dat", ", RUS"),
]


def load_all_cty(res_dir: str) -> CTY:
    """Load the full regional database from ``res_dir/cty/``
    (cty.cpp:250-260). Missing files are skipped with a warning so the
    app runs without the resource bundle."""
    cty = CTY()
    for fname, region in CTY_FILES:
        path = os.path.join(res_dir, "cty", fname)
        if not os.path.exists(path):
            flog.warn("cty: missing {}", path)
            continue
        cty.load(path, region)
    return cty
