"""CTY database, Maidenhead grid, bearing/distance, hrfreq, and the
FT8 decode annotation path (reference core/src/utils/cty.{h,cpp},
hrfreq.cpp, decoder_modules/ft8_decoder/src/{symbolic.cpp,main.cpp})."""

import math
import os

import pytest

from sdrplusplusbrown_tpu.utils.cty import (CTY, LatLng, bearing_distance,
                                            grid_to_latlng, load_all_cty)
from sdrplusplusbrown_tpu.utils import hrfreq
from sdrplusplusbrown_tpu.modules.ft8_module import (FT8DecoderModule,
                                                     extract_callsign_ft8)

REF_CTY = "/root/reference/root/res/cty"


# ---------------------------------------------------------------- grid

def test_grid_to_latlng_6char():
    ll = grid_to_latlng("JN58td")     # Munich
    assert abs(ll.lat - 48.1458) < 1e-3
    assert abs(ll.lon - 11.625) < 1e-3


def test_grid_to_latlng_4char_center():
    # 4-char locator gets the 'll' subsquare center (cty.cpp:37-39)
    ll = grid_to_latlng("FN31")
    full = grid_to_latlng("FN31ll")
    assert ll == full and ll.is_valid()


def test_grid_invalid():
    assert not grid_to_latlng("99XX").is_valid()
    assert not grid_to_latlng("Z").is_valid()


def test_bearing_distance_known():
    london = LatLng(51.5074, -0.1278)
    paris = LatLng(48.8566, 2.3522)
    bd = bearing_distance(london, paris)
    assert abs(bd.distance - 344) < 5          # ~344 km
    assert abs(math.degrees(bd.bearing) - 148) < 3


def test_bearing_distance_zero():
    p = LatLng(10.0, 20.0)
    assert bearing_distance(p, p).distance == pytest.approx(0.0)


# ---------------------------------------------------------------- parse

SAMPLE = """\
Monaco:                   14:  27:  EU:   43.73:    -7.40:    -1.0:  3A:
    3A;
United States:            05:  08:  NA:   37.60:    91.87:     5.0:  K:
    AA,K,N,W,=KH2BY(27)[61],=W1AW{NA};
Guantanamo Bay:           08:  11:  NA:   19.90:    75.15:     5.0:  KG4:
    KG4;
"""


def _sample_cty(tmp_path):
    p = tmp_path / "cty.dat"
    p.write_text(SAMPLE)
    cty = CTY()
    cty.load(str(p))
    return cty


def test_parse_entities(tmp_path):
    cty = _sample_cty(tmp_path)
    assert [d.name for d in cty.dxcc] == ["Monaco", "United States",
                                          "Guantanamo Bay"]
    us = cty.dxcc[1]
    # longitude is stored +west in cty.dat → negate (cty.cpp:185)
    assert us.ll.lat == pytest.approx(37.60)
    assert us.ll.lon == pytest.approx(-91.87)
    assert us.continent == "NA"
    assert [p.value for p in us.prefixes] == ["AA", "K", "N", "W",
                                              "KH2BY", "W1AW"]
    assert us.prefixes[4].exact and us.prefixes[5].exact


def test_find_exact_beats_prefix(tmp_path):
    cty = _sample_cty(tmp_path)
    cs = cty.find_callsign("W1AW")
    assert cs.exact and cs.dxccname == "United States"
    assert cs.continent == "NA"
    assert cs.ll.lat == pytest.approx(37.60)


def test_find_longest_prefix_wins(tmp_path):
    cty = _sample_cty(tmp_path)
    # KG4AB: prefix "K" (US) matches but "KG4" (Guantanamo) is longer
    cs = cty.find_callsign("KG4AB")
    assert cs.dxccname == "Guantanamo Bay"
    # plain K callsign
    assert cty.find_callsign("K5XYZ").dxccname == "United States"
    # no match at all
    assert cty.find_callsign("ZZ9ZZZ").dxccname == ""


def test_override_suffixes(tmp_path):
    p = tmp_path / "cty.dat"
    p.write_text("Somewhere:  1: 2: EU:  10.00:  -20.00:  0.0:  XX:\n"
                 "    XX,=XX1A<12.5/30.25>{AF};\n")
    cty = CTY()
    cty.load(str(p))
    cs_parsed = cty.dxcc[0].prefixes[1]
    assert cs_parsed.exact and cs_parsed.value == "XX1A"
    assert cs_parsed.ll.lat == pytest.approx(12.5)
    assert cs_parsed.ll.lon == pytest.approx(-30.25)
    assert cs_parsed.continent == "AF"
    # lookup resolves coordinates from the DXCC entity (cty.cpp:221-236)
    cs = cty.find_callsign("XX1A")
    assert cs.ll.lat == pytest.approx(10.0)
    assert cs.ll.lon == pytest.approx(20.0)


@pytest.mark.skipif(not os.path.isdir(REF_CTY),
                    reason="reference cty resources not mounted")
def test_reference_cty_golden():
    cty = load_all_cty(os.path.dirname(REF_CTY))
    assert len(cty.dxcc) > 300
    w1aw = cty.find_callsign("W1AW")
    assert w1aw.dxccname.startswith("United States")
    assert w1aw.continent == "NA"
    dl = cty.find_callsign("DL1ABC")
    assert "Germany" in dl.dxccname and dl.continent == "EU"
    # distance sanity: US entity centroid is ~6-8000 km from Munich
    bd = bearing_distance(grid_to_latlng("JN58td"), w1aw.ll)
    assert 6000 < bd.distance < 9000


# --------------------------------------------------------------- hrfreq

def test_hrfreq_to_string():
    assert hrfreq.to_string(14_074_000) == "14.074MHz"
    assert hrfreq.to_string(1_250) == "1.25KHz"
    assert hrfreq.to_string(500) == "500Hz"
    assert hrfreq.to_string(2.4e9) == "2.4GHz"
    assert hrfreq.to_string(1e6) == "1MHz"


def test_hrfreq_from_string():
    assert hrfreq.from_string("14.074MHz") == pytest.approx(14_074_000)
    assert hrfreq.from_string("freq: 7,100 kHz") == pytest.approx(7_100_000)
    assert hrfreq.from_string("500") == pytest.approx(500)
    assert hrfreq.from_string("2.4 GHz") == pytest.approx(2.4e9)
    assert hrfreq.from_string("abc") is None


# ------------------------------------------------- FT8 callsign/annotate

def test_extract_callsign():
    assert extract_callsign_ft8("CQ W1AW FN31") == "W1AW"
    assert extract_callsign_ft8("CQ K5XYZ") == "K5XYZ"        # CQ w/o loc
    # 3-part CQ without locator is not extractable (symbolic.cpp:42-44)
    assert extract_callsign_ft8("CQ DX K5XYZ") == ""
    assert extract_callsign_ft8("W1AW DL1ABC -10") == "DL1ABC"
    assert extract_callsign_ft8("W1AW DL1ABC R+05") == "DL1ABC"
    assert extract_callsign_ft8("DL1ABC W1AW RR73") == "W1AW"
    assert extract_callsign_ft8("DL1ABC W1AW 73") == "W1AW"
    assert extract_callsign_ft8("") == ""
    assert extract_callsign_ft8("TONE 1500.0Hz") == ""


class _FakeApp:
    modules: dict = {}


def test_ft8_module_annotates(tmp_path):
    cty = _sample_cty(tmp_path)
    mod = FT8DecoderModule("ft8", _FakeApp(), my_grid="JN58td", cty=cty)
    try:
        mod._on_result(["CQ W1AW FN31", "W1AW <KD9XYZ> RR73"], t0=0)
    finally:
        mod.shutdown()
    rec = mod.decodes[0]
    assert rec["callsign"] == "W1AW"
    assert rec["dxcc"] == "United States"
    assert rec["continent"] == "NA"
    assert 6000 < rec["distance_km"] < 9000
    # hashed callsigns are not looked up (main.cpp:1236)
    assert "callsign" not in mod.decodes[1]
