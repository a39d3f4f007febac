"""Byte-exact numeric term encoding + geo distance/haversine vectors.

Vector sources:
- numeric/prefix_coded_test.go (PrefixCoded byte arrays, verified there
  against the Lucene implementation; shift recovery; int64 round-trip)
- numeric/float_test.go (TestSortabledFloat64ToInt64)
- numeric/bin_test.go (TestInterleaveDeinterleave)
- geo/geo_dist_test.go (TestParseDistance, TestParseDistanceUnit,
  TestHaversinDistance)
- analysis/tokenmap_test.go + analysis/test_words.txt (comment styles)
"""

import math

import numpy as np
import pytest

from bleve_ray.analysis.token_filters import load_token_map
from bleve_ray.index.geo import _squash, haversin_km, interleave, parse_distance_km
from bleve_ray.index.numeric import (
    decode_prefix_coded,
    float64_to_int64,
    int64_to_float64,
    prefix_coded_int64,
)

# --- numeric/prefix_coded_test.go: byte-exact terms --------------------------

PREFIX_CODED_VECTORS = [
    (1, 0, bytes([0x20, 0x1, 0x0, 0x0, 0x0, 0x0, 0x0, 0x0, 0x0, 0x0, 0x1])),
    (-1, 0, bytes([0x20, 0x0, 0x7F, 0x7F, 0x7F, 0x7F, 0x7F, 0x7F, 0x7F, 0x7F, 0x7F])),
    (-94582, 0, bytes([0x20, 0x0, 0x7F, 0x7F, 0x7F, 0x7F, 0x7F, 0x7F, 0x7A, 0x1D, 0x0A])),
    (314729851, 0, bytes([0x20, 0x1, 0x0, 0x0, 0x0, 0x0, 0x1, 0x16, 0x9, 0x4A, 0x7B])),
    (314729851, 4, bytes([0x24, 0x8, 0x0, 0x0, 0x0, 0x0, 0x9, 0x30, 0x4C, 0x57])),
    (314729851, 8, bytes([0x28, 0x40, 0x0, 0x0, 0x0, 0x0, 0x4B, 0x4, 0x65])),
    (314729851, 16, bytes([0x30, 0x20, 0x0, 0x0, 0x0, 0x0, 0x25, 0x42])),
    (314729851, 32, bytes([0x40, 0x8, 0x0, 0x0, 0x0, 0x0])),
    (1234729851, 32, bytes([0x40, 0x8, 0x0, 0x0, 0x0, 0x0])),
]


@pytest.mark.parametrize("value,shift,expected", PREFIX_CODED_VECTORS)
def test_prefix_coded_bytes(value, shift, expected):
    term = prefix_coded_int64(value, shift)
    assert term.encode("ascii") == expected
    got_value, got_shift = decode_prefix_coded(term)
    assert got_shift == shift
    if shift == 0:
        assert got_value == value


# --- numeric/float_test.go ----------------------------------------------------


def test_sortable_float64_to_int64():
    inputs = [-4640094584139352638.0, -167.42, -1.11, 0.0, 3.14, 167.42]
    last = None
    for f in inputs:
        v = float64_to_int64(f)
        if last is not None:
            assert v > last  # sortable order preserved
        last = v
        assert int64_to_float64(v) == f  # round-trip


# --- numeric/bin_test.go -------------------------------------------------------


@pytest.mark.parametrize("v1,v2", [(0, 0), (1, 1), (27, 39), (2**32 - 1, 2**32 - 1)])
def test_interleave_deinterleave(v1, v2):
    # the geo morton codec is the repo's interleave: v1 (lon) occupies
    # even bits, v2 (lat) odd bits, recovered by morton_unhash
    i = interleave(np.uint64(v1), np.uint64(v2))
    assert int(_squash(i)) == v1  # Deinterleave(i)
    assert int(_squash(np.uint64(i) >> np.uint64(1))) == v2  # Deinterleave(i>>1)


# --- geo/geo_dist_test.go ------------------------------------------------------

PARSE_DISTANCE_VECTORS = [
    ("5mi", 5 * 1609.344),
    ("3", 3.0),
    ("3m", 3.0),
    ("5km", 5000.0),
]


@pytest.mark.parametrize("dist,want_meters", PARSE_DISTANCE_VECTORS)
def test_parse_distance(dist, want_meters):
    assert parse_distance_km(dist) * 1000 == pytest.approx(want_meters)


@pytest.mark.parametrize("bad", ["km", ""])
def test_parse_distance_errors(bad):
    with pytest.raises(ValueError):
        parse_distance_km(bad)


HAVERSIN_VECTORS = [
    (0, 0, 0, 0, 0.0),
    (-180, 0, -180, 0, 0.0),
    (-180, 0, 180, 0, 0.0),
    (180, 0, 180, 0, 0.0),
    (0, 90, 0, 90, 0.0),
    (-180, 90, -180, 90, 0.0),
    (-180, 90, 180, 90, 0.0),
    (180, 90, 180, 90, 0.0),
    (0, 0, 180, 0, 6378.137 * math.pi),
    (-74.0059731, 40.7143528, -74.0059731, 40.7143528, 0.0),
    (-74.0059731, 40.7143528, -73.9844722, 40.759011, 5.286),
    (-74.0059731, 40.7143528, -74.007819, 40.718266, 0.4621),
    (-74.0059731, 40.7143528, -74.0088305, 40.7051157, 1.055),
    (-74.0059731, 40.7143528, -74, 40.7247222, 1.258),
    (-74.0059731, 40.7143528, -73.9962255, 40.731033, 2.029),
    (-74.0059731, 40.7143528, -73.95, 40.65, 8.572),
]


@pytest.mark.parametrize("lon1,lat1,lon2,lat2,want_km", HAVERSIN_VECTORS)
def test_haversin_distance(lon1, lat1, lon2, lat2, want_km):
    got = float(haversin_km(lon1, lat1, lon2, lat2))
    assert got == pytest.approx(want_km, abs=1e-2)


def test_haversin_nan_propagates():
    for args in [
        (1, 1, math.nan, 1),
        (1, 1, 1, math.nan),
        (1, math.nan, 1, 1),
        (math.nan, 1, 1, 1),
    ]:
        assert math.isnan(float(haversin_km(*args)))


# --- analysis/tokenmap_test.go -------------------------------------------------


def test_token_map_comment_styles():
    text = (
        "# full line comment\n"
        "marty\n"
        "steve # trailing comment\n"
        "| different format of comment\n"
        "dustin\n"
        "siri | different style trailing comment\n"
        "multiple words\twith different\twhitespace"
    )
    assert load_token_map(text) == frozenset(
        [
            "marty", "steve", "dustin", "siri",
            "multiple", "words", "with", "different", "whitespace",
        ]
    )


# --- geo/geo_test.go: morton codec + scaling + rect-from-distance ------------

GEO_TOL = 1e-6  # geo.go:36 geoTolerance


@pytest.mark.parametrize(
    "lon,lat",
    [
        (-180.0, -90.0),
        (-5, 27.3),
        (0, 0),
        (1.0, 1.0),
        (24.7, -80.4),
        (180.0, 90.0),
    ],
)
def test_morton_hash_unhash(lon, lat):
    from bleve_ray.index.geo import morton_hash, morton_unhash

    h = morton_hash(lon, lat)
    got_lon, got_lat = morton_unhash(np.asarray([h], dtype=np.uint64))
    assert abs(float(got_lon[0]) - lon) <= GEO_TOL
    assert abs(float(got_lat[0]) - lat) <= GEO_TOL


@pytest.mark.parametrize("lon", [-180.0, 0.0, 1.0, 180.0])
def test_scale_unscale_lon(lon):
    from bleve_ray.index.geo import _LON_SCALE, _MIN_LON, scale_lon

    s = scale_lon(lon)
    back = float(s) / _LON_SCALE + _MIN_LON
    assert abs(back - lon) <= GEO_TOL


@pytest.mark.parametrize("lat", [-90.0, 0.0, 1.0, 90.0])
def test_scale_unscale_lat(lat):
    from bleve_ray.index.geo import _LAT_SCALE, _MIN_LAT, scale_lat

    s = scale_lat(lat)
    back = float(s) / _LAT_SCALE + _MIN_LAT
    assert abs(back - lat) <= GEO_TOL


def test_rect_from_point_distance():
    from bleve_ray.index.geo import rect_from_point_distance

    # at the equator 1 degree of latitude is about 110567 meters
    _, min_lat, _, max_lat = rect_from_point_distance(0, 0, 110.567)
    assert abs(max_lat - 1) <= 1e-2
    assert abs(min_lat + 1) <= 1e-2


# --- document/field_numeric_test.go ------------------------------------------


def test_numeric_field_16_trie_terms():
    from bleve_ray.index.numeric import float64_to_int64, terms_for_value

    # a numeric field analyzes to 16 prefix-coded trie terms (64 bits /
    # precisionStep 4), all distinct shifts
    terms = terms_for_value(float64_to_int64(3.4))
    assert len(terms) == 16
    assert len(set(terms)) == 16
    shifts = [decode_prefix_coded(t)[1] for t in terms]
    assert shifts == list(range(0, 64, 4))
