"""geo/parse_test.go TestExtractGeoPoint vectors (23-205), applied to
extract_geo_point.  The Go-struct / interface cases map onto the dict
prefix-match path (the reference's reflection fallback); bool / nil /
wrong-arity cases must fail."""

import numpy as np
import pytest

from bleve_ray.index.geo import encode_geohash, extract_geo_point

CASES = [
    # (value, lon, lat, ok)
    ({"lat": 5, "lon": 5}, 5.0, 5.0, True),          # int values
    ({"lat": np.uint32(5), "lon": np.uint32(5)}, 5.0, 5.0, True),  # uints
    ({"lat": 5.0, "lon": 5.0}, 5.0, 5.0, True),      # parsed-JSON floats
    ({"lat": True, "lon": False}, 0.0, 0.0, False),  # bool unsupported
    ({"lat": 5.0, "lng": 5.0}, 5.0, 5.0, True),      # lng variant
    ({"Lon": 3.0, "Lat": 7.5}, 3.0, 7.5, True),      # struct-style keys
    ({"Lng": 3.0, "Lat": 7.5}, 3.0, 7.5, True),      # struct w/ Lng
    ({"longitude": 4.0, "latitude": 6.9}, 4.0, 6.9, True),  # prefix match
    ([3.4, 5.9], 3.4, 5.9, True),                    # GeoJSON slice
    ([3.4, 5.9, 9.4], 0.0, 0.0, False),              # slice too long
    (np.array([3.4, 5.9]), 3.4, 5.9, True),          # float array
    ({"lat": None, "lon": None}, 0.0, 0.0, False),   # nil values
    (None, 0.0, 0.0, False),                         # nil input
    # string forms (parse.go:79-106): "lat,lon" then geohash
    ("5.9,3.4", 3.4, 5.9, True),
    ("not,a,point", 0.0, 0.0, False),
    # "junk" is all base32 chars -> decodes as a geohash cell center
    ("junk", 87.71484375, -66.708984375, True),
    ("bad!hash", 0.0, 0.0, False),        # invalid base32 char
    ("toolongforgeohash", 0.0, 0.0, False),  # > 12 chars, not a geohash
    ("", 0.0, 0.0, False),
]


@pytest.mark.parametrize("value,lon,lat,ok", CASES,
                         ids=[repr(c[0])[:40] for c in CASES])
def test_extract_geo_point(value, lon, lat, ok):
    glon, glat, gok = extract_geo_point(value)
    assert gok == ok
    assert glon == pytest.approx(lon)
    assert glat == pytest.approx(lat)


def test_extract_geohash_string_roundtrip():
    gh = encode_geohash(6.9, 4.0, 12)
    lon, lat, ok = extract_geo_point(gh)
    assert ok
    assert lon == pytest.approx(4.0, abs=1e-6)
    assert lat == pytest.approx(6.9, abs=1e-6)


def test_struct_lng_field_indexes(ray_session, tmp_path):
    """A geo struct column named lat/lng (not lon) must index and match
    a bounding-box query (build-path field resolution parity)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bleve_ray.index import FieldConfig, IndexOptions, build_index
    from bleve_ray.search import Index

    src = str(tmp_path / "pts.parquet")
    pq.write_table(
        pa.table({
            "doc_id": ["inside", "outside"],
            "loc": [{"lat": 40.0, "lng": -74.0}, {"lat": 10.0, "lng": 10.0}],
        }),
        src,
    )
    out = str(tmp_path / "idx")
    build_index(
        [src], out,
        IndexOptions(fields={"loc": FieldConfig(field_type="geo", positions=False)},
                     doc_id_fields=["doc_id"], num_shards=1, bucket_bits=8,
                     docvalue_fields=["loc"]),
    )
    idx = Index.open(out)
    res = idx.search({"query": {
        "top_left": {"lon": -75.0, "lat": 41.0},
        "bottom_right": {"lon": -73.0, "lat": 39.0},
        "field": "loc",
    }, "size": 10})
    assert [h.id for h in res.hits] == ["inside"]
