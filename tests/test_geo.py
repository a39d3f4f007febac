"""Geo queries: morton-hash trie terms + bounding box / point distance
with exact docvalue filtering (reference geo/geo.go, sloppy.go,
search_geoboundingbox.go, search_geopointdistance.go)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bleve_ray.index import FieldConfig, IndexOptions, build_index
from bleve_ray.index.geo import (
    haversin_km,
    interleave,
    morton_hash,
    morton_ranges_for_rect,
    morton_unhash,
    parse_distance_km,
)
from bleve_ray.search import Index


def test_morton_roundtrip():
    rng = np.random.default_rng(3)
    lon = rng.uniform(-180, 180, 500)
    lat = rng.uniform(-90, 90, 500)
    h = morton_hash(lon, lat)
    lon2, lat2 = morton_unhash(h)
    # 32-bit quantization: ~1e-7 degrees resolution
    assert np.abs(lon - lon2).max() < 1e-6
    assert np.abs(lat - lat2).max() < 1e-6


def test_interleave_bits():
    assert int(interleave(np.uint64(0b11), np.uint64(0b00))) == 0b0101
    assert int(interleave(np.uint64(0b00), np.uint64(0b11))) == 0b1010


def test_haversin_known_distances():
    # Paris (2.3522, 48.8566) -> London (-0.1276, 51.5072) ~ 334 km
    d = float(haversin_km(2.3522, 48.8566, -0.1276, 51.5072))
    assert 330 < d < 345
    assert float(haversin_km(0, 0, 0, 0)) == 0.0


def test_parse_distance():
    assert parse_distance_km("5km") == 5.0
    assert parse_distance_km("500m") == 0.5
    assert parse_distance_km(1000) == 1.0  # bare number = meters
    assert abs(parse_distance_km("1mi") - 1.609344) < 1e-9


def test_morton_ranges_cover_rect_points():
    rng = np.random.default_rng(5)
    rect = (-10.0, 40.0, 5.0, 50.0)
    ranges = morton_ranges_for_rect(*rect)
    lon = rng.uniform(rect[0], rect[2], 300)
    lat = rng.uniform(rect[1], rect[3], 300)
    h = morton_hash(lon, lat).view(np.int64)
    for v in h:
        assert any(lo <= int(v) <= hi for lo, hi in ranges), int(v)


@pytest.fixture(scope="module")
def geo_index(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("geoidx")
    rng = np.random.default_rng(9)
    n = 300
    lon = np.round(rng.uniform(-180, 180, n), 4)
    lat = np.round(rng.uniform(-90, 90, n), 4)
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), type=pa.int64()),
            "pt": pa.StructArray.from_arrays(
                [pa.array(lon), pa.array(lat)], names=["lon", "lat"]
            ),
        }
    )
    src = str(d / "geo.parquet")
    pq.write_table(tbl, src)
    idx_dir = str(d / "idx")
    build_index(
        [src],
        idx_dir,
        IndexOptions(
            fields={"pt": FieldConfig(field_type="geo", positions=False)},
            doc_id_fields=["doc_id"],
            num_shards=2,
            bucket_bits=6,
        ),
    )
    return Index.open(idx_dir), lon, lat


def test_geo_bounding_box(geo_index):
    idx, lon, lat = geo_index
    min_lon, max_lon, min_lat, max_lat = -30.0, 60.0, -20.0, 45.0
    r = idx.search(
        {
            "query": {
                "top_left": {"lon": min_lon, "lat": max_lat},
                "bottom_right": {"lon": max_lon, "lat": min_lat},
                "field": "pt",
            },
            "size": 1000,
        }
    )
    want = {
        str(i)
        for i in range(len(lon))
        if min_lon <= lon[i] <= max_lon and min_lat <= lat[i] <= max_lat
    }
    got = {h.id for h in r.hits}
    assert got == want
    assert len(want) > 5


def test_geo_distance(geo_index):
    idx, lon, lat = geo_index
    qlon, qlat, dist = 10.0, 45.0, "2000km"
    r = idx.search(
        {
            "query": {
                "location": {"lon": qlon, "lat": qlat},
                "distance": dist,
                "field": "pt",
            },
            "size": 1000,
        }
    )
    d = haversin_km(qlon, qlat, lon, lat)
    want = {str(i) for i in range(len(lon)) if d[i] <= 2000.0}
    got = {h.id for h in r.hits}
    assert got == want
    assert len(want) > 2


def test_geohash_decode():
    from bleve_ray.index.geo import decode_geohash

    # u4pruydqqvj ~ (57.64911, 10.40744) — canonical geohash example
    lat, lon = decode_geohash("u4pruydqqvj")
    assert abs(lat - 57.64911) < 1e-4
    assert abs(lon - 10.40744) < 1e-4


def test_point_in_polygon():
    from bleve_ray.index.geo import point_in_polygon

    tri = [(0.0, 0.0), (10.0, 0.0), (5.0, 10.0)]
    assert point_in_polygon(5.0, 3.0, tri)
    assert not point_in_polygon(0.0, 9.0, tri)
    assert point_in_polygon(0.0, 0.0, tri)  # vertex tolerance
    assert not point_in_polygon(5.0, 1.0, [(0, 0), (1, 1)])  # degenerate


def test_geo_polygon_query(geo_index):
    idx, lon, lat = geo_index
    from bleve_ray.index.geo import point_in_polygon

    poly = [(-60.0, -30.0), (60.0, -30.0), (60.0, 50.0), (-60.0, 50.0)]
    r = idx.search(
        {
            "query": {"polygon_points": poly, "field": "pt"},
            "size": 1000,
        }
    )
    want = {
        str(i)
        for i in range(len(lon))
        if point_in_polygon(lon[i], lat[i], poly)
    }
    assert {h.id for h in r.hits} == want
    assert len(want) > 5


def test_geohash_location_in_distance_query(geo_index):
    from bleve_ray.index.geo import decode_geohash

    idx, lon, lat = geo_index
    r1 = idx.search(
        {
            "query": {"location": {"lon": 10.407, "lat": 57.649},
                      "distance": "3000km", "field": "pt"},
            "size": 1000,
        }
    )
    r2 = idx.search(
        {
            "query": {"location": "u4pruyd", "distance": "3000km",
                      "field": "pt"},
            "size": 1000,
        }
    )
    assert {h.id for h in r1.hits} == {h.id for h in r2.hits}


def _shape_search(idx, shape, relation="intersects"):
    r = idx.search(
        {
            "query": {
                "geometry": {"shape": shape, "relation": relation},
                "field": "pt",
            },
            "size": 1000,
            "score": "none",
        }
    )
    return {h.id for h in r.hits}


def test_geo_shape_envelope(geo_index):
    """geo_shape envelope == bounding box (geo_shape.go adapted to point
    fields)."""
    idx, lon, lat = geo_index
    got = _shape_search(
        idx, {"type": "envelope", "coordinates": [[-30.0, 45.0], [60.0, -20.0]]}
    )
    want = {
        str(i)
        for i in range(len(lon))
        if -30 <= lon[i] <= 60 and -20 <= lat[i] <= 45
    }
    assert got == want and len(want) > 5


def test_geo_shape_polygon_with_hole(geo_index):
    idx, lon, lat = geo_index
    outer = [[-60.0, -40.0], [60.0, -40.0], [60.0, 40.0], [-60.0, 40.0]]
    hole = [[-20.0, -15.0], [20.0, -15.0], [20.0, 15.0], [-20.0, 15.0]]
    got = _shape_search(
        idx, {"type": "polygon", "coordinates": [outer, hole]}
    )

    def inside(i):
        in_outer = -60 <= lon[i] <= 60 and -40 <= lat[i] <= 40
        in_hole = -20 < lon[i] < 20 and -15 < lat[i] < 15
        return in_outer and not in_hole

    want = {str(i) for i in range(len(lon)) if inside(i)}
    # boundary-exact points are tolerated either way; none exist in this
    # random fixture (4-decimal coords vs integer edges)
    assert got == want and len(want) > 5


def test_geo_shape_circle(geo_index):
    idx, lon, lat = geo_index
    got = _shape_search(
        idx,
        {"type": "circle", "coordinates": [0.0, 0.0], "radius": "3000km"},
    )
    assert got == {
        h.id
        for h in idx.search(
            {
                "query": {
                    "location": {"lon": 0.0, "lat": 0.0},
                    "distance": "3000km",
                    "field": "pt",
                },
                "size": 1000,
                "score": "none",
            }
        ).hits
    }


def test_geo_shape_multipolygon_and_point(geo_index):
    idx, lon, lat = geo_index
    p1 = [[[-170.0, -80.0], [-100.0, -80.0], [-100.0, -20.0], [-170.0, -20.0]]]
    p2 = [[[100.0, 20.0], [170.0, 20.0], [170.0, 80.0], [100.0, 80.0]]]
    got = _shape_search(
        idx, {"type": "multipolygon", "coordinates": [p1, p2]}
    )
    want = {
        str(i)
        for i in range(len(lon))
        if (-170 <= lon[i] <= -100 and -80 <= lat[i] <= -20)
        or (100 <= lon[i] <= 170 and 20 <= lat[i] <= 80)
    }
    assert got == want and len(want) > 3

    # exact point shape: equality with a known doc point
    got = _shape_search(
        idx, {"type": "point", "coordinates": [float(lon[7]), float(lat[7])]}
    )
    assert "7" in got


def test_geo_shape_contains_and_linestring(geo_index):
    idx, lon, lat = geo_index
    # contains: point doc contains only a coincident point shape
    got = _shape_search(
        idx,
        {"type": "point", "coordinates": [float(lon[3]), float(lat[3])]},
        relation="contains",
    )
    assert "3" in got
    assert (
        _shape_search(
            idx,
            {
                "type": "polygon",
                "coordinates": [
                    [[-180.0, -90.0], [180.0, -90.0], [180.0, 90.0],
                     [-180.0, 90.0]]
                ],
            },
            relation="contains",
        )
        == set()
    )
    # linestring through a doc point matches exactly that point
    got = _shape_search(
        idx,
        {
            "type": "linestring",
            "coordinates": [
                [float(lon[11]), float(lat[11])],
                [float(lon[11]) + 1.0, float(lat[11])],
            ],
        },
    )
    assert "11" in got


def test_sort_by_geo_distance(geo_index):
    """Object-form sort entry {"by": "geo_distance"} (sort.go
    ParseSearchSortObj + SortGeoDistance): hits ordered by haversine
    distance from the given location; desc reverses."""
    from bleve_ray.index.geo import haversin_km

    idx, lon, lat = geo_index
    qlon, qlat = 2.35, 48.86
    r = idx.search(
        {
            "query": {"match_all": {}},
            "size": 20,
            "sort": [
                {
                    "by": "geo_distance",
                    "field": "pt",
                    "location": {"lon": qlon, "lat": qlat},
                    "unit": "km",
                }
            ],
        }
    )
    assert len(r.hits) == 20
    dists = np.array(
        [haversin_km(qlon, qlat, lon[int(h.id)], lat[int(h.id)]) for h in r.hits]
    )
    assert (np.diff(dists) >= -1e-9).all()
    # the nearest returned doc is the true global nearest
    all_d = haversin_km(qlon, qlat, lon, lat)
    assert int(r.hits[0].id) == int(np.argmin(all_d))

    r_desc = idx.search(
        {
            "query": {"match_all": {}},
            "size": 5,
            "sort": [
                {
                    "by": "geo_distance",
                    "field": "pt",
                    "location": [qlon, qlat],
                    "desc": True,
                }
            ],
        }
    )
    d_desc = np.array(
        [
            haversin_km(qlon, qlat, lon[int(h.id)], lat[int(h.id)])
            for h in r_desc.hits
        ]
    )
    assert (np.diff(d_desc) <= 1e-9).all()
    assert int(r_desc.hits[0].id) == int(np.argmax(all_d))


def test_sort_object_forms_match_string_forms(geo_index):
    idx, _, _ = geo_index
    a = idx.search(
        {"query": {"match_all": {}}, "size": 10, "sort": [{"by": "id"}]}
    )
    b = idx.search(
        {"query": {"match_all": {}}, "size": 10, "sort": ["_id"]}
    )
    assert [h.id for h in a.hits] == [h.id for h in b.hits]
    c = idx.search(
        {
            "query": {"match_all": {}},
            "size": 10,
            "sort": [{"by": "id", "desc": True}],
        }
    )
    assert [h.id for h in c.hits] == [
        h.id for h in idx.search(
            {"query": {"match_all": {}}, "size": 10, "sort": ["-_id"]}
        ).hits
    ]


def test_morton_roundtrip_property():
    """Property: morton_hash -> morton_unhash round-trips within the
    scaled-coordinate quantization error over generated points."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from bleve_ray.index.geo import morton_hash, morton_unhash

    @settings(max_examples=200, deadline=None)
    @given(
        st.floats(min_value=-180, max_value=180, allow_nan=False),
        st.floats(min_value=-90, max_value=90, allow_nan=False),
    )
    def check(lon, lat):
        h = morton_hash(np.array([lon]), np.array([lat]))
        lon2, lat2 = morton_unhash(h)
        # 32-bit quantization: ~8.4e-8 of the range per step
        assert abs(float(lon2[0]) - lon) < 360 / (1 << 31)
        assert abs(float(lat2[0]) - lat) < 180 / (1 << 31)

    check()


def test_geo_bounding_box_dateline(geo_index):
    # box crossing the antimeridian: top_left lon 150, bottom_right -150
    # (the reference splits it into two boxes, geo_boundingbox.go:68-82)
    idx, lon, lat = geo_index
    r = idx.search(
        {
            "query": {
                "top_left": {"lon": 150.0, "lat": 60.0},
                "bottom_right": {"lon": -150.0, "lat": -60.0},
                "field": "pt",
            },
            "size": 1000,
        }
    )
    want = {
        str(i)
        for i in range(len(lon))
        if (lon[i] >= 150.0 or lon[i] <= -150.0) and -60.0 <= lat[i] <= 60.0
    }
    assert {h.id for h in r.hits} == want
    assert len(want) > 5


def test_geo_distance_near_dateline(geo_index):
    # a 2000 km circle centred 1° east of the antimeridian must catch
    # points on BOTH sides of ±180
    idx, lon, lat = geo_index
    qlon, qlat = 179.0, 0.0
    r = idx.search(
        {
            "query": {
                "location": {"lon": qlon, "lat": qlat},
                "distance": "2000km",
                "field": "pt",
            },
            "size": 1000,
        }
    )
    d = haversin_km(qlon, qlat, lon, lat)
    want = {str(i) for i in range(len(lon)) if d[i] <= 2000.0}
    got = {h.id for h in r.hits}
    assert got == want
    # the fixture's uniform spread should put at least one point on the
    # far (western) side of the line inside the circle
    assert any(lon[int(i)] < 0 for i in want), "fixture lost its far side"
