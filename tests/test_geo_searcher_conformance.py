"""Geo searcher conformance over the reference's setupGeo /
setupGeoPolygonPoints fixtures:

- TestGeoBoundingBox (search/searcher/search_geoboundingbox_test.go:31-50):
  ten docs a..j at (i+0.0015, i+0.0015); six boxes incl. degenerate and
  reversed bounds.
- TestGeoPointDistance (search_geopointdistance_test.go:27-41): distances
  in meters around the equator approximation.
- TestSimpleGeoPolygons + TestRealGeoPolygons
  (search_geopolygon_test.go:30-105): triangle vertices count as inside,
  concave polygons, degenerate all-same-vertex polygon, real-world
  coordinates.
"""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bleve_ray.index import FieldConfig, IndexOptions, build_index
from bleve_ray.search import Index


def _build_geo(tmp, name, ids, lons, lats):
    src = str(tmp / f"{name}.parquet")
    pq.write_table(
        pa.table({
            "doc_id": ids,
            "loc": [{"lon": lo, "lat": la} for lo, la in zip(lons, lats)],
        }),
        src,
    )
    out = str(tmp / f"{name}_idx")
    build_index(
        [src], out,
        IndexOptions(
            fields={"loc": FieldConfig(field_type="geo", positions=False)},
            doc_id_fields=["doc_id"], num_shards=1, bucket_bits=6,
        ),
    )
    return Index.open(out)


@pytest.fixture(scope="module")
def geo_index(ray_session, tmp_path_factory):
    # setupGeo: docs a..j at (0.0015+i, 0.0015+i)
    tmp = tmp_path_factory.mktemp("refgeo")
    ids = [chr(ord("a") + i) for i in range(10)]
    coords = [i + 0.0015 for i in range(10)]
    return _build_geo(tmp, "geo", ids, coords, coords)


@pytest.fixture(scope="module")
def polygon_index(ray_session, tmp_path_factory):
    # setupGeoPolygonPoints: k..u + amoeba/communiti
    tmp = tmp_path_factory.mktemp("refgeopoly")
    docs = [
        ("k", -80.86469327, 35.2782),
        ("l", -80.8713, 35.28138),
        ("m", -84.25, 33.153),
        ("n", -89.992, 35.063),
        ("o", -71.648, 42.437),
        ("p", -80.016, 40.314),
        ("q", -111.919, 33.494),
        ("r", 1.5, 1.1),
        ("s", 2, 1.5),
        ("t", 2.0, 1.9),
        ("u", 2.0, 1.0),
        ("amoeba", 77.60490, 12.97467),
        ("communiti", 77.608237, 12.97237),
    ]
    return _build_geo(
        tmp, "poly",
        [d[0] for d in docs],
        [float(d[1]) for d in docs],
        [float(d[2]) for d in docs],
    )


BBOX_VECTORS = [
    (10.001, 10.001, 20.002, 20.002, []),
    (0.001, 0.001, 0.002, 0.002, ["a"]),
    (0.001, 0.001, 1.002, 1.002, ["a", "b"]),
    (0.001, 0.001, 9.002, 9.002,
     ["a", "b", "c", "d", "e", "f", "g", "h", "i", "j"]),
    # same upper-left, bottom-right point
    (25, 25, 25, 25, []),
    # box that would return points, but points reversed
    (0.002, 0.002, 0.001, 0.001, []),
]


@pytest.mark.parametrize("min_lon,min_lat,max_lon,max_lat,want", BBOX_VECTORS)
def test_geo_bounding_box_vectors(
    geo_index, min_lon, min_lat, max_lon, max_lat, want
):
    r = geo_index.search({
        "query": {
            "top_left": {"lon": min_lon, "lat": max_lat},
            "bottom_right": {"lon": max_lon, "lat": min_lat},
            "field": "loc",
        },
        "size": 100,
    })
    assert sorted(h.id for h in r.hits) == want


DIST_VECTORS = [
    # approx 110567m per degree at equator
    (0.0, 0.0, 0, []),
    (0.0, 0.0, 110567, ["a"]),
    (0.0, 0.0, 2 * 110567, ["a", "b"]),
    # stretching our approximation here
    (0.0, 0.0, 15 * 110567,
     ["a", "b", "c", "d", "e", "f", "g", "h", "i", "j"]),
]


@pytest.mark.parametrize("lon,lat,dist_m,want", DIST_VECTORS)
def test_geo_point_distance_vectors(geo_index, lon, lat, dist_m, want):
    r = geo_index.search({
        "query": {
            "location": {"lon": lon, "lat": lat},
            "distance": f"{dist_m}m",
            "field": "loc",
        },
        "size": 100,
    })
    assert sorted(h.id for h in r.hits) == want


POLYGON_VECTORS = [
    # points inside a triangle & on vertices: r,s inside; t,u on vertices
    ([(1.0, 1.0), (2.0, 1.9), (2.0, 1.0)], ["r", "s", "t", "u"]),
    # non overlapping polygon for the indexed documents
    ([(3.0, 1.0), (4.0, 2.5), (3.0, 2.0)], []),
    ([(-80.881, 35.282), (-80.858, 35.281), (-80.864, 35.270)],
     ["k", "l"]),
    ([(-82.467, 36.356), (-78.127, 36.321), (-80.555, 32.932),
      (-84.807, 33.111)], ["k", "l", "m"]),
    # same polygon vertices
    ([(-82.467, 36.356)] * 4, []),
    # non-overlapping polygon
    ([(-89.113, 36.400), (-93.947, 36.471), (-93.947, 34.031)], []),
    # concave polygon with doc n inside the hands but outside the polygon
    ([(-71.65, 42.446), (-71.649, 42.428), (-71.640, 42.445),
      (-71.649, 42.435)], []),
    # V-like concave polygon with doc p inside the bottom corner
    ([(-80.304, 40.740), (-80.038, 40.239), (-79.562, 40.786),
      (-80.018, 40.328)], ["p"]),
    ([(-111.918, 33.515), (-111.938, 33.494), (-111.944, 33.481),
      (-111.886, 33.517), (-111.919, 33.468), (-111.929, 33.508)],
     ["q"]),
    # real points near cb bangalore
    ([(77.607749, 12.974872), (77.610110, 12.971725),
      (77.606912, 12.972530), (77.603780, 12.975112)],
     ["amoeba", "communiti"]),
]


@pytest.mark.parametrize("polygon,want", POLYGON_VECTORS)
def test_geo_polygon_vectors(polygon_index, polygon, want):
    r = polygon_index.search({
        "query": {"polygon_points": list(polygon), "field": "loc"},
        "size": 100,
    })
    assert sorted(h.id for h in r.hits) == want


# --- TestComplexGeoPolygons (search_geopolygon_test.go:303-363) --------------
# self-intersecting polygons resolved by the even-odd ray-cast rule

COMPLEX_POLY_CASES = [
    (
        # bowtie-of-triangles; a,b,c inside, d on a vertex
        [(6.0, 2.0), (3.0, 4.0), (9.0, 6.0), (3.0, 8.0), (6.0, 10.0),
         (6.0, 2.0)],
        [("a", 3, 4), ("b", 7, 6), ("c", 4, 8.1), ("d", 6, 10.0),
         ("e", 5, 6), ("f", 7, 5)],
        ["a", "b", "c", "d"],
    ),
    (
        # hourglass
        [(7.0, 2.0), (1.0, 8.0), (1.0, 2.0), (7.0, 8.0), (7.0, 2.0)],
        [("a", 6, 5), ("b", 5, 5), ("c", 3, 5.0), ("d", 2, 4.0),
         ("e", 5, 3), ("f", 4, 4)],
        ["a", "b", "c", "d"],
    ),
]


@pytest.mark.parametrize("polygon,points,want", COMPLEX_POLY_CASES)
def test_complex_geo_polygons(
    ray_session, tmp_path_factory, polygon, points, want
):
    tmp = tmp_path_factory.mktemp("complexpoly")
    idx = _build_geo(
        tmp, "cx",
        [p[0] for p in points],
        [float(p[1]) for p in points],
        [float(p[2]) for p in points],
    )
    r = idx.search({
        "query": {"polygon_points": list(polygon), "field": "loc"},
        "size": 100,
    })
    assert sorted(h.id for h in r.hits) == want
