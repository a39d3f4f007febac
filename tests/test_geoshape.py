"""geoshape FIELD indexing + geo_shape query over shape docs
(reference document/field_geoshape.go + search_geoshape.go; cell scheme
in bleve_ray/index/geo_shapes.py).  End-to-end results are compared to
brute-force relation evaluation over every doc, so candidate generation
(cover cells + ancestor/descendant token expansion) is verified to lose
nothing."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bleve_ray.index import FieldConfig, IndexOptions, build_index
from bleve_ray.index.geo_shapes import (
    cover_cells,
    parse_geojson,
    shape_relation,
    shape_tokens,
)
from bleve_ray.search import Index


def _corpus(n=240):
    """Deterministic shape mix: diamonds, segments, points."""
    docs = []
    for i in range(n):
        cx = ((i * 97) % 340) - 170 + 0.5
        cy = ((i * 53) % 160) - 80 + 0.5
        w = 0.5 + (i % 5) * 0.7
        k = i % 3
        if k == 0:
            shp = {
                "type": "polygon",
                "coordinates": [
                    [[cx, cy - w], [cx + w, cy], [cx, cy + w], [cx - w, cy]]
                ],
            }
        elif k == 1:
            shp = {
                "type": "linestring",
                "coordinates": [[cx - w, cy - w], [cx + w, cy + w]],
            }
        else:
            shp = {"type": "point", "coordinates": [cx, cy]}
        docs.append((f"d{i:04d}", json.dumps(shp)))
    return docs


QUERIES = [
    # [minLon, maxLat], [maxLon, minLat] envelope
    ({"type": "envelope", "coordinates": [[-40, 30], [35, -25]]},
     "intersects"),
    ({"type": "envelope", "coordinates": [[-40, 30], [35, -25]]}, "within"),
    ({"type": "polygon",
      "coordinates": [[[0, -50], [50, 0], [0, 50], [-50, 0]]]},
     "intersects"),
    ({"type": "polygon",
      "coordinates": [[[0, -50], [50, 0], [0, 50], [-50, 0]],
                      [[-10, -10], [10, -10], [10, 10], [-10, 10]]]},
     "intersects"),
    ({"type": "circle", "coordinates": [10.5, 20.5], "radius": "2500km"},
     "intersects"),
    ({"type": "point", "coordinates": [-169.5, -79.5]}, "contains"),
    # consecutive lon deltas stay < 180: a lon jump >180 now reads as an
    # antimeridian crossing (RFC 7946), not a globe-spanning diagonal
    ({"type": "linestring",
      "coordinates": [[-170, -85], [0, 0], [170, 85]]},
     "intersects"),
]


@pytest.fixture(scope="module")
def shape_index(ray_session, tmp_path_factory):
    docs = _corpus()
    d = str(tmp_path_factory.mktemp("shapesrc"))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([x[0] for x in docs]),
                "shape": pa.array([x[1] for x in docs]),
            }
        ),
        os.path.join(d, "shapes.parquet"),
    )
    idxd = str(tmp_path_factory.mktemp("shapeidx"))
    build_index(
        [os.path.join(d, "shapes.parquet")],
        idxd,
        IndexOptions(
            fields={
                "shape": FieldConfig(field_type="geoshape", positions=False)
            },
            doc_id_fields=["doc_id"],
            num_shards=2,
            bucket_bits=16,
        ),
    )
    return Index.open(idxd), docs


@pytest.mark.parametrize("qshape,relation", QUERIES)
def test_geoshape_query_matches_bruteforce(shape_index, qshape, relation):
    idx, docs = shape_index
    r = idx.search(
        {
            "query": {
                "geometry": {"shape": qshape, "relation": relation},
                "field": "shape",
            },
            "size": 10_000,
            "score": "none",
        }
    )
    got = sorted(h.id for h in r.hits)
    qprims = parse_geojson(qshape)
    want = sorted(
        did
        for did, s in docs
        if shape_relation(parse_geojson(s), qprims, relation)
    )
    assert got == want
    if relation == "intersects":
        assert len(want) > 0


def test_cover_cells_cover_the_shape():
    """Every point probe inside the shape lies in some cover cell."""
    from bleve_ray.index.geo_shapes import _rect_of_path

    shp = {
        "type": "polygon",
        "coordinates": [[[0, -5], [5, 0], [0, 5], [-5, 0]]],
    }
    prims = parse_geojson(shp)
    paths = cover_cells(prims)
    rects = [_rect_of_path(p) for p in paths]
    import numpy as np

    rng = np.random.default_rng(7)
    pts = rng.uniform(-5, 5, size=(500, 2))
    for px, py in pts:
        if abs(px) + abs(py) < 5 - 1e-6:
            assert any(
                x1 <= px <= x2 and y1 <= py <= y2
                for x1, y1, x2, y2 in rects
            ), (px, py)


def test_cover_cells_budget():
    # world-sized shape stays within the cell budget
    shp = {
        "type": "envelope",
        "coordinates": [[-179, 89], [179, -89]],
    }
    toks = shape_tokens(shp, max_cells=64)
    assert 1 <= len(toks) <= 64


def test_geoshape_multipolygon_and_collection(shape_index):
    idx, docs = shape_index
    q = {
        "type": "geometrycollection",
        "geometries": [
            {"type": "point", "coordinates": [-169.5, -79.5]},
            {
                "type": "multipolygon",
                "coordinates": [
                    [[[100, 10], [140, 10], [140, 60], [100, 60]]],
                    [[[-140, -60], [-100, -60], [-100, -10], [-140, -10]]],
                ],
            },
        ],
    }
    r = idx.search(
        {
            "query": {
                "geometry": {"shape": q, "relation": "intersects"},
                "field": "shape",
            },
            "size": 10_000,
            "score": "none",
        }
    )
    got = sorted(h.id for h in r.hits)
    qprims = parse_geojson(q)
    want = sorted(
        did
        for did, s in docs
        if shape_relation(parse_geojson(s), qprims, "intersects")
    )
    assert got == want and len(want) > 0


# --- antimeridian (dateline) guardrails -------------------------------------


def test_dateline_polygon_splits_and_classifies():
    """A Fiji-style polygon written with a +170 -> -170 longitude jump
    crosses the dateline; planar math unsplit would treat it as a
    globe-spanning sliver and invert every classification."""
    from bleve_ray.index.geo_shapes import parse_geojson, shape_relation

    fiji = parse_geojson(
        {
            "type": "polygon",
            "coordinates": [
                [[170, -5], [-170, -5], [-170, 5], [170, 5], [170, -5]]
            ],
        }
    )
    # split into two in-range polys
    assert len(fiji) == 2
    for kind, (outer, _holes) in fiji:
        assert kind == "poly"
        assert all(-180.0 <= x <= 180.0 for x, _ in outer)

    def pt(x, y):
        return [("pt", (x, y))]

    # inside on both sides of the seam
    assert shape_relation(pt(175.0, 0.0), fiji, "intersects")
    assert shape_relation(pt(-175.0, 0.0), fiji, "intersects")
    assert shape_relation(pt(175.0, 0.0), fiji, "within")
    assert shape_relation(pt(-175.0, 0.0), fiji, "within")
    # clearly outside (would be INSIDE the unsplit planar sliver's span)
    assert not shape_relation(pt(0.0, 0.0), fiji, "intersects")
    assert not shape_relation(pt(160.0, 0.0), fiji, "intersects")
    assert not shape_relation(pt(175.0, 10.0), fiji, "intersects")


def test_dateline_envelope_splits():
    from bleve_ray.index.geo_shapes import parse_geojson, shape_relation

    env = parse_geojson(
        {"type": "envelope", "coordinates": [[170, 5], [-170, -5]]}
    )
    assert len(env) == 2
    assert shape_relation([("pt", (179.0, 0.0))], env, "intersects")
    assert shape_relation([("pt", (-179.0, 0.0))], env, "intersects")
    assert not shape_relation([("pt", (0.0, 0.0))], env, "intersects")


def test_dateline_linestring_splits():
    from bleve_ray.index.geo_shapes import parse_geojson

    line = parse_geojson(
        {"type": "linestring", "coordinates": [[178, 0], [-178, 2]]}
    )
    assert len(line) == 2
    for kind, pts in line:
        assert kind == "line"
        assert all(-180.0 <= x <= 180.0 for x, _ in pts)
    # the seam point is shared
    assert any(abs(abs(x) - 180.0) < 1e-9 for _, pts in line for x, _ in pts)


def test_huge_polygon_answers_geodesically():
    """r5: rings genuinely spanning >180 degrees of longitude are no
    longer rejected — they evaluate as oriented spherical loops with
    great-circle edges (geo_sphere.py).  This 300-degree equatorial
    band contains points inside the band across its whole span and
    excludes points outside it."""
    from bleve_ray.index.geo_shapes import parse_geojson, shape_relation

    prims = parse_geojson(
        {
            "type": "polygon",
            "coordinates": [
                [[-150, -10], [0, -10], [150, -10], [150, 10],
                 [0, 10], [-150, 10], [-150, -10]]
            ],
        }
    )
    assert [k for k, _ in prims] == ["spoly"]

    def pt(x, y):
        return [("pt", (x, y))]

    for lon in (-150, -90, 0, 90, 150):
        assert shape_relation(pt(lon, 0), prims, "intersects")
        assert shape_relation(pt(lon, 0), prims, "within")
    # outside: beyond the lon span (the 60-degree gap through 180) and
    # beyond the lat band
    assert not shape_relation(pt(180, 0), prims, "intersects")
    assert not shape_relation(pt(170, 0), prims, "intersects")
    assert not shape_relation(pt(0, 20), prims, "intersects")
    # great-circle edges BULGE poleward: the southern boundary arc from
    # (-150,-10) to (0,-10) dips to ~-34 degrees near lon -75, so a
    # planar-thinking "outside" point at -20 lat is geodesically inside
    assert shape_relation(pt(-75, -25), prims, "intersects")
    assert not shape_relation(pt(-75, -50), prims, "intersects")


def test_dateline_doc_shape_indexes_and_matches(ray_session, tmp_path):
    """End-to-end: a dateline-crossing DOC polygon is indexed (split
    cover cells) and found by point queries on both sides of the seam."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bleve_ray.index import FieldConfig, IndexOptions, build_index
    from bleve_ray.search import Index

    import json as _json

    shapes = [
        _json.dumps({
            "type": "polygon",
            "coordinates": [
                [[170, -5], [-170, -5], [-170, 5], [170, 5], [170, -5]]
            ],
        }),
        _json.dumps({"type": "point", "coordinates": [0.0, 0.0]}),
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1], type=pa.int64()),
            "geometry": pa.array(shapes),
        }
    )
    src = str(tmp_path / "t.parquet")
    pq.write_table(tbl, src)
    idx_dir = str(tmp_path / "idx")
    build_index(
        [src],
        idx_dir,
        IndexOptions(
            fields={
                "geometry": FieldConfig(
                    analyzer="keyword", positions=False,
                    field_type="geoshape",
                )
            },
            doc_id_fields=["doc_id"],
            num_shards=1,
            bucket_bits=4,
        ),
    )
    idx = Index.open(idx_dir)

    def q(x, y):
        r = idx.search(
            {
                "query": {
                    "geometry": {
                        "shape": {"type": "point", "coordinates": [x, y]},
                        "relation": "intersects",
                    },
                    "field": "geometry",
                },
                "size": 10,
            }
        )
        return sorted(h.id for h in r.hits)

    assert q(175.0, 0.0) == ["0"]
    assert q(-175.0, 0.0) == ["0"]
    assert q(0.0, 0.0) == ["1"]
    assert q(160.0, 0.0) == []
