"""Primitive geoshape relation vectors mechanically extracted from the
reference's search/searcher/geoshape_{intersects,within,contains}_test.go
(tests/data/geoshape_rel_vectors.json; extraction noted in the r4 log).
Each vector indexes one doc shape and queries with one shape+relation;
here the pair runs directly through parse_geojson + shape_relation,
the same predicate the geo_shape query path uses for exact filtering."""

import json
import os

import pytest

from bleve_ray.index.geo_shapes import parse_geojson, shape_relation

_VECS = json.load(
    open(os.path.join(os.path.dirname(__file__), "data",
                      "geoshape_rel_vectors.json"))
)

# documented divergences from the s2-backed reference, keyed by
# (test, desc):
#  - "geodesic": the reference computed the probe points ON the s2
#    geodesic between the vertices; in planar lat/lon space they are
#    ~20 m off the straight segment, so the planar predicate correctly
#    reports no intersection for the coordinates as given
#  - "guardrail": polygon spans >180 deg of longitude at high latitude;
#    parse_geojson rejects it as ambiguous under planar classification
#    (see _split_poly_antimeridian) where s2 picks an interior by
#    orientation
#  - "envelope-open": the reference's envelope containment excludes
#    shapes sharing the rect boundary (open edges) while polygons are
#    closed; this engine treats both as closed
# r5: the former "geodesic" (planar line math), "guardrail"
# (>180-degree-lon rejection) and "envelope-open" (open-interior
# envelope containment) divergences are all FIXED — every vector
# below now runs and passes.
_DIVERGENT = {}

# one reference vector's DocShapeVertices is a doc NAME, not
# coordinates (extraction artifact of a malformed fixture entry)
_SKIP = {("TestEnvelopePointIntersects", "point outside bounded rectangle")}


@pytest.mark.parametrize(
    "vec", _VECS,
    ids=[f'{v["relation"]}:{v["test"]}:{v["desc"][:40]}' for v in _VECS],
)
def test_geoshape_relation_vector(vec):
    key = (vec["test"], vec["desc"])
    if key in _SKIP:
        pytest.skip("malformed reference fixture entry")
    if key in _DIVERGENT:
        pytest.xfail(f"documented divergence: {_DIVERGENT[key]}")
    doc = parse_geojson(vec["doc"])
    query = parse_geojson(vec["query"])
    got = shape_relation(doc, query, vec["relation"])
    assert got == vec["expected"], vec["desc"]


def test_multipolygon_within_multipolygon_handported():
    """geoshape_within_test.go TestMultiPolygonWithin (the extractor
    skipped these two on a Go-literal quirk): a doc multipolygon is
    within a query multipolygon when each part fits some query part."""
    q = {"type": "multipolygon", "coordinates": [
        [[[16, 6], [41, 11], [11, 21], [6, 11], [16, 6]]],
        [[[31, 21], [46, 41], [11, 41], [31, 21]]],
    ]}
    doc_in = {"type": "multipolygon",
              "coordinates": [[[[31, 21], [46, 41], [11, 41], [31, 21]]]]}
    doc_out = {"type": "multipolygon",
               "coordinates": [[[[31, 21], [46, 41], [16, 46], [31, 21]]]]}
    assert shape_relation(parse_geojson(doc_in), parse_geojson(q),
                          "within") is True
    assert shape_relation(parse_geojson(doc_out), parse_geojson(q),
                          "within") is False
