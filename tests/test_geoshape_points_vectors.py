"""Reference geoshape point/multipoint golden vectors
(search/searcher/search_geoshape_points_test.go: setupGeoJsonShapesIndex
fixture + TestGeoJsonPointContainsQuery, TestGeoJsonMultiPointWithInQuery,
TestGeoJsonMultiPointIntersectsQuery) run end-to-end through the
geoshape field index and geo_shape query path.

The reference's "multilinestring1" fixture packs all six vertices into
one part, i.e. it indexes a single 6-point linestring; ported as such.
"""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bleve_ray.index import FieldConfig, IndexOptions, build_index
from bleve_ray.search import Index

POLYGON1 = [[
    [77.5853419303894, 12.953977766785052],
    [77.58405447006226, 12.95393594361393],
    [77.5819730758667, 12.9495026476557],
    [77.58068561553955, 12.94883346405509],
    [77.58019208908081, 12.948331575175299],
    [77.57991313934326, 12.943814529775414],
    [77.58497714996338, 12.94394000436408],
    [77.58517026901245, 12.9446301134728],
    [77.58572816848755, 12.945508431393435],
    [77.58785247802734, 12.946365833997325],
    [77.58967638015747, 12.946428570657417],
    [77.59070634841918, 12.947474179333993],
    [77.59317398071289, 12.948875288082773],
    [77.59167194366454, 12.949962710338657],
    [77.59077072143555, 12.950276388953625],
    [77.59098529815674, 12.951196510612728],
    [77.58729457855225, 12.952472128200755],
    [77.5853419303894, 12.953977766785052],
]]

POLYGON_WITH_HOLE1 = [
    [
        [77.59991168975829, 12.972232910164502],
        [77.6039457321167, 12.97582941279006],
        [77.60424613952637, 12.98168407323241],
        [77.59974002838135, 12.985489528568463],
        [77.59321689605713, 12.979300406693417],
        [77.59991168975829, 12.972232910164502],
    ],
    [
        [77.59682178497314, 12.975787593290978],
        [77.60295867919922, 12.975787593290978],
        [77.60295867919922, 12.98143316204164],
        [77.59682178497314, 12.98143316204164],
        [77.59682178497314, 12.975787593290978],
    ],
]

FIXTURE = [
    ("polygon1", {"type": "polygon", "coordinates": POLYGON1}),
    ("envelope1", {"type": "envelope", "coordinates": [
        [80.93696594238281, 26.33957605983274],
        [81.28440856933594, 26.351267272877074],
    ]}),
    ("circle1", {"type": "circle",
                 "coordinates": [77.59137153625487, 12.952660333521468],
                 "radius": "900m"}),
    ("linestring1", {"type": "linestring", "coordinates": [
        [77.5841188430786, 12.957093573282744],
        [77.57776737213135, 12.952074805390097],
    ]}),
    ("multilinestring1", {"type": "linestring", "coordinates": [
        [77.57227420806883, 12.948687079902895],
        [77.57600784301758, 12.954165970968194],
        [77.5779390335083, 12.94471376293191],
        [77.57218837738037, 12.948268838994263],
        [77.57781028747559, 12.951740217268595],
        [77.5779390335083, 12.945006535817749],
    ]}),
    ("multipoint1", {"type": "multipoint", "coordinates": [
        [77.56618022918701, 12.958180959662695],
        [77.56407737731932, 12.951614746607163],
        [77.56922721862793, 12.956173473406446],
    ]}),
    ("polygonWithHole1", {"type": "polygon",
                          "coordinates": POLYGON_WITH_HOLE1}),
]


@pytest.fixture(scope="module")
def shapes_index(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("refshapesrc"))
    pq.write_table(
        pa.table({
            "doc_id": pa.array([x[0] for x in FIXTURE]),
            "geometry": pa.array([json.dumps(x[1]) for x in FIXTURE]),
        }),
        os.path.join(d, "shapes.parquet"),
    )
    idxd = str(tmp_path_factory.mktemp("refshapeidx"))
    build_index(
        [os.path.join(d, "shapes.parquet")],
        idxd,
        IndexOptions(
            fields={"geometry": FieldConfig(field_type="geoshape",
                                            positions=False)},
            doc_id_fields=["doc_id"],
            num_shards=2,
            bucket_bits=16,
        ),
    )
    return Index.open(idxd)


def _run(idx, shape, relation):
    r = idx.search({
        "query": {"geometry": {"shape": shape, "relation": relation},
                  "field": "geometry"},
        "size": 100,
        "score": "none",
    })
    return sorted(h.id for h in r.hits)


POINT_CONTAINS = [
    ([77.58334636688232, 12.948268838994263], ["polygon1"]),
    ([77.58553504943848, 12.954040501528555], ["circle1"]),
    ([77.59293794631958, 12.948896200093982], ["circle1", "polygon1"]),
    ([77.5614595413208, 12.953287683563568], []),
    ([81.28166198730469, 26.34203746601541], ["envelope1"]),
    ([77.57776737213135, 12.952074805390097], ["linestring1"]),
    ([77.5779390335083, 12.945006535817749], ["multilinestring1"]),
    ([77.56407737731932, 12.951614746607163], ["multipoint1"]),
    ([77.60334491729736, 12.979844051951334], ["polygonWithHole1"]),
    ([77.60244369506836, 12.976247607394027], []),
]


@pytest.mark.parametrize("point,want", POINT_CONTAINS)
def test_point_contains_query(shapes_index, point, want):
    shape = {"type": "point", "coordinates": point}
    assert _run(shapes_index, shape, "contains") == sorted(want)


MULTIPOINT_CONTAINS = [
    ([[77.58334636688232, 12.948268838994263],
      [77.58467674255371, 12.944295515355652]], ["polygon1"]),
    ([[77.58553504943848, 12.954040501528555],
      [77.58643627166747, 12.956089827794571]], ["circle1"]),
    ([[81.28166198730469, 26.34203746601541],
      [80.94314575195312, 26.346960121309415]], ["envelope1"]),
    ([[77.59293794631958, 12.948896200093982],
      [77.58532047271729, 12.953789562459688]], ["circle1", "polygon1"]),
    ([[77.58334636688232, 12.948268838994263],
      [77.58643627166747, 12.956089827794571],
      [77.5615, 12.9533]], []),
    ([[77.5841188430786, 12.957093573282744],
      [77.57776737213135, 12.952074805390097]], ["linestring1"]),
    ([[77.5841188430786, 12.957093573282744],
      [77.57776737213135, 12.952074805390097],
      [77.58334636688232, 12.948268838994263]], []),
    ([[77.5779390335083, 12.94471376293191],
      [77.57218837738037, 12.948268838994263]], ["multilinestring1"]),
    ([[77.5779390335083, 12.94471376293191],
      [77.57218837738037, 12.948268838994263],
      [77.58532047271729, 12.953789562459688]], []),
    ([[77.60334491729736, 12.979844051951334],
      [77.60244369506836, 12.976247607394027]], []),
    ([[77.59656429290771, 12.981767710239714],
      [77.59888172149658, 12.979969508380469]], []),
    ([[77.60334491729736, 12.979844051951334],
      [77.59656429290771, 12.981767710239714],
      [77.59802341461182, 12.9751602999608]], ["polygonWithHole1"]),
]


@pytest.mark.parametrize("points,want", MULTIPOINT_CONTAINS)
def test_multipoint_contains_query(shapes_index, points, want):
    shape = {"type": "multipoint", "coordinates": points}
    assert _run(shapes_index, shape, "contains") == sorted(want)


MULTIPOINT_INTERSECTS = [
    ([[77.58334636688232, 12.948268838994263],
      [77.58467674255371, 12.944295515355652]], ["polygon1"]),
    ([[77.58553504943848, 12.954040501528555],
      [77.58643627166747, 12.956089827794571]], ["circle1"]),
    ([[81.28166198730469, 26.34203746601541],
      [80.94314575195312, 26.346960121309415],
      [81.12716674804688, 26.353728430338332]], ["envelope1"]),
    ([[77.59293794631958, 12.948896200093982],
      [77.58532047271729, 12.953789562459688]], ["circle1", "polygon1"]),
    ([[77.58334636688232, 12.948268838994263],
      [77.58643627166747, 12.956089827794571],
      [77.5615, 12.9533]], ["circle1", "polygon1"]),
    ([[77.5841188430786, 12.957093573282744],
      [77.57776737213135, 12.952074805390097]], ["linestring1"]),
    ([[77.5841188430786, 12.957093573282744],
      [77.57776737213135, 12.952074805390097],
      [77.58334636688232, 12.948268838994263]],
     ["linestring1", "polygon1"]),
    ([[77.5779390335083, 12.94471376293191],
      [77.57218837738037, 12.948268838994263]], ["multilinestring1"]),
    ([[77.5779390335083, 12.94471376293191],
      [77.57218837738037, 12.948268838994263],
      [77.58532047271729, 12.953789562459688]],
     ["circle1", "multilinestring1", "polygon1"]),
    ([[77.60334491729736, 12.979844051951334],
      [77.60244369506836, 12.976247607394027]], ["polygonWithHole1"]),
    ([[77.60244369506836, 12.976247607394027],
      [77.59888172149658, 12.979969508380469]], []),
    ([[77.60334491729736, 12.979844051951334],
      [77.59656429290771, 12.981767710239714],
      [77.59802341461182, 12.9751602999608]], ["polygonWithHole1"]),
]


@pytest.mark.parametrize("points,want", MULTIPOINT_INTERSECTS)
def test_multipoint_intersects_query(shapes_index, points, want):
    shape = {"type": "multipoint", "coordinates": points}
    assert _run(shapes_index, shape, "intersects") == sorted(want)
