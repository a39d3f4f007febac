"""Reference geoshape circle-query golden vectors
(search/searcher/search_geoshape_circle_test.go:
setupGeoJsonShapesIndexForCircleQuery fixture +
TestGeoJsonCircleIntersectsQuery / WithInQuery / ContainsQuery),
end-to-end through the geoshape field index -- includes the meter-scale
precision vectors (75m contains envelope3, 78m does not)."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bleve_ray.index import FieldConfig, IndexOptions, build_index
from bleve_ray.search import Index


FIXTURE = [
    ("polygon1", {"type": "polygon", "coordinates": [[
        [77.67248153686523, 12.957679089615821],
        [77.67956256866455, 12.948101542434257],
        [77.68908977508545, 12.948896200093982],
        [77.68934726715086, 12.955211547173878],
        [77.68016338348389, 12.954291440344619],
        [77.67248153686523, 12.957679089615821],
    ]]}),
    ("polygon2", {"type": "polygon", "coordinates": [[
        [81.84951782226561, 25.522692102524033],
        [81.8557834625244, 25.521762640415535],
        [81.86264991760254, 25.521762640415535],
        [81.86676979064941, 25.521607729364224],
        [81.89560890197754, 25.542673796271302],
        [81.88977241516113, 25.543293330460937],
        [81.84951782226561, 25.522692102524033],
    ]]}),
    ("polygon3", {"type": "polygon", "coordinates": [[
        [8.548071384429932, 47.379216780040124],
        [8.547642230987549, 47.3771680227784],
        [8.545818328857422, 47.37677569847655],
        [8.546290397644043, 47.37417465983494],
        [8.551719188690186, 47.37417465983494],
        [8.553242683410645, 47.37679022905829],
        [8.548071384429932, 47.379216780040124],
    ]]}),
    ("point1", {"type": "point", "coordinates": [81.2439, 26.2244]}),
    ("envelope1", {"type": "envelope", "coordinates": [
        [79.9969482421875, 23.895882703682627],
        [80.7220458984375, 25.750424835909385],
    ]}),
    ("envelope2", {"type": "envelope", "coordinates": [
        [82.10409164428711, 25.54360309635522],
        [82.10537910461424, 25.544609829984058],
    ]}),
    ("envelope3", {"type": "envelope", "coordinates": [
        [8.545668125152588, 47.37942019840244],
        [8.552148342132568, 47.383778974713124],
    ]}),
    ("circle1", {"type": "circle",
                 "coordinates": [77.67252445220947, 12.936348678099293],
                 "radius": "900m"}),
    ("circle2", {"type": "circle",
                 "coordinates": [82.10289001464844, 25.544919592476727],
                 "radius": "100m"}),
    ("circle3", {"type": "circle",
                 "coordinates": [8.53363037109375, 47.38191927423153],
                 "radius": "400m"}),
    ("linestring1", {"type": "linestring", "coordinates": [
        [77.68715858459473, 12.944755587650944],
        [77.69213676452637, 12.945090185150542],
    ]}),
    ("linestring2", {"type": "linestring", "coordinates": [
        [77.68913269042969, 12.929614580987227],
        [77.70252227783203, 12.929698235482276],
    ]}),
    ("linestring3", {"type": "linestring", "coordinates": [
        [81.26792907714844, 26.170845301716813],
        [81.30157470703125, 26.18440207077121],
    ]}),
    ("multilinestring1", {"type": "multilinestring", "coordinates": [
        [[81.86170578002928, 25.430407918899984],
         [81.86273574829102, 25.421958559611397]],
        [[81.88230514526367, 25.437616536907512],
         [81.90084457397461, 25.431415601111418]],
        [[81.86805725097656, 25.514868905100244],
         [81.86702728271484, 25.502474677473746]],
    ]}),
    ("multilinestring2", {"type": "multilinestring", "coordinates": [
        [[81.84642791748047, 25.561335859046192],
         [81.84230804443358, 25.550495180470026]],
        [[81.87423706054688, 25.55142441992021],
         [81.88453674316406, 25.555141305670045]],
        [[81.8642807006836, 25.572175556682115],
         [81.87458038330078, 25.567839795359724]],
    ]}),
    ("multipoint1", {"type": "multipoint", "coordinates": [
        [81.87337875366211, 25.432268248708212],
        [81.87355041503906, 25.416299483230368],
        [81.90118789672852, 25.426067037656946],
    ]}),
    ("polygonWithHole1", {"type": "polygon", "coordinates": [
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
    ]}),
]


@pytest.fixture(scope="module")
def circle_index(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("circsrc"))
    pq.write_table(
        pa.table({
            "doc_id": pa.array([x[0] for x in FIXTURE]),
            "geometry": pa.array([json.dumps(x[1]) for x in FIXTURE]),
        }),
        os.path.join(d, "shapes.parquet"),
    )
    idxd = str(tmp_path_factory.mktemp("circidx"))
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


def _run(idx, center, radius, relation):
    r = idx.search({
        "query": {
            "geometry": {
                "shape": {"type": "circle", "coordinates": center,
                          "radius": radius},
                "relation": relation,
            },
            "field": "geometry",
        },
        "size": 100,
        "score": "none",
    })
    return sorted(h.id for h in r.hits)


CIRCLE_INTERSECTS = [
    ([77.68115043640137, 12.94663769274367], "200m", ["polygon1"]),
    ([77.68115043640137, 12.94663769274367], "750m",
     ["circle1", "linestring1", "polygon1"]),
    ([77.69591331481932, 12.92756503709986], "250m", ["linestring2"]),
    ([77.6767, 12.9422], "250m", ["circle1"]),
    ([81.243896484375, 26.22444694563432], "90000m",
     ["envelope1", "linestring3", "point1"]),
    ([79.98458862304688, 25.339061458818374], "1250m", ["envelope1"]),
    ([81.87346458435059, 25.41505910223247], "200m", ["multipoint1"]),
    ([81.8669843673706, 25.512661276952272], "90m", ["multilinestring1"]),
]


@pytest.mark.parametrize("center,radius,want", CIRCLE_INTERSECTS)
def test_circle_intersects_query(circle_index, center, radius, want):
    assert _run(circle_index, center, radius, "intersects") == sorted(want)


CIRCLE_WITHIN = [
    ([81.85981750488281, 25.546778150624146], "3700m",
     ["multilinestring2", "polygon2"]),
    ([81.85981750488281, 25.546778150624146], "3250m",
     ["multilinestring2"]),
    ([81.88599586486816, 25.425756968727935], "1650m", ["multipoint1"]),
    ([82.09362030029297, 25.546313513788725], "1280m",
     ["circle2", "envelope2"]),
    ([82.10289001464844, 25.544919592476727], "700m",
     ["circle2", "envelope2"]),
    ([81.27685546875, 26.1899475672235], "5600m",
     ["linestring3", "point1"]),
]


@pytest.mark.parametrize("center,radius,want", CIRCLE_WITHIN)
def test_circle_within_query(circle_index, center, radius, want):
    assert _run(circle_index, center, radius, "within") == sorted(want)


CIRCLE_CONTAINS = [
    ([8.549551963806152, 47.3759038562437], "180m", ["polygon3"]),
    ([8.551011085510254, 47.380117626829275], "75m", ["envelope3"]),
    # exceeding envelope3 by a few meters
    ([8.551011085510254, 47.380117626829275], "78m", []),
    ([8.535819053649902, 47.38297989270074], "185m", ["circle3"]),
]


@pytest.mark.parametrize("center,radius,want", CIRCLE_CONTAINS)
def test_circle_contains_query(circle_index, center, radius, want):
    assert _run(circle_index, center, radius, "contains") == sorted(want)
