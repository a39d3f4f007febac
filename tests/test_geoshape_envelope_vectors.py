"""Reference geoshape envelope-query golden vectors
(search/searcher/search_geoshape_envelope_test.go:
setupGeoJsonShapesIndexForEnvelopeQuery fixture +
TestGeoJsonEnvelopeWithInQuery / IntersectsQuery / ContainsQuery).
Envelope queries arrive as [[minLon, maxLat], [maxLon, minLat]]-style
two-corner coordinates (geo/parse.go), here as given by the reference
vectors verbatim."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bleve_ray.index import FieldConfig, IndexOptions, build_index
from bleve_ray.search import Index


FIXTURE = [
    ("polygon1", {"type": "polygon", "coordinates": [[
        [8.548071384429932, 47.379216780040124],
        [8.547642230987549, 47.3771680227784],
        [8.545818328857422, 47.37677569847655],
        [8.546290397644043, 47.37417465983494],
        [8.551719188690186, 47.37417465983494],
        [8.553242683410645, 47.37679022905829],
        [8.548071384429932, 47.379216780040124],
    ]]}),
    ("polygon2", {"type": "polygon", "coordinates": [[
        [76.70379638671874, 16.828203242420393],
        [76.36322021484375, 16.58881695544584],
        [76.70928955078125, 16.720385051694],
        [76.70379638671874, 16.828203242420393],
    ]]}),
    ("polygon3", {"type": "polygon", "coordinates": [[
        [82.9522705078125, 17.749994573141873],
        [82.94952392578125, 17.692436998627272],
        [82.87673950195312, 17.64009591883757],
        [82.76412963867188, 17.58643052828743],
        [82.8094482421875, 17.522272941245202],
        [82.99621582031249, 17.64009591883757],
        [82.9522705078125, 17.749994573141873],
    ]]}),
    ("envelope1", {"type": "envelope", "coordinates": [
        [74.89654541015625, 17.403062993328923],
        [74.92401123046875, 17.66495983051931],
    ]}),
    ("circle1", {"type": "circle",
                 "coordinates": [75.0531005859375, 17.675427818339383],
                 "radius": "12900m"}),
    ("circle2", {"type": "circle",
                 "coordinates": [82.69683837890625, 17.902955242676995],
                 "radius": "6000m"}),
    ("circle3", {"type": "circle",
                 "coordinates": [8.53363037109375, 47.38191927423153],
                 "radius": "400m"}),
    ("point1", {"type": "point",
                "coordinates": [76.29730224609375, 16.796653031618053]}),
    ("linestring1", {"type": "linestring", "coordinates": [
        [76.85211181640624, 17.51048642597462],
        [77.24212646484374, 16.93070509876554],
    ]}),
    ("linestring2", {"type": "linestring", "coordinates": [
        [81.89208984375, 18.555136195095105],
        [82.21343994140625, 18.059701055000478],
    ]}),
    ("multipoint1", {"type": "multipoint", "coordinates": [
        [81.24938964843749, 17.602139123350838],
        [81.30432128906249, 17.56548361143177],
        [81.29058837890625, 17.180155043474496],
        [81.09283447265625, 17.87681743233167],
    ]}),
    ("multilinestring1", {"type": "multilinestring", "coordinates": [
        [[81.69708251953125, 17.641404631355755],
         [81.90994262695312, 17.642713334367667]],
        [[81.6998291015625, 17.620464090732245],
         [81.69708251953125, 17.468572623463153]],
        [[81.70120239257811, 17.458092664041494],
         [81.81243896484375, 17.311310073048123]],
        [[81.815185546875, 17.3034434020238],
         [81.81243896484375, 17.109292665395643]],
    ]}),
    ("multilinestring2", {"type": "multilinestring", "coordinates": [
        [[77.6015853881836, 12.990089451715061],
         [77.60476112365723, 12.987747683302153]],
        [[77.59875297546387, 12.988751301039581],
         [77.59446144104004, 12.98197680263484]],
        [[77.60188579559325, 12.982604078764705],
         [77.60557651519775, 12.987329508048184]],
    ]}),
]


@pytest.fixture(scope="module")
def env_index(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("envsrc"))
    pq.write_table(
        pa.table({
            "doc_id": pa.array([x[0] for x in FIXTURE]),
            "geometry": pa.array([json.dumps(x[1]) for x in FIXTURE]),
        }),
        os.path.join(d, "shapes.parquet"),
    )
    idxd = str(tmp_path_factory.mktemp("envidx"))
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


def _run(idx, corners, relation):
    r = idx.search({
        "query": {
            "geometry": {
                "shape": {"type": "envelope", "coordinates": corners},
                "relation": relation,
            },
            "field": "geometry",
        },
        "size": 100,
        "score": "none",
    })
    return sorted(h.id for h in r.hits)


ENV_WITHIN = [
    ([[76.256103515625, 16.76772739719064],
      [76.35772705078125, 16.872890378907783]], ["point1"]),
    ([[81.046142578125, 17.156537255486093],
      [81.331787109375, 17.96305758238804]], ["multipoint1"]),
    ([[81.05987548828125, 17.16178591271515],
      [81.36199951171875, 17.861132899477624]], []),
    ([[76.00341796875, 16.573022719182777],
      [76.717529296875, 17.006888277600524]], ["point1", "polygon2"]),
    ([[76.84112548828125, 16.86500518090961],
      [77.62115478515625, 17.531439701706244]], ["linestring1"]),
    ([[81.683349609375, 17.104042525557904],
      [81.99234008789062, 17.66495983051931]], ["multilinestring1"]),
    ([[81.65725708007812, 17.2601707001208],
      [81.95114135742186, 17.66495983051931]], []),
    ([[74.75372314453125, 17.36636733709516],
      [75.509033203125, 18.038809662036805]], ["circle1", "envelope1"]),
    ([[74.783935546875, 17.38209494787749],
      [75.96221923828125, 17.727758609852284]], ["envelope1"]),
]


@pytest.mark.parametrize("corners,want", ENV_WITHIN)
def test_envelope_within_query(env_index, corners, want):
    assert _run(env_index, corners, "within") == sorted(want)


ENV_INTERSECTS = [
    ([[81.00769042968749, 17.80622614478282],
      [81.199951171875, 17.983957957423037]], ["multipoint1"]),
    ([[81.65725708007812, 17.2601707001208],
      [81.95114135742186, 17.66495983051931]], ["multilinestring1"]),
    ([[81.9854736328125, 18.27369419984127],
      [82.14752197265625, 18.633232565431218]], ["linestring2"]),
    ([[82.6336669921875, 17.82714499951342],
      [82.66387939453125, 17.861132899477624]], ["circle2"]),
    ([[82.92343139648438, 17.739530934289657],
      [82.98797607421874, 17.79184300887134]], ["polygon3"]),
]


@pytest.mark.parametrize("corners,want", ENV_INTERSECTS)
def test_envelope_intersects_query(env_index, corners, want):
    assert _run(env_index, corners, "intersects") == sorted(want)


ENV_CONTAINS = [
    ([[8.548285961151123, 47.376092756617446],
      [8.551225662231445, 47.37764752629426]], ["polygon1"]),
    ([[8.549273014068604, 47.376194471922986],
      [8.551654815673828, 47.37827232736301]], []),
    ([[8.532772064208984, 47.380379160110856],
      [8.534531593322752, 47.38299442157271]], ["circle3"]),
    ([[8.532836437225342, 47.38010309716447],
      [8.538415431976318, 47.383081594720466]], []),
]


@pytest.mark.parametrize("corners,want", ENV_CONTAINS)
def test_envelope_contains_query(env_index, corners, want):
    assert _run(env_index, corners, "contains") == sorted(want)
