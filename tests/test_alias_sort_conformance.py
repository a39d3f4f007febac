"""Ports of TestGeoDistanceInSortAlias / TestDateSortAlias /
TestNumericSortAlias (search_test.go:5397-5663): cross-member alias
merges honoring geo_distance, date-typed, and numeric field sorts --
docs interleaved across two member indexes must come back in global
sort order."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bleve_ray.index import FieldConfig, IndexOptions, build_index
from bleve_ray.search import Index
from bleve_ray.search.distributed import IndexAlias


def _build(tmp, name, rows, field, fcfg):
    src = str(tmp / f"{name}.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], type=pa.string()),
                field: pa.array([r[1] for r in rows]),
            }
        ),
        src,
    )
    d = str(tmp / f"{name}_idx")
    build_index(
        [src],
        d,
        IndexOptions(
            fields={field: fcfg},
            doc_id_fields=["doc_id"],
            docvalue_fields=[field],
            num_shards=1,
            bucket_bits=6,
        ),
    )
    return Index.open(d)


def test_geo_distance_sort_alias(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("geosortalias")
    fcfg = FieldConfig(field_type="geo", positions=False)
    # doc 1 and 3 on member 1, doc 2 on member 2 (reference layout)
    i1 = _build(tmp, "m1", [("1", [1.0, 1.0]), ("3", [3.0, 3.0])],
                "geo", fcfg)
    i2 = _build(tmp, "m2", [("2", [2.0, 2.0])], "geo", fcfg)
    alias = IndexAlias([i1, i2])
    res = alias.search(
        {
            "query": {"location": {"lon": 0.0, "lat": 0.0},
                      "distance": "1000000m", "field": "geo"},
            "size": 10,
            "sort": [{"by": "geo_distance", "field": "geo",
                      "location": {"lon": 0.0, "lat": 0.0}}],
        }
    )
    assert [h.id for h in res.hits] == ["1", "2", "3"]


def test_date_sort_alias(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("datesortalias")
    fcfg = FieldConfig(field_type="datetime", positions=False,
                       datetime_parser="flexible")
    i1 = _build(tmp, "m1", [("1", "2023-01-01"), ("3", "2023-03-01")],
                "date", fcfg)
    i2 = _build(tmp, "m2", [("2", "2023-02-01")], "date", fcfg)
    alias = IndexAlias([i1, i2])
    res = alias.search(
        {
            "query": {"match_all": {}},
            "size": 10,
            "sort": [{"by": "field", "field": "date", "type": "date"}],
        }
    )
    assert [h.id for h in res.hits] == ["1", "2", "3"]
    # descending
    res = alias.search(
        {
            "query": {"match_all": {}},
            "size": 10,
            "sort": [{"by": "field", "field": "date", "type": "date",
                      "desc": True}],
        }
    )
    assert [h.id for h in res.hits] == ["3", "2", "1"]


def test_numeric_sort_alias(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("numsortalias")
    fcfg = FieldConfig(field_type="numeric", positions=False)
    i1 = _build(tmp, "m1", [("1", 10.0), ("3", 30.0)], "num", fcfg)
    i2 = _build(tmp, "m2", [("2", 20.0)], "num", fcfg)
    alias = IndexAlias([i1, i2])
    res = alias.search(
        {
            "query": {"match_all": {}},
            "size": 10,
            "sort": [{"by": "field", "field": "num", "type": "number"}],
        }
    )
    assert [h.id for h in res.hits] == ["1", "2", "3"]
    res = alias.search(
        {
            "query": {"match_all": {}},
            "size": 10,
            "sort": [{"by": "field", "field": "num", "type": "number",
                      "desc": True}],
        }
    )
    assert [h.id for h in res.hits] == ["3", "2", "1"]
