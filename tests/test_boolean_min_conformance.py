"""Ports of TestBooleanShouldMinPropagation and
TestDisjunctionMinPropagation (search_test.go:1423-1556): should-clause
min=0 must not filter must-matched docs; a disjunction whose min exceeds
its clause count matches nothing, and the emptiness propagates through
an enclosing disjunction."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bleve_ray.index import FieldConfig, IndexOptions, build_index
from bleve_ray.search import Index


def _mk_index(tmp, rows):
    src = str(tmp / "d.parquet")
    cols = {k: pa.array([r[k] for r in rows]) for k in rows[0]}
    pq.write_table(pa.table(cols), src)
    d = str(tmp / "idx")
    fields = {
        k: FieldConfig(analyzer="standard", positions=True)
        for k in rows[0]
        if k != "doc_id"
    }
    build_index(
        [src],
        d,
        IndexOptions(fields=fields, doc_id_fields=["doc_id"],
                     num_shards=1, bucket_bits=6),
    )
    return Index.open(d)


def test_boolean_should_min_propagation(ray_session, tmp_path_factory):
    idx = _mk_index(
        tmp_path_factory.mktemp("shouldmin"),
        [
            {"doc_id": "doc1", "dept": "queen", "name": "cersei lannister"},
            {"doc_id": "doc2", "dept": "kings guard",
             "name": "jaime lannister"},
        ],
    )
    res = idx.search(
        {
            "query": {
                "must": [{"match": "jaime lannister", "field": "name"}],
                "should": [{"match": "kings guard", "field": "dept"}],
            },
            "size": 10,
        }
    )
    assert res.total_hits == 2


def test_disjunction_min_propagation(ray_session, tmp_path_factory):
    idx = _mk_index(
        tmp_path_factory.mktemp("dismin"),
        [
            {"doc_id": "doc1", "dept": "finance", "name": "xyz"},
            {"doc_id": "doc2", "dept": "marketing", "name": "xyz"},
            {"doc_id": "doc3", "dept": "engineering", "name": "abc"},
        ],
    )
    inner = {
        "disjuncts": [
            {"match": "finance", "field": "dept"},
            {"match": "marketing", "field": "dept"},
        ],
        "min": 3,
    }
    res = idx.search(
        {"query": {"disjuncts": [inner], "min": 1}, "size": 10}
    )
    assert res.total_hits == 0
