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


def test_nested_boolean_searchers(ray_session, tmp_path_factory):
    """Port of TestNestedBooleanSearchers (search_test.go:617-737):
    conjunction of boolean{must: conjunction[disjunction[match,match]]}
    and boolean{must: conjunction[match]} over dotted struct paths."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bleve_ray.analysis.analyzers import make_custom_analyzer
    from bleve_ray.analysis.token_filters import lowercase_filter
    from bleve_ray.analysis.tokenizers import WhitespaceTokenizer
    from bleve_ray.search import Index as _Index

    make_custom_analyzer(
        "ws_lower", WhitespaceTokenizer(), [lowercase_filter]
    )
    tmp = tmp_path_factory.mktemp("nestedbool")
    n = 100
    hostnames = [f"planner_hostname_{i % 5}" for i in range(n)]
    regions = [f"planner_us-east-{i % 5}" for i in range(n)]
    expected = sum(
        1
        for h, r in zip(hostnames, regions)
        if h in ("planner_hostname_1", "planner_hostname_2")
        and r == "planner_us-east-1"
    )
    src = str(tmp / "d.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([str(i) for i in range(n)]),
                "hostname": pa.array(hostnames),
                "metadata": pa.array(
                    [{"region": r} for r in regions],
                    type=pa.struct([("region", pa.string())]),
                ),
            }
        ),
        src,
    )
    d = str(tmp / "idx")
    build_index(
        [src],
        d,
        IndexOptions(
            fields={
                "hostname": FieldConfig(analyzer="ws_lower",
                                        positions=True),
                "metadata.region": FieldConfig(analyzer="ws_lower",
                                               positions=True),
            },
            doc_id_fields=["doc_id"],
            num_shards=1,
            bucket_bits=8,
        ),
    )
    idx = _Index.open(d)
    res = idx.search(
        {
            "query": {
                "conjuncts": [
                    {"must": {"conjuncts": [
                        {"disjuncts": [
                            {"match": "planner_hostname_1",
                             "field": "hostname"},
                            {"match": "planner_hostname_2",
                             "field": "hostname"},
                        ]}
                    ]}},
                    {"must": {"conjuncts": [
                        {"match": "planner_us-east-1",
                         "field": "metadata.region"}
                    ]}},
                ]
            },
            "size": 100,
        }
    )
    assert expected == len(res.hits) == res.total_hits


def test_multiple_nested_must_not_after_update(ray_session,
                                               tmp_path_factory):
    """Port of TestMultipleNestedBooleanMustNotSearchersOnScorch
    (search_test.go:928-1070): must[ bool{must_not: type in [9,9]},
    bool{must_not: hasRole=true} ] over a corpus where one doc was
    UPDATED (re-indexed) -- exactly that doc survives both exclusions."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bleve_ray.search import Index as _Index

    tmp = tmp_path_factory.mktemp("mustnotupd")
    ids = ["1-child-0",
           "16d6fa37-48fd-4dea-8b3d-a52bddf73951",
           "18fa9eb2-8b1f-46f0-8b56-b4c551213f78",
           "3085855b-d74b-474a-86c3-9bf3e4504382",
           "38ef5d28-0f85-4fb0-8a94-dd20751c3364"]
    src = str(tmp / "d.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids),
                "id": pa.array(ids),
                "hasRole": pa.array([False] * 5),
                "roles": pa.array(["R1", None, None, None, None]),
                "type": pa.array([0.0, 9.0, 9.0, 9.0, 9.0]),
            }
        ),
        src,
    )
    d = str(tmp / "idx")
    build_index(
        [src],
        d,
        IndexOptions(
            fields={
                "id": FieldConfig(analyzer="keyword", positions=False),
                "hasRole": FieldConfig(field_type="boolean",
                                       positions=False),
                "roles": FieldConfig(analyzer="keyword", positions=False),
                "type": FieldConfig(field_type="numeric",
                                    positions=False),
            },
            doc_id_fields=["doc_id"],
            num_shards=1,
            bucket_bits=8,
            index_id_field=True,
        ),
    )
    idx = _Index.open(d)
    # update the first doc: drop its roles value (re-index semantics)
    idx.index("1-child-0", {"id": "1-child-0", "hasRole": False,
                            "roles": None, "type": 0.0})
    res = idx.search(
        {
            "query": {
                "must": [
                    {"must_not": [
                        {"min": 9.0, "max": 9.0, "inclusive_min": True,
                         "inclusive_max": True, "field": "type"}
                    ]},
                    {"must_not": [{"bool": True, "field": "hasRole"}]},
                ]
            },
            "size": 100,
        }
    )
    assert res.total_hits == 1
    assert res.hits[0].id == "1-child-0"


def test_boolean_search_bug_1185(ray_session, tmp_path_factory):
    """Port of TestBooleanSearchBug1185 (search_test.go:1746-1872):
    conjunction(typeQ, bool{must_not: bool{must_not: regexp}}) must equal
    boolean{must: typeQ, must_not: bool{must_not: regexp}} -- the classic
    double-negation equivalence over docs with/without the owner field."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bleve_ray.search import Index as _Index

    rows = [
        ("17112", "marty", "A Demo Type"),
        ("17139", None, "A Demo Type"),
        ("177777", None, "x"),
        ("177778", None, "A Demo Type"),
        ("17140", None, "A Demo Type"),
        ("17000", "marty", "x"),
        ("17141", None, "A Demo Type"),
        ("17428", "marty", "A Demo Type"),
        ("17113", "marty", "x"),
    ]
    tmp = tmp_path_factory.mktemp("bug1185")
    src = str(tmp / "d.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows]),
                "owner": pa.array([r[1] for r in rows]),
                "type": pa.array([r[2] for r in rows]),
            }
        ),
        src,
    )
    d = str(tmp / "idx")
    build_index(
        [src],
        d,
        IndexOptions(
            fields={
                "owner": FieldConfig(analyzer="keyword", positions=False),
                "type": FieldConfig(analyzer="standard", positions=True),
            },
            doc_id_fields=["doc_id"],
            num_shards=1,
            bucket_bits=8,
        ),
    )
    idx = _Index.open(d)
    match_type = {"match_phrase": "A Demo Type", "field": "type"}
    no_owner = {"must_not": [{"regexp": ".+", "field": "owner"}]}
    not_no_owner = {"must_not": [no_owner]}
    r1 = idx.search(
        {"query": {"conjuncts": [match_type, not_no_owner]}, "size": 100}
    )
    r2 = idx.search(
        {"query": {"must": [match_type], "must_not": [no_owner]},
         "size": 100}
    )
    assert {h.id for h in r1.hits} == {h.id for h in r2.hits} == {
        "17112", "17428"
    }
