"""Boolean must-not / disjunction-min searcher semantics ports:

- TestNestedBooleanMustNotSearcherUpsidedown (search_test.go:739-863):
  conjunction(term, boolean(should=[boolean(must_not=[bool])], min=1))
  must intersect correctly — no cross-leak between the must-not branch
  and the term branch.
- testBooleanMustNotSearcher (search_test.go:1072-1169): every hit of
  conjunction(left, right) must be a hit of BOTH left and right when
  right is a pure must-not boolean (docs missing the field count as
  not-matching the must-not'd clause, so they match the negation).
- TestDisjunctionQueryIncorrectMin (search_test.go:1195-1261): a
  disjunction with fewer clauses than min matches nothing, without error.
- TestQueryStringEmptyConjunctionSearcher (search_test.go:1178-1193):
  a query string with an empty required phrase must not crash.
"""

import pyarrow as pa
import pyarrow.parquet as pq

from bleve_ray.index import FieldConfig, IndexOptions, build_index
from bleve_ray.search import Index


def _mk(tmp, cols, fields, **opts):
    src = str(tmp / "d.parquet")
    pq.write_table(pa.table(cols), src)
    d = str(tmp / "idx")
    build_index(
        [src],
        d,
        IndexOptions(fields=fields, doc_id_fields=["doc_id"],
                     num_shards=1, bucket_bits=6, **opts),
    )
    return Index.open(d)


def _nested_mustnot_index(tmp):
    docs = [
        ("1@1", True, "1"), ("1@2", False, "2"),
        ("2@1", True, "1"), ("2@2", False, "2"),
        ("3@1", True, "1"), ("3@2", False, "2"),
        ("4@1", True, "1"), ("5@1", True, "1"),
        ("6@1", True, "1"), ("7@1", True, "1"),
    ]
    return _mk(
        tmp,
        {
            "doc_id": pa.array([d[0] for d in docs]),
            "hasRole": pa.array([d[1] for d in docs]),
            "investigationId": pa.array([d[2] for d in docs]),
        },
        {
            "hasRole": FieldConfig(field_type="boolean", positions=False),
            "investigationId": FieldConfig(analyzer="keyword", positions=False),
        },
    )


def test_nested_boolean_mustnot_conjunction(ray_session, tmp_path_factory):
    idx = _nested_mustnot_index(tmp_path_factory.mktemp("nbmn"))
    # every investigationId=1 doc HAS the role, so the no-role branch
    # must intersect to nothing
    q = {
        "conjuncts": [
            {"term": "1", "field": "investigationId"},
            {
                "should": [
                    {"must_not": [{"bool": True, "field": "hasRole"}]},
                ],
                "min_should": 1,
            },
        ]
    }
    res = idx.search({"query": q, "size": 100})
    assert res.total_hits == 0

    # sanity inverse: investigationId=2 docs all lack the role
    q["conjuncts"][0]["term"] = "2"
    res = idx.search({"query": q, "size": 100})
    assert res.total_hits == 3
    assert {h.id for h in res.hits} == {"1@2", "2@2", "3@2"}


def test_boolean_mustnot_conjunction_consistency(ray_session, tmp_path_factory):
    docs = [
        ("13900", False), ("13901", False), ("13965", False),
        ("13966", True), ("13967", True),
    ]
    idx = _mk(
        tmp_path_factory.mktemp("bmn"),
        {
            "doc_id": pa.array([d[0] for d in docs]),
            "Name": pa.array([d[0] for d in docs]),
            "HasRole": pa.array([d[1] for d in docs]),
        },
        {
            "Name": FieldConfig(analyzer="keyword", positions=False),
            "HasRole": FieldConfig(field_type="boolean", positions=False),
        },
    )
    left = {"ids": ["13965", "13966", "13967"]}
    right = {"must_not": [{"bool": True, "field": "HasRole"}]}

    lids = {h.id for h in idx.search({"query": left, "size": 100}).hits}
    rids = {h.id for h in idx.search({"query": right, "size": 100}).hits}
    cids = {
        h.id
        for h in idx.search(
            {"query": {"conjuncts": [left, right]}, "size": 100}
        ).hits
    }
    # reference assertion: conjunction ⊆ left ∩ right
    assert cids <= lids and cids <= rids
    # and concretely: only 13965 lacks the role among the three ids
    assert cids == {"13965"}
    # docs without the role (including field present=False) match must-not
    assert rids == {"13900", "13901", "13965"}


def test_disjunction_query_incorrect_min(ray_session, tmp_path_factory):
    idx = _mk(
        tmp_path_factory.mktemp("dmin"),
        {
            "doc_id": pa.array(["1", "2"]),
            "field1": pa.array(["one", "two"]),
            "field2": pa.array([1.0, 2.0]),
        },
        {
            "field1": FieldConfig(positions=False),
            "field2": FieldConfig(field_type="numeric", positions=False),
        },
    )
    res = idx.search(
        {"query": {"disjuncts": [{"term": "one", "field": "field1"}],
                   "min": 2},
         "size": 1}
    )
    assert res.total_hits == 0


def test_query_string_empty_conjunction(ray_session, tmp_path_factory):
    idx = _mk(
        tmp_path_factory.mktemp("qsempty"),
        {"doc_id": pa.array(["a"]), "foo": pa.array(["bar"])},
        {"foo": FieldConfig(analyzer="keyword", positions=False)},
    )
    # must not raise, whatever it matches (reference discards the result)
    try:
        idx.search(
            {"query": {"query": 'foo:bar +baz:""'}, "size": 10}
        )
    except ValueError:
        pass  # an explicit validation error is acceptable; a crash is not
