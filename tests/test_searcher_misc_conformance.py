"""Searcher conformance over the reference's twoDocIndex fixture:

- TestRegexpSearchScorch / testRegexpSearch
  (search/searcher/search_regexp_test.go:116-133): exact tf-idf scores.
- TestMatchAllSearcher (search_match_all_test.go:28-105): every doc at
  constant score 1.0, and boost 1.2 x queryNorm 0.8333 still ~1.0.
- TestMatchNoneSearcher (search_match_none_test.go): zero hits.
- TestDocIDSearcherValid (search_docid_test.go:141-147): missing, out
  of order and DUPLICATE requested ids collapse to the sorted unique
  intersection with the index.
- TestSplitRange (search_numeric_range_test.go:24-33): splitting
  [Float64ToInt64(1.0), Float64ToInt64(5.0)) at precision step 4
  enumerates exactly 135 terms.
- TestIncrementBytes (search_numeric_range_test.go:35-60).
"""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bleve_ray.index import FieldConfig, IndexOptions, build_index
from bleve_ray.index.numeric import (
    decode_prefix_coded,
    float64_to_int64,
    split_int64_range,
)
from bleve_ray.search import Index


@pytest.fixture(scope="module")
def two_doc_index(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("twodoc_misc")
    src = str(tmp / "docs.parquet")
    pq.write_table(
        pa.table({
            "doc_id": ["1", "2", "3", "4", "5"],
            "name": ["marty", "steve", "dustin", "ravi", "bobert"],
            "desc": [
                "beer beer beer beer",
                "angst beer couch database",
                "apple beer column dank",
                " ".join(["beer"] * 65),
                "water",
            ],
        }),
        src,
    )
    out = str(tmp / "idx")
    build_index(
        [src], out,
        IndexOptions(
            fields={
                "name": FieldConfig(analyzer="ascii_alnum_lower"),
                "desc": FieldConfig(analyzer="ascii_alnum_lower",
                                    positions=True),
            },
            doc_id_fields=["doc_id"], num_shards=1, bucket_bits=8,
            scoring_model="tfidf",
        ),
    )
    return Index.open(out)


def test_regexp_search_exact_scores(two_doc_index):
    r = two_doc_index.search(
        {"query": {"regexp": "ma.*", "field": "name"}, "size": 10}
    )
    assert {(h.id, h.score) for h in r.hits} == {
        ("1", 1.916290731874155),
    }
    r = two_doc_index.search(
        {"query": {"regexp": "co.*", "field": "desc"}, "size": 10}
    )
    assert {(h.id, h.score) for h in r.hits} == {
        ("2", 0.33875554280828685),
        ("3", 0.33875554280828685),
    }


def test_match_all_constant_scores(two_doc_index):
    r = two_doc_index.search({"query": {"match_all": {}}, "size": 10})
    assert sorted((h.id, h.score) for h in r.hits) == [
        (str(i), 1.0) for i in range(1, 6)
    ]
    # boost 1.2 with queryNorm 1/1.2: still 1.0 per doc
    r = two_doc_index.search(
        {"query": {"match_all": {}, "boost": 1.2}, "size": 10}
    )
    assert sorted((h.id, h.score) for h in r.hits) == [
        (str(i), 1.0) for i in range(1, 6)
    ]


def test_match_none(two_doc_index):
    r = two_doc_index.search({"query": {"match_none": {}}, "size": 10})
    assert r.hits == [] and r.total_hits == 0


def test_docid_searcher_valid(two_doc_index):
    # missing ("ee"), out of order and duplicate inputs -> sorted unique
    r = two_doc_index.search(
        {"query": {"ids": ["ee", "2", "1", "2"]}, "size": 10}
    )
    assert sorted(h.id for h in r.hits) == ["1", "2"]


def test_docid_searcher_empty_search(two_doc_index):
    r = two_doc_index.search({"query": {"ids": []}, "size": 10})
    assert r.hits == []


def test_split_range_135_terms():
    lo = float64_to_int64(1.0)
    hi = float64_to_int64(5.0)
    ranges = split_int64_range(lo, hi, 4)
    # TermRange.Enumerate walks raw byte strings from startTerm to
    # endTerm via incrementBytes, so the count per range is the
    # big-endian distance between the bounds; the reference counts 135
    total = 0
    for start_term, end_term in ranges:
        _, shift = decode_prefix_coded(start_term)
        _, shift2 = decode_prefix_coded(end_term)
        assert shift == shift2
        a = int.from_bytes(start_term.encode("ascii"), "big")
        b = int.from_bytes(end_term.encode("ascii"), "big")
        total += b - a + 1
    assert total == 135


def test_increment_bytes():
    # search_numeric_range_test.go TestIncrementBytes, via the same
    # big-endian +1 the enumeration distance above relies on
    for in_, out in [
        (bytes([0]), bytes([1])),
        (bytes([0, 0]), bytes([0, 1])),
        (bytes([0, 255]), bytes([1, 0])),
    ]:
        got = (int.from_bytes(in_, "big") + 1).to_bytes(len(in_), "big")
        assert got == out
