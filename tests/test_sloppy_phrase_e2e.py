"""End-to-end sloppy phrase matching over a real index: the slop knob
on match_phrase routes through findPhrasePaths semantics
(search/searcher/search_phrase.go:415-507; behavior mirrors the
TestFindPhrasePathsSloppy tables, here driven through the full query
path)."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bleve_ray.index import FieldConfig, IndexOptions, build_index
from bleve_ray.search import Index


@pytest.fixture(scope="module")
def slop_index(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("slopidx")
    src = str(tmp / "docs.parquet")
    pq.write_table(
        pa.table({
            "doc_id": ["counting", "arkbat", "reversed"],
            "content": [
                "one two three four five",
                "ark bat cat dog dog",
                "nil return",
            ],
        }),
        src,
    )
    out = str(tmp / "idx")
    build_index(
        [src],
        out,
        IndexOptions(
            fields={"content": FieldConfig(analyzer="ascii_alnum_lower",
                                           positions=True)},
            doc_id_fields=["doc_id"],
            num_shards=1,
            bucket_bits=8,
            store_fields=["content"],
        ),
    )
    return Index.open(out)


def _ids(idx, query):
    res = idx.search({"query": query, "size": 10})
    return sorted(h.id for h in res.hits)


def test_slop_zero_is_exact(slop_index):
    q = {"match_phrase": "one five", "field": "content"}
    assert _ids(slop_index, q) == []
    assert _ids(slop_index, dict(q, slop=2)) == []
    assert _ids(slop_index, dict(q, slop=3)) == ["counting"]


def test_slop_reversed_needs_two(slop_index):
    q = {"match_phrase": "return nil", "field": "content"}
    assert _ids(slop_index, q) == []  # stored as "nil return"
    assert _ids(slop_index, dict(q, slop=1)) == []
    assert _ids(slop_index, dict(q, slop=2)) == ["reversed"]


def test_slop_is_cumulative(slop_index):
    q = {"match_phrase": "one three five", "field": "content"}
    assert _ids(slop_index, dict(q, slop=1)) == []
    assert _ids(slop_index, dict(q, slop=2)) == ["counting"]
    rev = {"match_phrase": "five three one", "field": "content"}
    assert _ids(slop_index, dict(rev, slop=5)) == []
    assert _ids(slop_index, dict(rev, slop=6)) == ["counting"]


def test_slop_does_not_reuse_a_location(slop_index):
    # "cat dog dog": both dog slots must bind distinct occurrences
    q = {"match_phrase": "cat dog dog", "field": "content"}
    assert _ids(slop_index, dict(q, slop=1)) == ["arkbat"]
    # but "dog dog dog" has only two occurrences to bind
    q3 = {"terms": [["dog"], ["dog"], ["dog"]], "field": "content"}
    assert _ids(slop_index, dict(q3, slop=4)) == []
