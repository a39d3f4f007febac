"""Custom score/filter query family conformance (search_test.go:
TestCustomFilterQuery:4800+, TestCustomScoreQuery:4869,
TestCustomScoreQueryWithDocValues, TestCustomScoreQueryExplain,
TestCustom{Filter,Score}QueryWildcardFields,
TestCustomFilterQueryDateTimeDocValues,
TestCustom{Filter,Score}QueryFieldsDoNotLeakIntoResponse) over the
reference's 8-book fixture."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bleve_ray.index import FieldConfig, IndexOptions, build_index
from bleve_ray.search import Index
from bleve_ray.search.query import (
    CustomFilterQuery,
    CustomScoreQuery,
    TermQuery,
)

TITLES = ["The Catcher in the Rye", "Sapiens", "To Kill a Mockingbird",
          "The Power of Habit", "The Great Gatsby", "Atomic Habits",
          "Educated", "1984"]
GENRES = ["fiction", "non-fiction", "fiction", "self-help", "fiction",
          "self-help", "non-fiction", "fiction"]
RATINGS = [8.0, 9.0, 7.5, 6.0, 8.5, 7.0, 8.8, 9.5]


@pytest.fixture(scope="module")
def books_index(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("books")
    src = str(tmp / "books.parquet")
    pq.write_table(
        pa.table({
            "doc_id": [str(i) for i in range(8)],
            "title": TITLES,
            "genre": GENRES,
            "rating": RATINGS,
            "published": ["2019-06-15T00:00:00Z", "2022-03-10T00:00:00Z",
                          "2018-01-01T00:00:00Z", "2020-05-05T00:00:00Z",
                          "2021-07-07T00:00:00Z", "2019-02-02T00:00:00Z",
                          "2023-01-01T00:00:00Z", "2017-06-06T00:00:00Z"],
        }),
        src,
    )
    out = str(tmp / "idx")
    build_index(
        [src], out,
        IndexOptions(
            fields={
                "title": FieldConfig(analyzer="en"),
                "genre": FieldConfig(analyzer="keyword", positions=False),
                "rating": FieldConfig(field_type="numeric", positions=False),
                "published": FieldConfig(field_type="datetime",
                                         positions=False),
            },
            doc_id_fields=["doc_id"], num_shards=1, bucket_bits=8,
            docvalue_fields=["genre", "rating", "published"],
            store_fields=["title"],
        ),
    )
    return Index.open(out)


def test_custom_filter_query(books_index):
    allowed = {"0", "2", "7"}
    q = CustomFilterQuery(
        TermQuery("fiction", field="genre"),
        filter_func=lambda did, score, fields: did in allowed,
    )
    r = books_index.search({"query": q, "size": 10, "fields": ["title"]})
    assert r.total_hits == 3
    assert {h.id for h in r.hits} == allowed


def test_custom_score_query_reorders(books_index):
    boosts = {"7": 100.0, "2": 10.0, "0": 1.0}
    q = CustomScoreQuery(
        TermQuery("fiction", field="genre"),
        score_func=lambda did, score, fields: score + boosts.get(did, 0.0),
    )
    r = books_index.search({"query": q, "size": 4, "fields": ["title"]})
    assert [h.id for h in r.hits] == ["7", "2", "0", "4"]


def test_custom_score_query_with_docvalues(books_index):
    q = CustomScoreQuery(
        TermQuery("fiction", field="genre"),
        score_func=lambda did, score, fields: (
            score + 100 if (fields.get("rating") or 0) >= 9 else score
        ),
        fields=["rating"],
    )
    r = books_index.search({"query": q, "size": 4})
    # doc 7 (rating 9.5) is the only fiction doc rated >= 9
    assert r.hits[0].id == "7"
    assert r.hits[0].score > 100


def test_custom_score_query_wildcard_fields(books_index):
    q = CustomScoreQuery(
        TermQuery("fiction", field="genre"),
        score_func=lambda did, score, fields: (
            score + 100 if (fields.get("rating") or 0) >= 9 else score
        ),
        fields=["*"],
    )
    r = books_index.search({"query": q, "size": 4})
    assert r.hits[0].id == "7"
    assert r.hits[0].score > 100  # proves "*" surfaced the rating


def test_custom_filter_query_wildcard_fields(books_index):
    q = CustomFilterQuery(
        TermQuery("fiction", field="genre"),
        filter_func=lambda did, score, fields: (
            fields.get("rating") is not None
            and fields.get("genre") == "fiction"
            and fields["rating"] > 0
        ),
        fields=["*"],
    )
    r = books_index.search({"query": q, "size": 10})
    assert r.total_hits == 4  # every fiction doc carries genre + rating


def test_custom_filter_query_datetime_docvalues(books_index):
    """Datetime docvalues reach the callback in a comparable form
    (TestCustomFilterQueryDateTimeDocValues: cutoff 2020-01-01)."""
    import datetime as dt

    def after_cutoff(did, score, fields):
        v = fields.get("published")
        if v is None:
            return False
        if isinstance(v, str):
            t = dt.datetime.fromisoformat(v.replace("Z", "+00:00"))
        elif isinstance(v, (int, float)):
            t = dt.datetime.fromtimestamp(
                v / 1e9, tz=dt.timezone.utc)
        else:
            t = v if v.tzinfo else v.replace(tzinfo=dt.timezone.utc)
        return t >= dt.datetime(2020, 1, 1, tzinfo=dt.timezone.utc)

    q = CustomFilterQuery(
        TermQuery("fiction", field="genre"),
        filter_func=after_cutoff,
        fields=["published"],
    )
    r = books_index.search({"query": q, "size": 10})
    assert {h.id for h in r.hits} == {"4"}  # only 2021 fiction book


def test_custom_score_query_explain(books_index):
    q = CustomScoreQuery(
        TermQuery("habit", field="title"),
        score_func=lambda did, score, fields: score * 2,
    )
    r = books_index.search({"query": q, "size": 10, "explain": True})
    assert r.hits
    for h in r.hits:
        assert h.expl is not None
        assert h.expl["message"] == "custom_score function result"
        assert not h.expl.get("children")


def test_custom_query_fields_do_not_leak(books_index):
    for q in (
        CustomFilterQuery(
            TermQuery("fiction", field="genre"),
            filter_func=lambda did, s, f: (f.get("rating") or 0) >= 8,
            fields=["rating"],
        ),
        CustomScoreQuery(
            TermQuery("fiction", field="genre"),
            score_func=lambda did, s, f: s + (f.get("rating") or 0),
            fields=["rating"],
        ),
    ):
        r = books_index.search({"query": q, "size": 10,
                                "fields": ["title"]})
        assert r.hits
        for h in r.hits:
            assert "title" in (h.fields or {})
            assert "rating" not in (h.fields or {})


# --- search/query/custom_query_test.go: default JSON unmarshal ----------------


def test_custom_filter_query_unmarshal_json():
    from bleve_ray.search.query import CustomFilterQuery, MatchQuery, parse_query

    q = parse_query({"custom_filter": {"query": {"match": "beer"}}})
    assert isinstance(q, CustomFilterQuery)
    assert isinstance(q.query, MatchQuery)
    assert q.query.match == "beer"


def test_custom_score_query_unmarshal_json():
    from bleve_ray.search.query import CustomScoreQuery, MatchQuery, parse_query

    q = parse_query({"custom_score": {"query": {"match": "beer"}}})
    assert isinstance(q, CustomScoreQuery)
    assert isinstance(q.query, MatchQuery)


def test_custom_query_rejects_non_object_payload():
    import pytest as _pytest

    from bleve_ray.search.query import parse_query

    with _pytest.raises(ValueError, match="custom_filter query must be a JSON object"):
        parse_query({"custom_filter": "beer"})
    with _pytest.raises(ValueError, match="custom_score query must be a JSON object"):
        parse_query({"custom_score": "beer"})
