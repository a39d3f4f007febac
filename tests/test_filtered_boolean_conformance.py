"""Port of TestFilteredBooleanQuery (search_test.go:4560-4820): the
boolean FILTER clause restricts membership WITHOUT affecting scores
(filter child runs score-none, boolean.go:173-263), unlike the same
query in a must clause whose coord changes every score; a filter-only
boolean wraps match_all.  Also exercises multi-valued numeric fields
("tags": [1,2,3])."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bleve_ray.index import FieldConfig, IndexOptions, build_index
from bleve_ray.search import Index

BOOKS = [
    ("The Catcher in the Rye", "J.D. Salinger", "fiction", 9.99, [1, 2, 3]),
    ("Sapiens", "Yuval Noah Harari", "non-fiction", 14.29, [2]),
    ("To Kill a Mockingbird", "Harper Lee", "fiction", 12.0, []),
    ("The Power of Habit", "Charles Duhigg", "self-help", 26.0, [1, 2]),
    ("The Great Gatsby", "F. Scott Fitzgerald", "fiction", 22.0, [1, 2]),
    ("Atomic Habits", "James Clear", "self-help", 15.0, [3]),
    ("Educated", "Tara Westover", "non-fiction", 18.0, None),
    ("1984", "George Orwell", "fiction", 20.0, None),
]


@pytest.fixture(scope="module")
def books_index(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("books")
    src = str(root / "books.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(
                    [str(i) for i in range(len(BOOKS))], type=pa.string()
                ),
                "title": pa.array([b[0] for b in BOOKS]),
                "author": pa.array([b[1] for b in BOOKS]),
                "genre": pa.array([b[2] for b in BOOKS]),
                "price": pa.array([b[3] for b in BOOKS], type=pa.float64()),
                "tags": pa.array(
                    [b[4] for b in BOOKS], type=pa.list_(pa.int64())
                ),
            }
        ),
        src,
    )
    d = str(root / "idx")
    build_index(
        [src],
        d,
        IndexOptions(
            fields={
                "title": FieldConfig(analyzer="en", positions=True),
                "author": FieldConfig(analyzer="keyword", positions=False),
                "genre": FieldConfig(analyzer="keyword", positions=False),
                "price": FieldConfig(field_type="numeric", positions=False),
                "tags": FieldConfig(field_type="numeric", positions=False),
            },
            doc_id_fields=["doc_id"],
            docvalue_fields=["price"],
            store_fields=["title"],
            num_shards=1,
            bucket_bits=6,
            scoring_model="tfidf",
        ),
    )
    return Index.open(d)


FICTION = {"term": "fiction", "field": "genre"}
PRICE_LE_20 = {"max": 20.0, "inclusive_max": True, "field": "price"}
PRICE_SORT = [{"by": "field", "field": "price"}]


def _titles(res):
    return [h.fields["title"] for h in res.hits]


def test_unfiltered_boolean(books_index):
    res = books_index.search(
        {"query": {"must": [FICTION]}, "size": 10,
         "fields": ["title"], "sort": PRICE_SORT}
    )
    assert _titles(res) == [
        "The Catcher in the Rye", "To Kill a Mockingbird", "1984",
        "The Great Gatsby",
    ]
    scores = [h.score for h in res.hits]
    assert all(s == scores[0] for s in scores)


def test_filter_in_must_changes_scores(books_index):
    res = books_index.search(
        {"query": {"must": [FICTION, PRICE_LE_20]}, "size": 10,
         "fields": ["title"], "sort": PRICE_SORT}
    )
    assert _titles(res) == [
        "The Catcher in the Rye", "To Kill a Mockingbird", "1984",
    ]
    base = books_index.search(
        {"query": {"must": [FICTION]}, "size": 10}
    ).hits[0].score
    assert all(h.score != base for h in res.hits)


def test_filter_clause_keeps_scores(books_index):
    base = books_index.search(
        {"query": {"must": [FICTION]}, "size": 10}
    ).hits[0].score
    res = books_index.search(
        {"query": {"must": [FICTION], "filter": [PRICE_LE_20]},
         "size": 10, "fields": ["title"], "sort": PRICE_SORT}
    )
    assert _titles(res) == [
        "The Catcher in the Rye", "To Kill a Mockingbird", "1984",
    ]
    assert all(h.score == base for h in res.hits)


def test_filter_only_boolean_over_multivalue_tags(books_index):
    res = books_index.search(
        {
            "query": {
                "filter": [
                    {"min": 3.0, "max": 3.0, "inclusive_min": True,
                     "inclusive_max": True, "field": "tags"}
                ]
            },
            "size": 10,
            "fields": ["title"],
        }
    )
    assert res.total_hits == 2
    assert sorted(_titles(res)) == [
        "Atomic Habits", "The Catcher in the Rye",
    ]
