"""index_test.go TestSortMatchSearch: a match search sorted by
["Day", "Name"] must return hits in nondecreasing Day order (with Name
as secondary), with fields served via "*"."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bleve_ray.index import FieldConfig, IndexOptions, build_index
from bleve_ray.search import Index

NAMES = ["Noam", "Uri", "David", "Yosef", "Eitan", "Itay", "Ariel",
         "Daniel", "Omer", "Yogev", "Yehonatan", "Moshe", "Mohammed",
         "Yusuf", "Omar"]
DAYS = ["Sunday", "Monday", "Tuesday", "Wednesday", "Thursday", "Friday",
        "Saturday"]
NUMBERS = ["One", "Two", "Three", "Four", "Five", "Six", "Seven", "Eight",
           "Nine", "Ten", "Eleven", "Twelve"]


def test_sort_match_search(ray_session, tmp_path):
    n = 200
    src = str(tmp_path / "d.parquet")
    pq.write_table(
        pa.table({
            "doc_id": [str(i) for i in range(n)],
            "Name": [NAMES[i % len(NAMES)] for i in range(n)],
            "Day": [DAYS[i % len(DAYS)] for i in range(n)],
            "Number": [NUMBERS[i % len(NUMBERS)] for i in range(n)],
        }),
        src,
    )
    d = str(tmp_path / "idx")
    build_index(
        [src], d,
        IndexOptions(
            fields={c: FieldConfig(analyzer="standard", positions=False)
                    for c in ("Name", "Day", "Number")},
            doc_id_fields=["doc_id"], num_shards=2, bucket_bits=6,
            docvalue_fields=["Name", "Day", "Number"],
        ),
    )
    idx = Index.open(d)
    r = idx.search({
        "query": {"match": "One", "field": "Number"},
        "size": 100, "sort": ["Day", "Name"], "fields": ["*"],
    })
    assert r.hits, "match 'One' must hit"
    # every 12th doc carries Number=One
    assert r.total_hits == len([i for i in range(n) if i % 12 == 0])
    prev = ("", "")
    for h in r.hits:
        cur = (h.fields["Day"], h.fields["Name"])
        assert prev <= cur, f"hits must sort by (Day, Name): {prev} > {cur}"
        prev = cur


def test_count_match_search(ray_session, tmp_path):
    """TestIndexCountMatchSearch invariant: DocCount == match_all total
    and a term's search total equals its true occurrence count."""
    n = 500
    src = str(tmp_path / "d.parquet")
    pq.write_table(
        pa.table({
            "doc_id": [str(i) for i in range(n)],
            "body": [("even match" if i % 2 == 0 else "odd text")
                     for i in range(n)],
        }),
        src,
    )
    d = str(tmp_path / "idx")
    build_index([src], d, IndexOptions(
        fields={"body": FieldConfig(positions=False)},
        doc_id_fields=["doc_id"], num_shards=2, bucket_bits=6))
    idx = Index.open(d)
    assert idx.reader.doc_count() == n
    assert idx.search({"query": {"match_all": {}},
                       "size": 0}).total_hits == n
    assert idx.search({"query": {"term": "match", "field": "body"},
                       "size": 0}).total_hits == n // 2
