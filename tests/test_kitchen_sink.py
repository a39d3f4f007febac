"""Kitchen-sink integration: one index carrying every field type, every
query kind running against it (cross-field interactions: shared shard
space, mixed trie/term dictionaries, hybrid requests)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bleve_ray.index import FieldConfig, IndexOptions, build_index
from bleve_ray.search import Index


@pytest.fixture(scope="module")
def sink_index(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("sink")
    rng = np.random.default_rng(99)
    n = 60
    words = ["alpha", "beta", "gamma", "delta", "omega"]
    tbl = pa.table(
        {
            "doc_id": pa.array([f"doc{i:03d}" for i in range(n)]),
            "title": pa.array(
                [
                    " ".join(words[: (i % len(words)) + 1]) + f" item{i}"
                    for i in range(n)
                ]
            ),
            "price": pa.array(
                [round(float(10 + i * 2.5), 2) for i in range(n)]
            ),
            "created": pa.array(
                np.array(
                    [
                        np.datetime64("2024-01-01T00:00:00")
                        + np.timedelta64(i, "D")
                        for i in range(n)
                    ],
                    dtype="datetime64[us]",
                )
            ),
            "active": pa.array([i % 3 != 0 for i in range(n)]),
            "addr": pa.array([f"10.0.{i % 4}.{i}" for i in range(n)]),
            "pt": pa.StructArray.from_arrays(
                [
                    pa.array(np.round(rng.uniform(-10, 10, n), 4)),
                    pa.array(np.round(rng.uniform(40, 50, n), 4)),
                ],
                names=["lon", "lat"],
            ),
            "embedding": pa.array(
                [v.tolist() for v in rng.standard_normal((n, 6))],
                type=pa.list_(pa.float32()),
            ),
        }
    )
    src = str(d / "docs.parquet")
    pq.write_table(tbl, src)
    idx_dir = str(d / "idx")
    build_index(
        [src],
        idx_dir,
        IndexOptions(
            fields={
                "title": FieldConfig(analyzer="standard", positions=True),
                "price": FieldConfig(field_type="numeric", positions=False),
                "created": FieldConfig(
                    field_type="datetime", positions=False
                ),
                "active": FieldConfig(field_type="boolean", positions=False),
                "addr": FieldConfig(field_type="ip", positions=False),
                "pt": FieldConfig(field_type="geo", positions=False),
            },
            doc_id_fields=["doc_id"],
            num_shards=4,
            bucket_bits=6,
            docvalue_fields=["price", "embedding"],
            store_fields=["title"],
            index_id_field=True,
        ),
    )
    return Index.open(idx_dir), tbl


def test_every_query_kind_against_one_index(sink_index):
    idx, tbl = sink_index
    n = len(tbl)
    prices = tbl["price"].to_pylist()
    active = tbl["active"].to_pylist()

    # text
    assert idx.search({"query": {"term": "omega", "field": "title"},
                       "size": 0}).total_hits == sum(
        1 for i in range(n) if (i % 5) + 1 >= 5
    )
    # phrase
    r = idx.search(
        {"query": {"match_phrase": "alpha beta", "field": "title"},
         "size": 0}
    )
    assert r.total_hits == sum(1 for i in range(n) if (i % 5) + 1 >= 2)
    # numeric range
    want = sum(1 for p in prices if 20 <= p < 60)
    assert idx.search(
        {"query": {"min": 20, "max": 60, "field": "price"}, "size": 0}
    ).total_hits == want
    # datetime range
    assert idx.search(
        {
            "query": {
                "start": "2024-01-10T00:00:00",
                "end": "2024-01-20T00:00:00",
                "field": "created",
            },
            "size": 0,
        }
    ).total_hits == 10
    # bool field
    assert idx.search(
        {"query": {"bool": True, "field": "active"}, "size": 0}
    ).total_hits == sum(active)
    # CIDR
    assert idx.search(
        {"query": {"cidr": "10.0.2.0/24", "field": "addr"}, "size": 0}
    ).total_hits == sum(1 for i in range(n) if i % 4 == 2)
    # geo bounding box over the struct geo field
    lons = [p["lon"] for p in tbl["pt"].to_pylist()]
    lats = [p["lat"] for p in tbl["pt"].to_pylist()]
    want_geo = sum(
        1 for lo, la in zip(lons, lats) if -5 <= lo <= 5 and 42 <= la <= 48
    )
    assert idx.search(
        {
            "query": {
                "top_left": {"lon": -5.0, "lat": 48.0},
                "bottom_right": {"lon": 5.0, "lat": 42.0},
                "field": "pt",
            },
            "size": 100,
        }
    ).total_hits == want_geo
    # ids query via the _id keyword field
    assert idx.search(
        {"query": {"ids": ["doc003", "doc007"]}, "size": 10}
    ).total_hits == 2
    # boolean composition across field types
    r = idx.search(
        {
            "query": {
                "must": {"conjuncts": [
                    {"term": "alpha", "field": "title"},
                    {"min": 20, "max": 200, "field": "price"},
                ]},
                "must_not": {"disjuncts": [
                    {"bool": False, "field": "active"},
                ]},
            },
            "size": 100,
        }
    )
    want_bool = sum(
        1
        for i in range(n)
        if 20 <= prices[i] < 200 and active[i]
    )
    assert r.total_hits == want_bool
    # hybrid: text + knn over the docvalue vector with a filter
    emb = np.array(tbl["embedding"].to_pylist(), dtype=np.float64)
    q = emb[5]
    r = idx.search(
        {
            "query": {"term": "alpha", "field": "title"},
            "knn": [
                {
                    "field": "embedding",
                    "vector": q.tolist(),
                    "k": 5,
                    "filter": {"bool": True, "field": "active"},
                }
            ],
            "score": "rrf",
            "size": 10,
        }
    )
    assert r.hits and len(r.hits) == 10
    # sort by numeric docvalue + cursor page
    first = idx.search(
        {
            "query": {"match_all": {}},
            "size": 10,
            "sort": ["-price", "_id"],
            "fields": ["price"],
        }
    ).hits
    assert [h.fields["price"] for h in first] == sorted(
        prices, reverse=True
    )[:10]
    nxt = idx.search(
        {
            "query": {"match_all": {}},
            "size": 10,
            "sort": ["-price", "_id"],
            "search_after": [first[-1].fields["price"], first[-1].id],
            "fields": ["price"],
        }
    ).hits
    assert [h.fields["price"] for h in nxt] == sorted(
        prices, reverse=True
    )[10:20]
