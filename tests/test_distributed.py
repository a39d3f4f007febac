"""Distributed (shard-actor) query path == local path == oracle scores --
the scatter-gather consistency invariant (index_test.go:447 BM25GlobalScoring)."""

import os

import pytest

from bleve_ray.search import Index
from bleve_ray.search.distributed import DistributedIndex

from test_build_search import QUERIES


def test_distributed_matches_local(ray_session, built_index):
    idx_dir, _ = built_index
    local = Index.open(idx_dir)
    dist = DistributedIndex(idx_dir, num_actors=3)
    for req in QUERIES:
        a = local.search(req).to_dict()
        b = dist.search(req).to_dict()
        a.pop("took_ms"), b.pop("took_ms")
        assert a == b, req


@pytest.fixture(scope="module")
def built_index(ray_session, tiny_corpus_dir, tmp_path_factory):
    from bleve_ray.index import IndexOptions, build_index

    idx_dir = str(tmp_path_factory.mktemp("idx_dist"))
    files = sorted(
        os.path.join(tiny_corpus_dir, f) for f in os.listdir(tiny_corpus_dir)
    )
    build_index(files, idx_dir, IndexOptions(num_shards=6, bucket_bits=4))
    return idx_dir, files


def test_index_alias_merges_heterogeneous(ray_session, tmp_path):
    """IndexAlias over two DIFFERENT indexes: hits interleave by score,
    totals sum, facets merge (index_alias_impl.go:776-1090)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bleve_ray.index import FieldConfig, IndexOptions, build_index
    from bleve_ray.search import Index
    from bleve_ray.search.distributed import IndexAlias

    def mk(name, rows, lang):
        tbl = pa.table(
            {
                "doc_id": pa.array(
                    [f"{name}-{i}" for i in range(len(rows))],
                ),
                "text": pa.array(rows),
                "lang": pa.array([lang] * len(rows)),
            }
        )
        src = str(tmp_path / f"{name}.parquet")
        pq.write_table(tbl, src)
        d = str(tmp_path / f"{name}_idx")
        build_index(
            [src],
            d,
            IndexOptions(
                fields={
                    "text": FieldConfig(analyzer="standard", positions=True),
                    "lang": FieldConfig(analyzer="keyword", positions=False),
                },
                doc_id_fields=["doc_id"],
                num_shards=2,
                bucket_bits=6,
                docvalue_fields=["lang"],
            ),
        )
        return Index.open(d)

    a = mk("a", ["shared token alpha"] * 3 + ["only alpha here"], "en")
    b = mk("b", ["shared token beta"] * 2 + ["unrelated text"], "de")
    alias = IndexAlias([a, b])
    r = alias.search({"query": {"term": "shared", "field": "text"},
                      "size": 10})
    ra = a.search({"query": {"term": "shared", "field": "text"}, "size": 10})
    rb = b.search({"query": {"term": "shared", "field": "text"}, "size": 10})
    assert r.total_hits == ra.total_hits + rb.total_hits == 5
    got = [(h.id, h.score) for h in r.hits]
    want = sorted(
        [(h.id, h.score) for h in ra.hits] + [(h.id, h.score) for h in rb.hits],
        key=lambda x: (-x[1], x[0]),
    )
    assert got == want
    # facet merge across members
    rf = alias.search(
        {
            "query": {"match_all": {}},
            "size": 0,
            "facets": {"langs": {"field": "lang", "size": 10}},
        }
    )
    terms = {t["term"]: t["count"] for t in rf.facets["langs"]["terms"]}
    assert terms == {"en": 4, "de": 3}
    # paging across members
    page2 = alias.search({"query": {"term": "shared", "field": "text"},
                          "size": 2, "from": 2})
    assert [(h.id, h.score) for h in page2.hits] == want[2:4]


def test_alias_global_scoring_matches_single_partition(
    ray_session, tmp_path_factory
):
    """search_type=global_scoring (ctx SearchTypeKey=GlobalScoring,
    index_test.go TestBM25GlobalScoring): an alias over a doc-partitioned
    corpus scores EXACTLY like the single whole-corpus index when the
    scored term's docs all live in one member (term df is member-local in
    the reference too); without the flag, member-local docCount/avgdl
    give different scores."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bleve_ray.index import FieldConfig, IndexOptions, build_index
    from bleve_ray.search.distributed import IndexAlias

    d = tmp_path_factory.mktemp("galias")
    # needle docs all in part 0; part 1 skews avgdl with longer docs
    part0 = [f"needle in doc {i} plus filler words here" for i in range(8)]
    part1 = [
        "just a lot of other much longer filler text " * 3 + f"tail {i}"
        for i in range(12)
    ]

    def write(rows, name, base):
        tbl = pa.table(
            {
                "doc_id": pa.array(
                    range(base, base + len(rows)), type=pa.int64()
                ),
                "text": pa.array(rows),
            }
        )
        p = str(d / name)
        pq.write_table(tbl, p)
        return p

    opts = dict(
        fields={"text": FieldConfig(analyzer="standard", positions=True)},
        doc_id_fields=["doc_id"],
        num_shards=2,
        bucket_bits=6,
    )
    f0 = write(part0, "p0.parquet", 0)
    f1 = write(part1, "p1.parquet", 100)
    whole_dir = str(d / "whole")
    build_index([f0, f1], whole_dir, IndexOptions(**opts))
    m0_dir = str(d / "m0")
    build_index([f0], m0_dir, IndexOptions(**opts))
    m1_dir = str(d / "m1")
    build_index([f1], m1_dir, IndexOptions(**opts))

    whole = Index.open(whole_dir)
    alias = IndexAlias([Index.open(m0_dir), Index.open(m1_dir)])
    req = {"query": {"term": "needle", "field": "text"}, "size": 8}

    rw = whole.search(req)
    r_local = alias.search(req)
    r_global = alias.search(dict(req, search_type="global_scoring"))

    assert rw.hits and len(rw.hits) == 8
    # without presearch: member-local stats -> different scores
    assert any(
        abs(a.score - b.score) > 1e-9
        for a, b in zip(r_local.hits, rw.hits)
    )
    # with global scoring: identical ranking AND identical scores
    assert [h.id for h in r_global.hits] == [h.id for h in rw.hits]
    for a, b in zip(r_global.hits, rw.hits):
        assert abs(a.score - b.score) < 1e-12, (a, b)


def test_alias_honors_custom_sort(ray_session, tmp_path):
    """Alias hit merge follows the request's sort order (reference alias
    sorting honors req.Sort), not the default score order."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bleve_ray.index import FieldConfig, IndexOptions, build_index
    from bleve_ray.search.distributed import IndexAlias

    members = []
    for part in range(2):
        n0 = part * 20
        tbl = pa.table(
            {
                "doc_id": pa.array(
                    [f"{i:03d}" for i in range(n0, n0 + 20)]
                ),
                "text": pa.array(["common filler"] * 20),
                "rank": pa.array(
                    [((i * 7) % 40) for i in range(n0, n0 + 20)],
                    type=pa.int64(),
                ),
            }
        )
        p = str(tmp_path / f"m{part}.parquet")
        pq.write_table(tbl, p)
        d = str(tmp_path / f"idx{part}")
        build_index(
            [p],
            d,
            IndexOptions(
                fields={"text": FieldConfig(analyzer="ascii_alnum_lower")},
                doc_id_fields=["doc_id"],
                num_shards=2,
                bucket_bits=6,
                docvalue_fields=["rank"],
            ),
        )
        members.append(Index.open(d))
    alias = IndexAlias(members)
    r = alias.search(
        {
            "query": {"term": "common", "field": "text"},
            "size": 40,
            "sort": ["-rank", "_id"],
            "fields": ["rank"],
        }
    )
    ranks = [h.fields["rank"] for h in r.hits]
    assert ranks == sorted(ranks, reverse=True)
    assert len(r.hits) == 40
    # interleaved: both members contribute to the top 10
    top_members = {int(h.id) // 20 for h in r.hits[:10]}
    assert top_members == {0, 1}


def test_alias_sort_by_geo_distance(ray_session, tmp_path):
    """Alias merge supports the geo_distance object sort: distances
    computed from each hit's fetched geo field."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bleve_ray.index import FieldConfig, IndexOptions, build_index
    from bleve_ray.index.geo import haversin_km
    from bleve_ray.search.distributed import IndexAlias

    rng = np.random.default_rng(4)
    members = []
    all_pts = {}
    for part in range(2):
        n0 = part * 15
        lon = np.round(rng.uniform(-5, 5, 15), 4)
        lat = np.round(rng.uniform(44, 50, 15), 4)
        for i in range(15):
            all_pts[f"{n0 + i:03d}"] = (lon[i], lat[i])
        tbl = pa.table(
            {
                "doc_id": pa.array([f"{n0 + i:03d}" for i in range(15)]),
                "text": pa.array(["place marker"] * 15),
                "pt": pa.StructArray.from_arrays(
                    [pa.array(lon), pa.array(lat)], names=["lon", "lat"]
                ),
            }
        )
        p = str(tmp_path / f"g{part}.parquet")
        pq.write_table(tbl, p)
        d = str(tmp_path / f"gidx{part}")
        build_index(
            [p],
            d,
            IndexOptions(
                fields={
                    "text": FieldConfig(analyzer="ascii_alnum_lower"),
                    "pt": FieldConfig(field_type="geo", positions=False),
                },
                doc_id_fields=["doc_id"],
                num_shards=2,
                bucket_bits=6,
            ),
        )
        members.append(Index.open(d))
    alias = IndexAlias(members)
    qlon, qlat = 0.0, 47.0
    r = alias.search(
        {
            "query": {"term": "marker", "field": "text"},
            "size": 30,
            "sort": [
                {
                    "by": "geo_distance",
                    "field": "pt",
                    "location": {"lon": qlon, "lat": qlat},
                }
            ],
        }
    )
    assert len(r.hits) == 30
    dists = [
        float(haversin_km(qlon, qlat, *all_pts[h.id])) for h in r.hits
    ]
    assert all(a <= b + 1e-9 for a, b in zip(dists, dists[1:]))


def test_posting_cache_lru_evicts_not_stops(ray_session, built_index):
    """Round-4 ADVICE: the postings cache must EVICT under churn, not stop
    caching — after 10x working-set churn, new entries still get cached."""
    idx_dir, _ = built_index
    from bleve_ray.search.distributed import DistributedIndexReader

    r = DistributedIndexReader(idx_dir, num_actors=2)
    r._cache_cap = 8
    terms = [t for t, _ in r.local.dictionary("content")][:80]
    assert len(terms) >= 40, "corpus too small for churn test"
    for t in terms:
        r.posting("content", t)
    assert len(r._cache) == 8
    # the MOST RECENT 8 terms are cached: re-fetching them is a hit
    hits = sum(1 for t in terms[-8:] if ("content", t, False) in r._cache)
    assert hits == 8
    # and a brand-new fetch still lands in the cache (not silently dropped)
    r.posting("content", terms[0])
    assert ("content", terms[0], False) in r._cache
