"""End-to-end: Ray-built index vs the single-process oracle.

Mirrors the reference's two core equivalence suites:
- engine-vs-engine score parity (test/versus_score_test.go:46-75)
- sharded == single-partition BM25 scores (index_test.go:447-560
  TestBM25GlobalScoring) -- here: different (num_shards, bucket_bits)
  builds must produce identical hits AND scores.
"""

import os
import shutil

import pyarrow.parquet as pq
import pytest

from bleve_ray.corpus import doc_id_array, write_corpus
from bleve_ray.index import IndexOptions, build_index
from bleve_ray.oracle import OracleIndex
from bleve_ray.search import Index

QUERIES = [
    {"query": {"term": "func", "field": "content"}, "size": 10},
    {"query": {"term": "return", "field": "content"}, "size": 10},
    {"query": {"term": "zzz_absent", "field": "content"}, "size": 10},
    {"query": {"match": "func return", "field": "content"}, "size": 10},
    {
        "query": {
            "match": "func return err",
            "field": "content",
            "operator": "and",
        },
        "size": 10,
    },
    {"query": {"match_phrase": "return nil", "field": "content"}, "size": 10},
    {"query": {"match_phrase": "parse error", "field": "content"}, "size": 10},
    {
        "query": {
            "conjuncts": [
                {"term": "func", "field": "content"},
                {"term": "error", "field": "content"},
            ]
        },
        "size": 10,
    },
    {
        "query": {
            "disjuncts": [
                {"term": "lambda", "field": "content"},
                {"term": "yield", "field": "content"},
            ],
            "min": 1,
        },
        "size": 10,
    },
    {
        "query": {
            "must": [{"term": "func", "field": "content"}],
            "should": [{"term": "lambda", "field": "content"}],
            "must_not": [{"term": "goto", "field": "content"}],
        },
        "size": 10,
    },
    {"query": {"match_all": {}}, "size": 5},
    {"query": {"prefix": "hand", "field": "content"}, "size": 10},
    {"query": {"term": "func", "field": "content"}, "size": 5, "from": 3},
]


@pytest.fixture(scope="module")
def built_index(ray_session, tiny_corpus_dir, tmp_path_factory):
    idx_dir = str(tmp_path_factory.mktemp("idx"))
    files = sorted(
        os.path.join(tiny_corpus_dir, f) for f in os.listdir(tiny_corpus_dir)
    )
    build_index(
        files, idx_dir, IndexOptions(num_shards=4, bucket_bits=4)
    )
    return idx_dir, files


@pytest.fixture(scope="module")
def oracle(tiny_corpus_dir):
    o = OracleIndex(scoring_model="bm25")
    files = sorted(
        os.path.join(tiny_corpus_dir, f) for f in os.listdir(tiny_corpus_dir)
    )
    for f in files:
        t = pq.read_table(f)
        ids = doc_id_array(t).to_pylist()
        contents = t["content"].to_pylist()
        for i, doc_id in enumerate(ids):
            o.index_doc(doc_id, {"content": contents[i]}, {"content": "standard"})
    return o


def assert_same_results(got: dict, want: dict, qname=""):
    assert got["total_hits"] == want["total_hits"], qname
    got_hits = got["hits"]
    want_hits = want["hits"]
    assert [h["id"] for h in got_hits] == [h["id"] for h in want_hits], qname
    for g, w in zip(got_hits, want_hits):
        assert g["score"] == pytest.approx(w["score"], abs=1e-9), (
            qname,
            g["id"],
        )


@pytest.mark.parametrize("req", QUERIES, ids=lambda r: str(r["query"])[:50])
def test_engine_matches_oracle(built_index, oracle, req):
    idx_dir, _ = built_index
    idx = Index.open(idx_dir)
    got = idx.search(req).to_dict()
    want = oracle.search(req)
    assert_same_results(got, want, str(req))


def test_partitioning_equivalence(
    ray_session, tiny_corpus_dir, built_index, tmp_path_factory
):
    """Different shard/bucket partitionings -> identical hits and scores
    (the TestBM25GlobalScoring invariant)."""
    idx_dir_a, files = built_index
    idx_dir_b = str(tmp_path_factory.mktemp("idx_b"))
    build_index(files, idx_dir_b, IndexOptions(num_shards=1, bucket_bits=20))
    idx_dir_c = str(tmp_path_factory.mktemp("idx_c"))
    build_index(
        files,
        idx_dir_c,
        IndexOptions(num_shards=13, bucket_bits=3, target_segments_per_shard=2),
    )
    a, b, c = Index.open(idx_dir_a), Index.open(idx_dir_b), Index.open(idx_dir_c)
    for req in QUERIES:
        ra = a.search(req).to_dict()
        rb = b.search(req).to_dict()
        rc = c.search(req).to_dict()
        assert_same_results(rb, ra, f"b vs a: {req}")
        assert_same_results(rc, ra, f"c vs a: {req}")


def test_resume_skips_completed_partitions(
    ray_session, tiny_corpus_dir, tmp_path_factory
):
    """F6 resume: second build_index call over an existing manifest is a
    no-op for completed partitions and yields an identical index."""
    from bleve_ray.index import load_manifest

    files = sorted(
        os.path.join(tiny_corpus_dir, f) for f in os.listdir(tiny_corpus_dir)
    )
    d = str(tmp_path_factory.mktemp("idx_resume"))
    opts = IndexOptions(num_shards=2, bucket_bits=6)
    # build only the first file (simulates interruption after partition 0)
    build_index(files[:1], d, opts, files_per_partition=1)
    m1 = load_manifest(d)
    assert len(m1.partitions) == 1
    # now run with the full file list; partition 0 must be skipped
    build_index(files, d, opts, files_per_partition=1)
    m2 = load_manifest(d)
    assert len(m2.partitions) == 2
    assert m2.partitions[0].content_sha256_agg == m1.partitions[0].content_sha256_agg
    # full rebuild from scratch gives same doc stats
    d2 = str(tmp_path_factory.mktemp("idx_fresh"))
    build_index(files, d2, opts, files_per_partition=1)
    m3 = load_manifest(d2)
    s2 = {k: v for k, v in m2.stats.items() if k != "phase_seconds"}
    s3 = {k: v for k, v in m3.stats.items() if k != "phase_seconds"}
    assert s3 == s2
    # and identical search results
    for req in QUERIES[:4]:
        ra = Index.open(d).search(req).to_dict()
        rb = Index.open(d2).search(req).to_dict()
        ra.pop("took_ms"), rb.pop("took_ms")
        assert ra == rb


def test_multi_phrase_query(built_index):
    """MultiPhraseQuery: position slots with alternatives
    (reference NewMultiPhraseQuery / tokenStreamToPhrase multi-term slots)."""
    from bleve_ray.search import Index

    idx_dir, _ = built_index
    idx = Index.open(idx_dir)
    # "return nil" OR "return err" via a multi-term second slot
    r_multi = idx.search(
        {
            "query": {"terms": [["return"], ["nil", "err"]],
                      "field": "content"},
            "size": 100,
        }
    )
    r_nil = idx.search(
        {"query": {"match_phrase": "return nil", "field": "content"}, "size": 100}
    )
    r_err = idx.search(
        {"query": {"match_phrase": "return err", "field": "content"}, "size": 100}
    )
    union_ids = {h.id for h in r_nil.hits} | {h.id for h in r_err.hits}
    assert {h.id for h in r_multi.hits} == union_ids


def test_dotted_field_paths_index_struct_children(ray_session, tmp_path):
    """Document-mapping tree paths (mapping/document.go Properties): a
    field named 'meta.title' indexes the struct child; docvalues/stored
    fields resolve the same way; read pruning keeps the root column."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bleve_ray.index import FieldConfig, IndexOptions, build_index
    from bleve_ray.search import Index

    n = 30
    titles = [f"title word{i % 5}" for i in range(n)]
    langs = ["en" if i % 2 else "de" for i in range(n)]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), type=pa.int64()),
            "meta": pa.StructArray.from_arrays(
                [pa.array(titles), pa.array(langs)],
                names=["title", "lang"],
            ),
            "body": pa.array([f"body text {i}" for i in range(n)]),
        }
    )
    src = str(tmp_path / "nested.parquet")
    pq.write_table(tbl, src)
    d = str(tmp_path / "idx")
    build_index(
        [src],
        d,
        IndexOptions(
            fields={
                "meta.title": FieldConfig(analyzer="ascii_alnum_lower"),
                "body": FieldConfig(analyzer="ascii_alnum_lower"),
            },
            doc_id_fields=["doc_id"],
            num_shards=2,
            bucket_bits=6,
            docvalue_fields=["meta.lang"],
            store_fields=["meta.title"],
        ),
    )
    idx = Index.open(d)
    r = idx.search(
        {
            "query": {"term": "word3", "field": "meta.title"},
            "size": 50,
            "fields": ["meta.title", "meta.lang"],
        }
    )
    want = {str(i) for i in range(n) if i % 5 == 3}
    assert {h.id for h in r.hits} == want
    for h in r.hits:
        assert h.fields["meta.title"].endswith("word3")
        assert h.fields["meta.lang"] in ("en", "de")
    # facet over the nested docvalue
    f = idx.search(
        {
            "query": {"match_all": {}},
            "size": 0,
            "facets": {"langs": {"field": "meta.lang", "size": 5}},
        }
    ).facets["langs"]
    assert {t["term"]: t["count"] for t in f["terms"]} == {
        "en": 15,
        "de": 15,
    }


def test_randomized_query_parity_vs_oracle(built_index, oracle):
    """Randomized parity sweep: 60 seeded random query trees
    (term/match/phrase/prefix/bool/disjunction compositions) must be
    rank- and score-identical to the in-repo oracle."""
    import random

    idx_dir, _ = built_index
    idx = Index.open(idx_dir)
    vocab = [t for t, _ in idx.reader.dictionary("content")]
    rng = random.Random(20260817)

    def rand_leaf():
        kind = rng.randrange(4)
        if kind == 0:
            return {"term": rng.choice(vocab), "field": "content"}
        if kind == 1:
            return {
                "match": " ".join(
                    rng.choice(vocab) for _ in range(rng.randrange(1, 4))
                ),
                "field": "content",
                "operator": rng.choice(["or", "and"]),
            }
        if kind == 2:
            t = rng.choice(vocab)
            return {"prefix": t[: max(1, len(t) - 1)], "field": "content"}
        return {
            "match_phrase": " ".join(
                rng.choice(vocab) for _ in range(rng.randrange(1, 3))
            ),
            "field": "content",
        }

    def rand_query(depth=0):
        if depth >= 2 or rng.random() < 0.5:
            return rand_leaf()
        kind = rng.randrange(3)
        kids = [rand_query(depth + 1) for _ in range(rng.randrange(2, 4))]
        if kind == 0:
            return {"conjuncts": kids}
        if kind == 1:
            return {"disjuncts": kids, "min": rng.randrange(0, 2)}
        return {
            "must": kids[0],
            "should": kids[1:] or None,
            "must_not": rand_leaf() if rng.random() < 0.3 else None,
        }

    n_nonempty = 0
    for i in range(60):
        q = rand_query()
        if isinstance(q, dict) and q.get("should") is None:
            q.pop("should", None)
        if isinstance(q, dict) and q.get("must_not") is None:
            q.pop("must_not", None)
        req = {"query": q, "size": 10}
        got = idx.search(req).to_dict()
        want = oracle.search(req)
        assert_same_results(got, want, f"random#{i}: {q}")
        n_nonempty += 1 if got["total_hits"] else 0
    assert n_nonempty > 20  # the sweep actually exercised matches
