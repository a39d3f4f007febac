"""Hybrid FTS+KNN search: knn request, RRF/RSF fusion (fusion/rrf.go,
rsf.go, rescorer.go semantics), default additive merge."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bleve_ray.index import FieldConfig, IndexOptions, build_index
from bleve_ray.search import Index
from bleve_ray.search.fusion import (
    reciprocal_rank_fusion,
    relative_score_fusion,
)


@pytest.fixture(scope="module")
def vec_index(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("vecidx")
    rng = np.random.default_rng(11)
    n = 40
    texts = []
    for i in range(n):
        words = ["alpha", "beta", "gamma", "delta"]
        texts.append(" ".join(words[: (i % 4) + 1]) + f" doc{i}")
    vecs = rng.standard_normal((n, 8))
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), type=pa.int64()),
            "text": pa.array(texts),
            "embedding": pa.array(
                [v.tolist() for v in vecs], type=pa.list_(pa.float32())
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
            fields={"text": FieldConfig(analyzer="standard", positions=True)},
            doc_id_fields=["doc_id"],
            num_shards=2,
            bucket_bits=6,
            docvalue_fields=["embedding"],
        ),
    )
    return Index.open(idx_dir), vecs


def _brute_knn(vecs, q, k):
    qn = q / np.linalg.norm(q)
    norms = np.linalg.norm(vecs, axis=1)
    sims = (vecs @ qn) / norms
    order = sorted(range(len(vecs)), key=lambda i: (-sims[i], i))[:k]
    return order, sims


def test_knn_only(vec_index):
    idx, vecs = vec_index
    q = vecs[3]
    r = idx.search(
        {
            "query": {"match_none": {}},
            "knn": [{"field": "embedding", "vector": q.tolist(), "k": 5}],
            "size": 5,
        }
    )
    want, sims = _brute_knn(vecs.astype(np.float32).astype(np.float64), q, 5)
    got = [int(h.id) for h in r.hits]
    assert got == want
    for h in r.hits:
        assert h.score == pytest.approx(sims[int(h.id)], rel=1e-5)


def test_hybrid_default_merge(vec_index):
    """search_knn.go mergeKNNResults: fts + boost*knn additive."""
    idx, vecs = vec_index
    q = vecs[7]
    fts = idx.search({"query": {"term": "beta", "field": "text"}, "size": 40})
    fts_scores = {int(h.id): h.score for h in fts.hits}
    knn_ids, sims = _brute_knn(
        vecs.astype(np.float32).astype(np.float64), q, 5
    )
    r = idx.search(
        {
            "query": {"term": "beta", "field": "text"},
            "knn": [
                {"field": "embedding", "vector": q.tolist(), "k": 5,
                 "boost": 2.0}
            ],
            "size": 50,
        }
    )
    expect = dict(fts_scores)
    for i in knn_ids:
        expect[i] = expect.get(i, 0.0) + 2.0 * sims[i]
    got = {int(h.id): h.score for h in r.hits}
    assert set(got) == set(expect)
    for i, s in got.items():
        assert s == pytest.approx(expect[i], rel=1e-5)


def test_rrf_fusion(vec_index):
    """score=rrf: contribution weight/(rank_constant+rank) per source."""
    idx, vecs = vec_index
    q = vecs[2]
    fts = idx.search({"query": {"term": "gamma", "field": "text"}, "size": 40})
    knn_ids, sims = _brute_knn(
        vecs.astype(np.float32).astype(np.float64), q, 5
    )
    r = idx.search(
        {
            "query": {"term": "gamma", "field": "text"},
            "knn": [{"field": "embedding", "vector": q.tolist(), "k": 5}],
            "score": "rrf",
            "size": 10,
            "params": {"score_window_size": 10},
        }
    )
    src_fts = (
        [h.docnum for h in fts.hits],
        np.array([h.score for h in fts.hits]),
    )
    # map external id -> docnum via the fts result ordering is not enough;
    # recompute via the library fusion primitive for expectation
    dn_by_id = {int(h.id): h.docnum for h in fts.hits}
    all_ids = idx.search({"query": {"match_all": {}}, "size": 50})
    for h in all_ids.hits:
        dn_by_id[int(h.id)] = h.docnum
    src_knn = (
        [dn_by_id[i] for i in knn_ids],
        np.array([sims[i] for i in knn_ids]),
    )
    fused = reciprocal_rank_fusion([src_fts, src_knn], [1.0, 1.0], 60, 10)
    # default order tie-break is the EXTERNAL id string, like collect_topn
    id_by_dn = {dn: str(i) for i, dn in dn_by_id.items()}
    want = sorted(fused.items(), key=lambda kv: (-kv[1], id_by_dn[kv[0]]))[:10]
    got = [(h.docnum, h.score) for h in r.hits]
    assert [d for d, _ in got] == [d for d, _ in want]
    for (gd, gs), (wd, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-9)


def test_rsf_fusion_normalizes(vec_index):
    idx, vecs = vec_index
    q = vecs[5]
    r = idx.search(
        {
            "query": {"term": "alpha", "field": "text"},
            "knn": [{"field": "embedding", "vector": q.tolist(), "k": 5}],
            "score": "rsf",
            "size": 10,
        }
    )
    assert len(r.hits) > 0
    # top fused score is bounded by sum of weights (each source in [0,1])
    assert r.hits[0].score <= 2.0 + 1e-9
    scores = [h.score for h in r.hits]
    assert scores == sorted(scores, reverse=True)


def test_fusion_primitives_reference_vectors():
    """Locked RRF example: two sources, rank_constant=60."""
    fts = ([10, 11, 12], np.array([3.0, 2.0, 1.0]))
    knn = ([12, 13], np.array([0.9, 0.8]))
    fused = reciprocal_rank_fusion([fts, knn], [1.0, 1.0], 60, 10)
    assert fused[10] == pytest.approx(1 / 61)
    assert fused[11] == pytest.approx(1 / 62)
    assert fused[12] == pytest.approx(1 / 63 + 1 / 61)
    assert fused[13] == pytest.approx(1 / 62)
    rsf = relative_score_fusion([fts, knn], [1.0, 1.0], 10)
    assert rsf[10] == pytest.approx(1.0)  # (3-1)/(3-1)
    assert rsf[11] == pytest.approx(0.5)
    assert rsf[12] == pytest.approx(0.0 + 1.0)  # fts min + knn max
    assert rsf[13] == pytest.approx(0.0)


@pytest.fixture(scope="module")
def alias_setup(ray_session, tmp_path_factory, vec_index):
    """The SAME 40-doc corpus split across two member indexes + the
    whole-corpus index for parity."""
    whole, vecs = vec_index
    d = tmp_path_factory.mktemp("aliasvec")
    rng = np.random.default_rng(11)
    n = 40
    texts = []
    for i in range(n):
        words = ["alpha", "beta", "gamma", "delta"]
        texts.append(" ".join(words[: (i % 4) + 1]) + f" doc{i}")
    members = []
    for part, (lo, hi) in enumerate([(0, 20), (20, 40)]):
        tbl = pa.table(
            {
                "doc_id": pa.array(range(lo, hi), type=pa.int64()),
                "text": pa.array(texts[lo:hi]),
                "embedding": pa.array(
                    [v.tolist() for v in vecs[lo:hi]],
                    type=pa.list_(pa.float32()),
                ),
            }
        )
        src = str(d / f"docs{part}.parquet")
        pq.write_table(tbl, src)
        idx_dir = str(d / f"idx{part}")
        build_index(
            [src],
            idx_dir,
            IndexOptions(
                fields={
                    "text": FieldConfig(analyzer="standard", positions=True)
                },
                doc_id_fields=["doc_id"],
                num_shards=2,
                bucket_bits=6,
                docvalue_fields=["embedding"],
            ),
        )
        members.append(Index.open(idx_dir))
    from bleve_ray.search.distributed import IndexAlias

    return IndexAlias(members), whole, vecs


def test_alias_knn_presearch_matches_whole_index(alias_setup):
    """Alias KNN presearch: global top-k across members == the
    whole-corpus index's result, for pure KNN and for RRF hybrid
    (pre_search.go role: candidates are merged globally BEFORE fusion)."""
    alias, whole, vecs = alias_setup
    q = vecs[7] + 0.01

    # pure KNN (match_none keeps the FTS source empty)
    req = {
        "query": {"match_none": {}},
        "knn": [{"field": "embedding", "vector": q.tolist(), "k": 10}],
        "size": 10,
    }
    ra = alias.search(req)
    rw = whole.search(req)
    assert [h.id for h in ra.hits] == [h.id for h in rw.hits]
    assert np.allclose(
        [h.score for h in ra.hits], [h.score for h in rw.hits]
    )

    # hybrid with RRF fusion: fused ONCE at the alias level over the
    # globally-merged FTS ranking and the globally-merged KNN top-k.
    # (Member BM25 stats are member-local -- reference behavior without
    # global-scoring presearch -- so we reconstruct the expectation from
    # the members' own responses, not from the whole-corpus index.)
    req2 = {
        "query": {"match": "alpha beta", "field": "text"},
        "knn": [{"field": "embedding", "vector": q.tolist(), "k": 10}],
        "score": "rrf",
        "size": 10,
    }
    ra2 = alias.search(req2)

    from bleve_ray.search.fusion import (
        DEFAULT_RANK_CONSTANT,
        reciprocal_rank_fusion,
    )

    fts_pairs = []
    for m in alias.indexes:
        r = m.search(
            {"query": req2["query"], "size": 10, "from": 0}
        )
        fts_pairs.extend((h.id, h.score) for h in r.hits)
    fts_pairs.sort(key=lambda x: (-x[1], x[0]))
    # global knn top-10 by brute force over the union corpus
    order, sims = _brute_knn(vecs, q, 10)
    expected = reciprocal_rank_fusion(
        [
            (
                [i for i, _ in fts_pairs],
                np.array([s for _, s in fts_pairs]),
            ),
            ([str(i) for i in order], sims[order]),
        ],
        [1.0, 1.0],
        DEFAULT_RANK_CONSTANT,
        10,
    )
    want = sorted(expected.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [h.id for h in ra2.hits] == [i for i, _ in want]
    assert np.allclose(
        [h.score for h in ra2.hits], [s for _, s in want]
    )


def test_knn_prefilter(vec_index):
    """kNN pre-filtering (KNNRequest.FilterQuery): only docs matching the
    filter query are eligible candidates, so top-k comes from the
    filtered subset (all existing query clause kinds usable)."""
    idx, vecs = vec_index
    q = vecs[3] + 0.05
    # filter: docs containing "delta" = ids where i % 4 == 3
    eligible = {str(i) for i in range(40) if i % 4 == 3}
    r = idx.search(
        {
            "query": {"match_none": {}},
            "knn": [
                {
                    "field": "embedding",
                    "vector": q.tolist(),
                    "k": 5,
                    "filter": {"term": "delta", "field": "text"},
                }
            ],
            "size": 5,
        }
    )
    assert len(r.hits) == 5
    assert {h.id for h in r.hits} <= eligible
    # parity with brute force restricted to the eligible subset
    elig_idx = sorted(int(i) for i in eligible)
    sub = vecs[elig_idx]
    qn = q / np.linalg.norm(q)
    sims = (sub @ qn) / np.linalg.norm(sub, axis=1)
    order = sorted(range(len(sub)), key=lambda i: (-sims[i], elig_idx[i]))[:5]
    want = [str(elig_idx[i]) for i in order]
    assert [h.id for h in r.hits] == want


def test_knn_vector_base64(vec_index):
    """vector_base64 (document.DecodeVector): little-endian float32
    bytes, base64-encoded -- same results as the plain vector form."""
    import base64

    idx, vecs = vec_index
    q = vecs[9].astype(np.float32)
    enc = base64.standard_b64encode(q.tobytes()).decode()
    r_plain = idx.search(
        {
            "query": {"match_none": {}},
            "knn": [{"field": "embedding", "vector": q.tolist(), "k": 5}],
            "size": 5,
        }
    )
    r_b64 = idx.search(
        {
            "query": {"match_none": {}},
            "knn": [{"field": "embedding", "vector_base64": enc, "k": 5}],
            "size": 5,
        }
    )
    assert [h.id for h in r_b64.hits] == [h.id for h in r_plain.hits]
    assert np.allclose(
        [h.score for h in r_b64.hits], [h.score for h in r_plain.hits]
    )


def test_knn_operator_and_or(ray_session, tmp_path_factory):
    """knn_operator semantics (search_knn.go finalizeKNNResults +
    TestKNNOperator): "and" admits knn contributions only for docs in
    EVERY clause's top-k; "or" (default) is the union; anything else is
    rejected."""
    import numpy as np
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bleve_ray.index import FieldConfig, IndexOptions, build_index
    from bleve_ray.search import Index

    rng = np.random.default_rng(11)
    n, dims = 30, 5
    vecs = rng.normal(size=(n, dims)).astype(np.float32)
    d = str(tmp_path_factory.mktemp("knnopsrc"))
    pq.write_table(
        pa.table({
            "doc_id": pa.array([f"d{i:02d}" for i in range(n)]),
            "content": pa.array(["filler text"] * n),
            "vec": pa.array(list(map(list, vecs.tolist()))),
        }),
        os.path.join(d, "docs.parquet"),
    )
    idxd = str(tmp_path_factory.mktemp("knnopidx"))
    build_index(
        [os.path.join(d, "docs.parquet")],
        idxd,
        IndexOptions(
            fields={"content": FieldConfig()},
            doc_id_fields=["doc_id"],
            docvalue_fields=["vec"],
            num_shards=1,
            bucket_bits=16,
        ),
    )
    idx = Index.open(idxd)
    q1 = vecs[0].tolist()
    q2 = vecs[1].tolist()
    base = {
        "query": {"match_none": {}},
        "knn": [
            {"field": "vec", "vector": q1, "k": 5},
            {"field": "vec", "vector": q2, "k": 5},
        ],
        "size": 30,
    }
    r_or = idx.search({**base, "knn_operator": "or"})
    r_default = idx.search(base)
    r_and = idx.search({**base, "knn_operator": "and"})
    ids_or = {h.id for h in r_or.hits}
    ids_and = {h.id for h in r_and.hits}
    assert {h.id for h in r_default.hits} == ids_or
    assert ids_and < ids_or

    # exact membership vs brute-force cosine top-5 sets
    def topk(q):
        qv = np.asarray(q, dtype=np.float64)
        sims = (vecs @ qv) / (
            np.linalg.norm(vecs, axis=1) * np.linalg.norm(qv)
        )
        return {f"d{i:02d}" for i in np.argsort(-sims)[:5]}

    s1, s2 = topk(q1), topk(q2)
    assert ids_or == s1 | s2
    assert ids_and == s1 & s2

    import pytest as _pytest
    with _pytest.raises(ValueError, match="knn_operator"):
        idx.search({**base, "knn_operator": "xor"})


def test_multi_vector_per_doc(ray_session, tmp_path_factory):
    """Multi-vector docs (search_knn_test.go TestMultiVector /
    TestNestedVectors): a doc with several vectors scores as its BEST
    sub-vector cosine similarity."""
    import numpy as np
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bleve_ray.index import FieldConfig, IndexOptions, build_index
    from bleve_ray.search import Index

    rng = np.random.default_rng(5)
    n, dims = 12, 4
    docs = []
    for i in range(n):
        nvec = 1 + (i % 3)
        docs.append(rng.normal(size=(nvec, dims)).astype(np.float32))
    d = str(tmp_path_factory.mktemp("mvsrc"))
    pq.write_table(
        pa.table({
            "doc_id": pa.array([f"d{i:02d}" for i in range(n)]),
            "content": pa.array(["filler"] * n),
            "vecs": pa.array(
                [[list(map(float, v)) for v in doc] for doc in docs]
            ),
        }),
        os.path.join(d, "docs.parquet"),
    )
    idxd = str(tmp_path_factory.mktemp("mvidx"))
    build_index(
        [os.path.join(d, "docs.parquet")],
        idxd,
        IndexOptions(
            fields={"content": FieldConfig()},
            doc_id_fields=["doc_id"],
            docvalue_fields=["vecs"],
            num_shards=1,
            bucket_bits=16,
        ),
    )
    idx = Index.open(idxd)
    q = docs[3][0].tolist()
    res = idx.search({
        "query": {"match_none": {}},
        "knn": [{"field": "vecs", "vector": q, "k": 5}],
        "size": 5,
    })
    got = [(h.id, round(h.score, 9)) for h in res.hits]

    qv = np.asarray(q, dtype=np.float64)
    qn = qv / np.linalg.norm(qv)
    best = []
    for i, doc in enumerate(docs):
        m = doc.astype(np.float64)
        sims = (m @ qn) / np.linalg.norm(m, axis=1)
        best.append((f"d{i:02d}", float(sims.max())))
    best.sort(key=lambda x: (-x[1], x[0]))
    want = [(i, round(s, 9)) for i, s in best[:5]]
    assert got == want
    assert got[0][0] == "d03" and abs(got[0][1] - 1.0) < 1e-9


def test_knn_similarity_metrics(ray_session, tmp_path_factory):
    """Per-clause similarity models (mapping/field.go Similarity +
    scorer_knn.go:65-75): dot_product = raw inner product; l2_norm =
    inverted euclidean distance (1/d, exact match = maxKNNScore);
    cosine is the default.  The IVF sidecar path stays cosine-only."""
    import numpy as np
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pytest

    from bleve_ray.index import FieldConfig, IndexOptions, build_index
    from bleve_ray.search import Index

    rng = np.random.default_rng(9)
    n, dims = 20, 4
    vecs = rng.normal(size=(n, dims)).astype(np.float32)
    d = str(tmp_path_factory.mktemp("simsrc"))
    pq.write_table(
        pa.table({
            "doc_id": pa.array([f"d{i:02d}" for i in range(n)]),
            "content": pa.array(["filler"] * n),
            "vec": pa.array(list(map(list, vecs.tolist()))),
        }),
        os.path.join(d, "docs.parquet"),
    )
    idxd = str(tmp_path_factory.mktemp("simidx"))
    build_index(
        [os.path.join(d, "docs.parquet")],
        idxd,
        IndexOptions(
            fields={"content": FieldConfig()},
            doc_id_fields=["doc_id"],
            docvalue_fields=["vec"],
            num_shards=1,
            bucket_bits=16,
        ),
    )
    idx = Index.open(idxd)
    q = vecs[7].astype(np.float64)

    def run(sim):
        res = idx.search({
            "query": {"match_none": {}},
            "knn": [{"field": "vec", "vector": q.tolist(), "k": 5,
                     "similarity": sim}],
            "size": 5,
        })
        return [(h.id, h.score) for h in res.hits]

    m = vecs.astype(np.float64)
    # dot product: raw inner products, top-5
    dots = m @ q
    want_dot = sorted(
        ((f"d{i:02d}", float(dots[i])) for i in range(n)),
        key=lambda x: (-x[1], x[0]),
    )[:5]
    got_dot = run("dot_product")
    assert [g[0] for g in got_dot] == [w[0] for w in want_dot]
    for g, w in zip(got_dot, want_dot):
        assert abs(g[1] - w[1]) < 1e-9

    # l2: self-match first with maxKNNScore, then nearest by distance
    dists = np.linalg.norm(m - q, axis=1)
    order = np.argsort(dists)
    got_l2 = run("l2_norm")
    assert got_l2[0][0] == "d07"
    assert got_l2[0][1] > 1e38
    want_rest = [f"d{i:02d}" for i in order[1:5]]
    assert [g[0] for g in got_l2[1:]] == want_rest
    for g, i in zip(got_l2[1:], order[1:5]):
        assert abs(g[1] - 1.0 / dists[i]) < 1e-9

    with _pytest.raises(ValueError, match="similarity"):
        run("manhattan")


@pytest.fixture(scope="module")
def health_index(ray_session, tmp_path_factory):
    """TestHybridExplainNotDropped corpus (search_knn_test.go:3058):
    4 docs spanning text-only / vector-only / both / neither."""
    d = tmp_path_factory.mktemp("hybrid_expl")
    tbl = pa.table(
        {
            "doc_id": pa.array(
                ["vdocBoth", "vdocVecOnly", "vdocTextOnly", "vdocNeither"]
            ),
            "category": pa.array(["health", "", "health", "finance"]),
            "vector": pa.array(
                [
                    [0.1, 0.9, 0.2, 0.5],
                    [0.1, 0.9, 0.2, 0.5],
                    [0.1, 0.2, 0.9, 0.1],
                    [0.8, 0.1, 0.1, 0.9],
                ],
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
            fields={"category": FieldConfig(analyzer="keyword")},
            doc_id_fields=["doc_id"],
            num_shards=1,
            bucket_bits=6,
            docvalue_fields=["vector"],
            store_fields=["category"],
        ),
    )
    return Index.open(idx_dir)


def test_hybrid_explain_not_dropped(health_index):
    """search_knn_test.go TestHybridExplainNotDropped: every hybrid hit
    carries an explanation, expl.value == score, and the both-branches
    hit merges text + vector sub-explanations."""
    r = health_index.search(
        {
            "query": {"term": "health", "field": "category"},
            "knn": [
                {
                    "field": "vector",
                    "vector": [0.1, 0.9, 0.2, 0.4],
                    "k": 2,
                    "boost": 1.0,
                    "similarity": "l2_norm",
                }
            ],
            "explain": True,
            "fields": ["category"],
            "size": 10,
        }
    )
    assert r.hits
    ids = {h.id for h in r.hits}
    assert "vdocBoth" in ids
    for h in r.hits:
        assert h.expl is not None, f"hit {h.id} has no explanation"
        assert abs(h.expl["value"] - h.score) <= 1e-6, (
            h.id,
            h.expl["value"],
            h.score,
        )
        if h.id == "vdocBoth":
            assert len(h.expl.get("children", [])) >= 2


def test_knn_null_params(health_index):
    """search_knn_test.go TestKNNNullParams: null params / filter /
    pre_search_data in the request JSON must parse and run."""
    import json

    raw = json.loads(
        '{"pre_search_data": null, "knn": [{"field": "vector", '
        '"params": null, "filter": null, '
        '"vector": [0.1, 0.9, 0.2, 0.4], "k": 3}], "size": 3}'
    )
    r = health_index.search(raw)
    assert len(r.hits) == 3


@pytest.fixture(scope="module")
def cosine_index(ray_session, tmp_path_factory):
    """TestMultiVectorCosineNormalization corpus (search_knn_test.go:
    2138): single-vector docs on 'vec', one multi-vector doc on
    'multi_vec', cosine similarity."""
    d = tmp_path_factory.mktemp("cosnorm")
    tbl = pa.table(
        {
            "doc_id": pa.array(["doc1", "doc2", "doc3"]),
            "vec": pa.array(
                [[3.0, 0.0, 0.0], [0.0, 4.0, 0.0], None],
                type=pa.list_(pa.float32()),
            ),
            "multi_vec": pa.array(
                [None, None, [[3.0, 0.0, 0.0], [0.0, 4.0, 0.0]]],
                type=pa.list_(pa.list_(pa.float32())),
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
            fields={"doc_id": FieldConfig(analyzer="keyword")},
            doc_id_fields=["doc_id"],
            num_shards=1,
            bucket_bits=6,
            docvalue_fields=["vec", "multi_vec"],
        ),
    )
    return Index.open(idx_dir)


def _knn_only(idx, field, qvec, k=3):
    return idx.search(
        {
            "query": {"match_none": {}},
            "knn": [{"field": field, "vector": qvec, "k": k,
                     "similarity": "cosine"}],
            "size": k,
        }
    )


def test_multi_vector_cosine_normalization(cosine_index):
    """Cosine scores normalize magnitude away: axis-aligned docs score
    exactly 1.0 / 0.0, and a multi-vector doc scores by its best
    sub-vector in either direction."""
    r = _knn_only(cosine_index, "vec", [1.0, 0.0, 0.0])
    assert [h.id for h in r.hits] == ["doc1", "doc2"]
    assert abs(r.hits[0].score - 1.0) <= 1e-6
    assert abs(r.hits[1].score - 0.0) <= 1e-6

    r = _knn_only(cosine_index, "vec", [0.0, 1.0, 0.0])
    assert [h.id for h in r.hits] == ["doc2", "doc1"]
    assert abs(r.hits[0].score - 1.0) <= 1e-6
    assert abs(r.hits[1].score - 0.0) <= 1e-6

    for q in ([1.0, 0.0, 0.0], [0.0, 1.0, 0.0]):
        r = _knn_only(cosine_index, "multi_vec", q)
        assert [h.id for h in r.hits] == ["doc3"]
        assert abs(r.hits[0].score - 1.0) <= 1e-6


def test_knn_score_boosting(vec_index):
    """TestKNNScoreBoosting (search_knn_test.go:1491): boost=10 scales
    every knn hit's score by exactly 10x."""
    idx, vecs = vec_index
    q = vecs[5].astype(float).tolist()

    def run(boost):
        r = idx.search(
            {
                "query": {"match_none": {}},
                "knn": [
                    {"field": "embedding", "vector": q, "k": 3,
                     "boost": boost, "similarity": "dot_product"}
                ],
                "size": 3,
            }
        )
        return {h.id: h.score for h in r.hits}

    one, ten = run(1.0), run(10.0)
    assert set(one) == set(ten)
    for i, s in one.items():
        assert ten[i] == pytest.approx(s * 10.0, rel=1e-9)


ITEMS_DOCS = [
    {
        "doc_id": "doc1",
        "items": [
            {"description": "I like trains",
             "embedding_vector": [1.0, 0.0, 0.0], "type": "transport"},
            {"description": "I love pizza",
             "embedding_vector": [0.0, 1.0, 0.0], "type": "food"},
        ],
    },
    {
        "doc_id": "doc2",
        "items": [
            {"description": "I go to school by bus",
             "embedding_vector": [0.9, 0.1, 0.0], "type": "transport"},
            {"description": "Sushi is delicious",
             "embedding_vector": [0.0, 1.0, 0.0], "type": "food"},
        ],
    },
    {
        "doc_id": "doc3",
        "items": [
            {"description": "Hamburgers are tasty",
             "embedding_vector": [0.0, 0.8, 0.2], "type": "food"},
            {"description": "I enjoy biking",
             "embedding_vector": [0.7, 0.0, 0.3], "type": "transport"},
        ],
    },
]


def _items_index(tmpdir, nested):
    src = str(tmpdir / f"items_{nested}.parquet")
    pq.write_table(pa.Table.from_pylist(ITEMS_DOCS), src)
    idx_dir = str(tmpdir / f"idx_{nested}")
    build_index(
        [src],
        idx_dir,
        IndexOptions(
            fields={
                "items.type": FieldConfig(analyzer="keyword"),
                "items.description": FieldConfig(analyzer="en"),
            },
            doc_id_fields=["doc_id"],
            num_shards=1,
            bucket_bits=6,
            docvalue_fields=["items"],
            nested_paths=["items"] if nested else [],
        ),
    )
    return Index.open(idx_dir)


@pytest.fixture(scope="module")
def items_indexes(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("hier_nested_vec")
    return _items_index(d, False), _items_index(d, True)


def _items_knn(idx, with_filter):
    kr = {"field": "items.embedding_vector", "vector": [0.0, 1.0, 0.0],
          "k": 5, "similarity": "cosine"}
    if with_filter:
        kr["filter"] = {"term": "transport", "field": "items.type"}
    return idx.search(
        {"query": {"match_none": {}}, "knn": [kr], "size": 5}
    )


def test_hierarchical_nested_vector_search(items_indexes):
    """search_knn_test.go TestHierarchicalNestedVectorSearch: plain and
    doc-level-filtered knn behave identically on nested and non-nested
    mappings; a filter under the SAME nested root scopes eligible
    sub-vectors to matching elements only."""
    flat, nested = items_indexes
    plain_order = ["doc1", "doc2", "doc3"]
    plain_scores = [1.0, 1.0, 0.970]

    for idx in (flat, nested):
        r = _items_knn(idx, with_filter=False)
        assert [h.id for h in r.hits] == plain_order
        for h, want in zip(r.hits, plain_scores):
            assert abs(h.score - want) <= 0.01

    # non-nested: filter applies at doc level -> identical result
    r = _items_knn(flat, with_filter=True)
    assert [h.id for h in r.hits] == plain_order
    for h, want in zip(r.hits, plain_scores):
        assert abs(h.score - want) <= 0.01

    # nested: only transport elements' vectors are eligible
    r = _items_knn(nested, with_filter=True)
    assert [h.id for h in r.hits] == ["doc2", "doc1", "doc3"]
    for h, want in zip(r.hits, [0.110, 0.0, 0.0]):
        assert abs(h.score - want) <= 0.01
