"""Per-index IVF sidecar for the knn request path (reference role:
per-segment faiss IVF, search_knn.go / snapshot_vector_index.go /
optimize_knn.go): rank parity with brute force on top-k, candidate scan
count << N, epoch-staleness fallback."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bleve_ray.index import FieldConfig, IndexOptions, build_index
from bleve_ray.index.knn_ivf import build_knn_ivf, load_knn_ivf
from bleve_ray.search import Index
from bleve_ray.search.fusion import knn_topk

N = 100_000
DIM = 8
NLIST = 16


@pytest.fixture(scope="module")
def big_vec_index(ray_session, tmp_path_factory):
    """100k clustered vectors (16 well-separated centers) so nprobe=2
    probing is enough for exact top-k parity."""
    d = tmp_path_factory.mktemp("knn_ivf")
    rng = np.random.default_rng(3)
    centers = rng.standard_normal((16, DIM)) * 10.0
    labels = rng.integers(0, 16, size=N)
    vecs = (centers[labels] + rng.standard_normal((N, DIM)) * 0.5).astype(
        np.float32
    )
    tbl = pa.table(
        {
            "doc_id": pa.array(range(N), type=pa.int64()),
            "text": pa.array(["x"] * N),
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
            fields={
                "text": FieldConfig(analyzer="keyword", positions=False)
            },
            doc_id_fields=["doc_id"],
            num_shards=2,
            bucket_bits=6,
            docvalue_fields=["embedding"],
        ),
    )
    build_knn_ivf(idx_dir, "embedding", nlist=NLIST)
    return idx_dir, vecs


def _brute(vecs, q, k):
    qn = q / np.linalg.norm(q)
    m = vecs.astype(np.float64)
    sims = (m @ qn) / np.linalg.norm(m, axis=1)
    return sorted(range(len(m)), key=lambda i: (-sims[i], i))[:k]


def test_ivf_rank_parity_and_pruned_scan(big_vec_index):
    idx_dir, vecs = big_vec_index
    idx = Index.open(idx_dir)
    assert load_knn_ivf(idx.reader, "embedding") is not None
    rng = np.random.default_rng(9)
    for qi in rng.integers(0, N, size=5):
        q = vecs[qi].astype(np.float64)
        stats = {}
        nums, sims = knn_topk(
            idx.reader, "embedding", q, 10, nprobe=2, stats=stats
        )
        assert stats["path"] == "ivf"
        # candidate scan is a small fraction of the corpus
        assert 0 < stats["scanned"] < N // 4
        want = _brute(vecs, q, 10)
        # docnum == row order == doc_id here (single input file)
        assert nums.tolist() == want


def test_ivf_via_search_request_and_exact_gate(big_vec_index):
    idx_dir, vecs = big_vec_index
    idx = Index.open(idx_dir)
    q = vecs[7].astype(np.float64)
    r_ivf = idx.search(
        {
            "query": {"match_none": {}},
            "knn": [
                {
                    "field": "embedding",
                    "vector": q.tolist(),
                    "k": 5,
                    "nprobe": 2,
                }
            ],
            "size": 5,
        }
    )
    r_exact = idx.search(
        {
            "query": {"match_none": {}},
            "knn": [
                {
                    "field": "embedding",
                    "vector": q.tolist(),
                    "k": 5,
                    "method": "exact",
                }
            ],
            "size": 5,
        }
    )
    assert [h.id for h in r_ivf.hits] == [h.id for h in r_exact.hits]
    for a, b in zip(r_ivf.hits, r_exact.hits):
        assert a.score == pytest.approx(b.score, rel=1e-9)


def test_ivf_respects_knn_prefilter(big_vec_index):
    idx_dir, vecs = big_vec_index
    idx = Index.open(idx_dir)
    q = vecs[42].astype(np.float64)
    allowed = np.arange(0, N, 2, dtype=np.int64)  # even docnums only
    stats = {}
    nums, _ = knn_topk(
        idx.reader, "embedding", q, 10, allowed=allowed, nprobe=4,
        stats=stats,
    )
    assert stats["path"] == "ivf"
    assert all(n % 2 == 0 for n in nums.tolist())


def test_stale_sidecar_falls_back_to_exact(big_vec_index, tmp_path):
    """Mutating the index bumps the manifest epoch; the old sidecar must
    be ignored (never serve stale docnums)."""
    import json
    import os
    import shutil

    idx_dir, vecs = big_vec_index
    stale_dir = str(tmp_path / "stale_idx")
    shutil.copytree(idx_dir, stale_dir)
    meta_path = os.path.join(
        stale_dir, "knn_ivf", "embedding", "_ivf_meta.json"
    )
    meta = json.load(open(meta_path))
    meta["epoch"] = meta["epoch"] - 1  # simulate pre-mutation sidecar
    json.dump(meta, open(meta_path, "w"))
    idx = Index.open(stale_dir)
    assert load_knn_ivf(idx.reader, "embedding") is None
    stats = {}
    q = vecs[3].astype(np.float64)
    nums, _ = knn_topk(idx.reader, "embedding", q, 10, stats=stats)
    assert stats["path"] == "brute"
    assert nums.tolist() == _brute(vecs, q, 10)


def test_rebuild_replaces_sidecar_no_duplicates(ray_session, tmp_path):
    """Rebuilding over an existing sidecar must REPLACE it — ray's
    write_parquet appends by default, and candidates() globs every
    *.parquet per cell, so a stale file would double-count docnums."""
    rng = np.random.default_rng(5)
    n = 400
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), type=pa.int64()),
            "text": pa.array(["x"] * n),
            "embedding": pa.array(
                [rng.standard_normal(4).tolist() for _ in range(n)],
                type=pa.list_(pa.float32()),
            ),
        }
    )
    src = str(tmp_path / "t.parquet")
    pq.write_table(tbl, src)
    idx_dir = str(tmp_path / "idx")
    build_index(
        [src],
        idx_dir,
        IndexOptions(
            fields={
                "text": FieldConfig(analyzer="keyword", positions=False)
            },
            doc_id_fields=["doc_id"],
            num_shards=1,
            bucket_bits=4,
            docvalue_fields=["embedding"],
        ),
    )
    build_knn_ivf(idx_dir, "embedding", nlist=4)
    build_knn_ivf(idx_dir, "embedding", nlist=4)  # rebuild in place
    idx = Index.open(idx_dir)
    ivf = load_knn_ivf(idx.reader, "embedding")
    assert ivf is not None
    # probing EVERY cell must yield each docnum exactly once
    nums, vecs_out = ivf.candidates(np.ones(4), nprobe=4)
    assert len(nums) == n
    assert len(set(nums.tolist())) == n
    assert vecs_out.shape == (n, 4)


def test_method_ivf_errors_without_sidecar(ray_session, tmp_path):
    rng = np.random.default_rng(1)
    tbl = pa.table(
        {
            "doc_id": pa.array(range(10), type=pa.int64()),
            "text": pa.array(["x"] * 10),
            "embedding": pa.array(
                [rng.standard_normal(4).tolist() for _ in range(10)],
                type=pa.list_(pa.float32()),
            ),
        }
    )
    src = str(tmp_path / "t.parquet")
    pq.write_table(tbl, src)
    idx_dir = str(tmp_path / "idx")
    build_index(
        [src],
        idx_dir,
        IndexOptions(
            fields={
                "text": FieldConfig(analyzer="keyword", positions=False)
            },
            doc_id_fields=["doc_id"],
            num_shards=1,
            bucket_bits=4,
            docvalue_fields=["embedding"],
        ),
    )
    idx = Index.open(idx_dir)
    with pytest.raises(ValueError, match="IVF sidecar"):
        knn_topk(
            idx.reader, "embedding", np.zeros(4), 3, method="ivf"
        )


def test_alias_forwards_knn_method_and_nprobe(big_vec_index):
    """Alias presearch must honor per-clause method/nprobe like the
    single-index path: method:"ivf" with no sidecar at alias level is a
    recorded member failure (partial results), not a silent exact scan;
    method:"exact" never touches the sidecar."""
    from bleve_ray.search.distributed import IndexAlias

    idx_dir, vecs = big_vec_index
    idx = Index.open(idx_dir)
    alias = IndexAlias([idx])
    q = vecs[11].astype(np.float64)

    def req(**kw):
        return {
            "query": {"match_none": {}},
            "knn": [dict(field="embedding", vector=q.tolist(), k=5, **kw)],
            "size": 5,
            "score": "rrf",  # fusion routes through alias presearch
            "params": {"score_window_size": 5},
        }

    r_ivf = alias.search(req(method="ivf", nprobe=2))
    r_exact = alias.search(req(method="exact"))
    assert [h.id for h in r_ivf.hits] == [h.id for h in r_exact.hits]

    # strip the sidecar: method:"ivf" now fails that member, recorded in
    # the scatter status instead of silently scanning exact
    import shutil
    import tempfile

    bare = tempfile.mkdtemp()
    shutil.copytree(idx_dir, bare, dirs_exist_ok=True)
    shutil.rmtree(os.path.join(bare, "knn_ivf"))
    alias2 = IndexAlias([Index.open(bare)])
    r_fail = alias2.search(req(method="ivf"))
    assert r_fail.status["failed"] >= 1
    assert r_fail.status["errors"]
    assert not r_fail.hits
    shutil.rmtree(bare)


def test_insights_term_frequencies(ray_session, tmp_path):
    """TestIndexInsightsTermFrequencies (search_knn_test.go:2537): exact
    top-5 (term, df) list with (df desc, term asc) ordering under the en
    analyzer."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bleve_ray.index import FieldConfig, IndexOptions, build_index
    from bleve_ray.search import Index

    data = [
        ("one", "She sells sea shells by the sea shore"),
        ("two", "The quick brown fox jumps over the lazy dog"),
        ("three", "She sold sea shells to the person with the dog"),
        ("four", "But there are a lot of dogs on the beach"),
        ("five", "To hell with the foxes"),
        ("six", "What about the dogs"),
        ("seven", "Dogs are OK, foxes are not"),
    ]
    src = str(tmp_path / "docs.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([d[0] for d in data]),
                "text": pa.array([d[1] for d in data]),
            }
        ),
        src,
    )
    d = str(tmp_path / "idx")
    build_index(
        [src],
        d,
        IndexOptions(
            fields={"text": FieldConfig(analyzer="en")},
            doc_id_fields=["doc_id"],
            num_shards=2,
            bucket_bits=6,
        ),
    )
    ix = Index.open(d)
    assert ix.term_frequencies("text", 5, descending=True) == [
        ("dog", 5),
        ("fox", 3),
        ("sea", 2),
        ("shell", 2),
        ("beach", 1),
    ]


def test_insights_centroid_cardinalities(big_vec_index):
    """TestIndexInsightsCentroidCardinalities (search_knn_test.go:2618):
    top-k centroids with member counts and a non-empty index name; the
    counts must sum to the corpus size across ALL cells."""
    idx_dir, vecs = big_vec_index
    n_docs = len(vecs)
    from bleve_ray.search import Index

    ix = Index.open(idx_dir)
    top = ix.centroid_cardinalities("embedding", 5, descending=True)
    assert len(top) == 5
    for e in top:
        assert e["index"]
        assert e["cardinality"] > 0
    # descending order
    cards = [e["cardinality"] for e in top]
    assert cards == sorted(cards, reverse=True)
    everything = ix.centroid_cardinalities("embedding", 10**6)
    assert sum(e["cardinality"] for e in everything) == n_docs
