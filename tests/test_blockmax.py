"""Decode-level block-max: hot posting rows split into bounded blocks
(build.split_long_posting_rows); lookup reconstructs identical postings;
gather-only terms in disjunction_topk skip non-intersecting blocks."""

import numpy as np
import pytest

from bleve_ray.index import IndexOptions, build_index
from bleve_ray.index import build as build_mod
from bleve_ray.search import Index


@pytest.fixture(scope="module")
def corpus(ray_session, tmp_path_factory):
    from bleve_ray.corpus import write_corpus

    cdir = str(tmp_path_factory.mktemp("bm_corpus"))
    return write_corpus(cdir, n_docs=400, n_files=4, seed=23)


@pytest.fixture(scope="module")
def blocked_idx(corpus, tmp_path_factory):
    """Index built with a tiny block size so hot terms split into many
    block rows (production BLOCK_POSTINGS=4096 never splits at 400 docs)."""
    d = str(tmp_path_factory.mktemp("bm_idx"))
    old = build_mod.BLOCK_POSTINGS
    build_mod.BLOCK_POSTINGS = 16
    try:
        build_index(
            corpus, d,
            IndexOptions(num_shards=2, bucket_bits=33,
                         target_segments_per_shard=2),
        )
    finally:
        build_mod.BLOCK_POSTINGS = old
    return Index.open(d)


@pytest.fixture(scope="module")
def plain_idx(corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("bm_plain_idx"))
    build_index(
        corpus, d,
        IndexOptions(num_shards=2, bucket_bits=33,
                     target_segments_per_shard=2),
    )
    return Index.open(d)


def test_hot_term_splits_into_blocks(blocked_idx, plain_idx):
    blocks = blocked_idx.reader.posting_meta("content", "func")
    assert len(blocks) > 1, "hot term should span multiple block rows"
    plain = plain_idx.reader.posting("content", "func")
    assert sum(b["df"] for b in blocks) == plain.df
    # exact per-block bounds: disjoint ascending docnum ranges
    for a, b in zip(blocks, blocks[1:]):
        assert a["max_docnum"] < b["min_docnum"]
    # block maxima aggregate to the per-term maxima
    assert max(b["max_tf"] for b in blocks) == plain.max_tf
    assert max(b["max_norm"] for b in blocks) == pytest.approx(
        plain.max_norm, rel=1e-6
    )


def test_blocked_posting_reconstructs_identically(blocked_idx, plain_idx):
    for term in ["func", "return", "lambda", "error"]:
        a = blocked_idx.reader.posting("content", term, want_positions=True)
        b = plain_idx.reader.posting("content", term, want_positions=True)
        assert (a is None) == (b is None)
        if a is None:
            continue
        np.testing.assert_array_equal(a.docnums, b.docnums)
        np.testing.assert_array_equal(a.tfs, b.tfs)
        np.testing.assert_array_equal(a.norms, b.norms)
        np.testing.assert_array_equal(a.positions_flat, b.positions_flat)


@pytest.mark.parametrize(
    "req",
    [
        {"query": {"match": "func return", "field": "content"}, "size": 10},
        {"query": {"match_phrase": "func main", "field": "content"},
         "size": 10},
        {"query": {"must": [{"term": "func", "field": "content"}],
                   "must_not": [{"term": "lambda", "field": "content"}]},
         "size": 10},
    ],
)
def test_search_identical_on_blocked_index(blocked_idx, plain_idx, req):
    a = blocked_idx.search(req).to_dict()
    b = plain_idx.search(req).to_dict()
    assert [h["id"] for h in a["hits"]] == [h["id"] for h in b["hits"]]
    for ha, hb in zip(a["hits"], b["hits"]):
        assert ha["score"] == pytest.approx(hb["score"], abs=1e-12)
    assert a["total_hits"] == b["total_hits"]


@pytest.mark.parametrize("size", [1, 3, 10])
def test_pruned_topk_on_blocks_rank_identical(blocked_idx, size):
    req = {"query": {"match": "func lambda yield error",
                     "field": "content"}, "size": size}
    exact = blocked_idx.search(req).to_dict()
    pruned = blocked_idx.search(
        {**req, "track_total_hits": False}
    ).to_dict()
    assert [h["id"] for h in pruned["hits"]] == [
        h["id"] for h in exact["hits"]
    ]
    for g, w in zip(pruned["hits"], exact["hits"]):
        assert g["score"] == pytest.approx(w["score"], abs=1e-12)


def test_gather_phase_skips_block_decodes(blocked_idx):
    r = blocked_idx.reader
    # rarest keyword present: its few docs form a sparse candidate set,
    # so gathering the hot term's contribution skips most of its blocks
    rare = min(
        (d, t) for t, d in r.dictionary("content")
        if t.isalpha() and d >= 1
    )[1]
    before = dict(r.counters)
    blocked_idx.search(
        {"query": {"match": f"{rare} func", "field": "content"},
         "size": 1, "track_total_hits": False}
    )
    skipped = (
        r.counters["posting_blocks_skipped"]
        - before["posting_blocks_skipped"]
    )
    assert skipped > 0, "gather phase should skip non-intersecting blocks"


def test_pruned_topk_with_deletes(blocked_idx, tmp_path_factory, corpus):
    """Tombstones are filtered after pruning; k is inflated so live docs
    are never displaced by deleted ones."""
    import os
    import shutil

    from bleve_ray.index.mutate import delete_ids

    src = blocked_idx.reader.index_dir
    d = str(tmp_path_factory.mktemp("bm_del_idx"))
    shutil.rmtree(d)
    shutil.copytree(src, d)
    req = {"query": {"match": "func lambda yield error",
                     "field": "content"}, "size": 5}
    top = Index.open(d).search(req).to_dict()
    victims = [h["id"] for h in top["hits"][:3]]
    delete_ids(d, victims)
    idx2 = Index.open(d)
    exact = idx2.search(req).to_dict()
    pruned = idx2.search({**req, "track_total_hits": False}).to_dict()
    assert [h["id"] for h in pruned["hits"]] == [
        h["id"] for h in exact["hits"]
    ]
    assert not (set(victims) & {h["id"] for h in pruned["hits"]})
