"""MaxScore / block-max-style top-k pruning: rank-identical to exhaustive."""

import os

import pytest

from bleve_ray.index import IndexOptions, build_index
from bleve_ray.search import Index


@pytest.fixture(scope="module")
def idx(ray_session, tmp_path_factory):
    from bleve_ray.corpus import write_corpus

    cdir = str(tmp_path_factory.mktemp("topk_corpus"))
    files = write_corpus(cdir, n_docs=400, n_files=4, seed=11)
    d = str(tmp_path_factory.mktemp("topk_idx"))
    build_index(
        files, d, IndexOptions(num_shards=4, bucket_bits=33,
                               target_segments_per_shard=4)
    )
    return Index.open(d)


MATCHES = [
    "func return",
    "lambda yield await",
    "error string value",
    "merge split index search query",
    "zzznope func",
]


@pytest.mark.parametrize("text", MATCHES)
@pytest.mark.parametrize("size", [3, 10, 50])
def test_pruned_topk_rank_identical(idx, text, size):
    req = {"query": {"match": text, "field": "content"}, "size": size}
    exact = idx.search(req).to_dict()
    pruned = idx.search({**req, "track_total_hits": False}).to_dict()
    assert [h["id"] for h in pruned["hits"]] == [h["id"] for h in exact["hits"]]
    for g, w in zip(pruned["hits"], exact["hits"]):
        assert g["score"] == pytest.approx(w["score"], abs=1e-12)
    # total is exact or a declared lower bound
    if pruned.get("total_relation") == "gte":
        assert pruned["total_hits"] <= exact["total_hits"]
        assert pruned["total_hits"] >= min(size, exact["total_hits"])
    else:
        assert pruned["total_hits"] == exact["total_hits"]


def test_pruning_actually_prunes(idx):
    """With a tiny k and a mix of hot+rare terms the pruned path must skip
    docs (total_relation gte) -- guards against the optimization silently
    degrading to exhaustive."""
    req = {
        "query": {"match": "func lambda yield", "field": "content"},
        "size": 1,
        "track_total_hits": False,
    }
    r = idx.search(req).to_dict()
    exact = idx.search({k: v for k, v in req.items()
                        if k != "track_total_hits"}).to_dict()
    assert [h["id"] for h in r["hits"]] == [h["id"] for h in exact["hits"]][:1]
