"""score:none unadorned path + search_after pagination."""

import os

import pytest

from bleve_ray.index import IndexOptions, build_index
from bleve_ray.search import Index


@pytest.fixture(scope="module")
def idx(ray_session, tiny_corpus_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("extra_idx"))
    files = sorted(
        os.path.join(tiny_corpus_dir, f) for f in os.listdir(tiny_corpus_dir)
    )
    build_index(files, d, IndexOptions(num_shards=2, bucket_bits=6))
    return Index.open(d)


def test_score_none_counts_match(idx):
    scored = idx.search(
        {"query": {"match": "func return", "field": "content",
                   "operator": "and"}, "size": 5}
    )
    unscored = idx.search(
        {"query": {"match": "func return", "field": "content",
                   "operator": "and"}, "size": 5, "score": "none"}
    )
    assert unscored.total_hits == scored.total_hits
    assert all(h.score == 0.0 for h in unscored.hits)


def test_search_after_walks_full_ranking(idx):
    req = {"query": {"term": "lambda", "field": "content"}, "size": 3}
    full = idx.search({**req, "size": 100}).hits
    walked = []
    after = None
    while True:
        r = dict(req)
        if after:
            r["search_after"] = after
        page = idx.search(r).hits
        if not page:
            break
        walked.extend(page)
        after = [page[-1].score, page[-1].id]
    assert [(h.id, h.score) for h in walked] == [
        (h.id, h.score) for h in full
    ]
