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
