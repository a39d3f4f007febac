"""Web analyzer, index CopyTo, search_before."""

import os

import pytest

from bleve_ray.analysis import analyzer_named
from bleve_ray.index import IndexOptions, build_index
from bleve_ray.index.manifest import copy_to
from bleve_ray.search import Index


def test_web_analyzer():
    a = analyzer_named("web")
    assert a.terms("mail Bob.S+x@ex.COM see https://A.dev/z #Tag @User now") == [
        "mail",
        "bob.s+x@ex.com",
        "see",
        "https://a.dev/z",
        "#tag",
        "@user",
        "now",
    ]


@pytest.fixture(scope="module")
def built(ray_session, tiny_corpus_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("cp_idx"))
    files = sorted(
        os.path.join(tiny_corpus_dir, f) for f in os.listdir(tiny_corpus_dir)
    )
    build_index(files, d, IndexOptions(num_shards=2, bucket_bits=6))
    return d


def test_copy_to(built, tmp_path):
    dest = str(tmp_path / "copy")
    man = copy_to(built, dest)
    assert man.stats["doc_count"] == 64
    a = Index.open(built)
    b = Index.open(dest)
    req = {"query": {"term": "func", "field": "content"}, "size": 5}
    ra, rb = a.search(req).to_dict(), b.search(req).to_dict()
    ra.pop("took_ms"), rb.pop("took_ms")
    assert ra == rb


def test_search_before(built):
    idx = Index.open(built)
    req = {"query": {"term": "lambda", "field": "content"}, "size": 100}
    full = idx.search(req).hits
    assert len(full) >= 3
    pivot = full[2]
    r = idx.search(
        {
            "query": {"term": "lambda", "field": "content"},
            "size": 100,
            "search_before": [pivot.score, pivot.id],
        }
    )
    assert [(h.id, h.score) for h in r.hits] == [
        (h.id, h.score) for h in full[:2]
    ]


def test_search_before_small_page(built):
    """Page immediately PRECEDING the cursor (index_impl.go:776-782): with
    size < docs-before-pivot, return the LAST `size` before it, not the
    first; total_hits is cursor-independent."""
    idx = Index.open(built)
    req = {"query": {"match_all": {}}, "size": 1000}
    full = idx.search(req).hits
    assert len(full) >= 10
    pivot = full[7]
    r = idx.search(
        {
            "query": {"match_all": {}},
            "size": 3,
            "search_before": [pivot.score, pivot.id],
        }
    )
    assert [(h.id, h.score) for h in r.hits] == [
        (h.id, h.score) for h in full[4:7]
    ]
    assert r.total_hits == len(full)


def test_search_after_total_hits_cursor_independent(built):
    idx = Index.open(built)
    full = idx.search({"query": {"match_all": {}}, "size": 1000})
    pivot = full.hits[5]
    r = idx.search(
        {
            "query": {"match_all": {}},
            "size": 3,
            "search_after": [pivot.score, pivot.id],
        }
    )
    assert r.total_hits == full.total_hits
    assert [(h.id, h.score) for h in r.hits] == [
        (h.id, h.score) for h in full.hits[6:9]
    ]
