"""Delete-by-id tombstones (online-mutation slice): every query kind
excludes tombstoned docs; doc_count consistent; rollback restores."""

import os

import numpy as np
import pytest

from bleve_ray.index import IndexOptions, build_index
from bleve_ray.index.manifest import load as load_manifest, rollback
from bleve_ray.index.mutate import delete_ids
from bleve_ray.search import Index


@pytest.fixture()
def built(ray_session, tiny_corpus_dir, tmp_path):
    d = str(tmp_path / "delidx")
    files = sorted(
        os.path.join(tiny_corpus_dir, f) for f in os.listdir(tiny_corpus_dir)
    )
    build_index(files, d, IndexOptions(num_shards=2, bucket_bits=6))
    return d


def test_delete_excludes_from_all_query_kinds(built):
    idx = Index.open(built)
    base = idx.search({"query": {"term": "func", "field": "content"}, "size": 100})
    assert base.total_hits >= 10
    victims = [h.id for h in base.hits[:10]]
    pre_count = idx.reader.doc_count()

    delete_ids(built, victims)
    idx2 = Index.open(built)
    assert idx2.reader.doc_count() == pre_count - 10

    vset = set(victims)
    for req in [
        {"query": {"term": "func", "field": "content"}, "size": 200},
        {"query": {"match": "func return", "field": "content",
                   "operator": "and"}, "size": 200},
        {"query": {"match": "func return", "field": "content"}, "size": 200},
        {"query": {"match_phrase": "return nil", "field": "content"},
         "size": 200},
        {"query": {"match_all": {}}, "size": 200},
        {"query": {"prefix": "fun", "field": "content"}, "size": 200},
        {"query": {"ids": victims}, "size": 200},
        {"query": {"must": [{"term": "func", "field": "content"}],
                   "must_not": [{"term": "zzz", "field": "content"}]},
         "size": 200},
    ]:
        r = idx2.search(req)
        got = {h.id for h in r.hits}
        assert not (got & vset), f"deleted doc leaked for {req}"
    # total_hits drops by the number of deleted matches
    after = idx2.search(
        {"query": {"term": "func", "field": "content"}, "size": 200}
    )
    assert after.total_hits == base.total_hits - 10

    # facets over match_all count only live docs
    r = idx2.search(
        {
            "query": {"match_all": {}},
            "size": 0,
            "facets": {"langs": {"field": "lang", "size": 10}},
        }
    )
    if r.facets and "langs" in r.facets:
        f = r.facets["langs"]
        assert f["total"] + f["missing"] == idx2.reader.doc_count()


def test_delete_unknown_id_noop(built):
    man0 = load_manifest(built)
    man = delete_ids(built, ["no-such-doc-id"])
    assert man.deleted_count == 0
    assert man.epoch == man0.epoch  # nothing committed


def test_delete_rollback(built):
    idx = Index.open(built)
    victims = [h.id for h in idx.search(
        {"query": {"match_all": {}}, "size": 3}
    ).hits]
    pre = load_manifest(built).epoch
    delete_ids(built, victims)
    assert Index.open(built).reader.doc_count() == idx.reader.doc_count() - 3
    rollback(built, pre)
    assert Index.open(built).reader.doc_count() == idx.reader.doc_count()


def test_delete_idempotent_union(built):
    idx = Index.open(built)
    ids = [h.id for h in idx.search(
        {"query": {"match_all": {}}, "size": 5}
    ).hits]
    delete_ids(built, ids[:3])
    delete_ids(built, ids)  # overlapping set
    assert load_manifest(built).deleted_count == 5
