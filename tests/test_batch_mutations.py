"""Incremental adds + batch upserts (Index.Batch semantics,
index.go:46-65; scorch obsolete-old / introduce-new)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bleve_ray.index import FieldConfig, IndexOptions, build_index
from bleve_ray.index.mutate import add_files, apply_batch
from bleve_ray.search import Index


def _mk_table(ids, texts):
    return pa.table(
        {
            "doc_id": pa.array(ids, type=pa.string()),
            "text": pa.array(texts),
        }
    )


@pytest.fixture()
def base_index(ray_session, tmp_path):
    src = str(tmp_path / "base.parquet")
    pq.write_table(
        _mk_table(
            [f"d{i}" for i in range(20)],
            [f"base document number {i} common" for i in range(20)],
        ),
        src,
    )
    d = str(tmp_path / "idx")
    build_index(
        [src],
        d,
        IndexOptions(
            fields={"text": FieldConfig(analyzer="standard", positions=True)},
            doc_id_fields=["doc_id"],
            num_shards=2,
            bucket_bits=6,
        ),
    )
    return d


def test_add_files_appends_partition(base_index, tmp_path):
    add_src = str(tmp_path / "more.parquet")
    pq.write_table(
        _mk_table(["n1", "n2"], ["fresh common text", "fresh again"]), add_src
    )
    man = add_files(base_index, [add_src])
    assert len(man.partitions) == 2
    idx = Index.open(base_index)
    assert idx.reader.doc_count() == 22
    r = idx.search({"query": {"term": "fresh", "field": "text"}, "size": 10})
    assert sorted(h.id for h in r.hits) == ["n1", "n2"]
    # old docs still searchable, stats global
    r = idx.search({"query": {"term": "common", "field": "text"}, "size": 50})
    assert r.total_hits == 21


def test_apply_batch_upsert_replaces(base_index):
    idx = Index.open(base_index)
    before = idx.search(
        {"query": {"term": "common", "field": "text"}, "size": 50}
    ).total_hits
    # upsert d3 with new content, insert d99, delete d5
    apply_batch(
        base_index,
        upserts=_mk_table(["d3", "d99"], ["replacement text", "brand new"]),
        deletes=["d5"],
    )
    idx2 = Index.open(base_index)
    assert idx2.reader.doc_count() == 20  # 20 - deleted d5 - old d3 + 2 new
    # old content of d3 gone
    r = idx2.search({"query": {"term": "common", "field": "text"}, "size": 50})
    ids = {h.id for h in r.hits}
    assert "d3" not in ids and "d5" not in ids
    assert r.total_hits == before - 2
    # new content searchable
    r = idx2.search(
        {"query": {"term": "replacement", "field": "text"}, "size": 10}
    )
    assert [h.id for h in r.hits] == ["d3"]
    r = idx2.search({"query": {"term": "brand", "field": "text"}, "size": 10})
    assert [h.id for h in r.hits] == ["d99"]
    # DocID query resolves to the live version
    r = idx2.search({"query": {"ids": ["d3", "d5"]}, "size": 10})
    assert [h.id for h in r.hits] == ["d3"]


def test_apply_batch_is_repeatable(base_index):
    apply_batch(base_index, upserts=_mk_table(["d1"], ["first rewrite"]))
    apply_batch(base_index, upserts=_mk_table(["d1"], ["second rewrite"]))
    idx = Index.open(base_index)
    assert idx.reader.doc_count() == 20
    r = idx.search({"query": {"term": "second", "field": "text"}, "size": 10})
    assert [h.id for h in r.hits] == ["d1"]
    r = idx.search({"query": {"term": "first", "field": "text"}, "size": 10})
    assert not r.hits


def test_index_id_field_lookup(ray_session, tmp_path):
    """index_id_field=True resolves external ids via '_id' keyword-field
    posting lookups (AddIDField) instead of the driver id map."""
    src = str(tmp_path / "idf.parquet")
    pq.write_table(
        _mk_table([f"x{i}" for i in range(30)],
                  [f"text number {i}" for i in range(30)]),
        src,
    )
    d = str(tmp_path / "idfidx")
    build_index(
        [src],
        d,
        IndexOptions(
            fields={"text": FieldConfig(analyzer="standard", positions=True)},
            doc_id_fields=["doc_id"],
            num_shards=2,
            bucket_bits=6,
            index_id_field=True,
        ),
    )
    idx = Index.open(d)
    assert idx.reader.options["index_id_field"] is True
    r = idx.search({"query": {"ids": ["x3", "x17", "nope"]}, "size": 10})
    assert sorted(h.id for h in r.hits) == ["x17", "x3"]
    # no driver-side id map was built
    assert not hasattr(idx.reader, "_id_map")
    # text search unaffected by the extra field
    r = idx.search({"query": {"term": "17", "field": "text"}, "size": 5})
    assert [h.id for h in r.hits] == ["x17"]
    # upsert keeps working: DocID resolves to live version after tombstone
    apply_batch(d, upserts=_mk_table(["x3"], ["rewritten body"]))
    idx2 = Index.open(d)
    r = idx2.search({"query": {"ids": ["x3"]}, "size": 10})
    assert [h.id for h in r.hits] == ["x3"]
    r = idx2.search({"query": {"term": "rewritten", "field": "text"},
                     "size": 5})
    assert [h.id for h in r.hits] == ["x3"]
