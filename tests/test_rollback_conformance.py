"""index/scorch/rollback_test.go TestIndexRollback (33-285) shape over
the manifest-epoch rollback machinery: batch(1,2) -> record point ->
batch(+3,+4,-1) -> docs {2,3,4} -> Rollback(point) -> docs {1,2};
rolling back to an unknown epoch errors; a fresh index exposes no
rollback points."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bleve_ray.index import FieldConfig, IndexOptions, build_index
from bleve_ray.index.manifest import rollback, rollback_points
from bleve_ray.index.mutate import apply_batch
from bleve_ray.search import Index


def _tbl(ids, texts):
    return pa.table({"doc_id": pa.array(ids, type=pa.string()),
                     "name": pa.array(texts)})


def _ids(d):
    idx = Index.open(d)
    r = idx.search({"query": {"match_all": {}}, "size": 10})
    return sorted(h.id for h in r.hits)


def test_index_rollback_shape(ray_session, tmp_path, monkeypatch):
    # the reference test raises NumSnapshotsToKeep to 1000 so its recorded
    # point survives later batches (rollback_test.go:35-36); KEEP_EPOCHS
    # plays that role here
    from bleve_ray.index import manifest as manifest_mod

    monkeypatch.setattr(manifest_mod, "KEEP_EPOCHS", 1000)
    src = str(tmp_path / "b0.parquet")
    pq.write_table(_tbl(["1", "2"], ["test1", "test2"]), src)
    d = str(tmp_path / "idx")
    build_index(
        [src], d,
        IndexOptions(fields={"name": FieldConfig(analyzer="keyword",
                                                 positions=False)},
                     doc_id_fields=["doc_id"], num_shards=1, bucket_bits=6),
    )
    assert _ids(d) == ["1", "2"]

    points = rollback_points(d)
    assert points, "expected rollback points after the first batch"
    point = points[-1]

    # second batch: insert 3 and 4, delete 1
    apply_batch(d, upserts=_tbl(["3", "4"], ["test3", "test4"]),
                deletes=["1"])
    assert _ids(d) == ["2", "3", "4"]

    # the recorded point must still be available after further mutations
    assert point in rollback_points(d)

    # unknown epoch -> error (reference: "target epoch 100 not found")
    with pytest.raises(FileNotFoundError):
        rollback(d, 100000)

    rollback(d, point)
    assert _ids(d) == ["1", "2"]

    # doc 1's content is searchable again post-rollback
    idx = Index.open(d)
    r = idx.search({"query": {"term": "test1", "field": "name"}, "size": 5})
    assert [h.id for h in r.hits] == ["1"]


def test_fresh_index_dir_has_no_rollback_points(tmp_path):
    assert rollback_points(str(tmp_path)) == []
