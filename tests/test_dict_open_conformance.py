"""index_test.go behavior ports:
- TestDict: FieldDict / FieldDictRange / FieldDictPrefix enumeration
  order and contents over incrementally indexed docs; Stats non-nil.
- TestIndexOpenNonExisting: opening a missing path errors cleanly.
- TestIndexOpenMetaMissingOrCorrupt: corrupt/missing manifest errors
  cleanly instead of crashing.
- TestClosedIndex: operations on a closed index raise, not segfault."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bleve_ray.index import FieldConfig, IndexOptions, build_index
from bleve_ray.search import Index


@pytest.fixture()
def dict_index(ray_session, tmp_path):
    src = str(tmp_path / "d.parquet")
    pq.write_table(
        pa.table({
            "doc_id": ["a", "y", "x"],
            "name": ["marty", "jasper", "rose"],
            "desc": ["gophercon india", "clojure", "googler"],
        }),
        src,
    )
    d = str(tmp_path / "idx")
    build_index(
        [src], d,
        IndexOptions(
            fields={"name": FieldConfig(analyzer="ascii_alnum_lower",
                                        positions=False),
                    "desc": FieldConfig(analyzer="ascii_alnum_lower",
                                        positions=False)},
            doc_id_fields=["doc_id"], num_shards=1, bucket_bits=6,
        ),
    )
    return Index.open(d)


def test_dict_enumeration(dict_index):
    terms = [t for t, _df in dict_index.field_dict("name")]
    assert terms == ["jasper", "marty", "rose"]


def test_dict_range(dict_index):
    assert dict_index.field_dict_range("name", "marty", "rose") == \
        ["marty", "rose"]


def test_dict_prefix(dict_index):
    # add doc z incrementally, as TestDict does
    dict_index.index("z", {
        "name": "prefix", "desc": "bob cat cats catting dog doggy zoo",
    })
    assert dict_index.field_dict_prefix("desc", "cat") == \
        ["cat", "cats", "catting"]
    assert dict_index.stats_map() is not None


def test_open_non_existing(tmp_path):
    with pytest.raises(Exception):
        Index.open(str(tmp_path / "no-such-index"))


def test_open_corrupt_manifest(ray_session, tmp_path):
    src = str(tmp_path / "d.parquet")
    pq.write_table(pa.table({"doc_id": ["a"], "text": ["hi"]}), src)
    d = str(tmp_path / "idx")
    build_index([src], d, IndexOptions(
        fields={"text": FieldConfig(positions=False)},
        doc_id_fields=["doc_id"], num_shards=1, bucket_bits=6))
    with open(os.path.join(d, "manifest.json"), "w") as f:
        f.write("{not json")
    with pytest.raises((ValueError, json.JSONDecodeError, KeyError)):
        Index.open(d)


def test_closed_index_rejects_operations(ray_session, tmp_path):
    src = str(tmp_path / "d.parquet")
    pq.write_table(pa.table({"doc_id": ["a"], "text": ["hi there"]}), src)
    d = str(tmp_path / "idx")
    build_index([src], d, IndexOptions(
        fields={"text": FieldConfig(positions=False)},
        doc_id_fields=["doc_id"], num_shards=1, bucket_bits=6))
    idx = Index.open(d)
    idx.close()
    with pytest.raises(Exception):
        idx.search({"query": {"term": "hi", "field": "text"}, "size": 5})
