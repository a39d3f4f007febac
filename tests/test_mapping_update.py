"""Live mapping-update validation (index_update.go semantics): legal
drops narrow the served mapping in a new manifest epoch; everything else
is rejected."""

import copy

import pytest

from bleve_ray.index import (
    FieldConfig,
    IndexOptions,
    MappingUpdateError,
    apply_mapping_update,
    build_index,
    deleted_fields,
)
from bleve_ray.index import manifest as manifest_mod
from bleve_ray.search import Index

SF = "/root/testdata/sf0.001"


def _opts(**kw):
    base = dict(
        fields={
            "text": FieldConfig(analyzer="ascii_alnum_lower", positions=True),
            "source": FieldConfig(analyzer="keyword"),
        },
        doc_id_fields=["doc_id"],
        num_shards=2,
        bucket_bits=16,
        docvalue_fields=["lang", "n_chars"],
        store_fields=["text"],
    )
    base.update(kw)
    return IndexOptions(**base)


@pytest.fixture(scope="module")
def upd_index(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("updidx"))
    build_index([f"{SF}/documents.parquet"], d, _opts())
    return d


def test_illegal_updates_rejected(upd_index):
    ori = _opts()
    # new field
    upd = _opts()
    upd.fields["extra"] = FieldConfig()
    with pytest.raises(MappingUpdateError, match="matching field not found"):
        deleted_fields(ori, upd)
    # analyzer change
    upd = _opts()
    upd.fields["text"] = FieldConfig(analyzer="en", positions=True)
    with pytest.raises(MappingUpdateError, match="analyzer cannot be updated"):
        deleted_fields(ori, upd)
    # positions toggle (term-vectors role)
    upd = _opts()
    upd.fields["text"] = FieldConfig(
        analyzer="ascii_alnum_lower", positions=False
    )
    with pytest.raises(
        MappingUpdateError, match="includeTermVectors cannot be changed"
    ):
        deleted_fields(ori, upd)
    # type change
    upd = _opts()
    upd.fields["source"] = FieldConfig(field_type="numeric")
    with pytest.raises(MappingUpdateError, match="field type cannot"):
        deleted_fields(ori, upd)
    # widening store
    upd = _opts(store_fields=["text", "lang"])
    with pytest.raises(
        MappingUpdateError, match="store cannot be changed from false to true"
    ):
        deleted_fields(ori, upd)
    # widening docvalues
    upd = _opts(docvalue_fields=["lang", "n_chars", "source"])
    with pytest.raises(
        MappingUpdateError,
        match="docvalues cannot be changed from false to true",
    ):
        deleted_fields(ori, upd)
    # shard topology
    upd = _opts(num_shards=4)
    with pytest.raises(MappingUpdateError, match="num_shards"):
        deleted_fields(ori, upd)
    # deleting a field that feeds _all
    ori_all = _opts(enable_all_field=True)
    upd = _opts(enable_all_field=True)
    del upd.fields["source"]
    with pytest.raises(MappingUpdateError, match="_all"):
        deleted_fields(ori_all, upd)


def test_legal_drop_narrows_serving_and_rolls_back(upd_index):
    ix = Index.open(upd_index)
    before = ix.search(
        {"query": {"term": "en", "field": "source"}, "size": 1}
    )
    # source:keyword indexes whole source strings; find one real term
    dict_before = ix.reader.dictionary("source")
    assert dict_before
    term = dict_before[0][0]
    hits_before = ix.search(
        {"query": {"term": term, "field": "source"}, "size": 5}
    )
    assert hits_before.total_hits > 0
    epoch_before = manifest_mod.load(upd_index).epoch

    upd = _opts()
    del upd.fields["source"]
    info = apply_mapping_update(upd_index, upd)
    assert info["source"].deleted

    ix2 = Index.open(upd_index)
    assert manifest_mod.load(upd_index).epoch == epoch_before + 1
    # dropped field serves nothing, in any query kind
    assert (
        ix2.search(
            {"query": {"term": term, "field": "source"}, "size": 5}
        ).total_hits
        == 0
    )
    assert ix2.reader.dictionary("source") == []
    assert ix2.reader.terms_with_prefix("source", term[:1]) == []
    # other fields unaffected
    assert (
        ix2.search(
            {"query": {"match": "the data", "field": "text"}, "size": 1}
        ).total_hits
        > 0
    )
    # rollback restores the field
    manifest_mod.rollback(upd_index, epoch_before)
    ix3 = Index.open(upd_index)
    assert (
        ix3.search(
            {"query": {"term": term, "field": "source"}, "size": 5}
        ).total_hits
        == hits_before.total_hits
    )


def test_docvalue_store_narrowing_reported():
    ori = _opts()
    upd = _opts(docvalue_fields=["lang"])  # drop n_chars docvalues
    info = deleted_fields(ori, upd)
    assert info == {"n_chars": __import__(
        "bleve_ray.index.update", fromlist=["UpdateFieldInfo"]
    ).UpdateFieldInfo(docvalues=True)}
    upd2 = _opts(store_fields=[])  # stop storing text
    info2 = deleted_fields(ori, upd2)
    assert info2["text"].store and not info2["text"].deleted


def test_reader_snapshot_isolation(ray_session, tmp_path):
    """An open reader is an epoch snapshot (scorch snapshot semantics):
    mutations commit new epochs, but a handle opened earlier keeps
    serving its epoch until reopen."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bleve_ray.index import FieldConfig, IndexOptions, build_index
    from bleve_ray.search import Index

    tbl = pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in range(10)]),
            "text": pa.array([f"snapshot doc {i}" for i in range(10)]),
        }
    )
    src = str(tmp_path / "in.parquet")
    pq.write_table(tbl, src)
    d = str(tmp_path / "idx")
    build_index(
        [src], d,
        IndexOptions(
            fields={"text": FieldConfig(analyzer="ascii_alnum_lower")},
            doc_id_fields=["doc_id"], num_shards=2, bucket_bits=6,
        ),
    )
    old = Index.open(d)
    assert old.doc_count() == 10

    # a second handle mutates (delete 3 docs)
    writer = Index.open(d)
    writer.batch(deletes=["d0", "d1", "d2"])
    assert writer.doc_count() == 7

    # the earlier snapshot still serves its epoch
    assert old.doc_count() == 10
    assert (
        old.search({"query": {"term": "snapshot", "field": "text"},
                    "size": 0}).total_hits == 10
    )
    # reopen advances to the new epoch
    old.reopen()
    assert old.doc_count() == 7


def test_successive_updates_accumulate_drops(ray_session, tmp_path):
    """A second mapping update must not resurrect fields dropped by the
    first (dropped_fields accumulates across epochs)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "doc_id": pa.array(["x1", "x2"]),
            "a": pa.array(["alpha one", "alpha two"]),
            "b": pa.array(["beta one", "beta two"]),
            "c": pa.array(["gamma one", "gamma two"]),
        }
    )
    src = str(tmp_path / "in.parquet")
    pq.write_table(tbl, src)
    d = str(tmp_path / "idx")
    opts = IndexOptions(
        fields={
            "a": FieldConfig(analyzer="ascii_alnum_lower"),
            "b": FieldConfig(analyzer="ascii_alnum_lower"),
            "c": FieldConfig(analyzer="ascii_alnum_lower"),
        },
        doc_id_fields=["doc_id"], num_shards=2, bucket_bits=6,
    )
    build_index([src], d, opts)

    upd1 = IndexOptions(
        fields={k: v for k, v in opts.fields.items() if k != "a"},
        doc_id_fields=["doc_id"], num_shards=2, bucket_bits=6,
    )
    apply_mapping_update(d, upd1)
    upd2 = IndexOptions(
        fields={"c": opts.fields["c"]},
        doc_id_fields=["doc_id"], num_shards=2, bucket_bits=6,
    )
    apply_mapping_update(d, upd2)

    ix = Index.open(d)
    assert set(ix.reader.options["dropped_fields"]) == {"a", "b"}
    for f in ("a", "b"):
        assert ix.search(
            {"query": {"term": "one", "field": f}, "size": 0}
        ).total_hits == 0
    assert ix.search(
        {"query": {"term": "gamma", "field": "c"}, "size": 0}
    ).total_hits == 2


def test_update_then_force_merge(ray_session, tmp_path):
    """TestIndexUpdateMerge (index_update_test.go:2738-3121): after a
    mapping update drops fields, a forced merge must keep the index
    consistent -- dropped fields still serve nothing, every retained
    field still serves hits, and stored/docvalue access works."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bleve_ray.index.build import run_merge_phase

    tbl = pa.table(
        {
            "doc_id": pa.array([f"m{i}" for i in range(8)]),
            "a": pa.array([f"alpha common{i % 2}" for i in range(8)]),
            "b": pa.array([f"beta common{i % 2}" for i in range(8)]),
            "c": pa.array([f"gamma common{i % 2}" for i in range(8)]),
        }
    )
    srcs = []
    # several input files => several segments to actually merge
    for part in range(4):
        src = str(tmp_path / f"in{part}.parquet")
        pq.write_table(tbl.slice(part * 2, 2), src)
        srcs.append(src)
    d = str(tmp_path / "idx")
    opts = IndexOptions(
        fields={
            "a": FieldConfig(analyzer="ascii_alnum_lower"),
            "b": FieldConfig(analyzer="ascii_alnum_lower"),
            "c": FieldConfig(analyzer="ascii_alnum_lower"),
        },
        doc_id_fields=["doc_id"], num_shards=2, bucket_bits=6,
        target_segments_per_shard=4,
    )
    build_index(srcs, d, opts)

    upd = IndexOptions(
        fields={k: v for k, v in opts.fields.items() if k != "b"},
        doc_id_fields=["doc_id"], num_shards=2, bucket_bits=6,
        target_segments_per_shard=4,
    )
    info = apply_mapping_update(d, upd)
    assert info["b"].deleted

    man = manifest_mod.load(d)
    segs_before = len(man.segments)
    man.merge_done = False
    merge_opts = copy.deepcopy(opts)
    merge_opts.target_segments_per_shard = 1
    man2 = run_merge_phase(d, man, merge_opts)
    assert len(man2.segments) < segs_before

    ix = Index.open(d)
    assert ix.doc_count() == 8
    # dropped field serves nothing after the merge
    assert ix.search(
        {"query": {"term": "beta", "field": "b"}, "size": 0}
    ).total_hits == 0
    # retained fields still serve every doc
    for f, term in (("a", "alpha"), ("c", "gamma")):
        assert ix.search(
            {"query": {"term": term, "field": f}, "size": 0}
        ).total_hits == 8
    # and term-level queries still rank
    r = ix.search({"query": {"term": "common0", "field": "a"}, "size": 8})
    assert r.total_hits == 4


def test_synonym_search_after_mapping_update(ray_session, tmp_path):
    """TestIndexUpdateSynonym (index_update_test.go:2576-2737): after an
    update drops fields, synonym expansion keeps working on retained
    fields while dropped fields serve nothing -- even via synonyms."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    text1 = (
        "The hardworking employee consistently strives to exceed "
        "expectations. His industrious nature makes him a valuable asset "
        "to any team."
    )
    text2 = (
        "The tranquil surroundings of the retreat provide a perfect "
        "escape. Guests enjoy the peaceful atmosphere and the calm "
        "environment."
    )
    tbl = pa.table(
        {
            "doc_id": pa.array(["003", "004"]),
            "a": pa.array([text1, text2]),
            "b": pa.array([text1, text2]),
            "c": pa.array([text1, text2]),
        }
    )
    src = str(tmp_path / "syn.parquet")
    pq.write_table(tbl, src)
    d = str(tmp_path / "idx")
    opts = IndexOptions(
        fields={
            "a": FieldConfig(analyzer="en"),
            "b": FieldConfig(analyzer="en"),
            "c": FieldConfig(analyzer="en"),
        },
        doc_id_fields=["doc_id"], num_shards=2, bucket_bits=6,
    )
    build_index([src], d, opts)

    collection = "collection1"
    ix = Index.open(d)
    ix.index_synonym(
        "001",
        collection,
        {"synonyms": ["hardworking", "industrious", "conscientious",
                      "persistent", "focused", "devoted"]},
        "en",
    )
    ix.index_synonym(
        "002",
        collection,
        {"synonyms": ["tranquil", "peaceful", "calm", "relaxed",
                      "unruffled"]},
        "en",
    )

    def wire(index):
        for f in ("a", "b", "c"):
            index.mapping.synonym_sources[f] = collection

    wire(ix)
    # sanity before the update: synonyms expand on every field
    assert ix.search(
        {"query": {"match": "devoted", "field": "a"}, "size": 5}
    ).total_hits == 1
    assert ix.search(
        {"query": {"match": "unruffled", "field": "c"}, "size": 5}
    ).total_hits == 1

    upd = IndexOptions(
        fields={"a": opts.fields["a"]},
        doc_id_fields=["doc_id"], num_shards=2, bucket_bits=6,
    )
    info = apply_mapping_update(d, upd)
    assert info["b"].deleted and info["c"].deleted

    ix2 = Index.open(d)
    wire(ix2)
    # a:devoted -> the hardworking doc via synonym expansion
    r1 = ix2.search({"query": {"match": "devoted", "field": "a"}, "size": 5})
    assert r1.total_hits == 1 and r1.hits[0].id == "003"
    # dropped fields serve nothing, synonyms included
    assert ix2.search(
        {"query": {"match": "devoted", "field": "b"}, "size": 5}
    ).total_hits == 0
    assert ix2.search(
        {"query": {"match": "unruffled", "field": "c"}, "size": 5}
    ).total_hits == 0
