"""Merge planner cases (F6 spirit of the reference's
mergeplan/merge_plan_test.go scenarios) + manifest epoch/rollback."""

from bleve_ray.index.manifest import (
    Manifest,
    SegmentEntry,
    commit,
    load,
    rollback,
    rollback_points,
)
from bleve_ray.index.mergeplan import plan_merges


def seg(i, shard=0, tier=0, postings=1000):
    return SegmentEntry(
        seg_id=f"s{i}",
        path=f"segments/s{i}.parquet",
        shard=shard,
        min_docnum=i * 1000,
        max_docnum=i * 1000 + 999,
        term_count=10,
        posting_count=postings,
        size_bytes=1,
        tier=tier,
    )


def test_no_merge_needed():
    assert plan_merges([seg(0)]) == []
    assert plan_merges([seg(0), seg(1, shard=1)]) == []


def test_fan_in_10():
    segs = [seg(i) for i in range(25)]
    tasks = plan_merges(segs, fan_in=10)
    sizes = sorted(len(t.inputs) for t in tasks)
    assert sizes == [5, 10, 10]
    # inputs ordered by min_docnum so postings concat in docnum order
    for t in tasks:
        mins = [s.min_docnum for s in t.inputs]
        assert mins == sorted(mins)


def test_merge_until_one():
    segs = [seg(i) for i in range(100)]
    rounds = 0
    while True:
        tasks = plan_merges(segs, fan_in=10)
        if not tasks:
            break
        rounds += 1
        merged_ids = {s.seg_id for t in tasks for s in t.inputs}
        nxt = [s for s in segs if s.seg_id not in merged_ids]
        for j, t in enumerate(tasks):
            nxt.append(seg(1000 + rounds * 100 + j, tier=t.out_tier))
        # keep docnum order deterministic for the synthetic entries
        segs = nxt
    assert rounds == 2  # 100 -> 10 -> 1 (builder.go doMerge semantics)
    assert len(segs) == 1


def test_max_postings_cap():
    segs = [seg(i, postings=30_000_000) for i in range(4)]
    tasks = plan_merges(segs, fan_in=10, max_postings=50_000_000)
    # no group may exceed the cap (unless single segment)
    for t in tasks:
        assert sum(s.posting_count for s in t.inputs) <= 50_000_000


def test_shards_merge_independently():
    segs = [seg(i, shard=i % 3) for i in range(9)]
    tasks = plan_merges(segs, fan_in=10)
    assert len(tasks) == 3
    for t in tasks:
        assert len({s.shard for s in t.inputs}) == 1


def test_manifest_epochs_and_rollback(tmp_path):
    d = str(tmp_path)
    man = Manifest(options={"x": 1})
    man.segments = [seg(0)]
    commit(d, man)
    man.segments.append(seg(1))
    commit(d, man)
    assert load(d).epoch == 2
    assert rollback_points(d) == [1, 2]
    rolled = rollback(d, 1)
    assert rolled.epoch == 1
    assert len(rolled.segments) == 1
    assert load(d).epoch == 1


def test_calc_budget_reference_vectors():
    """CalcBudget (merge_plan.go:396-428): all 12 reference vectors."""
    from bleve_ray.index.mergeplan import (
        DEFAULT_MERGE_PLAN_OPTIONS,
        MergePlanOptions,
        calc_budget,
    )

    D = DEFAULT_MERGE_PLAN_OPTIONS
    cases = [
        (0, 0, MergePlanOptions(), 0),
        (1, 0, MergePlanOptions(), 1),
        (9, 0, MergePlanOptions(), 9),
        (1, 1, MergePlanOptions(1, 1000, 2.0, 2, 1), 1),
        (21, 1, MergePlanOptions(1, 1000, 2.0, 2, 1), 5),
        (21, 1, MergePlanOptions(2, 1000, 2.0, 2, 1), 7),
        (1000, 2000, D, 1),
        (5000, 2000, D, 3),
        (10000, 2000, D, 5),
        (30000, 2000, D, 11),
        (1000000, 2000, D, 24),
        (1000000000, 2000, D, 54),
    ]
    for total, first, o, want in cases:
        assert calc_budget(total, first, o) == want, (total, first, want)


def test_plan_tiered_rosters():
    """TieredMergePolicy plan loop: over-budget shards produce
    score-selected rosters capped at segments_per_merge_task; inputs
    come out min_docnum-ordered (concat-safe); big segments (>= max/2)
    are never merged."""
    from bleve_ray.index.manifest import SegmentEntry
    from bleve_ray.index.mergeplan import MergePlanOptions, plan_tiered

    def seg(i, postings, shard=0):
        return SegmentEntry(
            seg_id=f"s{i}", path=f"p{i}", shard=shard,
            min_docnum=i * 100, max_docnum=i * 100 + 99,
            term_count=10, posting_count=postings, size_bytes=postings,
        )

    # 20 equal floor-size segments: budget=2 tiers -> merges of 10
    segs = [seg(i, 100) for i in range(20)]
    tasks = plan_tiered(segs)
    assert tasks and all(len(t.inputs) <= 10 for t in tasks)
    for t in tasks:
        mins = [s.min_docnum for s in t.inputs]
        assert mins == sorted(mins)

    # an over-half-max segment is ineligible
    o = MergePlanOptions(max_segment_size=1000)
    segs2 = [seg(0, 600)] + [seg(i, 10) for i in range(1, 12)]
    tasks2 = plan_tiered(segs2, o)
    for t in tasks2:
        assert all(s.posting_count < 500 for s in t.inputs)

    # under-budget shard: no merging
    assert plan_tiered([seg(0, 100), seg(1, 100_000)]) == []


def test_tiered_policy_end_to_end(ray_session, tmp_path):
    """merge_policy='tiered' drives run_merge_phase with the
    TieredMergePolicy planner and converges to a within-budget segment
    count; all docs stay searchable."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from bleve_ray.index import FieldConfig, IndexOptions, build_index
    from bleve_ray.search import Index

    files = []
    for part in range(8):
        tbl = pa.table(
            {
                "doc_id": pa.array(
                    [part * 100 + i for i in range(40)], type=pa.int64()
                ),
                "text": pa.array(
                    [f"common word{part * 100 + i}" for i in range(40)]
                ),
            }
        )
        p = str(tmp_path / f"in{part}.parquet")
        pq.write_table(tbl, p)
        files.append(p)
    d = str(tmp_path / "idx")
    build_index(
        files,
        d,
        IndexOptions(
            fields={"text": FieldConfig(analyzer="ascii_alnum_lower",
                                        positions=False)},
            doc_id_fields=["doc_id"],
            num_shards=2,
            bucket_bits=33,  # 2 files per bucket -> several segments/shard
            merge_policy="tiered",
        ),
    )
    idx = Index.open(d)
    assert idx.doc_count() == 320
    r = idx.search({"query": {"term": "common", "field": "text"}, "size": 0})
    assert r.total_hits == 320
    # tiered policy merged the floor-size segments per shard
    per_shard = {}
    for s in idx.reader.manifest.segments:
        per_shard[s.shard] = per_shard.get(s.shard, 0) + 1
    assert max(per_shard.values()) <= 10


def test_event_callbacks_fire(ray_session, tmp_path):
    """RegisterEventCallback surface (event.go role): activated
    observers see index/segments/merge/batch events; errors in an
    observer never break the build."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bleve_ray.index import FieldConfig, IndexOptions, build_index
    from bleve_ray.index import events

    seen = []
    events.register_event_callback("t", lambda ev: seen.append(ev.kind))
    events.register_event_callback(
        "boom", lambda ev: (_ for _ in ()).throw(RuntimeError("x"))
    )
    events.activate_event_callback("t")
    events.activate_event_callback("boom")
    try:
        tbl = pa.table(
            {
                "doc_id": pa.array(["a", "b"]),
                "text": pa.array(["one two", "three four"]),
            }
        )
        p = str(tmp_path / "in.parquet")
        pq.write_table(tbl, p)
        d = str(tmp_path / "idx")
        build_index(
            [p], d,
            IndexOptions(
                fields={"text": FieldConfig(analyzer="ascii_alnum_lower")},
                doc_id_fields=["doc_id"], num_shards=2, bucket_bits=6,
            ),
        )
        assert events.EVENT_INDEX_START in seen
        assert events.EVENT_SEGMENTS_BUILT in seen

        from bleve_ray.index.mutate import apply_batch

        apply_batch(d, deletes=["a"])
        assert events.EVENT_BATCH_INTRODUCTION_START in seen
        assert events.EVENT_BATCH_INTRODUCTION in seen
    finally:
        events.deactivate_event_callback("t")
        events.deactivate_event_callback("boom")
