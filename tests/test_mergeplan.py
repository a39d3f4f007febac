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
