"""Tiered merge planning -- a pure function over manifest segment entries.

Follows the offline Builder's merge loop semantics
(index/scorch/builder.go:169-236: merge up to 10 segments per task, append
the result, repeat until one remains) with the tiered-merge-policy knobs from
index/scorch/mergeplan/merge_plan.go:160-168 (fan-in 10, segments below the
floor size treated equally, max segment size caps a merge).

Segments are merged only within a shard, ordered by min_docnum so posting
lists concatenate in docnum order (docnum ranges of segments are disjoint by
construction -- SURVEY.md §4 'salt hot terms ... concat-safe').
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List

from .manifest import SegmentEntry

MERGE_FAN_IN = 10  # builder.go:29 mergeMax
MAX_SEGMENT_POSTINGS = 50_000_000  # cap like maxSegmentSize (merge_plan.go:162)


@dataclass
class MergeTask:
    shard: int
    inputs: List[SegmentEntry]
    out_tier: int


def plan_merges(
    segments: List[SegmentEntry],
    fan_in: int = MERGE_FAN_IN,
    target_per_shard: int = 1,
    max_postings: int = MAX_SEGMENT_POSTINGS,
) -> List[MergeTask]:
    """One round of merge tasks.  Call repeatedly until it returns []."""
    by_shard: Dict[int, List[SegmentEntry]] = {}
    for s in segments:
        by_shard.setdefault(s.shard, []).append(s)

    tasks: List[MergeTask] = []
    for shard, segs in sorted(by_shard.items()):
        if len(segs) <= target_per_shard:
            continue
        segs = sorted(segs, key=lambda s: s.min_docnum)
        i = 0
        while i < len(segs):
            group = []
            postings = 0
            while (
                i < len(segs)
                and len(group) < fan_in
                and (not group or postings + segs[i].posting_count <= max_postings)
            ):
                postings += segs[i].posting_count
                group.append(segs[i])
                i += 1
            if len(group) > 1:
                tasks.append(
                    MergeTask(
                        shard=shard,
                        inputs=group,
                        out_tier=max(g.tier for g in group) + 1,
                    )
                )
    return tasks
