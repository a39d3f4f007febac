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
from typing import Dict, List, Optional

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


# ---------------------------------------------------------------------------
# Full TieredMergePolicy planner (index/scorch/mergeplan/merge_plan.go,
# Lucene-inspired): logarithmic tier budget (CalcBudget,
# merge_plan.go:396-428), roster scan with balance/size scoring
# (ScoreSegments, merge_plan.go:446-478), loop-while-over-budget
# (plan, merge_plan.go:229-393).  Sizes here are posting counts (our
# segments carry no vectors and no per-segment delete attribution, so
# live == full and the reclaim-deletes term is neutral).
# ---------------------------------------------------------------------------

from dataclasses import field as _dc_field


@dataclass
class MergePlanOptions:
    max_segments_per_tier: int = 10
    max_segment_size: int = 5_000_000
    tier_growth: float = 10.0
    segments_per_merge_task: int = 10
    floor_segment_size: int = 2_000

    def raise_to_floor(self, s: int) -> int:
        return s if s > self.floor_segment_size else self.floor_segment_size


DEFAULT_MERGE_PLAN_OPTIONS = MergePlanOptions()


def calc_budget(total_size: int, first_tier_size: int,
                o: MergePlanOptions) -> int:
    """Segments needed to cover total_size climbing a logarithmic tier
    staircase (CalcBudget, merge_plan.go:396-428)."""
    import math

    tier_size = max(first_tier_size, 1)
    max_per_tier = max(o.max_segments_per_tier, 1)
    growth = max(o.tier_growth, 1.0)
    budget = 0
    while total_size > 0:
        in_tier = total_size / tier_size
        if in_tier < max_per_tier:
            budget += int(math.ceil(in_tier))
            break
        budget += max_per_tier
        total_size -= max_per_tier * tier_size
        tier_size = int(tier_size * growth)
    return budget


def score_segments(sizes: List[int], o: MergePlanOptions) -> float:
    """Lower is better (ScoreSegments, merge_plan.go:446-478); the
    reclaim-deletes factor is 1 here (live == full)."""
    tot_after = sum(sizes)
    tot_floored = sum(o.raise_to_floor(s) for s in sizes)
    if tot_after <= 0 or tot_floored <= 0:
        return 0.0
    balance = o.raise_to_floor(sizes[0]) / tot_floored
    return balance * (tot_after ** 0.05)


def plan_tiered(
    segments: List[SegmentEntry],
    o: MergePlanOptions = DEFAULT_MERGE_PLAN_OPTIONS,
) -> List[MergeTask]:
    """One TieredMergePolicy planning pass per shard; segments not in
    any task stay unmerged (plan, merge_plan.go:229-393)."""
    by_shard: Dict[int, List[SegmentEntry]] = {}
    for s in segments:
        by_shard.setdefault(s.shard, []).append(s)

    tasks: List[MergeTask] = []
    for shard, segs in sorted(by_shard.items()):
        if len(segs) <= 1:
            continue
        size = {id(s): max(int(s.posting_count), 0) for s in segs}
        ordered = sorted(segs, key=lambda s: -size[id(s)])
        eligibles = [s for s in ordered if size[id(s)] < o.max_segment_size / 2]
        if not eligibles:
            continue
        min_live = min(size[id(s)] for s in ordered)
        budget = calc_budget(
            sum(size[id(s)] for s in eligibles),
            o.raise_to_floor(min_live),
            o,
        )
        n_tasks = 0
        while eligibles and (len(eligibles) + n_tasks) > budget:
            best: Optional[tuple] = None  # (score, roster)
            for start in range(len(eligibles)):
                roster, roster_size = [], 0
                for s in eligibles[start:]:
                    if len(roster) >= o.segments_per_merge_task:
                        break
                    if roster_size + size[id(s)] >= o.max_segment_size:
                        continue
                    roster.append(s)
                    roster_size += size[id(s)]
                if roster:
                    sc = score_segments([size[id(s)] for s in roster], o)
                    if best is None or sc < best[0]:
                        best = (sc, roster)
            if best is None:
                break
            roster = best[1]
            if len(roster) > 1:
                tasks.append(
                    MergeTask(
                        shard=shard,
                        inputs=sorted(roster, key=lambda s: s.min_docnum),
                        out_tier=max(g.tier for g in roster) + 1,
                    )
                )
                n_tasks += 1
            ids = {id(s) for s in roster}
            eligibles = [s for s in eligibles if id(s) not in ids]
    return tasks
