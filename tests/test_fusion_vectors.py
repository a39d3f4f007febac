"""Reference fusion golden vectors (fusion/rrf_test.go, fusion/rsf_test.go).

Each reference case supplies hits as (fts_score, {knn_query_idx: score})
with HitNumber = input position; the adapter below maps them onto the
repo's per-source fusion primitives and reassembles the FusionResult the
way rrf.go:100-122 / rsf.go does: fused scores for every input hit
(0.0 when nothing contributed), MaxScore over ALL hits before the window
trim, final order (-score, hit_number), trimmed to window_size.
"""

import math

import numpy as np
import pytest

from bleve_ray.search.fusion import (
    reciprocal_rank_fusion,
    relative_score_fusion,
)


def _sources(hits, num_knn):
    """hits: list of (id, fts_score, breakdown dict).  Sources use the
    input position as the doc key so ties break by HitNumber like
    util.go's sorts."""
    fts = (list(range(len(hits))), np.array([h[1] for h in hits]))
    out = [fts]
    for qi in range(num_knn):
        ids = [i for i, h in enumerate(hits) if qi in h[2]]
        out.append((ids, np.array([hits[i][2][qi] for i in ids])))
    return out


def _assemble(hits, fused, window):
    full = {i: fused.get(i, 0.0) for i in range(len(hits))}
    max_score = max(full.values(), default=0.0)
    order = sorted(full, key=lambda i: (-full[i], i))[:window]
    return [(hits[i][0], full[i]) for i in order], max_score


def _rrf(hits, weights, rank_constant, window, num_knn):
    if not hits or window == 0:
        return [], 0.0
    fused = reciprocal_rank_fusion(
        _sources(hits, num_knn), weights, rank_constant, window
    )
    return _assemble(hits, fused, window)


def _rsf(hits, weights, window, num_knn):
    if not hits or window == 0:
        return [], 0.0
    fused = relative_score_fusion(_sources(hits, num_knn), weights, window)
    return _assemble(hits, fused, window)


def _check(got, want):
    got_hits, got_max = got
    want_hits, want_max = want
    assert [h[0] for h in got_hits] == [h[0] for h in want_hits]
    for (gid, gs), (_, ws) in zip(got_hits, want_hits):
        assert math.isclose(gs, ws, abs_tol=1e-3), (gid, gs, ws)
    assert math.isclose(got_max, want_max, abs_tol=1e-3)


RRF_CASES = [
    # (name, hits, weights, rank_constant, window, num_knn, want_hits, want_max)
    ("empty hits", [], [0.5, 0.5], 60, 10, 1, [], 0.0),
    (
        "single knn query",
        [("a", 0.9, {0: 0.8}), ("b", 0.8, {0: 0.9}), ("c", 0.7, {0: 0.7})],
        [0.4, 0.6], 1, 3, 1,
        [("b", 0.433), ("a", 0.4), ("c", 0.25)], 0.433,
    ),
    (
        "multiple knn queries",
        [
            ("a", 0.9, {0: 0.8, 1: 0.6}),
            ("b", 0.8, {0: 0.9, 1: 0.5}),
            ("c", 0.7, {0: 0.7, 1: 0.7}),
        ],
        [0.3, 0.4, 0.3], 1, 3, 2,
        [("a", 0.383), ("b", 0.375), ("c", 0.325)], 0.383,
    ),
    (
        "window size smaller than hits",
        [("a", 0.9, {0: 0.7}), ("b", 0.8, {0: 0.9}), ("c", 0.7, {0: 0.8})],
        [0.4, 0.6], 1, 2, 1,
        [("b", 0.433), ("a", 0.2)], 0.433,
    ),
    (
        "documents with partial scores missing KNN scores",
        [
            ("a", 0.9, {0: 0.8}),
            ("b", 0.8, {1: 0.7}),
            ("c", 0.7, {0: 0.6, 1: 0.9}),
            ("d", 0.6, {}),
        ],
        [0.3, 0.4, 0.3], 1, 4, 2,
        [("c", 0.358), ("a", 0.35), ("b", 0.2), ("d", 0.06)], 0.358,
    ),
    (
        "documents with only KNN scores",
        [
            ("a", 0.0, {0: 0.9}),
            ("b", 0.0, {1: 0.8}),
            ("c", 0.0, {0: 0.7, 1: 0.6}),
        ],
        [0.5, 0.3, 0.2], 1, 3, 2,
        [("c", 0.167), ("a", 0.15), ("b", 0.1)], 0.167,
    ),
    (
        "mixed scenario with gaps in KNN queries",
        [
            ("a", 0.8, {1: 0.9}),
            ("b", 0.6, {0: 0.8}),
            ("c", 0.0, {0: 0.7}),
            ("d", 0.4, {}),
        ],
        [0.4, 0.3, 0.3], 1, 4, 2,
        # d's 0.4/4 is float-greater than c's 0.3/3 (rrf_test.go ordering)
        [("a", 0.35), ("b", 0.283), ("d", 0.1), ("c", 0.1)], 0.35,
    ),
]


@pytest.mark.parametrize(
    "hits,weights,rc,window,nk,want_hits,want_max",
    [c[1:] for c in RRF_CASES],
    ids=[c[0] for c in RRF_CASES],
)
def test_rrf_reference_vectors(hits, weights, rc, window, nk, want_hits, want_max):
    _check(_rrf(hits, weights, rc, window, nk), (want_hits, want_max))


RSF_CASES = [
    ("empty hits", [], [0.5, 0.5], 10, 1, [], 0.0),
    (
        "single knn query",
        [("a", 0.9, {0: 0.8}), ("b", 0.8, {0: 0.9}), ("c", 0.7, {0: 0.7})],
        [0.4, 0.6], 3, 1,
        [("b", 0.8), ("a", 0.7), ("c", 0.0)], 0.8,
    ),
    (
        "multiple knn queries",
        [
            ("a", 0.9, {0: 0.8, 1: 0.6}),
            ("b", 0.8, {0: 0.9, 1: 0.5}),
            ("c", 0.7, {0: 0.7, 1: 0.7}),
        ],
        [0.3, 0.4, 0.3], 3, 2,
        [("a", 0.65), ("b", 0.55), ("c", 0.3)], 0.65,
    ),
    (
        "all scores identical should normalize to 1.0",
        [("a", 0.8, {0: 0.9}), ("b", 0.8, {0: 0.9}), ("c", 0.8, {0: 0.9})],
        [0.4, 0.6], 3, 1,
        [("a", 1.0), ("b", 1.0), ("c", 1.0)], 1.0,
    ),
    (
        "window size smaller than hits",
        [("a", 0.9, {0: 0.7}), ("b", 0.8, {0: 0.9}), ("c", 0.7, {0: 0.8})],
        [0.4, 0.6], 2, 1,
        [("b", 0.6), ("a", 0.4)], 0.6,
    ),
    (
        "documents with partial scores missing KNN scores",
        [
            ("a", 0.9, {0: 0.8}),
            ("b", 0.8, {1: 0.7}),
            ("c", 0.7, {0: 0.6, 1: 0.9}),
            ("d", 0.6, {}),
        ],
        [0.3, 0.4, 0.3], 4, 2,
        [("a", 0.7), ("c", 0.4), ("b", 0.2), ("d", 0.0)], 0.7,
    ),
    (
        "documents with only KNN scores",
        [
            ("a", 0.0, {0: 0.9}),
            ("b", 0.0, {1: 0.8}),
            ("c", 0.0, {0: 0.7, 1: 0.6}),
        ],
        [0.5, 0.3, 0.2], 3, 2,
        [("a", 0.3), ("b", 0.2), ("c", 0.0)], 0.3,
    ),
    (
        "mixed scenario with different score ranges",
        [("a", 1.0, {0: 0.1}), ("b", 0.1, {0: 1.0}), ("c", 0.5, {0: 0.5})],
        [0.5, 0.5], 3, 1,
        [("a", 0.5), ("b", 0.5), ("c", 0.444)], 0.5,
    ),
]


@pytest.mark.parametrize(
    "hits,weights,window,nk,want_hits,want_max",
    [c[1:] for c in RSF_CASES],
    ids=[c[0] for c in RSF_CASES],
)
def test_rsf_reference_vectors(hits, weights, window, nk, want_hits, want_max):
    _check(_rsf(hits, weights, window, nk), (want_hits, want_max))


def test_file_topk_mixed_flat_and_multivector_column():
    """Layout is decided per value: a column mixing flat vectors and
    multi-vector lists (or whose first doc differs in shape from later
    docs) must score every doc — flat docs as themselves, multi-vector
    docs as their best sub-vector."""
    import numpy as np

    from bleve_ray.search.fusion import _file_topk

    q = np.array([1.0, 0.0])
    nums = np.arange(4, dtype=np.int64)
    col = [
        [1.0, 0.0],                      # flat, sim 1.0
        [[0.0, 1.0], [0.6, 0.8]],        # multi: best sub-vector sim 0.6
        None,                             # missing
        [[-1.0, 0.0]],                   # multi with one sub-vector, -1.0
    ]
    got_nums, got_sims = _file_topk(nums, col, q, k=4)
    by = dict(zip(got_nums.tolist(), got_sims.tolist()))
    assert set(by) == {0, 1, 3}
    assert by[0] == pytest.approx(1.0)
    assert by[1] == pytest.approx(0.6)
    assert by[3] == pytest.approx(-1.0)

    # first doc NESTED then flat (the old first-element heuristic broke
    # exactly this: flat rows iterated as scalars)
    col2 = [[[0.0, 1.0]], [0.8, 0.6], [1.0, 0.0]]
    n2, s2 = _file_topk(np.arange(3, dtype=np.int64), col2, q, k=3)
    by2 = dict(zip(n2.tolist(), s2.tolist()))
    assert by2[2] == pytest.approx(1.0)
    assert by2[1] == pytest.approx(0.8)
    assert by2[0] == pytest.approx(0.0)
