"""TermLocation overlap/merge/order conformance.

Vectors: /root/reference/search/highlight/term_locations_test.go
(TestTermLocationOverlaps:24-122, TestTermLocationsMergeOverlapping:127-340,
TestTermLocationsOrder:345+).  Notably locks in the reference's
anchor-never-advances MergeOverlapping quirk: only the cluster containing
the first location merges; later disjoint clusters stay unmerged.
"""

from bleve_ray.search.highlight import (
    TermLocation,
    merge_overlapping,
    order_term_locations,
)


def TL(start, end, ap=(), term="", pos=0):
    return TermLocation(term=term, array_positions=ap, pos=pos, start=start, end=end)


def test_overlaps_vectors():
    cases = [
        (TL(0, 5), TL(3, 7), True),
        (TL(0, 5), TL(5, 7), False),   # touching endpoints do NOT overlap
        (TL(0, 5), TL(7, 11), False),
        (TL(0, 5, ap=(0,)), TL(7, 11, ap=(1,)), False),
        (TL(0, 5, ap=(0,)), TL(3, 11, ap=(1,)), False),  # different element
        (TL(0, 5, ap=(0,)), TL(3, 11, ap=(0,)), True),
        (TL(0, 5, ap=(0,)), TL(7, 11, ap=(0,)), False),
    ]
    for left, right, want in cases:
        assert left.overlaps(right) is want, (left, right)


def test_merge_overlapping_vectors():
    cases = [
        ([], []),
        ([TL(0, 5), TL(7, 11)], [TL(0, 5), TL(7, 11)]),
        ([TL(0, 5), TL(4, 11)], [TL(0, 11), None]),
        ([TL(0, 5), TL(4, 11), TL(9, 13)], [TL(0, 13), None, None]),
        (
            [TL(0, 5), TL(4, 11), TL(9, 13), TL(15, 21)],
            [TL(0, 13), None, None, TL(15, 21)],
        ),
        (
            [TL(0, 5, ap=(0,)), TL(7, 11, ap=(1,))],
            [TL(0, 5, ap=(0,)), TL(7, 11, ap=(1,))],
        ),
        (
            [TL(0, 5, ap=(0,)), TL(7, 11, ap=(0,))],
            [TL(0, 5, ap=(0,)), TL(7, 11, ap=(0,))],
        ),
        (
            [TL(0, 5, ap=(0,)), TL(3, 11, ap=(0,))],
            [TL(0, 11, ap=(0,)), None],
        ),
        (
            [TL(0, 5, ap=(0,)), TL(3, 11, ap=(1,))],
            [TL(0, 5, ap=(0,)), TL(3, 11, ap=(1,))],
        ),
    ]
    for inp, want in cases:
        merge_overlapping(inp)
        assert inp == want, (inp, want)


def test_merge_anchor_never_advances():
    # the reference quirk, made explicit: a second overlapping cluster
    # that does not touch the anchor is left unmerged
    locs = [TL(0, 5), TL(7, 11), TL(9, 13)]
    merge_overlapping(locs)
    assert locs == [TL(0, 5), TL(7, 11), TL(9, 13)]


def test_order_term_locations_vectors():
    assert order_term_locations({}) == []

    out = order_term_locations({"term": [{"start": 0}, {"start": 5}]})
    assert out == [TL(0, 0, term="term"), TL(5, 0, term="term")]

    out = order_term_locations({"term": [{"start": 5}, {"start": 0}]})
    assert [t.start for t in out] == [0, 5]

    out = order_term_locations(
        {
            "term": [
                {"array_positions": (0,), "start": 0},
                {"array_positions": (0,), "start": 5},
            ]
        }
    )
    assert [t.start for t in out] == [0, 5]

    # cross-element: element order dominates start order
    out = order_term_locations(
        {
            "term": [
                {"array_positions": (1,), "start": 0},
                {"array_positions": (0,), "start": 5},
            ]
        }
    )
    assert [(t.array_positions, t.start) for t in out] == [((0,), 5), ((1,), 0)]

    # shorter array-position path sorts before a longer one sharing the prefix
    out = order_term_locations(
        {
            "term": [
                {"array_positions": (0, 1), "start": 0},
                {"array_positions": (0,), "start": 5},
            ]
        }
    )
    assert [(t.array_positions, t.start) for t in out] == [((0,), 5), ((0, 1), 0)]


def test_highlight_text_merges_overlapping_spans():
    # rendering must not duplicate text when token spans overlap
    from bleve_ray.analysis.analyzers import analyzer_named
    from bleve_ray.search.highlight import highlight_text

    an = analyzer_named("standard")
    frags = highlight_text("alpha beta gamma", {"alpha", "beta"}, an, style="html")
    assert frags == ["<mark>alpha</mark> <mark>beta</mark> gamma"]
