"""Reference vectors from search/levenshtein_test.go
(TestLevenshteinDistance, TestLevenshteinDistanceMax) -- plain
Levenshtein (transpositions=False), with LevenshteinDistanceMax's
(min(dist, max), exceeded) contract mapped onto bounded_distance."""

import pytest

from bleve_ray.search.levenshtein import bounded_distance


@pytest.mark.parametrize(
    "a,b,dist",
    [("water", "atec", 2), ("water", "aphex", 4)],
)
def test_levenshtein_distance(a, b, dist):
    k = max(len(a), len(b))
    assert bounded_distance(a, b, k, transpositions=False) == dist


@pytest.mark.parametrize(
    "a,b,mx,dist,exceeded",
    [
        ("water", "atec", 1, 1, True),
        ("water", "christmas", 3, 3, True),
        ("", "water", 10, 5, False),
        ("water", "", 3, 3, True),
    ],
)
def test_levenshtein_distance_max(a, b, mx, dist, exceeded):
    d = bounded_distance(a, b, mx, transpositions=False)
    got_exceeded = d > mx
    got_dist = min(d, mx)
    assert (got_dist, got_exceeded) == (dist, exceeded)
