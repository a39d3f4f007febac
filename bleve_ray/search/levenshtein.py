"""Bounded edit-distance check (the role of the reference's Levenshtein
automaton over the term dictionary, search/levenshtein.go +
search_fuzzy.go:26 MaxFuzziness=2).  A banded DP with early exit is O(k*n)
per candidate -- fine for dictionary-scan expansion.

The reference builds its automata WITH transpositions
(index/scorch/snapshot_index.go:58-62 NewLevenshteinAutomatonBuilder(d,
true)), i.e. restricted Damerau-Levenshtein (adjacent transposition is
one edit, edited substrings never overlap); that is the default here.
"""

from __future__ import annotations


def within_distance(
    a: str, b: str, k: int, transpositions: bool = True
) -> bool:
    return bounded_distance(a, b, k, transpositions) <= k


def bounded_distance(
    a: str, b: str, k: int, transpositions: bool = True
) -> int:
    """Edit distance when <= k, else k+1 (used for the fuzzy
    per-candidate boost 1/(distance+1), search_multi_term.go:193-194)."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if abs(la - lb) > k:
        return k + 1
    if k == 0:
        return k + 1
    # banded DP (optimal string alignment when transpositions=True)
    prev2 = None
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        # Out-of-band cells must read as > k, never 0: a 0 leaks into the
        # next row via prev[j] and admits terms at distance > k.
        cur = [k + 1] * (lb + 1)
        cur[0] = i
        lo = max(1, i - k)
        hi = min(lb, i + k)
        # column 0 (value i) is inside the band when i <= k
        best = i if i <= k else k + 1
        for j in range(lo, hi + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            d = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            if (
                transpositions
                and i > 1
                and j > 1
                and a[i - 1] == b[j - 2]
                and a[i - 2] == b[j - 1]
                and prev2[j - 2] + 1 < d
            ):
                d = prev2[j - 2] + 1
            cur[j] = d
            if d < best:
                best = d
        if best > k:
            return k + 1
        prev2 = prev
        prev = cur
    return min(prev[lb], k + 1)
