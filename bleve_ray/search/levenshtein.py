"""Bounded Levenshtein distance check (the role of the reference's
Levenshtein automaton over the term dictionary, search/levenshtein.go +
search_fuzzy.go:26 MaxFuzziness=2).  A banded DP with early exit is O(k*n)
per candidate -- fine for dictionary-scan expansion."""

from __future__ import annotations


def within_distance(a: str, b: str, k: int) -> bool:
    if a == b:
        return True
    la, lb = len(a), len(b)
    if abs(la - lb) > k:
        return False
    if k == 0:
        return False
    # banded DP
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        lo = max(1, i - k)
        hi = min(lb, i + k)
        if lo > 1:
            cur[lo - 1] = k + 1
        best = k + 1
        for j in range(lo, hi + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            best = min(best, cur[j])
        if best > k:
            return False
        prev = cur
    return prev[lb] <= k
