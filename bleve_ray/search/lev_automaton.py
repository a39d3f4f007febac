"""Levenshtein automaton over the sorted term dictionary.

The role of the reference's vellum Levenshtein automaton intersected with
the FST dictionary (search/levenshtein.go + search_fuzzy.go:26-120,
fuzzy candidate expansion): accepts exactly the strings within edit
distance k of the query term, and -- the part that matters at 10^8 terms
-- supports ``next_valid(s)``: the lexicographically smallest accepted
string >= s.  A seek loop alternating ``next_valid`` with a binary search
into the sorted dictionary visits only O(matches) terms, and whole
parquet row groups whose [term_min, term_max] interval contains no
accepted string are never read.

Standard public construction (Lucene's fuzzy automaton / the well-known
"Levenshtein automata" powerset technique, Schulz-Mihov): NFA states are
(offset i, edits e, in_transposition) positions; the DFA is built on
demand with subsumption-reduced frozensets memoized per (state,
char-class).  Transpositions are ON by default, matching the reference
(index/scorch/snapshot_index.go:58-62 builds its automata with
transpositions=true): an adjacent swap costs one edit, modeled by a
t-position (i, e, 1) = "consumed body[i+1], awaiting body[i], lands at
i+2"."""

from __future__ import annotations

from typing import Dict, FrozenSet, List, Optional, Tuple

_MAX_CP = 0x10FFFF

State = FrozenSet[Tuple[int, int, int]]  # {(offset, edits, in_transposition)}


class LevAutomaton:
    """Accepts strings within edit distance <= k of ``term``
    (unit-cost insert/delete/substitute, plus adjacent transposition when
    ``transpositions`` -- the reference's configuration)."""

    def __init__(
        self,
        term: str,
        k: int,
        prefix: str = "",
        transpositions: bool = True,
    ):
        self.term = term
        self.k = k
        self.transpositions = transpositions
        # required literal prefix (prefix_length semantics,
        # search_fuzzy.go:93-120): accepted strings are prefix + w with
        # lev(w, term[len(prefix):]) <= k
        self.prefix = prefix
        self.body = term[len(prefix):] if prefix else term
        self.n = len(self.body)
        self._step_cache: Dict[Tuple[State, str], State] = {}
        self._start: State = self._reduce([(0, 0, 0)])

    # --- NFA -> DFA ------------------------------------------------------

    def _reduce(self, positions: List[Tuple[int, int, int]]) -> State:
        """Drop subsumed standard positions: (i,e) subsumes (j,f) when f>e
        and |j-i| <= f-e (anything (j,f) can accept, (i,e) can too).
        T-positions are kept as-is (conservative; reduction is purely an
        optimization)."""
        std = [p for p in positions if not p[2]]
        tpos = [p for p in positions if p[2]]
        keep = []
        for p in std:
            i, e, _ = p
            subsumed = False
            for q in std:
                j, f, _ = q
                if q != p and f < e and abs(i - j) <= e - f:
                    subsumed = True
                    break
            if not subsumed:
                keep.append(p)
        return frozenset(keep + tpos)

    def _char_class(self, c: str) -> str:
        """Transitions depend only on whether/where c occurs in the next
        k+1 body chars of each position; collapsing all chars absent from
        the body keeps the memo small."""
        return c if c in self.body else "\x00"

    def step(self, state: State, c: str) -> State:
        key = (state, self._char_class(c))
        hit = self._step_cache.get(key)
        if hit is not None:
            return hit
        nxt: List[Tuple[int, int, int]] = []
        n, k, body = self.n, self.k, self.body
        for i, e, t in state:
            if t:
                # completing a transposition: awaiting body[i]
                if body[i] == c:
                    nxt.append((i + 2, e, 0))
                continue
            if i < n and body[i] == c:
                nxt.append((i + 1, e, 0))  # match
            if e < k:
                nxt.append((i, e + 1, 0))  # insertion of c
                if i < n:
                    nxt.append((i + 1, e + 1, 0))  # substitution
                # delete d body chars then match c
                for d in range(1, k - e + 1):
                    if i + d < n and body[i + d] == c:
                        nxt.append((i + d + 1, e + d, 0))
                if (
                    self.transpositions
                    and i + 1 < n
                    and body[i + 1] == c
                    and body[i] != c
                ):
                    # adjacent swap: consumed body[i+1], await body[i]
                    nxt.append((i, e + 1, 1))
        out = self._reduce(list(set(nxt)))
        self._step_cache[key] = out
        return out

    def is_final(self, state: State) -> bool:
        return any(
            not t and self.n - i <= self.k - e for i, e, t in state
        )

    def _next_edge(self, state: State, after: Optional[str]) -> Optional[str]:
        """Smallest char strictly greater than ``after`` (or the smallest
        at all when None) with a live transition out of ``state``."""
        floor = -1 if after is None else ord(after)
        if any(e < self.k and not t for _, e, t in state):
            # insert/substitute: EVERY char has a transition
            return chr(floor + 1) if floor + 1 <= _MAX_CP else None
        best = None
        for i, e, t in state:
            # exact matches step; t-positions step only on their awaited
            # char body[i]
            if i < self.n:
                c = self.body[i]
                if ord(c) > floor and (best is None or c < best):
                    best = c
        return best

    # --- public API ------------------------------------------------------

    def accepts(self, s: str) -> bool:
        if self.prefix:
            if not s.startswith(self.prefix):
                return False
            s = s[len(self.prefix):]
        state = self._start
        for c in s:
            state = self.step(state, c)
            if not state:
                return False
        return self.is_final(state)

    def next_valid(self, s: str) -> Optional[str]:
        """Smallest accepted string >= s ("" gives the smallest overall).
        Classic backtracking walk over the on-demand DFA."""
        p = self.prefix
        if not p:
            return self._next_valid_body(s)
        if s.startswith(p):
            body_next = self._next_valid_body(s[len(p):])
            return p + body_next if body_next is not None else None
        if s < p:
            # smallest accepted overall (every accepted string >= p > s)
            body_next = self._next_valid_body("")
            return p + body_next if body_next is not None else None
        # s > p without sharing it: all accepted strings start with p and
        # are therefore < s
        return None

    def _next_valid_body(self, s: str) -> Optional[str]:
        state = self._start
        stack: List[Tuple[str, State, Optional[str]]] = []
        dead_at = None
        for idx, c in enumerate(s):
            stack.append((s[:idx], state, c))
            state = self.step(state, c)
            if not state:
                dead_at = idx
                break
        if dead_at is None:
            if self.is_final(state):
                return s
            stack.append((s, state, None))
        while stack:
            path, state, after = stack.pop()
            c = self._next_edge(state, after)
            if c is None:
                continue
            nxt = self.step(state, c)
            if not nxt:
                # try the next char after c (only reachable in the
                # exact-match-only regime where edges are sparse)
                stack.append((path, state, c))
                continue
            path = path + c
            if self.is_final(nxt):
                return path
            # descend: smallest continuation from nxt
            stack.append((path[:-1], state, c))
            stack.append((path, nxt, None))
        return None


def intersect_sorted_terms(aut: LevAutomaton, terms: List[str]) -> List[int]:
    """Indices of accepted terms in an ascending-sorted term list, visiting
    O(matches + seeks) entries via next_valid + bisect (the FST/automaton
    intersection loop, vellum's Iterator(aut) role)."""
    import bisect

    out: List[int] = []
    n = len(terms)
    if n == 0:
        return out
    target = aut.next_valid("")
    while target is not None:
        pos = bisect.bisect_left(terms, target)
        if pos >= n:
            break
        t = terms[pos]
        if t == target or aut.accepts(t):
            out.append(pos)
            if pos + 1 >= n:
                break
            target = aut.next_valid(t + "\x00")
        else:
            target = aut.next_valid(t)
            if target == t:  # defensive: accepts() said no -> advance
                target = aut.next_valid(t + "\x00")
    return out
