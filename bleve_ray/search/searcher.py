"""Searchers -- vectorized (array-at-a-time) equivalents of the reference's
iterator searchers (search/searcher/*).  Each searcher produces the FULL
sorted (docnum, score) arrays for its subtree; set operations that the
reference does by leapfrog iteration are numpy sorted-array intersections /
unions, which give identical results order-free.

queryNorm plumbing mirrors the reference exactly: composite searchers
compute queryNorm = 1/sqrt(sum of children Weight()) at construction and
push it down (search_conjunction.go:90-101, search_disjunction_heap.go:94+,
search_boolean.go:92-110); a single bare term searcher never receives a
queryNorm so its queryWeight stays 1.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence

import numpy as np

from .scorer import ConstantScorer, TermQueryScorer

# phrase key space: doc_rank * base + biased position (base >> any doc len)
_KEY_BASE = np.int64(1) << np.int64(33)


@dataclass
class SearchHits:
    """Sorted-by-docnum match arrays for a (sub)query."""

    docnums: np.ndarray  # int64 ascending
    scores: np.ndarray  # float64

    @staticmethod
    def empty() -> "SearchHits":
        return SearchHits(
            np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
        )




def _merge_locations(dicts):
    out = {}
    for d in dicts:
        if not d:
            continue
        for f, terms in d.items():
            tgt = out.setdefault(f, {})
            for t, locs in terms.items():
                cur = tgt.setdefault(t, [])
                for loc in locs:
                    # dedupe identical locations from overlapping
                    # branches (reference issue 1168: disjunction of the
                    # same term must not double its locations)
                    if loc not in cur:
                        cur.append(loc)
    return out or None


class Searcher:
    """Base: weight()/set_query_norm() mirror search.Searcher."""

    def weight(self) -> float:
        raise NotImplementedError

    def set_query_norm(self, qnorm: float) -> None:
        raise NotImplementedError

    def search(self) -> SearchHits:
        raise NotImplementedError

    def count(self) -> int:
        """Upper-bound match count (reader.Count equivalent)."""
        raise NotImplementedError

    def explain(self, docnum: int, doc_id: str = ""):
        """Per-hit explanation tree ("explain": true request option,
        reference search.Explanation); None when this searcher cannot
        explain the doc."""
        return None

    def locations(self, docnum: int):
        """Per-hit term locations ("includeLocations": true).  Shape:
        {field: {term: [{"pos": p, "start": 0, "end": 0}]}}.  The index
        stores positions only (positions=True in FieldConfig), not term
        vectors; byte start/end are filled in afterwards by the collector
        (Index._fill_location_offsets) by re-analyzing the stored field
        text of the returned page."""
        return None


class TermSearcher(Searcher):
    """search_term.go equivalent: posting arrays + TermQueryScorer.

    Posting decode is LAZY when the reader exposes block metadata:
    df and the score bounds come from the meta columns alone, so a
    block-max caller (disjunction_topk) can plan and skip blocks before
    any blob is decoded."""

    def __init__(self, reader, term: str, field: str, boost: float, options):
        self.reader = reader
        self.term = term
        self.field = field
        self._options = options
        self._posting = None
        self._decoded = False
        self.blocks = None
        if hasattr(reader, "posting_meta"):
            self.blocks = reader.posting_meta(field, term)
            doc_term = sum(b["df"] for b in self.blocks)
            if not self.blocks:
                self._decoded = True  # nothing to decode
        else:
            self._posting = reader.posting(
                field, term, want_positions=options.need_positions
            )
            self._decoded = True
            doc_term = self._posting.df if self._posting else 0
        if options.scoring_model == "bm25":
            stats = getattr(options, "bm25_stats", None)
            if stats:
                # bm25ScoreMetrics with ctx BM25Stats (search_term.go:101-106)
                import math as _math

                doc_total = int(stats["doc_count"])
                card = stats["field_cardinality"].get(field)
                if card is None:
                    raise KeyError(
                        f"field stat for bm25 not present {field}"
                    )
                avg_len = (
                    _math.ceil(card / doc_total) if doc_total else 0.0
                )
            else:
                doc_total, avg_len = reader.bm25_metrics(field)
        else:
            doc_total, avg_len = reader.doc_count(), 0.0
        self.scorer = TermQueryScorer(
            term, field, boost, doc_total, doc_term, avg_len
        )
        self._score_none = getattr(options, "score", "") == "none"

    @property
    def posting(self):
        if not self._decoded:
            self._posting = self.reader.posting(
                self.field, self.term,
                want_positions=self._options.need_positions,
            )
            self._decoded = True
        return self._posting

    def max_bounds(self):
        """(max_tf, max_norm) from block metadata without decoding; None
        when bounds are unavailable."""
        if self.blocks is not None and self.blocks:
            if any(b.get("max_tf") is None for b in self.blocks):
                return None
            return (
                max(b["max_tf"] for b in self.blocks),
                max(b["max_norm"] for b in self.blocks),
            )
        p = self.posting
        if p is None or p.max_tf is None:
            return None
        return (p.max_tf, p.max_norm)

    def weight(self) -> float:
        return self.scorer.weight()

    def set_query_norm(self, qnorm: float) -> None:
        self.scorer.set_query_norm(qnorm)

    def count(self) -> int:
        if self.blocks is not None:
            return sum(b["df"] for b in self.blocks)
        return self.posting.df if self.posting else 0

    def explain(self, docnum: int, doc_id: str = ""):
        from .scorer import term_explanation

        p = self.posting
        if p is None or len(p.docnums) == 0:
            return None
        i = int(np.searchsorted(p.docnums, docnum))
        if i >= len(p.docnums) or p.docnums[i] != docnum:
            return None
        return term_explanation(
            self.scorer, int(p.tfs[i]), float(p.norms[i]), doc_id
        )

    def locations(self, docnum: int):
        p = self.reader.posting(self.field, self.term, want_positions=True)
        if p is None or p.positions_flat is None or len(p.docnums) == 0:
            return None
        i = int(np.searchsorted(p.docnums, docnum))
        if i >= len(p.docnums) or p.docnums[i] != docnum:
            return None
        start = int(p.tfs[:i].sum())
        poss = p.positions_flat[start : start + int(p.tfs[i])]
        from ..analysis.freq import ARRAY_POS_MASK, ARRAY_POS_SHIFT

        locs = []
        for x in poss:
            x = int(x)
            elem = x >> ARRAY_POS_SHIFT
            loc = {"pos": x & ARRAY_POS_MASK, "start": 0, "end": 0}
            if elem:
                # array-element ordinal packed into the high position
                # bits at build time (freq.analyze_batch list branch)
                loc["array_positions"] = [elem]
            locs.append(loc)
        return {self.field: {self.term: locs}}

    def search(self) -> SearchHits:
        if self.posting is None:
            return SearchHits.empty()
        if self._score_none:
            # unadorned path (optimize.go:26-47): no freq/norm math
            scores = np.zeros(len(self.posting.docnums), dtype=np.float64)
        else:
            scores = self.scorer.score(self.posting.tfs, self.posting.norms)
        return SearchHits(self.posting.docnums, scores)


class MatchNoneSearcher(Searcher):
    def weight(self) -> float:
        return 0.0

    def set_query_norm(self, qnorm: float) -> None:
        pass

    def count(self) -> int:
        return 0

    def search(self) -> SearchHits:
        return SearchHits.empty()


class MatchAllSearcher(Searcher):
    """search_match_all.go: every doc, constant score."""

    def __init__(self, reader, boost: float):
        self.reader = reader
        self.scorer = ConstantScorer(1.0, boost)

    def weight(self) -> float:
        return self.scorer.weight()

    def set_query_norm(self, qnorm: float) -> None:
        self.scorer.set_query_norm(qnorm)

    def count(self) -> int:
        return self.reader.doc_count()

    def search(self) -> SearchHits:
        docnums = self.reader.all_docnums()
        score = self.scorer.score_value()
        return SearchHits(docnums, np.full(len(docnums), score, dtype=np.float64))

    def explain(self, docnum: int, doc_id: str = ""):
        from .scorer import constant_explanation

        return constant_explanation(self.scorer, doc_id)


class ConjunctionSearcher(Searcher):
    """search_conjunction.go: intersection, score = sum of constituents."""

    def __init__(self, children: Sequence[Searcher], options=None):
        self.children = list(children)
        self._compute_query_norm()

    def _compute_query_norm(self):
        sum_sq = sum(c.weight() for c in self.children)
        if sum_sq == 0:
            return
        qnorm = 1.0 / np.sqrt(sum_sq)
        for c in self.children:
            c.set_query_norm(qnorm)

    def weight(self) -> float:
        return sum(c.weight() for c in self.children)

    def set_query_norm(self, qnorm: float) -> None:
        for c in self.children:
            c.set_query_norm(qnorm)

    def count(self) -> int:
        return min((c.count() for c in self.children), default=0)

    def search(self) -> SearchHits:
        if not self.children:
            return SearchHits.empty()
        results = [c.search() for c in self.children]
        # intersect smallest-first via searchsorted (docnums are sorted
        # unique): O(min log max) per step, no concatenate+sort
        results_by_size = sorted(results, key=lambda r: len(r.docnums))
        docs = results_by_size[0].docnums
        for r in results_by_size[1:]:
            if len(docs) == 0:
                return SearchHits.empty()
            other = r.docnums
            if len(other) == 0:
                return SearchHits.empty()
            idx = np.minimum(np.searchsorted(other, docs), len(other) - 1)
            docs = docs[other[idx] == docs]
        if len(docs) == 0:
            return SearchHits.empty()
        scores = np.zeros(len(docs), dtype=np.float64)
        for r in results:
            idx = np.searchsorted(r.docnums, docs)
            scores += r.scores[idx]
        return SearchHits(docs, scores)

    def explain(self, docnum: int, doc_id: str = ""):
        from .scorer import Explanation

        kids = [c.explain(docnum, doc_id) for c in self.children]
        kids = [k for k in kids if k is not None]
        if not kids:
            return None
        return Explanation(
            sum(k["value"] for k in kids), "sum of:", kids
        )

    def locations(self, docnum: int):
        return _merge_locations(c.locations(docnum) for c in self.children)


class DisjunctionSearcher(Searcher):
    """search_disjunction_{slice,heap}.go: union, score = sum x coord, with
    optional min-should-match filter."""

    def __init__(self, children: Sequence[Searcher], min_match: int = 0, options=None):
        self.children = list(children)
        self.min_match = min_match
        self._compute_query_norm()

    def _compute_query_norm(self):
        sum_sq = sum(c.weight() for c in self.children)
        if sum_sq == 0:
            return
        qnorm = 1.0 / np.sqrt(sum_sq)
        for c in self.children:
            c.set_query_norm(qnorm)

    def weight(self) -> float:
        return sum(c.weight() for c in self.children)

    def set_query_norm(self, qnorm: float) -> None:
        for c in self.children:
            c.set_query_norm(qnorm)

    def count(self) -> int:
        return sum(c.count() for c in self.children)

    def explain(self, docnum: int, doc_id: str = ""):
        from .scorer import Explanation

        kids = [c.explain(docnum, doc_id) for c in self.children]
        kids = [k for k in kids if k is not None]
        if len(kids) < max(1, self.min_match):
            return None
        total = len(self.children)
        raw = Explanation(sum(k["value"] for k in kids), "sum of:", kids)
        coord = len(kids) / float(total)
        out = Explanation(
            raw["value"] * coord,
            "product of:",
            [raw, Explanation(coord, f"coord({len(kids)}/{total})")],
        )
        # search.Explanation.PartialMatch (search/search.go): a
        # disjunction hit that satisfied fewer than all clauses
        out["partial_match"] = len(kids) < total
        return out

    def score_breakdown(self, docnum: int) -> dict:
        """Clause index -> that clause's (pre-coord) score at docnum
        (DocumentMatch.ScoreBreakdown, search.go:172; populated by the
        disjunction slice/heap searchers when RetrieveScoreBreakdown)."""
        out = {}
        for i, c in enumerate(self.children):
            e = c.explain(docnum)
            if e is not None:
                out[i] = e["value"]
        return out

    def locations(self, docnum: int):
        return _merge_locations(c.locations(docnum) for c in self.children)

    def search(self) -> SearchHits:
        results = [c.search() for c in self.children]
        if not results:
            return SearchHits.empty()
        all_docs = np.concatenate([r.docnums for r in results])
        if len(all_docs) == 0:
            return SearchHits.empty()
        docs = np.unique(all_docs)
        sums = np.zeros(len(docs), dtype=np.float64)
        counts = np.zeros(len(docs), dtype=np.int64)
        for r in results:
            idx = np.searchsorted(docs, r.docnums)
            sums[idx] += r.scores
            counts[idx] += 1
        total = len(self.children)
        # DisjunctionQueryScorer: score = sum * (countMatch/countTotal)
        scores = sums * (counts.astype(np.float64) / float(total))
        if self.min_match > 0:
            keep = counts >= self.min_match
            docs, scores = docs[keep], scores[keep]
        return SearchHits(docs, scores)


class _TopKResult:
    """search_topk result: top-k-safe hits + whether total is exact."""

    __slots__ = ("hits", "exact_total", "seen_total")

    def __init__(self, hits: SearchHits, exact_total: bool, seen_total: int):
        self.hits = hits
        self.exact_total = exact_total
        self.seen_total = seen_total


def _gather_term(
    c: "TermSearcher",
    cand_docs: np.ndarray,
    cand_sum: np.ndarray,
    cand_cnt: np.ndarray,
) -> None:
    """Add c's exact contributions to EXISTING candidates only.  With
    block metadata available, decode only posting blocks whose
    [min_docnum, max_docnum] range contains a candidate -- the
    decode-level skip of block-max WAND (blocks are exact bounds written
    by build.split_long_posting_rows, so the skip loses nothing)."""
    ctr = getattr(c.reader, "counters", None)
    if c.blocks:
        for b in c.blocks:
            lo = np.searchsorted(cand_docs, b["min_docnum"], side="left")
            hi = np.searchsorted(cand_docs, b["max_docnum"], side="right")
            if lo >= hi:
                if ctr is not None:
                    ctr["posting_blocks_skipped"] = (
                        ctr.get("posting_blocks_skipped", 0) + 1
                    )
                continue
            if ctr is not None:
                ctr["posting_blocks_decoded"] = (
                    ctr.get("posting_blocks_decoded", 0) + 1
                )
            p = c.reader.decode_block(c.field, c.term, b)
            if p is None:
                continue
            scores = c.scorer.score(p.tfs, p.norms)
            window = cand_docs[lo:hi]
            idx = np.searchsorted(p.docnums, window)
            idx_c = np.minimum(idx, len(p.docnums) - 1)
            m = p.docnums[idx_c] == window
            # basic slices are views: writes land in the caller's arrays
            cand_sum[lo:hi][m] += scores[idx_c[m]]
            cand_cnt[lo:hi][m] += 1
        return
    hits = c.search()
    if len(hits.docnums) == 0:
        return
    idx = np.searchsorted(hits.docnums, cand_docs)
    idx_c = np.minimum(idx, len(hits.docnums) - 1)
    m = hits.docnums[idx_c] == cand_docs
    cand_sum[m] += hits.scores[idx_c[m]]
    cand_cnt[m] += 1


def disjunction_topk(dis: "DisjunctionSearcher", k: int) -> _TopKResult:
    """MaxScore-family top-k pruning over a disjunction of term searchers
    (the block-max WAND role from the north star, at term/segment-block
    granularity): terms are processed in decreasing upper-bound order;
    once the remaining terms' combined bound falls below the running k-th
    score estimate, they can no longer introduce NEW top-k docs and are
    only gathered onto existing candidates.

    Correctness: a doc unseen after terms 0..i-1 has final score
    <= tail_ub[i] * (n-i)/n (sum bound x coord bound); theta is the k-th
    largest CURRENT estimate sum*cnt/n, which only grows toward the final
    score -- so strict `bound < theta` skipping can never drop a true
    top-k doc.  Scores of returned docs are computed exactly; ranking is
    identical to the exhaustive path (asserted in tests).

    Savings are two-level: candidate-set growth (the sorted-union merge)
    AND posting decode -- upper bounds come from block metadata columns
    alone (posting_meta, no blob decode), and a gather-only term decodes
    ONLY the ~4096-doc blocks whose docnum range intersects a candidate
    (build.split_long_posting_rows block rows).  Skipped/decoded block
    counts surface in reader.stats()."""
    kids = [c for c in dis.children if isinstance(c, TermSearcher)]
    if (
        len(kids) != len(dis.children)
        or dis.min_match > 1
        or any(c._score_none for c in kids)
    ):
        return _TopKResult(dis.search(), True, -1)
    infos = []
    for c in kids:
        if c.count() == 0:
            continue
        mb = c.max_bounds()
        if mb is None:
            # bounds unavailable (legacy segment without max_tf/max_norm)
            return _TopKResult(dis.search(), True, -1)
        ub = float(
            c.scorer.score(
                np.array([mb[0]], dtype=np.int64),
                np.array([mb[1]], dtype=np.float32),
            )[0]
        )
        infos.append((ub, c))
    if not infos:
        return _TopKResult(SearchHits.empty(), True, 0)
    infos.sort(key=lambda x: -x[0])
    n_total = len(dis.children)
    ubs = np.array([u for u, _ in infos])
    tail = np.concatenate((np.cumsum(ubs[::-1])[::-1], [0.0]))

    cand_docs = np.empty(0, dtype=np.int64)
    cand_sum = np.empty(0, dtype=np.float64)
    cand_cnt = np.empty(0, dtype=np.int64)
    theta = -np.inf
    pruned = False
    for i, (ub, c) in enumerate(infos):
        remaining = len(infos) - i
        new_doc_bound = tail[i] * (remaining / n_total)
        if new_doc_bound < theta:
            pruned = True
            # gather-only: add contributions to existing candidates,
            # decoding only blocks whose docnum range holds a candidate
            _gather_term(c, cand_docs, cand_sum, cand_cnt)
        else:
            hits = c.search()
            merged = np.unique(np.concatenate((cand_docs, hits.docnums)))
            new_sum = np.zeros(len(merged), dtype=np.float64)
            new_cnt = np.zeros(len(merged), dtype=np.int64)
            pos_old = np.searchsorted(merged, cand_docs)
            new_sum[pos_old] = cand_sum
            new_cnt[pos_old] = cand_cnt
            pos_new = np.searchsorted(merged, hits.docnums)
            new_sum[pos_new] += hits.scores
            new_cnt[pos_new] += 1
            cand_docs, cand_sum, cand_cnt = merged, new_sum, new_cnt
        if len(cand_docs) >= k > 0:
            est = cand_sum * (cand_cnt.astype(np.float64) / n_total)
            theta = float(np.partition(est, len(est) - k)[len(est) - k])
    scores = cand_sum * (cand_cnt.astype(np.float64) / n_total)
    if dis.min_match > 0:
        keep = cand_cnt >= dis.min_match
        cand_docs, scores = cand_docs[keep], scores[keep]
    return _TopKResult(
        SearchHits(cand_docs, scores), not pruned, len(cand_docs)
    )


class BooleanSearcher(Searcher):
    """search_boolean.go: must AND should(>=min via the should-disjunction)
    AND NOT mustNot; score = must + should contributions (conjunction-style
    sum); queryNorm over must+should only (search_boolean.go:92-110)."""

    def __init__(
        self,
        must: Optional[Searcher],
        should: Optional[Searcher],
        must_not: Optional[Searcher],
        options=None,
    ):
        self.must = must
        self.should = should
        self.must_not = must_not
        self._compute_query_norm()

    def _compute_query_norm(self):
        sum_sq = 0.0
        if self.must is not None:
            sum_sq += self.must.weight()
        if self.should is not None:
            sum_sq += self.should.weight()
        if sum_sq == 0:
            return
        qnorm = 1.0 / np.sqrt(sum_sq)
        if self.must is not None:
            self.must.set_query_norm(qnorm)
        if self.should is not None:
            self.should.set_query_norm(qnorm)

    def weight(self) -> float:
        w = 0.0
        if self.must is not None:
            w += self.must.weight()
        if self.should is not None:
            w += self.should.weight()
        return w

    def set_query_norm(self, qnorm: float) -> None:
        if self.must is not None:
            self.must.set_query_norm(qnorm)
        if self.should is not None:
            self.should.set_query_norm(qnorm)

    def count(self) -> int:
        if self.must is not None:
            return self.must.count()
        if self.should is not None:
            return self.should.count()
        return 0

    def explain(self, docnum: int, doc_id: str = ""):
        from .scorer import Explanation

        kids = []
        if self.must is not None:
            m = self.must.explain(docnum, doc_id)
            if m is None:
                return None
            kids.append(m)
        if self.should is not None:
            sh = self.should.explain(docnum, doc_id)
            if sh is not None:
                kids.append(sh)
        if not kids:
            return None
        return Explanation(sum(k["value"] for k in kids), "sum of:", kids)

    def locations(self, docnum: int):
        out = []
        if self.must is not None:
            out.append(self.must.locations(docnum))
        if self.should is not None:
            out.append(self.should.locations(docnum))
        return _merge_locations(out)

    def search(self) -> SearchHits:
        must_hits = self.must.search() if self.must is not None else None
        should_hits = self.should.search() if self.should is not None else None

        if must_hits is not None:
            docs = must_hits.docnums
            scores = must_hits.scores.copy()
            if should_hits is not None and len(should_hits.docnums) > 0:
                idx = np.searchsorted(should_hits.docnums, docs)
                idx_c = np.clip(idx, 0, len(should_hits.docnums) - 1)
                in_should = should_hits.docnums[idx_c] == docs
                scores[in_should] += should_hits.scores[idx_c[in_should]]
                # if should has a hard min (>0), must-docs not matching
                # should are dropped (mirrors shouldSearcher.Min() check)
                if getattr(self.should, "min_match", 0) > 0:
                    docs, scores = docs[in_should], scores[in_should]
            elif should_hits is not None and getattr(self.should, "min_match", 0) > 0:
                return SearchHits.empty()
        elif should_hits is not None:
            docs, scores = should_hits.docnums, should_hits.scores
        else:
            return SearchHits.empty()

        if self.must_not is not None:
            mn = self.must_not.search()
            if len(mn.docnums) > 0:
                keep = ~np.isin(docs, mn.docnums, assume_unique=True)
                docs, scores = docs[keep], scores[keep]
        return SearchHits(docs, scores)


class PhraseSearcher(Searcher):
    """search_phrase.go: conjunction over per-slot term searchers, then
    position-adjacency verification (findPhrasePaths, slop=0) honoring
    stop-word gaps (empty slots advance the expected position)."""

    def __init__(self, reader, phrase: List[List[str]], field: str, boost: float, options,
                 slop: int = 0):
        self.reader = reader
        self.field = field
        # slop > 0 routes matching through findPhrasePaths semantics
        # (shared cumulative budget, see phrase_paths.py); 0 stays on
        # the vectorized slot-key intersection
        self.slop = int(slop or 0)
        # slot offsets of non-empty slots; empty slots ([]) are gaps.
        # Slot entries are terms or (term, boost_multiplier) pairs --
        # fuzzy/synonym phrase expansion weights candidates like the
        # reference (1/(editDistance+1), synonyms at 1/2)
        self.slots: List[List[str]] = []
        boosts: List[List[float]] = []
        self.offsets: List[int] = []
        for i, slot in enumerate(phrase):
            terms = []
            mults = []
            for t in slot:
                if isinstance(t, tuple):
                    t, m = t
                else:
                    m = 1.0
                if t != "":
                    terms.append(t)
                    mults.append(m)
            if terms:
                self.slots.append(terms)
                boosts.append(mults)
                self.offsets.append(i)
        child_opts = options.with_positions()
        children: List[Searcher] = []
        for terms, mults in zip(self.slots, boosts):
            if len(terms) == 1:
                children.append(
                    TermSearcher(
                        reader, terms[0], field, boost * mults[0], child_opts
                    )
                )
            else:
                children.append(
                    DisjunctionSearcher(
                        [
                            TermSearcher(
                                reader, t, field, boost * m, child_opts
                            )
                            for t, m in zip(terms, mults)
                        ],
                        min_match=1,
                    )
                )
        self.must = ConjunctionSearcher(children)
        self._options = child_opts

    def weight(self) -> float:
        return self.must.weight()

    def set_query_norm(self, qnorm: float) -> None:
        self.must.set_query_norm(qnorm)

    def count(self) -> int:
        return self.must.count()

    def explain(self, docnum: int, doc_id: str = ""):
        return self.must.explain(docnum, doc_id)

    def locations(self, docnum: int):
        return self.must.locations(docnum)

    def _slot_keys(
        self, terms: List[str], cand_docs: np.ndarray, offset: int
    ) -> np.ndarray:
        """(doc_rank << 32 | (pos - offset)) keys for every occurrence of
        any slot term within the candidate docs -- lets the multi-slot
        adjacency check run as pure sorted-array intersections."""
        keys = []
        for t in terms:
            p = self.reader.posting(self.field, t, want_positions=True)
            if p is None or p.positions_flat is None:
                continue
            starts = np.zeros(len(p.tfs), dtype=np.int64)
            np.cumsum(p.tfs[:-1], out=starts[1:])
            idx = np.searchsorted(p.docnums, cand_docs)
            idx_c = np.minimum(idx, len(p.docnums) - 1)
            valid = p.docnums[idx_c] == cand_docs
            ranks = np.flatnonzero(valid)
            pidx = idx_c[valid]
            counts = p.tfs[pidx]
            total = int(counts.sum())
            if total == 0:
                continue
            # vectorized gather of each candidate doc's position slice;
            # one fused repeat: tok_idx = arange + repeat(start - out_off)
            out_off = np.concatenate(([0], np.cumsum(counts[:-1])))
            tok_idx = np.arange(total) + np.repeat(
                starts[pidx] - out_off, counts
            )
            rank_rep = np.repeat(ranks, counts)  # flatnonzero: int64
            # pos-offset can go slightly negative for later slots; bias
            # +64.  positions stay int32 through the subtraction; the
            # add upcasts once into the int64 rank keys (no full-width
            # astype copy of the position gather)
            keys.append(
                rank_rep * _KEY_BASE
                + (p.positions_flat[tok_idx] - np.int32(offset - 64))
            )
        if not keys:
            return np.empty(0, dtype=np.int64)
        if len(keys) == 1:
            # single-term slot (the common case): ranks are nondecreasing
            # and per-doc positions are stored sorted, so the keys are
            # already sorted -- skip the O(n log n) sort
            return keys[0]
        out = np.concatenate(keys)
        out.sort()
        return out

    @staticmethod
    def _sorted_intersect(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        """Intersection of two SORTED int64 arrays via searchsorted on the
        larger side -- O(min log max), no re-sort (vs np.intersect1d's
        concatenate+sort)."""
        if len(a) > len(b):
            a, b = b, a
        if len(b) == 0:
            return a[:0]
        idx = np.minimum(np.searchsorted(b, a), len(b) - 1)
        return a[b[idx] == a]

    def _search_sloppy(self, hits: SearchHits) -> SearchHits:
        """Per-candidate findPhrasePaths verification for slop > 0.

        The candidate set is already the conjunction of all slots (the
        reference shape: NewPhraseSearcher wraps a conjunction and
        verifies each must-match, search_phrase.go:271-332), so the
        Python-level path check runs only on docs containing every
        slot term somewhere."""
        from .phrase_paths import find_phrase_paths

        phrase: List[List[str]] = [[] for _ in range(self.offsets[-1] + 1)]
        for terms, off in zip(self.slots, self.offsets):
            phrase[off] = terms
        keep = np.zeros(len(hits.docnums), dtype=bool)
        for i, dn in enumerate(hits.docnums):
            locs = self.must.locations(int(dn))
            tlm = (locs or {}).get(self.field) or {}
            if tlm and find_phrase_paths(phrase, tlm, self.slop):
                keep[i] = True
        return SearchHits(hits.docnums[keep], hits.scores[keep])

    def search(self) -> SearchHits:
        hits = self.must.search()
        if len(hits.docnums) == 0 or not self.slots:
            return hits
        if self.slop > 0:
            return self._search_sloppy(hits)
        base = self.offsets[0]
        ok = self._slot_keys(self.slots[0], hits.docnums, 0)
        for s in range(1, len(self.slots)):
            nxt = self._slot_keys(
                self.slots[s], hits.docnums, self.offsets[s] - base
            )
            ok = self._sorted_intersect(ok, nxt)
            if len(ok) == 0:
                return SearchHits.empty()
        match_ranks = np.unique(ok // _KEY_BASE)
        keep = np.zeros(len(hits.docnums), dtype=bool)
        keep[match_ranks] = True
        return SearchHits(hits.docnums[keep], hits.scores[keep])


class DocIDSearcher(Searcher):
    """search_docid.go: sorted external-ID lookup, constant scoring."""

    def __init__(self, reader, ids, boost: float):
        self.reader = reader
        self.docnums = reader.docnums_for_ids(ids)
        self.scorer = ConstantScorer(1.0, boost)

    def weight(self) -> float:
        return self.scorer.weight()

    def set_query_norm(self, qnorm: float) -> None:
        self.scorer.set_query_norm(qnorm)

    def count(self) -> int:
        return len(self.docnums)

    def search(self) -> SearchHits:
        score = self.scorer.score_value()
        return SearchHits(
            self.docnums, np.full(len(self.docnums), score, dtype=np.float64)
        )


class MultiTermSearcher(DisjunctionSearcher):
    """search_multi_term.go: disjunction over a term list (prefix/regexp/
    fuzzy/range expansions), min=0.  ``edit_distances`` applies the fuzzy
    per-candidate boost 1/(distance+1) (makeBatchSearchersBoosted,
    search_multi_term.go:179-203)."""

    def __init__(
        self,
        reader,
        terms: Sequence[str],
        field: str,
        boost: float,
        options,
        edit_distances: Optional[Sequence[int]] = None,
    ):
        if edit_distances is None:
            children = [
                TermSearcher(reader, t, field, boost, options)
                for t in terms
            ]
        else:
            children = [
                TermSearcher(
                    reader, t, field, boost / (d + 1), options
                )
                for t, d in zip(terms, edit_distances)
            ]
        super().__init__(children, min_match=0)
