"""Top-N collection + the Index facade.

TopN semantics follow search/collector/topn.go:56-91 + the default sort
order [-_score, _id] (search_no_knn.go:111-117): descending score, ascending
external doc ID as tiebreak; pagination via from/size windowing.

Vectorized: np.partition finds the score boundary, only boundary candidates
have their external IDs fetched for exact tie-breaking.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field as dc_field
from typing import Dict, List, Optional

import numpy as np

from .query import Query, parse_query
from .reader import IndexReader, SearchOptions
from .searcher import SearchHits


@dataclass
class IndexMapping:
    """Minimal mapping (mapping/index.go role): field -> analyzer name +
    default search field."""

    default_field: str = "content"
    analyzers: Dict[str, str] = dc_field(default_factory=dict)
    scoring_model: str = "bm25"

    def analyzer_for(self, field: str) -> str:
        return self.analyzers.get(field, "standard")


@dataclass
class Hit:
    id: str
    score: float
    docnum: int


@dataclass
class SearchResult:
    total_hits: int
    max_score: float
    hits: List[Hit]
    took_ms: float

    def to_dict(self) -> dict:
        return {
            "total_hits": self.total_hits,
            "max_score": self.max_score,
            "hits": [
                {"id": h.id, "score": h.score} for h in self.hits
            ],
            "took_ms": self.took_ms,
        }


def collect_topn(
    reader: IndexReader, hits: SearchHits, size: int, from_: int
) -> SearchResult:
    t0 = time.perf_counter()
    n = len(hits.docnums)
    k = from_ + size
    if n == 0 or size <= 0 and from_ >= n:
        return SearchResult(n, 0.0, [], (time.perf_counter() - t0) * 1e3)
    scores = hits.scores
    max_score = float(scores.max()) if n else 0.0
    if n > k and k > 0:
        boundary = np.partition(scores, n - k)[n - k]
        cand = np.flatnonzero(scores >= boundary)
    else:
        cand = np.arange(n)
    cand_scores = scores[cand]
    cand_docs = hits.docnums[cand]
    ids = reader.doc_ids_for(cand_docs)
    order = sorted(
        range(len(cand)), key=lambda i: (-cand_scores[i], ids[i])
    )
    window = order[from_ : from_ + size]
    out = [
        Hit(id=ids[i], score=float(cand_scores[i]), docnum=int(cand_docs[i]))
        for i in window
    ]
    return SearchResult(n, max_score, out, (time.perf_counter() - t0) * 1e3)


class Index:
    """Open a built index for searching (index_impl.go Search equivalent)."""

    def __init__(self, index_dir: str, mapping: Optional[IndexMapping] = None):
        self.reader = IndexReader(index_dir)
        opts = self.reader.options
        self.mapping = mapping or IndexMapping(
            default_field=next(iter(opts["fields"])),
            analyzers={
                f: c["analyzer"] for f, c in opts["fields"].items()
            },
            scoring_model=opts.get("scoring_model", "bm25"),
        )

    @staticmethod
    def open(index_dir: str) -> "Index":
        return Index(index_dir)

    def search(self, request: dict) -> SearchResult:
        """request: {"query": {...}, "size": 10, "from": 0} (bleve
        SearchRequest shape; sort is fixed to [-_score, _id])."""
        q = request["query"]
        query = parse_query(q) if isinstance(q, dict) else q
        options = SearchOptions(scoring_model=self.mapping.scoring_model)
        searcher = query.searcher(self.reader, self.mapping, options)
        hits = searcher.search()
        return collect_topn(
            self.reader,
            hits,
            size=request.get("size", 10),
            from_=request.get("from", 0),
        )
