"""Facets over matched docs (reference search/facet/*, SURVEY.md §2.10).

- terms facet: docvalue term counts over the matched set, top-N with
  missing/other bookkeeping (facet_builder_terms.go:34-140 semantics:
  total = matched docs with a value; other = total - sum(top terms))
- numeric-range facet: counts per [min,max) range (facet_builder_numeric.go)

Computed vectorized over the full matched docnum array using the columnar
docvalues; across partitions this is the partial-count-then-merge pattern
(FacetResults.Merge equivalent) -- here partitions are docvalue files.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np


def compute_facets(
    reader, docnums: np.ndarray, facet_requests: Dict[str, dict]
) -> Dict[str, dict]:
    fields = sorted({fr["field"] for fr in facet_requests.values()})
    dv = reader.docvalues_for(docnums, fields)
    out = {}
    for name, fr in facet_requests.items():
        values = dv[fr["field"]]
        if "numeric_ranges" in fr:
            out[name] = _numeric_range_facet(fr, values)
        else:
            out[name] = _terms_facet(fr, values)
    return out


def _terms_facet(fr: dict, values: List) -> dict:
    size = fr.get("size", 10)
    counts: Dict[str, int] = {}
    missing = 0
    for v in values:
        if v is None:
            missing += 1
        else:
            counts[str(v)] = counts.get(str(v), 0) + 1
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:size]
    total = len(values) - missing
    other = total - sum(c for _, c in ranked)
    return {
        "field": fr["field"],
        "total": total,
        "missing": missing,
        "other": other,
        "terms": [{"term": t, "count": c} for t, c in ranked],
    }


def _numeric_range_facet(fr: dict, values: List) -> dict:
    ranges = fr["numeric_ranges"]
    arr = np.array(
        [np.nan if v is None else float(v) for v in values], dtype=np.float64
    )
    missing = int(np.isnan(arr).sum())
    buckets = []
    covered = 0
    for r in ranges:
        lo = r.get("min", -np.inf)
        hi = r.get("max", np.inf)
        n = int(np.count_nonzero((arr >= lo) & (arr < hi)))
        covered += n
        buckets.append(
            {"name": r.get("name", f"[{lo},{hi})"), "min": r.get("min"),
             "max": r.get("max"), "count": n}
        )
    total = len(values) - missing
    return {
        "field": fr["field"],
        "total": total,
        "missing": missing,
        "other": max(0, total - covered),
        "numeric_ranges": buckets,
    }
