"""Facets over matched docs (reference search/facet/*, SURVEY.md §2.10).

- terms facet: docvalue term counts over the matched set, top-N with
  missing/other bookkeeping (facet_builder_terms.go:34-140 semantics:
  total = matched docs with a value; other = total - sum(top terms))
- numeric-range facet: counts per [min,max) range (facet_builder_numeric.go)

Counting is vectorized (pyarrow value_counts / numpy histogram masks).
Small match sets count on the driver over the columnar docvalues; large
match sets fan out one Ray task per docvalue file computing PARTIAL
counts that the driver merges before ranking -- the FacetResults.Merge
shape (search/facets_builder.go Merge), so top-N is exact because
truncation happens only after the merge."""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# above this many matched docs, fan facet counting out as Ray tasks
DISTRIBUTED_FACET_THRESHOLD = 200_000


def _value_nanos(v) -> float:
    """Best-effort conversion of a docvalue to epoch nanos (float; NaN on
    missing/unparseable).  Handles datetime/date objects, numpy datetime64,
    raw int nanos, and ISO strings."""
    import datetime as _dt

    if v is None:
        return np.nan
    if isinstance(v, (int, np.integer)):
        return float(v)
    if isinstance(v, np.datetime64):
        return float(v.astype("datetime64[ns]").astype(np.int64))
    if isinstance(v, _dt.datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=_dt.timezone.utc)
        epoch = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)
        delta = v - epoch
        return float(
            (delta.days * 86_400 + delta.seconds) * 1_000_000_000
            + delta.microseconds * 1_000
        )
    if isinstance(v, _dt.date):
        epoch = _dt.date(1970, 1, 1)
        return float((v - epoch).days * 86_400 * 1_000_000_000)
    if isinstance(v, str):
        from ..analysis.datetime_parsers import parse_iso

        n = parse_iso(v)
        return np.nan if n is None else float(n)
    return np.nan


def _validate_facet(fr: dict) -> None:
    """FacetRequest.Validate (search.go): ranges must carry at least one
    bound, names must be unique, and a facet is either numeric- or
    date-ranged, never both."""
    if "numeric_ranges" in fr and "date_ranges" in fr:
        raise ValueError(
            "facet can only contain numeric ranges or date ranges, "
            "not both"
        )
    names: set = set()
    for r in fr.get("numeric_ranges", []):
        rname = r.get("name")
        if rname in names:
            raise ValueError(
                f"numeric ranges contains duplicate name '{rname}'"
            )
        names.add(rname)
        if r.get("min") is None and r.get("max") is None:
            raise ValueError(
                "numeric range query must specify either min, max or "
                f"both for range name '{rname}'"
            )
    for r in fr.get("date_ranges", []):
        rname = r.get("name")
        if rname in names:
            raise ValueError(
                f"date ranges contains duplicate name '{rname}'"
            )
        names.add(rname)


def _normalize_date_ranges(facet_requests: Dict[str, dict]) -> Dict[str, dict]:
    """Parse date_ranges start/end strings to nanos bounds once, before
    (possibly distributed) counting (reference search.go dateTimeRange.
    ParseDates + facet_builder_datetime.go AddRange).  Range semantics are
    [start, end) like the reference's start<=t<end check."""
    from ..analysis.datetime_parsers import resolve_datetime_parser

    out = {}
    for name, fr in facet_requests.items():
        _validate_facet(fr)
        if "date_ranges" not in fr:
            out[name] = fr
            continue
        nranges = []
        for r in fr["date_ranges"]:
            # per-range parser override (AddDateTimeRangeStringWithParser,
            # search.go dateTimeRange) falling back to the facet-level
            # parser, then the reference's default QueryDateTimeParser
            pname = (
                r.get("datetime_parser")
                or fr.get("datetime_parser")
                or "dateTimeOptional"
            )
            parse = resolve_datetime_parser(pname)
            rname = r.get("name")
            if r.get("start") is None and r.get("end") is None:
                raise ValueError(
                    "date range query must specify either start, end or "
                    f"both for date range name '{rname}'"
                )
            lo = hi = None
            for which in ("start", "end"):
                v = r.get(which)
                if v is None:
                    continue
                ns = parse(v)
                if ns is None:
                    raise ValueError(
                        f"ParseDates err: error parsing {which} date "
                        f"'{v}' for date range name '{rname}': unable to "
                        "parse datetime with any of the layouts, using "
                        f"date time parser named {pname}"
                    )
                if which == "start":
                    lo = ns
                else:
                    hi = ns
            nranges.append({"name": rname, "lo": lo, "hi": hi,
                            "start": r.get("start"), "end": r.get("end")})
        out[name] = {**fr, "_date_nanos_ranges": nranges}
    return out


def compute_facets(
    reader, docnums: np.ndarray, facet_requests: Dict[str, dict]
) -> Dict[str, dict]:
    facet_requests = _normalize_date_ranges(facet_requests)
    if len(docnums) >= DISTRIBUTED_FACET_THRESHOLD:
        try:
            import ray

            if ray.is_initialized():
                return _compute_facets_distributed(
                    reader, docnums, facet_requests
                )
        except ImportError:
            pass
    fields = sorted({fr["field"] for fr in facet_requests.values()})
    dv = reader.docvalues_for(docnums, fields)
    out = {}
    for name, fr in facet_requests.items():
        fr = _attach_field_parser(reader, fr)
        values = dv[fr["field"]]
        partial = _partial_counts(fr, values)
        out[name] = _finalize_facet(fr, [partial])
    return out


def _attach_field_parser(reader, fr: dict) -> dict:
    """Date-range facets over a custom-format datetime FIELD must convert
    the stored docvalue strings with the field's own index-time parser
    (facet_builder_datetime.go reads the already-parsed index values; our
    docvalues keep the original strings)."""
    if "_date_nanos_ranges" not in fr or "_field_dt_parser" in fr:
        return fr
    fcfg = (reader.options.get("fields") or {}).get(fr["field"]) or {}
    spec = fcfg.get("datetime_parser")
    return {**fr, "_field_dt_parser": spec} if spec else fr


def _partial_counts(fr: dict, values: List) -> dict:
    """One partition's contribution: either term->count + missing, or
    per-range counts + missing (mergeable, un-truncated)."""
    if "numeric_ranges" in fr:
        arr = np.array(
            [np.nan if v is None else float(v) for v in values],
            dtype=np.float64,
        )
        missing = int(np.isnan(arr).sum())
        counts = []
        for r in fr["numeric_ranges"]:
            lo = r.get("min", -np.inf)
            hi = r.get("max", np.inf)
            counts.append(int(np.count_nonzero((arr >= lo) & (arr < hi))))
        return {"missing": missing, "n": len(values), "ranges": counts}
    if "_date_nanos_ranges" in fr:
        conv = _value_nanos
        if fr.get("_field_dt_parser"):
            from ..analysis.datetime_parsers import resolve_datetime_parser

            fparse = resolve_datetime_parser(fr["_field_dt_parser"])

            def conv(v):
                if isinstance(v, str):
                    ns = fparse(v)
                    return np.nan if ns is None else float(ns)
                return _value_nanos(v)

        arr = np.array([conv(v) for v in values], dtype=np.float64)
        missing = int(np.isnan(arr).sum())
        counts = []
        for r in fr["_date_nanos_ranges"]:
            lo = -np.inf if r["lo"] is None else r["lo"]
            hi = np.inf if r["hi"] is None else r["hi"]
            counts.append(int(np.count_nonzero((arr >= lo) & (arr < hi))))
        return {"missing": missing, "n": len(values), "ranges": counts}
    if any(isinstance(v, (list, tuple)) for v in values):
        # array-valued docvalues: each element counts once per doc
        # (facet_builder_terms.go over multi-value fields); a doc with
        # ZERO field terms (empty array) is missing, like the reference
        missing = sum(
            1
            for v in values
            if v is None or (isinstance(v, (list, tuple)) and not v)
        )
        counts2: Dict[str, int] = {}
        nv = 0
        for v in values:
            if v is None:
                continue
            for e in v if isinstance(v, (list, tuple)) else (v,):
                counts2[str(e)] = counts2.get(str(e), 0) + 1
                nv += 1
        # total counts every visited VALUE (UpdateVisitor total++ per
        # term), so multi-valued docs contribute once per element
        return {
            "missing": missing, "n": len(values), "nv": nv,
            "terms": counts2,
        }
    try:
        arr = pa.array(values)
        missing = arr.null_count
        if not pa.types.is_string(arr.type):
            arr = pc.cast(arr, pa.string())
        vc = pc.value_counts(arr.drop_null())
        counts = dict(
            zip(vc.field("values").to_pylist(), vc.field("counts").to_pylist())
        )
    except (pa.ArrowInvalid, pa.ArrowTypeError):
        # mixed-type docvalues: fall back to str() keys
        counts = {}
        missing = 0
        for v in values:
            if v is None:
                missing += 1
            else:
                counts[str(v)] = counts.get(str(v), 0) + 1
    pref = fr.get("term_prefix")
    pat = fr.get("term_pattern")
    if pref or pat:
        # facet_builder_terms.go UpdateVisitor: total counts EVERY visited
        # value; only matching terms enter the counts map
        import re as _re

        rx = _re.compile(pat) if pat else None
        counts = {
            t: c
            for t, c in counts.items()
            if (not pref or t.startswith(pref))
            and (rx is None or rx.search(t))
        }
    return {"missing": missing, "n": len(values), "terms": counts}


def _finalize_facet(fr: dict, partials: List[dict]) -> dict:
    """Single-builder Result() semantics (facet_builder_terms.go:107-141,
    facet_builder_numeric.go:109-140): total counts every visited VALUE
    (per array element for multi-valued fields), buckets/terms sort
    (count desc, name asc) and trim to size, other = total - kept."""
    missing = sum(p["missing"] for p in partials)
    # per-element visited-value count when partials carry it (multi-value
    # fields); docs-with-value otherwise (identical for scalar fields)
    total = sum(p.get("nv", p["n"] - p["missing"]) for p in partials)
    size = fr.get("size", 10)
    if "numeric_ranges" in fr or "_date_nanos_ranges" in fr:
        if "numeric_ranges" in fr:
            key = "numeric_ranges"
            buckets = []
            for r in fr["numeric_ranges"]:
                lo = r.get("min", -np.inf)
                hi = r.get("max", np.inf)
                buckets.append(
                    {"name": r.get("name", f"[{lo},{hi})"),
                     "min": r.get("min"), "max": r.get("max"), "count": 0}
                )
        else:
            key = "date_ranges"
            buckets = [
                {"name": r["name"], "start": r["start"], "end": r["end"],
                 "count": 0}
                for r in fr["_date_nanos_ranges"]
            ]
        for p in partials:
            for i, c in enumerate(p["ranges"]):
                buckets[i]["count"] += c
        buckets.sort(key=lambda b: (-b["count"], b["name"]))
        kept = buckets[:size]
        return {
            "field": fr["field"],
            "total": total,
            "missing": missing,
            "other": total - sum(b["count"] for b in kept),
            key: kept,
        }
    counts: Dict[str, int] = {}
    for p in partials:
        for t, c in p["terms"].items():
            counts[t] = counts.get(t, 0) + c
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:size]
    other = total - sum(c for _, c in ranked)
    return {
        "field": fr["field"],
        "total": total,
        "missing": missing,
        "other": other,
        "terms": [{"term": t, "count": c} for t, c in ranked],
    }


def _compute_facets_distributed(
    reader, docnums: np.ndarray, facet_requests: Dict[str, dict]
) -> Dict[str, dict]:
    """Fan out one Ray task per docvalue file over its slice of the
    (sorted) match set; each task returns partial counts, merged here.
    Partitioning assumption: docvalue files hold disjoint docnum ranges
    (they are written per analyze sub-batch)."""
    import ray

    fields = sorted({fr["field"] for fr in facet_requests.values()})
    files = reader._dv_files()
    sorted_dn = np.sort(docnums)
    reqs = {
        name: _attach_field_parser(reader, fr)
        for name, fr in facet_requests.items()
    }

    @ray.remote
    def _facet_task(path: str, dn_slice: np.ndarray) -> Dict[str, dict]:
        import pyarrow.parquet as _pq

        have = _pq.ParquetFile(path).schema_arrow.names
        t = _pq.read_table(
            path, columns=["docnum"] + [f for f in fields if f in have]
        ).sort_by("docnum")
        nums = np.asarray(t["docnum"], dtype=np.int64)
        if len(nums) == 0:
            nums = np.array([-1], dtype=np.int64)
        j = np.searchsorted(nums, dn_slice)
        j_cl = np.minimum(j, len(nums) - 1)
        hit = nums[j_cl] == dn_slice
        src = j_cl[hit]
        n_miss_file = int(len(dn_slice) - hit.sum())
        out = {}
        for name, fr in reqs.items():
            f = fr["field"]
            if f in t.column_names:
                vals = t[f].take(pa.array(src)).to_pylist()
            else:
                vals = [None] * len(src)
            # docnums that matched the query but have no dv row count as
            # missing for every facet
            p = _partial_counts(fr, vals)
            p["missing"] += n_miss_file
            p["n"] += n_miss_file
            out[name] = p
        return out

    futures = []
    covered = np.zeros(len(sorted_dn), dtype=bool)
    for path, lo, hi in files:
        a = np.searchsorted(sorted_dn, lo, side="left")
        b = np.searchsorted(sorted_dn, hi, side="right")
        if b > a:
            futures.append(_facet_task.remote(path, sorted_dn[a:b]))
            covered[a:b] = True
    n_uncovered = int((~covered).sum())
    partial_lists: Dict[str, List[dict]] = {name: [] for name in reqs}
    for res in ray.get(futures):
        for name, p in res.items():
            partial_lists[name].append(p)
    if n_uncovered:
        for name in reqs:
            partial_lists[name].append(
                {"missing": n_uncovered, "n": n_uncovered,
                 **({"ranges": [0] * len(
                        reqs[name].get("numeric_ranges")
                        or reqs[name]["_date_nanos_ranges"])}
                    if "numeric_ranges" in reqs[name]
                    or "_date_nanos_ranges" in reqs[name]
                    else {"terms": {}})}
            )
    return {
        name: _finalize_facet(fr, partial_lists[name])
        for name, fr in reqs.items()
    }
