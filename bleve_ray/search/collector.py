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
from typing import Dict, List, Optional, Tuple

import numpy as np

from .query import Query, parse_query, validate_query
from .reader import IndexReader, SearchOptions
from .searcher import SearchHits


@dataclass
class IndexMapping:
    """Minimal mapping (mapping/index.go role): field -> analyzer name +
    default search field."""

    default_field: str = "content"
    analyzers: Dict[str, str] = dc_field(default_factory=dict)
    # fallback for fields without an explicit analyzer entry (the "_all"
    # composite analyzes queries with the mapping default, like the
    # reference's analyzerNameForPath)
    default_analyzer: str = "standard"
    scoring_model: str = "bm25"
    # query-time synonym expansion (SynonymDefinition, index.go:358-390)
    synonyms: Optional[object] = None
    # index-time thesaurus segments: source name -> ThesaurusReader
    # (snapshot_index_thes.go), plus the field->source association
    # (mapping/field.go:85 SynonymSource, mapping/index.go:54
    # DefaultSynonymSource)
    thesauri: Dict[str, object] = dc_field(default_factory=dict)
    synonym_sources: Dict[str, str] = dc_field(default_factory=dict)
    default_synonym_source: str = ""

    def analyzer_for(self, field: str) -> str:
        return self.analyzers.get(field, self.default_analyzer)

    def synonym_source_for(self, field: str) -> str:
        return (
            self.synonym_sources.get(field)
            or self.default_synonym_source
        )

    def set_synonyms(self, definitions, analyzer=None) -> None:
        from .synonyms import Thesaurus

        self.synonyms = Thesaurus.from_definitions(definitions, analyzer)


@dataclass
class Hit:
    id: str
    score: float
    docnum: int
    fields: Optional[Dict] = None
    fragments: Optional[Dict] = None
    expl: Optional[Dict] = None  # explanation tree ("explain": true)
    # clause index -> pre-coord score (DisjunctionQuery score breakdown)
    score_breakdown: Optional[Dict] = None
    locations: Optional[Dict] = None  # {field:{term:[{pos,start,end}]}}


@dataclass
class SearchResult:
    total_hits: int
    max_score: float
    hits: List[Hit]
    took_ms: float
    facets: Optional[Dict] = None
    total_relation: str = "eq"  # "gte" when top-k pruning skipped docs
    # alias scatter status (SearchStatus, index_alias_impl.go
    # MultiSearch): {"total", "successful", "failed", "errors":{name:msg}}
    status: Optional[Dict] = None

    def merge(self, other: "SearchResult") -> None:
        """search.go SearchResult.Merge (TestSearchResultMerge,
        TestSearchResultFacetsMerge): hits append, totals and status sum,
        max_score takes the max, facets merge by name with per-term /
        per-bucket counts summed (Fixup is the caller's separate step,
        as in the reference)."""
        self.hits = list(self.hits) + list(other.hits)
        self.total_hits += other.total_hits
        self.max_score = max(self.max_score, other.max_score)
        if other.status is not None:
            if self.status is None:
                self.status = {"total": 0, "successful": 0, "failed": 0,
                               "errors": {}}
            for k in ("total", "successful", "failed"):
                self.status[k] = (
                    self.status.get(k, 0) + other.status.get(k, 0)
                )
            if other.status.get("errors"):
                self.status.setdefault("errors", {}).update(
                    other.status["errors"]
                )
        if other.facets:
            if not self.facets:
                self.facets = {}
            for name, fr in other.facets.items():
                mine = self.facets.get(name)
                if mine is None:
                    self.facets[name] = fr
                    continue
                for k in ("total", "missing", "other"):
                    mine[k] = mine.get(k, 0) + fr.get(k, 0)
                if "terms" in fr or "terms" in mine:
                    counts = {
                        t["term"]: t["count"] for t in mine.get("terms", [])
                    }
                    for t in fr.get("terms", []):
                        counts[t["term"]] = (
                            counts.get(t["term"], 0) + t["count"]
                        )
                    mine["terms"] = [
                        {"term": t, "count": c}
                        for t, c in sorted(counts.items(),
                                           key=lambda kv: (-kv[1], kv[0]))
                    ]
                else:
                    key = ("numeric_ranges"
                           if "numeric_ranges" in (fr | mine)
                           else "date_ranges")
                    buckets = {b["name"]: dict(b)
                               for b in mine.get(key, [])}
                    for b in fr.get(key, []):
                        e = buckets.get(b["name"])
                        if e is None:
                            buckets[b["name"]] = dict(b)
                        else:
                            e["count"] += b["count"]
                    mine[key] = sorted(
                        buckets.values(),
                        key=lambda b: (-b["count"], b["name"]),
                    )

    def to_dict(self) -> dict:
        d = {
            "total_hits": self.total_hits,
            "max_score": self.max_score,
            "hits": [],
            "took_ms": self.took_ms,
        }
        if self.total_relation != "eq":
            d["total_relation"] = self.total_relation
        if self.status is not None:
            d["status"] = self.status
        for h in self.hits:
            hd = {"id": h.id, "score": h.score}
            if h.fields is not None:
                hd["fields"] = h.fields
            if h.fragments is not None:
                hd["fragments"] = h.fragments
            if h.expl is not None:
                hd["explanation"] = h.expl
            if h.locations is not None:
                hd["locations"] = h.locations
            if h.score_breakdown is not None:
                hd["score_breakdown"] = h.score_breakdown
            d["hits"].append(hd)
        if self.facets is not None:
            d["facets"] = self.facets
        return d


def collect_topn(
    reader: IndexReader,
    hits: SearchHits,
    size: int,
    from_: int,
    sort: Optional[List[str]] = None,
) -> SearchResult:
    t0 = time.perf_counter()
    n = len(hits.docnums)
    k = from_ + size
    if n == 0 or size <= 0 and from_ >= n:
        return SearchResult(n, 0.0, [], (time.perf_counter() - t0) * 1e3)
    scores = hits.scores
    max_score = float(scores.max()) if n else 0.0
    if sort and sort != ["-_score", "_id"]:
        return _collect_sorted(reader, hits, size, from_, sort, t0)
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


def _collect_sorted(
    reader, hits: SearchHits, size: int, from_: int, sort: List, t0
) -> SearchResult:
    """Custom sort order (search/sort.go SortOrder): string keys are
    '_score', '_id' or a docvalue field name with '-' prefix for
    descending; OBJECT entries mirror ParseSearchSortObj
    (sort.go:53-110): {"by": "id"|"score"|"field"|"geo_distance",
    "desc": bool, "field": ..., "location": ..., "unit": ...}.  Missing
    values sort last."""
    n = len(hits.docnums)
    key_for, _ = _build_sort_machinery(reader, hits, sort)
    order = sorted(range(n), key=key_for)
    window = order[from_ : from_ + size]
    ids = None
    win_ids = reader.doc_ids_for(hits.docnums[window])
    out = [
        Hit(id=win_ids[j], score=float(hits.scores[i]), docnum=int(hits.docnums[i]))
        for j, i in enumerate(window)
    ]
    max_score = float(hits.scores.max()) if n else 0.0
    return SearchResult(n, max_score, out, (time.perf_counter() - t0) * 1e3)


def _build_sort_machinery(reader, hits: SearchHits, sort: List):
    """(key_for, cursor_key) for a sort order: key_for(i) builds hit i's
    comparable key tuple; cursor_key(values) builds the SAME-shaped tuple
    from search_after/search_before cursor values."""
    n = len(hits.docnums)
    # normalize entries -> (name, desc, precomputed values, missing_first)
    entries = []
    for s in sort:
        if isinstance(s, dict):
            by = s.get("by")
            desc = bool(s.get("desc", False))
            missing_first = False
            if "missing" in s:
                # SortFieldMissing (sort.go:135-143,370-378)
                if s["missing"] not in ("first", "last"):
                    raise ValueError(
                        f"unknown sort field missing: {s['missing']}"
                    )
                missing_first = s["missing"] == "first"
            if by == "id":
                entries.append(("_id", desc, None, False, "auto", "default"))
            elif by == "score":
                entries.append(("_score", desc, None, False, "auto",
                                "default"))
            elif by == "field":
                entries.append((s["field"], desc, None, missing_first,
                                s.get("type", "auto"),
                                s.get("mode", "default")))
            elif by == "geo_distance":
                # SortGeoDistance (sort.go:700-760): haversine from the
                # query location to each hit's geo docvalue, in `unit`
                from ..index.geo import haversin_km, parse_distance_km
                from .query import _geo_values

                loc = s.get("location")
                if isinstance(loc, dict):
                    lon, lat = float(loc["lon"]), float(loc["lat"])
                else:
                    lon, lat = float(loc[0]), float(loc[1])
                glon, glat = _geo_values(
                    reader, s["field"], hits.docnums
                )
                dist = haversin_km(lon, lat, glon, glat)
                unit = s.get("unit")
                if unit:
                    dist = dist / parse_distance_km("1" + unit)
                entries.append(("_computed", desc, dist, missing_first,
                                "number", "default"))
            else:
                raise ValueError(f"search sort must specify by: {s!r}")
        else:
            entries.append((s.lstrip("-"), s.startswith("-"), None, False,
                            "auto", "default"))
    field_keys = [
        name
        for name, _, pre, _, _, _ in entries
        if pre is None and name not in ("_score", "_id")
    ]
    dv = reader.docvalues_for(hits.docnums, field_keys) if field_keys else {}
    ids = None
    if any(name == "_id" for name, _, _, _, _, _ in entries):
        ids = reader.doc_ids_for(hits.docnums)

    def _mv(v, mode):
        """Multi-valued docvalue -> one comparable (SortField Mode,
        sort.go SortFieldMode min/max; default = first value)."""
        if isinstance(v, (list, tuple)) and not isinstance(v, str):
            vals = [x for x in v if x is not None]
            if not vals:
                return None
            if mode == "min":
                return min(vals)
            if mode == "max":
                return max(vals)
            return vals[0]
        return v

    def key_for(i: int):
        parts = []
        for name, desc, pre, missing_first, _stype, mode in entries:
            if name == "_score":
                v = hits.scores[i]
                parts.append(-v if desc else v)
            elif name == "_id":
                iv = ids[i]
                parts.append(_RevStr(iv) if desc else iv)
            else:
                if pre is not None:
                    v = float(pre[i])
                    missing = v != v  # NaN = no geo point stored
                else:
                    v = _mv(dv[name][i], mode)
                    missing = v is None
                rank = not missing if missing_first else missing
                if desc:
                    parts.append((rank, _Rev(v) if not missing else None))
                else:
                    parts.append((rank, v if not missing else None))
        return tuple(parts)

    def _coerce_cursor(v, stype, col):
        """Cursor values arrive as strings (the reference's SearchAfter
        is []string); coerce to the sort key's comparable type so the
        tuple comparison never mixes str with float
        (TestSearchRequestValidatePagination)."""
        sample = next((x for x in (col or ()) if x is not None), None)
        if stype == "number" or isinstance(sample, (int, float)):
            return float(v)
        if stype == "date" and isinstance(sample, (int, float)):
            from ..analysis.datetime_parsers import resolve_datetime_parser

            return float(resolve_datetime_parser("dateTimeOptional")(str(v)))
        return v

    def cursor_key(values):
        if len(values) != len(entries):
            raise ValueError(
                "search after must have same size as sort order"
            )
        parts = []
        for (name, desc, pre, missing_first, stype, _mode), v in zip(
                entries, values):
            if name == "_score":
                x = float(v)
                parts.append(-x if desc else x)
            elif name == "_id":
                s_ = str(v)
                parts.append(_RevStr(s_) if desc else s_)
            else:
                if name == "_computed" or pre is not None:
                    v = float(v) if v is not None else None
                elif v is not None:
                    v = _coerce_cursor(v, stype, dv.get(name))
                missing = v is None
                rank = not missing if missing_first else missing
                if desc:
                    parts.append((rank, _Rev(v) if not missing else None))
                else:
                    parts.append((rank, v if not missing else None))
        return tuple(parts)

    return key_for, cursor_key


def _apply_cursor_sorted(
    reader, hits: SearchHits, sort: List, cursor, before: bool
) -> SearchHits:
    """search_after/search_before under a CUSTOM sort order: keep hits
    whose sort key is strictly after (or before) the cursor's key tuple
    (the reference's seeded-collector semantics generalized; cursor
    arity must match the sort arity, search.go Validate)."""
    key_for, cursor_key = _build_sort_machinery(reader, hits, sort)
    ck = cursor_key(list(cursor))
    n = len(hits.docnums)
    if before:
        keep = [i for i in range(n) if key_for(i) < ck]
    else:
        keep = [i for i in range(n) if ck < key_for(i)]
    keep = np.asarray(keep, dtype=np.int64)
    return SearchHits(hits.docnums[keep], hits.scores[keep])


class _Rev:
    """Reverses comparison for descending sort of arbitrary values."""

    __slots__ = ("v",)

    def __init__(self, v):
        self.v = v

    def __lt__(self, other):
        return other.v < self.v

    def __eq__(self, other):
        return self.v == other.v


class _RevStr(_Rev):
    pass


def _apply_search_before(reader, hits: SearchHits, before) -> SearchHits:
    """search_before (index_impl.go SearchBefore, reversed execution): keep
    only docs strictly BEFORE (score, id) in the default order."""
    b_score = float(before[0])
    b_id = str(before[1]) if len(before) > 1 else ""
    gt = hits.scores > b_score
    ties = np.flatnonzero(hits.scores == b_score)
    if len(ties):
        tie_ids = reader.doc_ids_for(hits.docnums[ties])
        for j, tid in zip(ties, tie_ids):
            if tid < b_id:
                gt[j] = True
    return SearchHits(hits.docnums[gt], hits.scores[gt])


def _apply_search_after(reader, hits: SearchHits, after) -> SearchHits:
    """search_after for the default [-_score, _id] order
    (index_impl.go:776-782 seeded-collector semantics): keep only docs
    strictly after (after_score, after_id)."""
    after_score = float(after[0])
    after_id = str(after[1]) if len(after) > 1 else ""
    lt = hits.scores < after_score
    ties = np.flatnonzero(hits.scores == after_score)
    if len(ties):
        tie_ids = reader.doc_ids_for(hits.docnums[ties])
        for j, tid in zip(ties, tie_ids):
            if tid > after_id:
                lt[j] = True
    return SearchHits(hits.docnums[lt], hits.scores[lt])


def _knn_vector(kr: dict):
    """KNN clause vector: "vector", or "vector_base64" decoded as
    little-endian float32 bytes (document.DecodeVector,
    field_vector_base64.go:115-131)."""
    if kr.get("vector") is not None:
        vec = kr["vector"]
        if hasattr(vec, "__len__") and len(vec) and not hasattr(vec, "dtype"):
            # untyped JSON input: validate/coerce like ingestion does
            # (mapping_vectors.go processVector semantics)
            from ..index.vectors import process_vector

            dims = len(vec[0]) if hasattr(vec[0], "__len__") and not isinstance(
                vec[0], (str, bytes)) else len(vec)
            out, ok = process_vector(vec, dims)
            if not ok:
                raise ValueError("knn clause vector is not numeric")
            return out
        return vec
    enc = kr.get("vector_base64")
    if not enc:
        raise ValueError("knn clause needs vector or vector_base64")
    import base64

    raw = base64.standard_b64decode(enc)
    if len(raw) % 4 != 0 or not raw:
        raise ValueError("decoded byte array not divisible by 4")
    return np.frombuffer(raw, dtype="<f4").astype(np.float64)


_SYNONYMS_INTERNAL_KEY = "_synonym_definitions"


def _apply_knn_operator(request: dict, sources) -> None:
    """knn_operator (search_knn.go:272-273 + finalizeKNNResults:469-485):
    "and" keeps knn contributions only for docs present in EVERY knn
    clause's top-k (hits whose ScoreBreakdown covers all clauses);
    "or"/default keeps the union.  sources[0] is the FTS ranking and is
    never filtered."""
    op = request.get("knn_operator") or "or"
    if op not in ("and", "or"):
        raise ValueError("knn_operator must be either 'and' / 'or'")
    if op != "and" or len(sources) <= 2:
        return
    common = set(sources[1][0])
    for ids, _ in sources[2:]:
        common &= set(ids)
    for si in range(1, len(sources)):
        ids, scores = sources[si]
        keep = [j for j, d in enumerate(ids) if d in common]
        sources[si] = ([ids[j] for j in keep], scores[keep])


class Index:
    """Open a built index for searching (index_impl.go Search equivalent)."""

    def __init__(self, index_dir: str, mapping: Optional[IndexMapping] = None):
        self._closed = False
        self.reader = IndexReader(index_dir)
        opts = self.reader.options
        self.mapping = mapping or IndexMapping(
            # with the _all composite enabled the default search field is
            # "_all", like the reference (mapping/index.go
            # defaultField); otherwise the first mapped field
            default_field=(
                "_all" if opts.get("enable_all_field")
                else next(iter(opts["fields"]))
            ),
            analyzers={
                f: c["analyzer"] for f, c in opts["fields"].items()
            },
            default_analyzer=opts.get("default_analyzer", "standard"),
            scoring_model=opts.get("scoring_model", "bm25"),
        )
        if mapping is None:
            self._load_persisted_synonyms()
        self._load_thesauri()

    def _load_thesauri(self) -> None:
        """Open a ThesaurusReader per source committed in the manifest
        (index-time synonym segments, index/thesaurus.py)."""
        from ..index.thesaurus import ThesaurusReader

        man = self.reader.manifest
        for source in getattr(man, "thesaurus", {}) or {}:
            self.mapping.thesauri[source] = ThesaurusReader(
                self.reader.index_dir, man, source
            )

    def _load_persisted_synonyms(self) -> None:
        """Synonym sources persist WITH the index (reference
        index.go:358-390 indexes SynonymDefinitions into the index; here
        the thesaurus lives in the manifest's internal KV) and re-apply on
        every open."""
        import json as _json

        raw = self.reader.manifest.internal.get(_SYNONYMS_INTERNAL_KEY)
        if not raw:
            return
        try:
            payload = _json.loads(raw)
        except ValueError:
            return
        analyzer = None
        if payload.get("analyzer"):
            from ..analysis.analyzers import analyzer_named

            analyzer = analyzer_named(payload["analyzer"])
        self.mapping.set_synonyms(payload.get("definitions", []), analyzer)

    def define_synonyms(
        self, definitions, analyzer_name: str = ""
    ) -> None:
        """Persist synonym definitions into the index (epoch-committed
        internal KV) and apply them to the live mapping immediately."""
        import json as _json

        self.set_internal(
            _SYNONYMS_INTERNAL_KEY,
            _json.dumps(
                {"definitions": list(definitions), "analyzer": analyzer_name}
            ),
        )
        analyzer = None
        if analyzer_name:
            from ..analysis.analyzers import analyzer_named

            analyzer = analyzer_named(analyzer_name)
        self.mapping.set_synonyms(definitions, analyzer)

    def index_synonym(
        self,
        doc_id: str,
        collection: str,
        definition: dict,
        analyzer_name: str = "",
    ) -> None:
        """Index one synonym definition DOCUMENT into a thesaurus segment
        (reference index_impl.go:336 IndexSynonym): re-indexing the same
        id replaces its definition; the segment commits a manifest epoch."""
        from ..index.thesaurus import ThesaurusReader, add_synonym_documents

        man = add_synonym_documents(
            self.reader.index_dir,
            collection,
            [(doc_id, definition)],
            analyzer_name,
            man=self.reader.manifest,
        )
        self.reader.manifest = man
        self.mapping.thesauri[collection] = ThesaurusReader(
            self.reader.index_dir, man, collection
        )

    def delete_synonym(self, doc_id: str, collection: str) -> None:
        """Tombstone a synonym definition document."""
        from ..index.thesaurus import (
            ThesaurusReader,
            delete_synonym_document,
        )

        man = delete_synonym_document(
            self.reader.index_dir,
            collection,
            doc_id,
            man=self.reader.manifest,
        )
        self.reader.manifest = man
        self.mapping.thesauri[collection] = ThesaurusReader(
            self.reader.index_dir, man, collection
        )

    @staticmethod
    def open(index_dir: str) -> "Index":
        return Index(index_dir)

    # --- Index interface parity (reference index.go Index) --------------

    def doc_count(self) -> int:
        return self.reader.doc_count()

    # --- InsightsIndex (reference index.go:397-403) ---------------------

    def term_frequencies(
        self, field: str, limit: int = 10, descending: bool = True
    ):
        """InsightsIndex.TermFrequencies: the field's top terms by
        document frequency, (term, df) pairs ordered by (df desc, term
        asc) -- the search_knn_test.go TestIndexInsightsTermFrequencies
        ordering.  descending=False returns the rarest terms instead."""
        d = self.reader.dictionary(field)
        if descending:
            ranked = sorted(d, key=lambda td: (-td[1], td[0]))
        else:
            ranked = sorted(d, key=lambda td: (td[1], td[0]))
        return [(t, int(df)) for t, df in ranked[:limit]]

    def centroid_cardinalities(
        self, field: str, limit: int = 10, descending: bool = True
    ):
        """InsightsIndex.CentroidCardinalities: per-IVF-cell member
        counts for a vector field, from the knn sidecar's partition
        METADATA only (no vector decode).  Requires a current-epoch
        sidecar (bleve_ray.index.knn_ivf.build_knn_ivf)."""
        import glob as _glob
        import os as _os

        import pyarrow.parquet as _pq

        from ..index.knn_ivf import load_knn_ivf

        ivf = load_knn_ivf(self.reader, field)
        if ivf is None:
            raise ValueError(
                f"no current-epoch IVF sidecar for field {field!r}; "
                "build one with build_knn_ivf"
            )
        entries = []
        for cdir in _glob.glob(_os.path.join(ivf.dir, "list_id=*")):
            try:
                cell = int(_os.path.basename(cdir).split("=", 1)[1])
            except ValueError:
                continue
            n = 0
            for f in _glob.glob(_os.path.join(cdir, "*.parquet")):
                n += _pq.ParquetFile(f).metadata.num_rows
            entries.append(
                {
                    "centroid": cell,
                    "cardinality": int(n),
                    "index": f"{field}/list_id={cell}",
                }
            )
        entries.sort(
            key=lambda e: (
                -e["cardinality"] if descending else e["cardinality"],
                e["centroid"],
            )
        )
        return entries[:limit]

    def fields(self):
        """Indexed field names (index.go Fields())."""
        return sorted(self.reader.options["fields"])

    def document(self, doc_id: str):
        """Stored/docvalue field values for one external id (index.go
        Document(); None when the id is unknown).  Returns
        {"id": ..., "fields": {field: value}} over the columns the index
        persisted (docvalue_fields + store_fields)."""
        import numpy as np

        dn = self.reader.docnums_for_ids([doc_id])
        if len(dn) == 0:
            return None
        cols = sorted(
            set(self.reader.options.get("docvalue_fields", []))
            | set(self.reader.options.get("store_fields", []))
        )
        dv = (
            self.reader.docvalues_for(np.asarray(dn[:1], dtype=np.int64), cols)
            if cols
            else {}
        )
        return {
            "id": doc_id,
            "fields": {f: dv[f][0] for f in cols if f in dv},
        }

    def index(self, doc_id: str, doc: Dict) -> None:
        """index.go Index(id, data): single-doc upsert (a 1-row Batch).
        Empty ids are rejected (index.go ErrorEmptyID)."""
        import pyarrow as pa

        if not doc_id:
            raise ValueError("document ID cannot be empty")
        ids = self.reader.options.get("doc_id_fields") or ["doc_id"]
        if len(ids) != 1:
            raise ValueError(
                "Index(id, doc) needs a single-column doc id mapping; "
                "use batch() with explicit id columns instead"
            )
        row = dict(doc)
        row[ids[0]] = doc_id
        self.batch(upserts=pa.table({k: [v] for k, v in row.items()}))

    def delete(self, doc_id: str) -> None:
        """index.go Delete(id); empty ids rejected (ErrorEmptyID)."""
        if not doc_id:
            raise ValueError("document ID cannot be empty")
        self.batch(deletes=[doc_id])

    def batch(self, upserts=None, deletes=None) -> None:
        """index.go Batch: tombstone deletes + index upserts as an
        incremental partition (mutate.apply_batch), then reopen the
        reader at the new epoch so this handle serves the new state."""
        from ..index.mutate import apply_batch

        apply_batch(self.reader.index_dir, upserts=upserts, deletes=deletes)
        self.reopen()

    def reopen(self) -> None:
        """Refresh this handle to the latest committed epoch."""
        self.reader = IndexReader(self.reader.index_dir)

    def field_dict(self, field: str):
        """index.go FieldDict: sorted (term, df) pairs."""
        return self.reader.dictionary(field)

    def field_dict_prefix(self, field: str, prefix: str):
        return self.reader.terms_with_prefix(field, prefix)

    def field_dict_range(self, field: str, start: str, end: str):
        return self.reader.terms_in_range(field, start, end)

    def term_frequencies(self, field: str, limit: int = 10,
                         descending: bool = True):
        """index.go TermFrequencies insights API: (term, df) pairs
        ordered by document frequency."""
        d = self.reader.dictionary(field)
        key = (
            (lambda td: (-td[1], td[0]))
            if descending
            else (lambda td: (td[1], td[0]))
        )
        return sorted(d, key=key)[:limit]

    def advanced(self):
        """index.go Advanced(): the underlying index reader."""
        return self.reader

    def get_mapping(self):
        """index.go Mapping()."""
        return self.mapping

    def stats_map(self):
        """index.go StatsMap / IndexStat: query-side counters + manifest
        stats."""
        out = dict(self.reader.stats())
        out["doc_count"] = self.reader.doc_count()
        out["epoch"] = self.reader.manifest.epoch
        out["segments"] = len(self.reader.manifest.segments)
        return out

    def close(self) -> None:
        """index.go Close: release cached segment readers; subsequent
        operations raise like the reference's ErrorIndexClosed
        (TestClosedIndex)."""
        self._closed = True
        self.reader._seg_readers.clear()
        self.reader._posting_cache.clear()

    @property
    def name(self) -> str:
        return getattr(self, "_name", self.reader.index_dir)

    def set_name(self, name: str) -> None:
        self._name = name

    def get_internal(self, key: str):
        """index.go GetInternal: app-metadata KV stored in the manifest."""
        from ..index import manifest as manifest_mod

        man = manifest_mod.load(self.reader.index_dir)
        return man.internal.get(key) if man else None

    def set_internal(self, key: str, value: str) -> None:
        """index.go SetInternal: epoch-committed (rollback restores)."""
        from ..index import manifest as manifest_mod

        man = manifest_mod.load(self.reader.index_dir)
        man.internal[key] = value
        manifest_mod.commit(self.reader.index_dir, man)

    def delete_internal(self, key: str) -> None:
        from ..index import manifest as manifest_mod

        man = manifest_mod.load(self.reader.index_dir)
        man.internal.pop(key, None)
        manifest_mod.commit(self.reader.index_dir, man)

    def _validate_request(self, request: dict) -> None:
        """SearchRequest.Validate equivalent (search.go:324-355 +
        validatePagination): reject contradictory paging options up front."""
        if request.get("search_after") is not None and request.get(
            "search_before"
        ) is not None:
            raise ValueError(
                "cannot use search after and search before together"
            )
        for key in ("search_after", "search_before"):
            if request.get(key) is not None and request.get("from", 0) != 0:
                raise ValueError(
                    f"cannot use {key.replace('_', ' ')} with from !=0"
                )
        if request.get("size", 10) < 0 or request.get("from", 0) < 0:
            raise ValueError("size and from must be non-negative")
        if request.get("score") in ("rrf", "rsf") and (
            request.get("search_after") is not None
            or request.get("search_before") is not None
        ):
            raise ValueError(
                "cannot use search after or search before with score fusion"
            )
        self._validate_pagination_values(request)

    def _validate_pagination_values(self, request: dict) -> None:
        """validatePagination (search.go TestSearchRequestValidatePagination):
        each search_after / search_before value must parse under its sort
        key's type — number -> float, date -> RFC3339-ish datetime,
        geo_distance -> float — so cursor typos fail loudly instead of
        corrupting the cursor comparison."""
        sort = request.get("sort")
        for key in ("search_after", "search_before"):
            vals = request.get(key)
            if vals is None or not sort:
                continue
            label = key.replace("_", " ")
            for so, v in zip(sort, vals):
                if not isinstance(so, dict):
                    continue
                typ = so.get("type", "auto")
                if so.get("by") == "geo_distance":
                    typ = "number"
                field = so.get("field", "")
                if typ == "number":
                    try:
                        float(v)
                    except (TypeError, ValueError):
                        raise ValueError(
                            f"invalid {label} value for sort field "
                            f"'{field}': '{v}'. not parseable as a number"
                        )
                elif typ == "date":
                    from ..analysis.datetime_parsers import (
                        resolve_datetime_parser,
                    )

                    try:
                        parsed = resolve_datetime_parser(
                            "dateTimeOptional")(str(v))
                    except Exception:
                        parsed = None
                    if parsed is None:
                        raise ValueError(
                            f"invalid {label} value for sort field "
                            f"'{field}': '{v}'. not parseable as a datetime"
                        )

    def _expand_fields(self, want_fields):
        """The special field "*" returns every retrievable field
        (search.go:53 'A special field named "*"'): here the stored +
        docvalue columns of the live mapping."""
        if "*" not in (want_fields or []):
            return want_fields or []
        opts = self.reader.options
        return sorted(
            set(opts.get("store_fields", []))
            | set(opts.get("docvalue_fields", []))
        )

    def _fill_location_offsets(self, hits) -> None:
        """Fill byte start/end offsets into hit locations by re-analyzing
        the STORED field text of the returned page only.

        The index stores positions, not term vectors; offsets are
        recomputed lazily per hit (cost is O(top-k field text), never
        O(corpus)), matching the reference's Location.Start/End byte
        offsets (search/search.go Location) for analyzers whose filters
        preserve tokenizer positions.  Fields that are unstored, non-text,
        or position-rewriting (shingle/ngram chains) keep offset 0."""
        from ..analysis.analyzers import analyzer_named

        fields = sorted(
            {f for h in hits if h.locations for f in h.locations}
        )
        if not fields:
            return
        docnums = np.array([h.docnum for h in hits], dtype=np.int64)
        try:
            dv = self.reader.docvalues_for(docnums, fields)
        except Exception:
            return
        span_cache: Dict[Tuple[str, int], Dict[int, Tuple[int, int]]] = {}
        for j, h in enumerate(hits):
            if not h.locations:
                continue
            for f, terms in h.locations.items():
                text = dv.get(f, [None] * len(hits))[j]
                if isinstance(text, (list, tuple)):
                    self._fill_multivalue_offsets(f, text, terms)
                    continue
                if not isinstance(text, str) or not text:
                    continue
                key = (f, j)
                spans = span_cache.get(key)
                if spans is None:
                    try:
                        # full filter chain: positions AND spans survive
                        # token-splitting filters (camelCase sub-spans)
                        ana = analyzer_named(self.mapping.analyzer_for(f))
                        spans = {}
                        for tok in ana.analyze(text):
                            spans.setdefault(
                                tok.position, (tok.start, tok.end)
                            )
                    except Exception:
                        spans = {}
                    span_cache[key] = spans
                for locs in terms.values():
                    for loc in locs:
                        se = spans.get(loc.get("pos"))
                        if se is not None:
                            loc["start"], loc["end"] = se

    def _fill_multivalue_offsets(self, f: str, values, terms) -> None:
        """Array-field locations: positions restart per element, so each
        occurrence of (term, pos) maps to the next element whose analyzed
        token at that position IS the term; offsets are within that
        element and array_positions identifies it (search/search.go
        Location.ArrayPositions)."""
        from ..analysis.analyzers import analyzer_named

        try:
            ana = analyzer_named(self.mapping.analyzer_for(f))
            elem_spans = []
            for v in values:
                spans = {}
                if isinstance(v, str) and v:
                    for tok in ana.analyze(v):
                        spans.setdefault(
                            tok.position, (tok.term, tok.start, tok.end)
                        )
                elem_spans.append(spans)
        except Exception:
            return
        for term, locs in terms.items():
            cursor: Dict[int, int] = {}
            for loc in locs:
                p = loc.get("pos")
                ap = loc.get("array_positions")
                if ap:  # index-side element ordinal (position high bits)
                    ei = ap[0]
                    se = elem_spans[ei].get(p) if ei < len(elem_spans) else None
                    if se is not None and se[0] == term:
                        loc["start"], loc["end"] = se[1], se[2]
                    continue
                for ei in range(cursor.get(p, 0), len(elem_spans)):
                    se = elem_spans[ei].get(p)
                    if se is not None and se[0] == term:
                        loc["start"], loc["end"] = se[1], se[2]
                        loc["array_positions"] = [ei]
                        cursor[p] = ei + 1
                        break

    def _knn_filter_docnums(self, kr: dict, options):
        """kNN pre-filtering (search_knn.go KNNRequest.FilterQuery):
        evaluate the per-clause filter query and return its sorted docnum
        set (None = unfiltered)."""
        fq = kr.get("filter")
        if not fq:
            return None
        q = parse_query(fq) if isinstance(fq, dict) else fq
        hits = q.searcher(self.reader, self.mapping, options).search()
        return np.sort(hits.docnums)

    def _knn_nested_scoped(self, kr: dict, options):
        """Nested-scoped filtered kNN (search_knn_test.go
        TestHierarchicalNestedVectorSearch): when the knn FIELD lives
        under a nested path and the clause's filter scopes to the SAME
        nested root, only sub-vectors of elements MATCHING the filter
        participate -- the scorch block-join semantics where the filter
        selects nested sub-documents, not whole parents.

        Returns (docnums, sims) sorted by (-sim, docnum) capped at k, or
        None when the clause is not nested-scoped (doc-level path
        applies)."""
        fq = kr.get("filter")
        field = kr.get("field", "")
        if not fq or "." not in field:
            return None
        nested = (self.reader.options or {}).get("nested_paths") or []
        if not nested:
            return None
        from ..index.nested import nested_prefixes
        from .nested import NestedVerifier, collect_root_leaf_values

        kchain = nested_prefixes(field, nested)
        if not kchain:
            return None
        node = parse_query(fq) if isinstance(fq, dict) else fq
        verifier = NestedVerifier(self.reader, self.mapping, nested)
        fchain = verifier.chain_of(node)
        if not fchain or fchain[0] != kchain[0]:
            return None  # filter is doc-level relative to the vectors
        allowed = self._knn_filter_docnums(kr, options)
        k = int(kr.get("k", 10))
        metric = kr.get("similarity", "cosine")
        if allowed is None or len(allowed) == 0:
            return (
                np.empty(0, dtype=np.int64),
                np.empty(0, dtype=np.float64),
            )
        from .fusion import _metric_sims as _sims_fn

        qv = np.asarray(_knn_vector(kr), dtype=np.float64)
        root = field.split(".", 1)[0]
        fetch = getattr(self.reader, "docvalues_rows", None)
        if fetch is None:
            fetch = self.reader.docvalues_for
        dv = fetch(allowed, [root])
        L = min(len(fchain), len(kchain))
        nums_out, sims_out = [], []
        for i, dn in enumerate(allowed):
            value = dv[root][i]
            if value is None:
                continue
            _, m = verifier.eval(node, {root: value})
            if m is False or (not isinstance(m, bool) and not m):
                continue
            groups = collect_root_leaf_values(
                value, root, field.split(".")[1:], verifier.nested_set
            )
            if isinstance(m, bool):  # doc-level TRUE: every element
                eligible = groups
            else:
                keys = {t[:L] for t in m}
                eligible = {
                    o: v for o, v in groups.items() if o[:L] in keys
                }
            vecs = []
            for vals in eligible.values():
                if not vals:
                    continue
                a = np.asarray(vals, dtype=np.float64).reshape(
                    -1, len(qv)
                )
                vecs.append(a)
            if not vecs:
                continue
            mat = np.vstack(vecs)
            sims = _sims_fn(mat, qv, metric)
            nums_out.append(int(dn))
            sims_out.append(float(sims.max()))
        if not nums_out:
            return (
                np.empty(0, dtype=np.int64),
                np.empty(0, dtype=np.float64),
            )
        nums_a = np.asarray(nums_out, dtype=np.int64)
        sims_a = np.asarray(sims_out, dtype=np.float64)
        order = sorted(
            range(len(nums_a)), key=lambda j: (-sims_a[j], nums_a[j])
        )[:k]
        return nums_a[order], sims_a[order]

    def _search_hybrid(self, request: dict) -> SearchResult:
        """Hybrid FTS + KNN search (search_knn.go + rescorer.go):
        request["knn"] = [{"field", "vector", "k", "boost"?}, ...];
        request["score"] = "rrf" | "rsf" selects fusion rescoring
        (fusion/rrf.go, rsf.go), otherwise additive merge
        (mergeKNNResults).  KNN vectors come from the named docvalue
        column; similarity is cosine."""
        import time as _t

        from .fusion import (
            DEFAULT_RANK_CONSTANT,
            default_knn_merge,
            knn_topk,
            reciprocal_rank_fusion,
            relative_score_fusion,
        )

        t0 = _t.perf_counter()
        size = request.get("size", 10)
        from_ = request.get("from", 0)
        q = request.get("query", {"match_none": {}})
        query = parse_query(q) if isinstance(q, dict) else q
        options = SearchOptions(
            scoring_model=self.mapping.scoring_model,
            score="",
            bm25_stats=(request.get("pre_search_data") or {}).get(
                "bm25_stats"
            ),
        )
        fts = query.searcher(self.reader, self.mapping, options).search()
        fkeep = self.reader.filter_deleted(fts.docnums)
        sources = [(fts.docnums[fkeep].tolist(), fts.scores[fkeep])]
        weights = [1.0]
        for kr in request.get("knn") or []:
            scoped = self._knn_nested_scoped(kr, options)
            if scoped is not None:
                nums, sims = scoped
                kkeep = self.reader.filter_deleted(nums)
                nums, sims = nums[kkeep], sims[kkeep]
                sources.append((nums.tolist(), sims))
                weights.append(float(kr.get("boost", 1.0)))
                continue
            allowed = self._knn_filter_docnums(kr, options)
            # per-clause ANN controls: method "auto" (IVF sidecar when
            # present at the current epoch, exact otherwise), "exact"
            # (force brute force, the track_total_hits-style gate), or
            # "ivf" (error when no sidecar); nprobe tunes the
            # recall/scan trade
            nums, sims = knn_topk(
                self.reader,
                kr["field"],
                _knn_vector(kr),
                int(kr.get("k", 10)),
                allowed=allowed,
                method=kr.get("method", "auto"),
                nprobe=kr.get("nprobe"),
                metric=kr.get("similarity", "cosine"),
            )
            kkeep = self.reader.filter_deleted(nums)
            nums, sims = nums[kkeep], sims[kkeep]
            sources.append((nums.tolist(), sims))
            weights.append(float(kr.get("boost", 1.0)))
        _apply_knn_operator(request, sources)
        params = request.get("params") or {}
        window = int(params.get("score_window_size", from_ + size) or 1)
        window = max(window, size)
        mode = request.get("score", "")
        if mode == "rrf":
            fused = reciprocal_rank_fusion(
                sources,
                weights,
                int(params.get("score_rank_constant", DEFAULT_RANK_CONSTANT)),
                window,
            )
        elif mode == "rsf":
            fused = relative_score_fusion(sources, weights, window)
        else:
            fused = default_knn_merge(sources, weights)
        docnums = np.fromiter(fused.keys(), dtype=np.int64, count=len(fused))
        scores = np.fromiter(fused.values(), dtype=np.float64, count=len(fused))
        hits = SearchHits(docnums, scores)
        sort = request.get("sort")
        custom_sort = bool(sort) and sort != ["-_score", "_id"]
        if mode in ("rrf", "rsf"):
            # fusion re-ranks by fused score (rescorer.go rescore); a
            # custom sort or cursor contradicts that ordering -- reject
            # explicitly instead of silently ignoring
            if custom_sort:
                raise ValueError(
                    "sort is not supported with score fusion (rrf/rsf)"
                )
            if request.get("search_after") or request.get("search_before"):
                raise ValueError(
                    "search_after/search_before are not supported with "
                    "score fusion (rrf/rsf)"
                )
            result = collect_topn(self.reader, hits, size=size, from_=from_)
            if len(result.hits) > window:
                result.hits = result.hits[:window]
        else:
            # additive merge behaves like a normal search over the fused
            # hit set: custom sorts and cursors apply
            pre_cursor_total = len(hits.docnums)
            if request.get("search_after"):
                if custom_sort:
                    hits = _apply_cursor_sorted(
                        self.reader, hits, sort, request["search_after"],
                        before=False,
                    )
                else:
                    hits = _apply_search_after(
                        self.reader, hits, request["search_after"]
                    )
            if request.get("search_before"):
                if custom_sort:
                    hits = _apply_cursor_sorted(
                        self.reader, hits, sort, request["search_before"],
                        before=True,
                    )
                else:
                    hits = _apply_search_before(
                        self.reader, hits, request["search_before"]
                    )
                from_ = max(0, len(hits.docnums) - size)
            result = collect_topn(
                self.reader, hits, size=size, from_=from_, sort=sort
            )
            if request.get("search_after") or request.get("search_before"):
                result.total_hits = pre_cursor_total
        result.took_ms = (_t.perf_counter() - t0) * 1e3
        if request.get("explain") and result.hits:
            # hybrid explanations must not be dropped (reference
            # search_knn_test.go TestHybridExplainNotDropped): every hit
            # carries an explanation whose value equals its score, and a
            # hit present in both branches merges the text and vector
            # sub-explanations (search_knn.go mergeKNNResults)
            from .scorer import Explanation

            expl_searcher = query.searcher(
                self.reader, self.mapping, options
            )
            fts_pos = {int(d): i for i, d in enumerate(sources[0][0])}
            knn_reqs = request.get("knn") or []
            knn_pos = [
                {int(d): i for i, d in enumerate(s[0])}
                for s in sources[1:]
            ]
            for h in result.hits:
                dn = int(h.docnum)
                children = []
                if dn in fts_pos:
                    e = expl_searcher.explain(dn, h.id)
                    if e is None:
                        e = Explanation(
                            float(sources[0][1][fts_pos[dn]]),
                            "fts score",
                        )
                    children.append(e)
                for ci, pos in enumerate(knn_pos):
                    if dn not in pos:
                        continue
                    sim = float(sources[1 + ci][1][pos[dn]])
                    w = weights[1 + ci]
                    fld = (
                        knn_reqs[ci].get("field", "")
                        if ci < len(knn_reqs)
                        else ""
                    )
                    children.append(
                        Explanation(
                            w * sim,
                            f"vector similarity of field {fld}, "
                            f"similarity={sim:g}, boost={w:g}",
                        )
                    )
                msg = (
                    "sum of:"
                    if mode not in ("rrf", "rsf")
                    else f"{mode} fusion of:"
                )
                h.expl = Explanation(h.score, msg, children)
        if request.get("facets"):
            # reference semantics (index_impl.go:1040-1056): facets come
            # from the FTS collector over every query match; knn hits and
            # fusion reordering do not change them
            from .facets import compute_facets

            result.facets = compute_facets(
                self.reader, np.asarray(sources[0][0], dtype=np.int64),
                request["facets"],
            )
        want_fields = self._expand_fields(request.get("fields"))
        hl = request.get("highlight")
        if (want_fields or hl is not None) and result.hits:
            dn = np.array([h.docnum for h in result.hits], dtype=np.int64)
            fetch = set(want_fields)
            if hl is not None:
                fetch.update(hl.get("fields", []))
            dv = self.reader.docvalues_for(dn, sorted(fetch))
            for j, h in enumerate(result.hits):
                if want_fields:
                    h.fields = {f: dv[f][j] for f in want_fields}
                if hl is not None:
                    from ..analysis.analyzers import analyzer_named
                    from .highlight import (
                        extract_query_terms,
                        highlight_value,
                    )

                    terms_by_field = extract_query_terms(
                        q if isinstance(q, dict) else {},
                        lambda f, a=None: analyzer_named(
                            a or self.mapping.analyzer_for(f)
                        ),
                        self.mapping.default_field,
                    )
                    h.fragments = {}
                    hl_fields = hl.get("fields")
                    if not hl_fields:
                        # no fields given: highlight the fields the
                        # query matched (the reference defaults to the
                        # hit's matched fields); "_all" expands to the
                        # stored text fields carrying its terms
                        hl_fields = sorted(
                            f for f in terms_by_field if f != "_all")
                        if "_all" in terms_by_field:
                            allf = [
                                sf for sf in
                                self.reader.options.get("store_fields", [])
                                if sf not in hl_fields
                            ]
                            for sf in allf:
                                terms_by_field.setdefault(sf, set()).update(
                                    terms_by_field["_all"])
                            hl_fields.extend(allf)
                        dv2 = self.reader.docvalues_for(
                            dn, [f for f in hl_fields if f not in dv])
                        dv.update(dv2)
                    for f in hl_fields:
                        text = dv.get(f, [None] * len(result.hits))[j]
                        if text:
                            h.fragments[f] = highlight_value(
                                text,
                                terms_by_field.get(f, set()),
                                analyzer_named(
                                    self.mapping.analyzer_for(f)
                                ),
                                style=hl.get("style", "html"),
                                max_fragments=hl.get("max_fragments", 1),
                                fragment_size=hl.get(
                                    "fragment_size", 200
                                ),
                            )
        return result

    def search(self, request: dict) -> SearchResult:
        """request: bleve SearchRequest shape:
        {"query": {...}, "size": 10, "from": 0,
         "sort": ["-_score", "_id"] | ["field", "-other"],
         "facets": {name: {"field": f, "size": N} |
                    {"field": f, "numeric_ranges": [...]}},
         "highlight": {"fields": [...], "style": "html"|"ansi"},
         "fields": ["stored", ...]}  ("*" = every retrievable field)"""
        if getattr(self, "_closed", False):
            raise RuntimeError("index is closed")
        if request.get("timeout_ms") is not None and (
            float(request["timeout_ms"]) <= 0
        ):
            # an already-expired deadline errors up front
            # (TestSearchTimeout cancelled-context case)
            raise TimeoutError("context deadline exceeded")
        self._validate_request(request)
        # rrf/rsf rescoring applies to FTS-only requests too
        # (rescorer.go wraps Search whenever req.Score selects fusion,
        # with or without KNN clauses)
        if request.get("knn") or request.get("score") in ("rrf", "rsf"):
            return self._search_hybrid(request)
        q = request["query"]
        query = parse_query(q) if isinstance(q, dict) else q
        options = SearchOptions(
            scoring_model=self.mapping.scoring_model,
            score=request.get("score", ""),
            bm25_stats=(request.get("pre_search_data") or {}).get(
                "bm25_stats"
            ),
        )
        searcher = query.searcher(self.reader, self.mapping, options)
        total_relation = "eq"
        if (
            request.get("track_total_hits", True) is False
            and not request.get("facets")
            and not request.get("sort")
            and not request.get("search_after")
            and not request.get("search_before")
        ):
            from .searcher import DisjunctionSearcher, disjunction_topk

            if isinstance(searcher, DisjunctionSearcher):
                # block-max/MaxScore top-k pruning: rank-identical top-k,
                # total_hits becomes a lower bound ("gte")
                # k inflated by the tombstone count: deleted docs are
                # filtered AFTER pruning, so each tombstone may occupy a
                # top-k slot a live doc should get
                tk = disjunction_topk(
                    searcher,
                    request.get("size", 10)
                    + request.get("from", 0)
                    + len(getattr(self.reader, "deleted", ())),
                )
                hits = tk.hits
                if not tk.exact_total:
                    total_relation = "gte"
            else:
                hits = searcher.search()
        else:
            hits = searcher.search()
        # tombstone filter (obsoleted-bitmap consult, mutate.py): every
        # query kind excludes deleted docs
        keep = self.reader.filter_deleted(hits.docnums)
        if not keep.all():
            hits = SearchHits(hits.docnums[keep], hits.scores[keep])
        # nested same-element scoping (search_nested_test.go): post-filter
        # the doc-level candidates so conjunctions over fields under one
        # nested path match within the SAME array element
        from .nested import apply_nested_filter

        hits = apply_nested_filter(self.reader, self.mapping, query, hits)
        # total_hits is cursor-independent (collector/topn.go basicPrepare
        # counts every match before the searchAfter skip)
        pre_cursor_total = len(hits.docnums)
        # facets likewise accumulate over every match, not the cursor page
        # (reference collector facets run during the full collect loop)
        pre_cursor_docnums = hits.docnums
        size = request.get("size", 10)
        from_ = request.get("from", 0)
        sort = request.get("sort")
        custom_sort = bool(sort) and sort != ["-_score", "_id"]
        if request.get("search_after"):
            if custom_sort:
                hits = _apply_cursor_sorted(
                    self.reader, hits, sort, request["search_after"],
                    before=False,
                )
            else:
                hits = _apply_search_after(
                    self.reader, hits, request["search_after"]
                )
        if request.get("search_before"):
            if custom_sort:
                hits = _apply_cursor_sorted(
                    self.reader, hits, sort, request["search_before"],
                    before=True,
                )
            else:
                hits = _apply_search_before(
                    self.reader, hits, request["search_before"]
                )
            # reference (index_impl.go SearchBefore) reverses the sort and
            # returns the page immediately PRECEDING the cursor, re-sorted
            # to the request order: i.e. the LAST `size` docs before it.
            from_ = max(0, len(hits.docnums) - size)
        result = collect_topn(
            self.reader,
            hits,
            size=size,
            from_=from_,
            sort=request.get("sort"),
        )
        if request.get("search_after") or request.get("search_before"):
            result.total_hits = pre_cursor_total
        result.total_relation = total_relation
        if request.get("explain"):
            # reference options.Explain: attach a per-hit explanation tree
            # (computed post-hoc for the returned page only -- rank and
            # scores are unchanged)
            for h in result.hits:
                h.expl = searcher.explain(int(h.docnum), h.id)
        if getattr(searcher, "retrieve_score_breakdown", False):
            # DisjunctionQuery.RetrieveScoreBreakdown (search.go:172
            # DocumentMatch.ScoreBreakdown): clause index -> that
            # clause's pre-coord score contribution
            for h in result.hits:
                h.score_breakdown = searcher.score_breakdown(
                    int(h.docnum)
                )
        if request.get("includeLocations"):
            for h in result.hits:
                h.locations = searcher.locations(int(h.docnum))
            self._fill_location_offsets(result.hits)
        if request.get("facets"):
            from .facets import compute_facets

            result.facets = compute_facets(
                self.reader, pre_cursor_docnums, request["facets"]
            )
        want_fields = self._expand_fields(request.get("fields"))
        hl = request.get("highlight")
        if (want_fields or hl is not None) and result.hits:
            docnums = np.array([h.docnum for h in result.hits], dtype=np.int64)
            fetch = set(want_fields)
            if hl is not None:
                fetch.update(hl.get("fields", []))
            dv = self.reader.docvalues_for(docnums, sorted(fetch))
            for j, h in enumerate(result.hits):
                if want_fields:
                    h.fields = {f: dv[f][j] for f in want_fields}
                if hl is not None:
                    from ..analysis.analyzers import analyzer_named
                    from .highlight import (
                        extract_query_terms,
                        highlight_value,
                    )

                    terms_by_field = extract_query_terms(
                        q if isinstance(q, dict) else {},
                        lambda f, a=None: analyzer_named(
                            a or self.mapping.analyzer_for(f)
                        ),
                        self.mapping.default_field,
                    )
                    h.fragments = {}
                    hl_fields = hl.get("fields")
                    if not hl_fields:
                        # no fields given: highlight the fields the
                        # query matched (the reference defaults to the
                        # hit's matched fields); "_all" expands to the
                        # stored text fields carrying its terms
                        hl_fields = sorted(
                            f for f in terms_by_field if f != "_all")
                        if "_all" in terms_by_field:
                            allf = [
                                sf for sf in
                                self.reader.options.get("store_fields", [])
                                if sf not in hl_fields
                            ]
                            for sf in allf:
                                terms_by_field.setdefault(sf, set()).update(
                                    terms_by_field["_all"])
                            hl_fields.extend(allf)
                        dv2 = self.reader.docvalues_for(
                            docnums, [f for f in hl_fields if f not in dv])
                        dv.update(dv2)
                    for f in hl_fields:
                        text = dv.get(f, [None] * len(result.hits))[j]
                        if text:
                            h.fragments[f] = highlight_value(
                                text,
                                terms_by_field.get(f, set()),
                                analyzer_named(self.mapping.analyzer_for(f)),
                                style=hl.get("style", "html"),
                                max_fragments=hl.get("max_fragments", 1),
                                fragment_size=hl.get(
                                    "fragment_size", 200
                                ),
                            )
        return result
