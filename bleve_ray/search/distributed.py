"""Distributed query execution: shard-resident posting actors.

Model (SURVEY.md §2.9, the IndexAlias scatter/presearch design): the index
is term-partitioned across shards; a pool of PostingShardActor processes
each holds the opened segment readers for its shards (like Bleve's
refcounted snapshots living inside each child index).  A
DistributedIndexReader presents the SAME interface as the local IndexReader
-- posting()/bm25_metrics()/doc_ids_for() -- so every searcher works
unchanged; global BM25 stats come from the manifest (presearch is a
manifest read, no extra round-trip), and per-term doc_freq is global
because a term's full posting list lives in exactly one shard.

Consequently: distributed scores == local scores == oracle scores (the
TestBM25GlobalScoring invariant, index_test.go:447-560), which
test_distributed.py asserts.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from ..index.segment import Posting
from .collector import Index, IndexMapping, SearchResult, collect_topn
from .query import parse_query
from .reader import IndexReader, SearchOptions


class PostingShardActor:
    """Holds open SegmentReaders for a subset of shards; decodes postings
    on request.  Created via ray.remote by DistributedIndex."""

    def __init__(self, index_dir: str, shards: List[int]):
        self.reader = IndexReader(index_dir)
        self.shards = set(shards)

    def posting(self, field: str, term: str, want_positions: bool):
        p = self.reader.posting(field, term, want_positions)
        if p is None:
            return None
        return (p.docnums, p.tfs, p.norms, p.positions_flat)

    def dictionary(self, field: str):
        # only this actor's shards contribute (term-partitioned)
        out = []
        for shard in self.shards:
            for entry in self.reader._by_shard.get(shard, []):
                out.extend(
                    self.reader._reader(entry).iter_terms(field)
                )
        return out


class DistributedIndexReader:
    """IndexReader facade backed by shard actors (term-routed)."""

    def __init__(self, index_dir: str, num_actors: int = 4):
        import ray

        self.local = IndexReader(index_dir)
        self.num_shards = self.local.num_shards
        self.options = self.local.options
        self.manifest = self.local.manifest
        self.deleted = self.local.deleted
        self.filter_deleted = self.local.filter_deleted
        num_actors = min(num_actors, self.num_shards)
        actor_cls = ray.remote(PostingShardActor)
        self._actor_of_shard: Dict[int, int] = {}
        shard_lists: List[List[int]] = [[] for _ in range(num_actors)]
        for s in range(self.num_shards):
            shard_lists[s % num_actors].append(s)
            self._actor_of_shard[s] = s % num_actors
        self.actors = [
            actor_cls.remote(index_dir, shard_lists[i])
            for i in range(num_actors)
        ]
        # LRU postings cache: bounded working set with eviction (a plain
        # stop-at-N cap would silently stop caching after churn, degrading
        # a long-lived query actor to uncached reads).
        from collections import OrderedDict

        self._cache: "OrderedDict" = OrderedDict()
        self._cache_cap = 256

    def _shard_of(self, field: str, term: str) -> int:
        from ..index.shard_hash import shard_of_term

        return shard_of_term(
            field,
            term,
            self.num_shards,
            self.options.get("shard_hash", "sha1"),
        )

    def posting(
        self, field: str, term: str, want_positions: bool = False
    ) -> Optional[Posting]:
        import ray

        ck = (field, term, want_positions)
        if ck in self._cache:
            self._cache.move_to_end(ck)
            return self._cache[ck]
        actor = self.actors[self._actor_of_shard[self._shard_of(field, term)]]
        res = ray.get(actor.posting.remote(field, term, want_positions))
        p = None if res is None else Posting(*res)
        self._cache_put(ck, p)
        return p

    def _cache_put(self, ck, p) -> None:
        self._cache[ck] = p
        self._cache.move_to_end(ck)
        while len(self._cache) > self._cache_cap:
            self._cache.popitem(last=False)

    def prefetch(self, requests) -> None:
        """Issue all posting fetches concurrently (one round-trip instead of
        one per term) -- the scatter half of the alias scatter-gather."""
        import ray

        refs = []
        for field, term, want_positions in requests:
            ck = (field, term, want_positions)
            if ck in self._cache:
                self._cache.move_to_end(ck)
                continue
            actor = self.actors[
                self._actor_of_shard[self._shard_of(field, term)]
            ]
            refs.append(
                (ck, actor.posting.remote(field, term, want_positions))
            )
        for ck, ref in refs:
            res = ray.get(ref)
            self._cache_put(ck, None if res is None else Posting(*res))

    # stats / docmeta / dictionary: manifest + local files (tiny reads)
    def doc_count(self) -> int:
        return self.local.doc_count()

    def field_cardinality(self, field: str) -> int:
        return self.local.field_cardinality(field)

    def bm25_metrics(self, field: str):
        return self.local.bm25_metrics(field)

    def doc_ids_for(self, docnums: np.ndarray) -> List[str]:
        return self.local.doc_ids_for(docnums)

    def docvalues_for(self, docnums: np.ndarray, fields: List[str]):
        return self.local.docvalues_for(docnums, fields)

    def docvalues_rows(self, docnums: np.ndarray, fields: List[str]):
        return self.local.docvalues_rows(docnums, fields)

    def docvalues_arrow(self, docnums: np.ndarray, field: str):
        return self.local.docvalues_arrow(docnums, field)

    def all_docnums(self) -> np.ndarray:
        return self.local.all_docnums()

    def dictionary(self, field: str):
        return self.local.dictionary(field)

    def terms_with_prefix(self, field: str, prefix: str):
        return self.local.terms_with_prefix(field, prefix)

    def terms_in_range(self, field, lo, hi, inclusive_hi=True):
        return self.local.terms_in_range(field, lo, hi, inclusive_hi)


class DistributedIndex(Index):
    """Index facade whose postings are served by an actor pool."""

    def __init__(self, index_dir: str, num_actors: int = 4):
        self.reader = DistributedIndexReader(index_dir, num_actors)
        opts = self.reader.options
        self.mapping = IndexMapping(
            default_field=next(iter(opts["fields"])),
            analyzers={f: c["analyzer"] for f, c in opts["fields"].items()},
            scoring_model=opts.get("scoring_model", "bm25"),
        )

    def search(self, request: dict) -> SearchResult:
        q = request.get("query")
        if isinstance(q, dict):
            from ..analysis.analyzers import analyzer_named
            from .highlight import extract_query_terms

            terms_by_field = extract_query_terms(
                q,
                lambda f, a=None: analyzer_named(
                    a or self.mapping.analyzer_for(f)
                ),
                self.mapping.default_field,
            )
            want_pos = "match_phrase" in str(q)
            self.reader.prefetch(
                [
                    (f, t, want_pos)
                    for f, ts in terms_by_field.items()
                    for t in sorted(ts)
                ]
            )
        return super().search(request)


def _alias_sort_key(sort):
    """Cross-member hit comparator for a custom sort order: field values
    come from the hit's fetched fields; '-' / desc reverses; missing
    sorts last (same rules as the local _collect_sorted)."""
    from .collector import _Rev, _RevStr

    def key(item):
        _, h = item
        parts = []
        for s in sort:
            geo = None
            if isinstance(s, dict):
                name = {"id": "_id", "score": "_score"}.get(
                    s.get("by"), s.get("field")
                )
                desc = bool(s.get("desc", False))
                if s.get("by") == "geo_distance":
                    geo = s
            else:
                name = s.lstrip("-")
                desc = s.startswith("-")
            if geo is not None:
                # distance from the query location to the hit's fetched
                # geo value (struct or [lon, lat])
                from ..index.geo import haversin_km

                v = (h.fields or {}).get(geo["field"])
                if v is None:
                    parts.append((True, None))
                    continue
                if isinstance(v, dict):
                    lon, lat = float(v["lon"]), float(v["lat"])
                else:
                    lon, lat = float(v[0]), float(v[1])
                loc = geo.get("location")
                if isinstance(loc, dict):
                    qlon, qlat = float(loc["lon"]), float(loc["lat"])
                else:
                    qlon, qlat = float(loc[0]), float(loc[1])
                d = float(haversin_km(qlon, qlat, lon, lat))
                parts.append((False, _Rev(d) if desc else d))
                continue
            if name == "_score":
                parts.append(-h.score if desc else h.score)
            elif name == "_id":
                parts.append(_RevStr(h.id) if desc else h.id)
            else:
                v = (h.fields or {}).get(name)
                missing = v is None
                if desc:
                    parts.append((missing, _Rev(v) if not missing else None))
                else:
                    parts.append((missing, v if not missing else None))
        return tuple(parts)

    return key


class IndexAlias:
    """Multi-index alias (index_alias_impl.go:776-1090): scatter a search
    to HETEROGENEOUS member indexes, gather and merge.

    Merge semantics: hits interleaved by (-score, id) (the default sort
    order), total summed, max_score maxed, facets merged partial-style
    before top-N truncation.  Each member scores with its own collection
    statistics (the reference's behavior without presearch-global
    scoring; homogeneous-shard global scoring lives in
    DistributedIndex)."""

    def __init__(self, indexes: Optional[List[Index]] = None,
                 name: str = "alias"):
        # empty aliases are constructible; searching one errors
        # (ErrorAliasEmpty, index_alias_impl.go:42)
        self.indexes = list(indexes or [])
        self.name = name

    def add(self, index: Index) -> None:
        self.indexes.append(index)

    def remove(self, index: Index) -> None:
        self.indexes.remove(index)

    def _member_name(self, idx, i: int) -> str:
        return getattr(idx, "name", None) or f"index_{i}"

    def _scatter(self, request: dict):
        """Guarded member scatter (MultiSearch): an erroring member is
        recorded in the status and the others still contribute --
        partial results instead of a failed search.  Nested aliases
        merge their child statuses (SearchStatus.Merge)."""
        if not self.indexes:
            raise RuntimeError("cannot search empty alias")
        import time as _time

        # "timeout_ms" is the context-deadline role (index_alias_impl.go
        # MultiSearch with ctx; TestMultiSearchTimeoutPartial): members
        # past the deadline are recorded as deadline errors and the
        # finished members' hits are returned as a partial result.
        timeout_ms = request.get("timeout_ms")
        deadline = (
            _time.monotonic() + float(timeout_ms) / 1e3
            if timeout_ms else None
        )
        results = []
        total = successful = 0
        errors: Dict[str, str] = {}
        for i, idx in enumerate(self.indexes):
            if deadline is not None and _time.monotonic() > deadline:
                total += 1
                errors[self._member_name(idx, i)] = (
                    "context deadline exceeded"
                )
                continue
            try:
                r = idx.search(request)
            except Exception as e:  # member down/failed: partial result
                total += 1
                errors[self._member_name(idx, i)] = str(e)
                continue
            results.append(r)
            st = getattr(r, "status", None)
            if st:
                total += st["total"]
                successful += st["successful"]
                errors.update(st.get("errors") or {})
            else:
                total += 1
                successful += 1
        status = {
            "total": total,
            "successful": successful,
            "failed": total - successful,
            "errors": errors,
        }
        return results, status

    def _leaf_indexes(self) -> List[Index]:
        out: List[Index] = []
        for idx in self.indexes:
            if isinstance(idx, IndexAlias):
                out.extend(idx._leaf_indexes())
            else:
                out.append(idx)
        return out

    def _synonym_presearch(self):
        """Alias synonym presearch (pre_search.go synonym processor +
        index_alias_impl.go preSearch flow): synonym DOCUMENTS are
        distributed across members like regular documents, so each
        member holds a PARTIAL thesaurus; expansion must use the union.
        Returns {source: UnionThesaurus} for sources seen on >1 member
        (a single holder needs no merge)."""
        from .synonyms import UnionThesaurus

        per_src: Dict[str, list] = {}
        for idx in self._leaf_indexes():
            # members are duck-typed (the reference aliases anything
            # satisfying the Index interface); only mapping-bearing
            # members can hold thesauri
            ths = (
                getattr(getattr(idx, "mapping", None), "thesauri", None)
                or {}
            )
            for src, r in ths.items():
                per_src.setdefault(src, []).append(r)
        return {
            src: UnionThesaurus(rs)
            for src, rs in per_src.items()
            if len(rs) > 1
        }

    def _searched_members(self):
        """Member search pass with union thesauri injected into every
        leaf mapping for the duration (restored after)."""
        import contextlib

        @contextlib.contextmanager
        def ctx():
            union = self._synonym_presearch()
            leaves = (
                [
                    l
                    for l in self._leaf_indexes()
                    if getattr(l, "mapping", None) is not None
                ]
                if union
                else []
            )
            saved = []
            for leaf in leaves:
                saved.append(leaf.mapping.thesauri)
                leaf.mapping.thesauri = {
                    **leaf.mapping.thesauri,
                    **union,
                }
            try:
                yield
            finally:
                for leaf, s in zip(leaves, saved):
                    leaf.mapping.thesauri = s

        return ctx()

    def search(self, request: dict) -> SearchResult:
        import time as _t

        if request.get("knn") or request.get("score") in ("rrf", "rsf"):
            # fusion must run ONCE over the global ranking (the member
            # strip in _search_knn removes score/params so members
            # return raw scores; member-local ranks would diverge)
            return self._search_knn(request)
        t0 = _t.perf_counter()
        size = request.get("size", 10)
        from_ = request.get("from", 0)
        sub_req = dict(request)
        # every member must return enough rows to fill the global window
        sub_req["size"] = from_ + size
        sub_req["from"] = 0
        sort = request.get("sort")
        custom_sort = bool(sort) and sort != ["-_score", "_id"]
        if custom_sort:
            # hit merge needs each member hit's sort-field values, like
            # the reference's DocumentMatch.Sort keys carried across the
            # alias (index_alias_impl.go hit sorting honors req.Sort)
            sort_fields = [
                (s["field"] if isinstance(s, dict) else s.lstrip("-"))
                for s in sort
                if (
                    isinstance(s, dict)
                    and s.get("by") in ("field", "geo_distance")
                )
                or (
                    not isinstance(s, dict)
                    and s.lstrip("-") not in ("_score", "_id")
                )
            ]
            sub_req["fields"] = sorted(
                set(sub_req.get("fields") or []) | set(sort_fields)
            )
        if request.get("search_type") == "global_scoring":
            sub_req["pre_search_data"] = {
                "bm25_stats": self._bm25_presearch()
            }
        with self._searched_members():
            results, status = self._scatter(sub_req)
        merged = []
        for ri, r in enumerate(results):
            for h in r.hits:
                merged.append((ri, h))
        if custom_sort:
            merged.sort(key=_alias_sort_key(sort))
        else:
            merged.sort(key=lambda x: (-x[1].score, x[1].id))
        window = [h for _, h in merged[from_ : from_ + size]]
        if custom_sort:
            # drop sort-key fields the caller didn't ask for (they were
            # fetched only to merge, like DocumentMatch.Sort keys)
            want = set(request.get("fields") or [])
            for h in window:
                if h.fields is not None:
                    if want:
                        h.fields = {
                            k: v for k, v in h.fields.items() if k in want
                        }
                    else:
                        h.fields = None
        total = sum(r.total_hits for r in results)
        max_score = max((r.max_score for r in results), default=0.0)
        out = SearchResult(
            total_hits=total,
            max_score=max_score,
            hits=window,
            took_ms=(_t.perf_counter() - t0) * 1e3,
            status=status,
        )
        if request.get("facets"):
            out.facets = _merge_facet_results(
                request["facets"], [r.facets for r in results if r.facets]
            )
        return out

    def _bm25_presearch(self) -> dict:
        """Global-scoring presearch (pre_search.go
        bm25PreSearchResultProcessor + SearchTypeKey=GlobalScoring,
        index_alias_impl.go:650-668): sum DocCount and per-field
        cardinality across members so phase-2 searchers score with
        alias-wide docTotal/avgDocLength.  Term df stays member-local,
        exactly like the reference (search_term.go:145 reader.Count())."""
        stats = {"doc_count": 0, "field_cardinality": {}}
        for idx in self._leaf_indexes():
            r = idx.reader
            stats["doc_count"] += int(r.doc_count())
            for f in r.options.get("fields", {}):
                if not r.field_live(f):
                    continue
                stats["field_cardinality"][f] = stats[
                    "field_cardinality"
                ].get(f, 0) + int(r.field_cardinality(f))
        return stats

    def _search_knn(self, request: dict) -> SearchResult:
        """Alias hybrid search with KNN PRESEARCH (pre_search.go /
        index_alias_impl.go preSearchRequired for KNN): phase 1 gathers
        each member's per-clause KNN candidates and keeps the GLOBAL
        top-k; phase 2 runs the FTS query on every member; fusion (rrf /
        rsf / additive merge) then happens ONCE at the alias level over
        globally-merged rankings keyed by external doc id -- per-member
        fusion would fuse against member-local ranks and diverge."""
        import time as _t

        import numpy as np

        from .collector import Hit
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
        params = request.get("params") or {}
        window = max(int(params.get("score_window_size", from_ + size) or 1), size)

        # phase 2 prerequisites first: member FTS results (also give us
        # the Hit objects for the returned page)
        fts_req = {
            k: v
            for k, v in request.items()
            if k not in ("knn", "score", "params")
        }
        fts_req["size"] = window
        fts_req["from"] = 0
        if request.get("search_type") == "global_scoring":
            fts_req["pre_search_data"] = {
                "bm25_stats": self._bm25_presearch()
            }
        results, status = self._scatter(fts_req)
        by_id: Dict[str, Hit] = {}
        fts_pairs = []
        for r in results:
            for h in r.hits:
                by_id.setdefault(h.id, h)
                fts_pairs.append((h.id, h.score))
        fts_pairs.sort(key=lambda x: (-x[1], x[0]))
        sources = [
            (
                [i for i, _ in fts_pairs],
                np.array([s for _, s in fts_pairs], dtype=np.float64),
            )
        ]
        weights = [1.0]

        # phase 1 (presearch): global top-k per KNN clause across members.
        # Recurse to LEAF indexes -- a nested sub-alias has no reader of
        # its own; the reference's preSearch likewise fans out to every
        # concrete member (index_alias_impl.go preSearchAll over leaves).
        leaves = self._leaf_indexes()
        for kr in request.get("knn") or []:
            k = int(kr.get("k", 10))
            cands = []  # (sim, id, member_idx, docnum)
            for mi, idx in enumerate(leaves):
                try:
                    allowed = idx._knn_filter_docnums(
                        kr,
                        SearchOptions(scoring_model=idx.mapping.scoring_model),
                    )
                    from .collector import _knn_vector

                    nums, sims = knn_topk(
                        idx.reader, kr["field"], _knn_vector(kr), k,
                        allowed=allowed,
                        method=kr.get("method", "auto"),
                        nprobe=kr.get("nprobe"),
                        metric=kr.get("similarity", "cosine"),
                    )
                except Exception as e:
                    # partial results: record the member failure in the
                    # scatter status (same bookkeeping as _scatter)
                    nm = self._member_name(idx, mi)
                    if nm not in status["errors"]:
                        status["errors"][nm] = str(e)
                        status["failed"] += 1
                        status["successful"] = max(
                            0, status["successful"] - 1
                        )
                    continue
                keep = idx.reader.filter_deleted(nums)
                nums, sims = nums[keep], sims[keep]
                ids = idx.reader.doc_ids_for(nums)
                cands.extend(
                    (float(s), i, mi, int(dn))
                    for s, i, dn in zip(sims, ids, nums)
                )
            cands.sort(key=lambda c: (-c[0], c[1]))
            cands = cands[:k]
            for s, i, mi, dn in cands:
                by_id.setdefault(i, Hit(id=i, score=0.0, docnum=dn))
            sources.append(
                (
                    [c[1] for c in cands],
                    np.array([c[0] for c in cands], dtype=np.float64),
                )
            )
            weights.append(float(kr.get("boost", 1.0)))

        from .collector import _apply_knn_operator

        _apply_knn_operator(request, sources)
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

        ordered = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))
        page = ordered[from_ : from_ + size]
        hits = []
        for i, s in page:
            h = by_id[i]
            hits.append(Hit(id=i, score=float(s), docnum=h.docnum))
        out = SearchResult(
            total_hits=len(fused),
            max_score=max(fused.values(), default=0.0),
            hits=hits,
            took_ms=(_t.perf_counter() - t0) * 1e3,
            status=status,
        )
        if request.get("facets"):
            # facets ride the member FTS pass (fts_req keeps the facets
            # key) and merge exactly like the non-knn alias path; fusion
            # reordering must not change them (rescorer.go wraps the
            # complete search, index_impl.go:1040-1056)
            out.facets = _merge_facet_results(
                request["facets"], [r.facets for r in results if r.facets]
            )
        return out


def _merge_facet_results(requests: dict, facet_sets: List[dict]) -> dict:
    """FacetResults.Merge + Fixup across member indexes
    (search/facets_builder.go:FacetResult.Merge, Fixup): total/missing/
    other SUM across members, per-term or per-range counts merge by key,
    then one top-N fixup sorted (count desc, name asc) with the dropped
    entries' counts moved into other -- reference arithmetic, which
    equals a recompute only when every partial kept all its terms."""
    out = {}
    for name, fr in requests.items():
        partials = [fs[name] for fs in facet_sets if name in fs]
        if not partials:
            continue
        size = fr.get("size", 10)
        total = sum(p["total"] for p in partials)
        missing = sum(p["missing"] for p in partials)
        other = sum(p.get("other", 0) for p in partials)
        bucket_key = next(
            (
                k
                for k in ("numeric_ranges", "date_ranges")
                if k in partials[0]
            ),
            None,
        )
        if bucket_key:
            buckets: Dict[str, dict] = {}
            order: List[str] = []
            for p in partials:
                for b in p[bucket_key]:
                    e = buckets.get(b["name"])
                    if e is None:
                        e = dict(b)
                        buckets[b["name"]] = e
                        order.append(b["name"])
                    else:
                        e["count"] += b["count"]
            ranked = sorted(
                buckets.values(), key=lambda b: (-b["count"], b["name"])
            )
            kept, dropped = ranked[:size], ranked[size:]
            other += sum(b["count"] for b in dropped)
            out[name] = {
                "field": fr["field"], "total": total, "missing": missing,
                "other": other, bucket_key: kept,
            }
        else:
            counts: Dict[str, int] = {}
            for p in partials:
                for t in p["terms"]:
                    counts[t["term"]] = counts.get(t["term"], 0) + t["count"]
            ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
            kept, dropped = ranked[:size], ranked[size:]
            other += sum(c for _, c in dropped)
            out[name] = {
                "field": fr["field"], "total": total, "missing": missing,
                "other": other,
                "terms": [{"term": t, "count": c} for t, c in kept],
            }
    return out
