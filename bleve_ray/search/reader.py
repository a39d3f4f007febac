"""IndexReader: snapshot-style reader over a built index directory.

Equivalent of scorch's refcounted IndexSnapshot + TermFieldReader
(index/scorch/snapshot_index.go): opens the manifest, lazily opens segment
readers (cached), merges per-segment postings into global arrays (segments
hold disjoint docnum ranges, so concatenation in min_docnum order IS the
ascending-docnum merge), and resolves docnums back to external doc IDs via
the docmeta files.

BM25 global stats come from the manifest ("presearch" at zero cost --
SURVEY.md §2.9): avgDocLength = ceil(fieldCardinality/docCount) exactly like
search/searcher/search_term.go:113.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, replace
from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow.parquet as pq

from ..index import manifest as manifest_mod
from ..index.shard_hash import shard_of_term
from ..index.segment import Posting, SegmentReader


def _extract_dotted(value, parts):
    """Leaf values of a dotted path inside a stored struct value
    (dict / list-of-dict from a docvalue column): a scalar when no array
    is crossed, a flat list otherwise, None when absent."""
    out: list = []
    crossed = [False]

    def walk(v, i):
        if v is None:
            return
        if isinstance(v, (list, tuple)):
            crossed[0] = True
            for e in v:
                walk(e, i)
            return
        if i == len(parts):
            out.append(v)
            return
        if isinstance(v, dict):
            walk(v.get(parts[i]), i + 1)

    walk(value, 0)
    if not out:
        return None
    if len(out) == 1 and not crossed[0]:
        return out[0]
    return out


def _prefix_successor(prefix: str) -> Optional[str]:
    """Smallest string greater than every string with prefix ``prefix``:
    drop trailing U+10FFFF codepoints, increment the last remaining one
    (skipping the surrogate gap, which no valid string contains); None
    (open bound) if every codepoint is U+10FFFF."""
    i = len(prefix)
    while i > 0 and ord(prefix[i - 1]) == 0x10FFFF:
        i -= 1
    if i == 0:
        return None
    nxt = ord(prefix[i - 1]) + 1
    if 0xD800 <= nxt <= 0xDFFF:
        nxt = 0xE000
    return prefix[: i - 1] + chr(nxt)


@dataclass
class SearchOptions:
    scoring_model: str = "bm25"
    need_positions: bool = False
    # "none" = the unadorned fast path (scorch optimize.go:26-47): skip
    # freq/norm scoring entirely; set ops + counts only
    score: str = ""
    # alias global-scoring presearch stats (search.BM25Stats,
    # search_term.go:89-106): when set, docTotal/avgDocLength come from
    # here instead of the local index; term df stays local like the
    # reference.  {"doc_count": int, "field_cardinality": {field: int}}
    bm25_stats: Optional[dict] = None

    def with_positions(self) -> "SearchOptions":
        return replace(self, need_positions=True)


class IndexReader:
    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        self.manifest = manifest_mod.load(index_dir)
        if self.manifest is None:
            raise FileNotFoundError(f"no manifest in {index_dir}")
        self.options = self.manifest.options
        self.num_shards = self.options["num_shards"]
        # pre-poly64 manifests were sha1-routed (index/shard_hash.py)
        self._shard_method = self.options.get("shard_hash", "sha1")
        self._by_shard: Dict[int, list] = {}
        for s in self.manifest.segments:
            self._by_shard.setdefault(s.shard, []).append(s)
        for shard in self._by_shard:
            self._by_shard[shard].sort(key=lambda e: e.min_docnum)
        self._seg_readers: Dict[str, SegmentReader] = {}
        self._docmeta_cache: Dict[str, Tuple[np.ndarray, list]] = {}
        self._all_docnums: Optional[np.ndarray] = None
        self._posting_cache: Dict = {}
        from ..index.mutate import load_deleted

        # tombstoned docnums (sorted; obsoleted-bitmap role) -- consulted
        # by every searcher via filter_deleted
        self.deleted: np.ndarray = load_deleted(index_dir, self.manifest)
        # query-side counters (index/scorch/stats.go role)
        self.counters: Dict[str, int] = {
            "term_searchers_started": 0,
            "postings_decoded": 0,
            "posting_cache_hits": 0,
            "dictionary_ops": 0,
            "posting_blocks_decoded": 0,
            "posting_blocks_skipped": 0,
        }

    def filter_deleted(self, docnums: np.ndarray) -> np.ndarray:
        """Boolean keep-mask over docnums excluding tombstoned docs."""
        if len(self.deleted) == 0:
            return np.ones(len(docnums), dtype=bool)
        j = np.searchsorted(self.deleted, docnums)
        j_cl = np.minimum(j, len(self.deleted) - 1)
        return self.deleted[j_cl] != docnums

    # --- postings ---------------------------------------------------------

    def field_live(self, field: str) -> bool:
        """False once a mapping update deleted the field
        (index/update.py); segments may still hold its postings but the
        live mapping no longer serves them."""
        return field not in self.options.get("dropped_fields", ())

    def _segments_for(self, field: str, term: str) -> list:
        if not self.field_live(field):
            return []
        shard = shard_of_term(
            field, term, self.num_shards, self._shard_method
        )
        return self._by_shard.get(shard, [])

    def _reader(self, entry) -> SegmentReader:
        r = self._seg_readers.get(entry.seg_id)
        if r is None:
            r = SegmentReader(os.path.join(self.index_dir, entry.path))
            self._seg_readers[entry.seg_id] = r
        return r

    def posting(
        self, field: str, term: str, want_positions: bool = False
    ) -> Optional[Posting]:
        """Decoded global posting for (field, term); small LRU so a query
        tree touching the same term twice (e.g. phrase verification after
        the conjunction) decodes once."""
        ck = (field, term, want_positions)
        self.counters["term_searchers_started"] += 1
        if ck in self._posting_cache:
            self.counters["posting_cache_hits"] += 1
            return self._posting_cache[ck]
        p = self._posting_uncached(field, term, want_positions)
        self.counters["postings_decoded"] += 1
        if len(self._posting_cache) >= 256:
            self._posting_cache.pop(next(iter(self._posting_cache)))
        self._posting_cache[ck] = p
        return p

    def posting_meta(self, field: str, term: str):
        """Block-level metadata for (field, term) WITHOUT decoding blobs
        (parquet column pruning): list of block dicts with df, docnum
        range, score bounds and a decode handle -- the data a block-max
        searcher plans with."""
        ck = (field, term)
        if not hasattr(self, "_meta_cache2"):
            self._meta_cache2: Dict = {}
        if ck in self._meta_cache2:
            return self._meta_cache2[ck]
        blocks = []
        for entry in self._segments_for(field, term):
            r = self._reader(entry)
            for m in r.block_meta(field, term):
                m["_seg"] = entry.seg_id
                blocks.append(m)
        blocks.sort(key=lambda m: m["min_docnum"])
        if len(self._meta_cache2) < 1024:
            self._meta_cache2[ck] = blocks
        return blocks

    def decode_block(
        self, field: str, term: str, block: dict,
        want_positions: bool = False,
    ):
        """Decode one block row previously returned by posting_meta."""
        for entry in self._segments_for(field, term):
            if entry.seg_id == block["_seg"]:
                return self._reader(entry).decode_block(
                    field, term, block["_rg"], block["min_docnum"],
                    want_positions,
                )
        return None

    def _posting_uncached(
        self, field: str, term: str, want_positions: bool = False
    ) -> Optional[Posting]:
        parts: List[Posting] = []
        for entry in self._segments_for(field, term):
            p = self._reader(entry).lookup(field, term, want_positions)
            if p is not None:
                parts.append(p)
        if not parts:
            return None
        if len(parts) == 1:
            return parts[0]
        # disjoint docnum ranges sorted by min_docnum -> concat is the merge
        parts.sort(key=lambda p: p.docnums[0] if len(p.docnums) else 0)
        bounds = [p for p in parts if p.max_tf is not None]
        return Posting(
            docnums=np.concatenate([p.docnums for p in parts]),
            tfs=np.concatenate([p.tfs for p in parts]),
            norms=np.concatenate([p.norms for p in parts]),
            positions_flat=(
                np.concatenate([p.positions_flat for p in parts])
                if want_positions and all(p.positions_flat is not None for p in parts)
                else None
            ),
            max_tf=(
                max(p.max_tf for p in bounds)
                if len(bounds) == len(parts)
                else None
            ),
            max_norm=(
                max(p.max_norm for p in bounds)
                if len(bounds) == len(parts)
                else None
            ),
        )

    # --- stats ------------------------------------------------------------

    def doc_count(self) -> int:
        return int(self.manifest.stats["doc_count"]) - len(self.deleted)

    def field_cardinality(self, field: str) -> int:
        fs = self.manifest.stats["field_stats"].get(field)
        return int(fs["sum_field_len"]) if fs else 0

    def bm25_metrics(self, field: str) -> Tuple[int, float]:
        """(docCount, avgDocLength) -- bm25ScoreMetrics
        (search_term.go:83-113, including the ceil).  Uses the segment
        stats as written: like Lucene/scorch, tombstoned docs keep
        contributing to scoring statistics until a merge rewrites the
        segments (mutate.py scoring note)."""
        count = int(self.manifest.stats["doc_count"])
        card = self.field_cardinality(field)
        if count == 0 and card == 0:
            return 0, 0.0
        return count, math.ceil(card / count)

    # --- docmeta ----------------------------------------------------------

    def _load_docmeta(self, path: str) -> Tuple[np.ndarray, list]:
        cached = self._docmeta_cache.get(path)
        if cached is None:
            t = pq.read_table(
                os.path.join(self.index_dir, path),
                columns=["docnum", "doc_id", "field"],
            )
            primary = next(iter(self.options["fields"]))
            import pyarrow.compute as pc

            t = t.filter(pc.equal(t["field"], primary)).sort_by("docnum")
            cached = (
                np.asarray(t["docnum"], dtype=np.int64),
                t["doc_id"].to_pylist(),
            )
            self._docmeta_cache[path] = cached
        return cached

    def doc_ids_for(self, docnums: np.ndarray) -> List[str]:
        """Resolve docnums -> external IDs (stored-field lookup equivalent,
        snapshot_index_doc.go).  Entries are bisected by docnum range and
        each touched docmeta file gets one batched searchsorted."""
        n = len(docnums)
        out = [None] * n
        cached = getattr(self, "_docmeta_ranges", None)
        if cached is None:
            # manifest is immutable per reader -- sort + range arrays once
            entries = sorted(
                self.manifest.docmeta, key=lambda e: e.min_docnum
            )
            cached = (
                entries,
                np.array([e.min_docnum for e in entries], dtype=np.int64),
                np.array([e.max_docnum for e in entries], dtype=np.int64),
            )
            self._docmeta_ranges = cached
        entries, los, his = cached
        if not entries or n == 0:
            return out
        docnums = np.asarray(docnums, dtype=np.int64)
        order = np.argsort(docnums, kind="stable")
        sorted_dn = docnums[order]
        eidx = np.searchsorted(his, sorted_dn, side="left")
        ok = (eidx < len(entries)) & (
            los[np.minimum(eidx, len(entries) - 1)] <= sorted_dn
        )
        for ei in np.unique(eidx[ok]):
            sel = np.flatnonzero((eidx == ei) & ok)
            nums, ids = self._load_docmeta(entries[ei].path)
            j = np.searchsorted(nums, sorted_dn[sel])
            j_cl = np.minimum(j, len(nums) - 1)
            hit = nums[j_cl] == sorted_dn[sel]
            for s, jj in zip(sel[hit], j_cl[hit]):
                out[order[s]] = ids[jj]
        return out

    def docnums_for_ids(self, doc_ids: List[str]) -> np.ndarray:
        """External ID -> docnum lookup (DocIDSearcher support,
        search_docid.go).  When the index was built with index_id_field
        (AddIDField, index/scorch/README.md:39-43) each id resolves via a
        row-group-pruned posting lookup on the "_id" keyword field; the
        lazy full docmeta id map is the fallback for older indexes."""
        if self.options.get("index_id_field"):
            parts = []
            # duplicate requested ids collapse (search_docid.go:41
            # dedups via the kept-ids map: "duplicate inputs" vector)
            for d in dict.fromkeys(doc_ids):
                p = self.posting("_id", d)
                if p is not None:
                    parts.append(p.docnums)
            if not parts:
                return np.empty(0, dtype=np.int64)
            return np.unique(np.concatenate(parts))
        if not hasattr(self, "_id_map"):
            m = {}
            for e in self.manifest.docmeta:
                nums, ids = self._load_docmeta(e.path)
                for dn, did in zip(nums.tolist(), ids):
                    m[did] = dn
            self._id_map = m
        out = sorted(
            {self._id_map[d] for d in doc_ids if d in self._id_map}
        )
        return np.array(out, dtype=np.int64)

    def all_docnums(self) -> np.ndarray:
        if self._all_docnums is None:
            parts = [
                self._load_docmeta(e.path)[0] for e in self.manifest.docmeta
            ]
            self._all_docnums = (
                np.sort(np.concatenate(parts))
                if parts
                else np.empty(0, dtype=np.int64)
            )
        return self._all_docnums

    # --- docvalues (forward values; facets/sort/highlight) ---------------

    def _dv_files(self):
        import glob as _glob

        if not hasattr(self, "_dv_list"):
            out = []
            for p in sorted(
                _glob.glob(os.path.join(self.index_dir, "docvalues", "dv_*.parquet"))
            ):
                base = os.path.basename(p)[3 : -len(".parquet")]
                lo_s, hi_s = base.split("_")
                out.append((p, int(lo_s, 16), int(hi_s, 16)))
            self._dv_list = out
            self._dv_cache: Dict[str, Tuple[np.ndarray, dict]] = {}
        return self._dv_list

    def _load_dv(self, path: str):
        cached = self._dv_cache.get(path)
        if cached is None:
            t = pq.read_table(path).sort_by("docnum")
            nums = np.asarray(t["docnum"], dtype=np.int64)
            cols = {}
            for c in t.column_names:
                if c == "docnum":
                    continue
                vals = t[c].to_pylist()
                # 1-D object array ALWAYS: np.asarray on uniform-length
                # list values (geo [lon,lat] pairs, embeddings) would
                # silently build a 2-D array and break the fancy-index
                # gather below
                arr = np.empty(len(vals), dtype=object)
                arr[:] = vals
                cols[c] = arr
            cached = (nums, cols)
            self._dv_cache[path] = cached
        return cached

    def docvalues_rows(
        self, docnums: np.ndarray, fields: List[str]
    ) -> Dict[str, list]:
        """Like docvalues_for but converts ONLY the requested rows to
        Python objects (Arrow take + to_pylist per file) instead of
        materializing whole object columns.  The right call for
        candidate-bounded post-filters over big forward columns (the
        nested same-element verifier): at 12% selectivity this is ~8x
        less conversion work than the cached full-column path that
        facets/sort amortize across calls."""
        n = len(docnums)
        out_np: Dict[str, np.ndarray] = {
            f: np.full(n, None, dtype=object) for f in fields
        }
        fields = [f for f in fields if self.field_live(f)]
        files = self._dv_files()
        if not files or n == 0:
            return {f: v.tolist() for f, v in out_np.items()}
        order = np.argsort(docnums, kind="stable")
        sorted_dn = docnums[order]
        file_his = np.array([hi for _, _, hi in files], dtype=np.int64)
        file_los = np.array([lo for _, lo, _ in files], dtype=np.int64)
        fidx = np.searchsorted(file_his, sorted_dn, side="left")
        in_range = (fidx < len(files)) & (
            file_los[np.minimum(fidx, len(files) - 1)] <= sorted_dn
        )
        import pyarrow as pa

        for fi in np.unique(fidx[in_range]):
            sel = np.flatnonzero((fidx == fi) & in_range)
            dn_sel = sorted_dn[sel]
            path = files[fi][0]
            key = ("arrow", path)
            cached = self._dv_cache.get(key)
            if cached is None:
                t = pq.read_table(path).sort_by("docnum")
                cached = (np.asarray(t["docnum"], dtype=np.int64), t)
                self._dv_cache[key] = cached
            nums, t = cached
            j = np.searchsorted(nums, dn_sel)
            j_cl = np.minimum(j, len(nums) - 1)
            hit = nums[j_cl] == dn_sel
            src = j_cl[hit]
            dst = order[sel[hit]]
            take_idx = pa.array(src)
            for f in fields:
                if f not in t.column_names:
                    continue
                vals = t[f].take(take_idx).to_pylist()
                # 1-D object array ALWAYS (same hazard as _load_dv:
                # np.array on uniform-length lists goes 2-D)
                arr = np.empty(len(vals), dtype=object)
                arr[:] = vals
                out_np[f][dst] = arr
        return {f: v.tolist() for f, v in out_np.items()}

    def docvalues_arrow(self, docnums: np.ndarray, field: str):
        """ONE forward column aligned to docnums as a zero-copy-ish
        Arrow array (no Python conversion at all) — the input the
        vectorized nested verifier (search/nested_fast.py) flattens.
        None when the field is missing, dropped, or any requested doc
        has no stored value (caller falls back to the general path)."""
        import pyarrow as pa

        n = len(docnums)
        if n == 0 or not self.field_live(field):
            return None
        files = self._dv_files()
        if not files:
            return None
        order = np.argsort(docnums, kind="stable")
        sorted_dn = docnums[order]
        file_his = np.array([hi for _, _, hi in files], dtype=np.int64)
        file_los = np.array([lo for _, lo, _ in files], dtype=np.int64)
        fidx = np.searchsorted(file_his, sorted_dn, side="left")
        in_range = (fidx < len(files)) & (
            file_los[np.minimum(fidx, len(files) - 1)] <= sorted_dn
        )
        arrs, dsts = [], []
        for fi in np.unique(fidx[in_range]):
            sel = np.flatnonzero((fidx == fi) & in_range)
            dn_sel = sorted_dn[sel]
            path = files[fi][0]
            key = ("arrow", path)
            cached = self._dv_cache.get(key)
            if cached is None:
                t = pq.read_table(path).sort_by("docnum")
                cached = (np.asarray(t["docnum"], dtype=np.int64), t)
                self._dv_cache[key] = cached
            nums, t = cached
            if field not in t.column_names:
                return None
            j = np.searchsorted(nums, dn_sel)
            j_cl = np.minimum(j, len(nums) - 1)
            hit = nums[j_cl] == dn_sel
            src = j_cl[hit]
            dst = order[sel[hit]]
            a = t[field].take(pa.array(src))
            if isinstance(a, pa.ChunkedArray):
                a = a.combine_chunks()
            arrs.append(a)
            dsts.append(dst)
        if not arrs:
            return None
        got = np.concatenate(dsts)
        if len(got) < n:
            return None
        if len({str(a.type) for a in arrs}) > 1:
            # heterogeneous file schemas (docs ingested with different
            # nesting shapes): not concatenatable — caller falls back
            return None
        merged = pa.concat_arrays(arrs) if len(arrs) > 1 else arrs[0]
        inv = np.empty(n, dtype=np.int64)
        inv[got] = np.arange(len(got), dtype=np.int64)
        return merged.take(pa.array(inv))

    def docvalues_for(
        self, docnums: np.ndarray, fields: List[str]
    ) -> Dict[str, list]:
        """Forward values aligned to docnums (DocValueReader equivalent;
        used by facets, sort-by-field and highlighting's stored text).
        Vectorized: one searchsorted per touched docvalue file, values
        gathered by fancy indexing -- no per-doc Python loop."""
        n = len(docnums)
        out_np: Dict[str, np.ndarray] = {
            f: np.full(n, None, dtype=object) for f in fields
        }
        # mapping-update drops: deleted fields keep their None column
        fields = [f for f in fields if self.field_live(f)]
        files = self._dv_files()
        if not files or n == 0:
            return {f: v.tolist() for f, v in out_np.items()}
        order = np.argsort(docnums, kind="stable")
        sorted_dn = docnums[order]
        file_his = np.array([hi for _, _, hi in files], dtype=np.int64)
        file_los = np.array([lo for _, lo, _ in files], dtype=np.int64)
        fidx = np.searchsorted(file_his, sorted_dn, side="left")
        in_range = (fidx < len(files)) & (
            file_los[np.minimum(fidx, len(files) - 1)] <= sorted_dn
        )
        for fi in np.unique(fidx[in_range]):
            sel = np.flatnonzero((fidx == fi) & in_range)
            dn_sel = sorted_dn[sel]
            nums, cols = self._load_dv(files[fi][0])
            j = np.searchsorted(nums, dn_sel)
            j_cl = np.minimum(j, len(nums) - 1)
            hit = nums[j_cl] == dn_sel
            src = j_cl[hit]
            dst = order[sel[hit]]
            for f in fields:
                col = cols.get(f)
                if col is None and "." in f:
                    # dotted sub-path of a stored struct/nested root
                    # (index/nested.py stores nested roots whole):
                    # extract the leaf values per doc — a LIST when the
                    # path crosses arrays
                    root = f.split(".", 1)[0]
                    rcol = cols.get(root)
                    if rcol is not None:
                        parts = f.split(".")[1:]
                        col = np.empty(len(rcol), dtype=object)
                        col[:] = [
                            _extract_dotted(v, parts) for v in rcol
                        ]
                if col is not None:
                    out_np[f][dst] = col[src]
        return {f: v.tolist() for f, v in out_np.items()}

    def _terms_tables(
        self,
        field: str,
        lo: Optional[str] = None,
        hi: Optional[str] = None,
        inclusive_hi: bool = True,
    ):
        import pyarrow as pa

        self.counters["dictionary_ops"] += 1
        parts = []
        if self.field_live(field):
            for shard_entries in self._by_shard.values():
                for entry in shard_entries:
                    parts.append(
                        self._reader(entry).terms_table(
                            field, lo, hi, inclusive_hi
                        )
                    )
        if not parts:
            return pa.table(
                {"term": pa.array([], type=pa.string()),
                 "df": pa.array([], type=pa.int64())}
            )
        return pa.concat_tables(parts)

    def dictionary(self, field: str) -> List[Tuple[str, int]]:
        """Full sorted term dictionary with global df (FieldDict equivalent,
        snapshot_index.go:242+), vectorized: per-segment column reads +
        one hash aggregate."""
        t = self._terms_tables(field)
        if len(t) == 0:
            return []
        agg = t.group_by("term").aggregate([("df", "sum")]).sort_by("term")
        return list(zip(agg["term"].to_pylist(), agg["df_sum"].to_pylist()))

    def terms_with_prefix(self, field: str, prefix: str) -> List[str]:
        """FieldDictPrefix equivalent; prunes to row groups overlapping
        [prefix, successor(prefix)).  The bound is the true prefix
        successor (last non-U+10FFFF codepoint incremented), not
        prefix+U+10FFFF, which would wrongly exclude terms continuing
        with U+10FFFF itself."""
        hi = _prefix_successor(prefix) if prefix else None
        t = self._terms_tables(field, prefix or None, hi, inclusive_hi=False)
        terms = sorted(set(t["term"].to_pylist()))
        return [x for x in terms if x.startswith(prefix)]

    def terms_in_range(
        self, field: str, lo: Optional[str], hi: Optional[str],
        inclusive_hi: bool = True,
    ) -> List[str]:
        """lo=None / hi=None are open bounds (NewTermRangeSearcher allows
        nil min/max, search_term_range.go).  Row groups outside the range
        are never read (binary-searchable sorted dictionary)."""
        t = self._terms_tables(field, lo, hi, inclusive_hi)
        return sorted(set(t["term"].to_pylist()))

    def terms_matching_automaton(self, field: str, aut) -> List[str]:
        """Sorted distinct terms accepted by an automaton, gathered by
        seek-intersection per segment (FieldDictFuzzy / automaton x FST
        walk, search_fuzzy.go:93-120).  Every shard is consulted --
        (field,term) hashing scatters edit-distance neighbours."""
        self.counters["dictionary_ops"] += 1
        out = set()
        for shard_entries in self._by_shard.values():
            for entry in shard_entries:
                for t, _ in self._reader(entry).terms_matching(field, aut):
                    out.add(t)
        return sorted(out)

    def stats(self) -> Dict:
        """Query-side stats surface (index/scorch/stats.go:29-180 role):
        reader counters + segment/rowgroup observability + index-level
        stats from the manifest."""
        rg_total = rg_read = 0
        for r in self._seg_readers.values():
            rg_total += r._pf.metadata.num_row_groups
            rg_read += r.rg_read_count
        return {
            **self.counters,
            "segments_open": len(self._seg_readers),
            "segments_total": len(self.manifest.segments),
            "row_groups_known": rg_total,
            "row_groups_read": rg_read,
            "doc_count": self.doc_count(),
            "deleted_count": len(self.deleted),
            "epoch": self.manifest.epoch,
        }
