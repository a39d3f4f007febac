"""The Ray-Data index build pipeline.

Model: the reference's offline Builder (index.go:334-346,
index/scorch/builder.go:116-236 -- batch docs, analyze, build segments,
tiered-merge until compact), re-expressed Ray-Data-first:

  read+analyze+partial-invert  (map_batches over row-group descriptors;
                                emits per-(term, batch) posting CHUNKS =
                                the partial pre-aggregation that keeps the
                                shuffle balanced under Zipf terms)
  -> groupby(shard, bucket)    (the groupby-term shuffle; shard =
                                hash(field,term) % S, bucket = docnum-range
                                salt so one hot term cannot form an
                                unbounded group)
  -> map_groups(build segment) (encode delta-varint postings, write one
                                sorted segment parquet per (shard, bucket))
  -> tiered merge              (actor-pool map_batches over MergeTask rows,
                                fan-in 10 per round, builder.go:169-236)
  -> manifest commit per phase (checkpoint/resume; per-partition lineage)

Doc numbering is deterministic under retries: docnum = file_idx << 32 |
row_within_file (derived from input layout, never from execution order --
SURVEY.md §7.5 risk 5).  Build partitions (groups of input files) are the
checkpoint unit: a partition already in the manifest is skipped on re-run.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import dataclass, field as dc_field
from typing import Any, Dict, Iterator, List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..analysis.analyzers import analyzer_named
from ..analysis.freq import analyze_batch, invert_batch_encoded
from . import codec, manifest as manifest_mod, segment as segment_mod
from .manifest import (
    DocmetaEntry,
    Manifest,
    PartitionEntry,
    SegmentEntry,
)
from .mergeplan import MergeTask, plan_merges

DOCNUM_FILE_SHIFT = 32  # docnum = file_idx << 32 | row_in_file


def _limit_arrow_threads() -> None:
    """Cap pyarrow's per-process thread pools inside Ray workers.

    Arrow defaults to os.cpu_count() threads PER PROCESS; with 32 worker
    processes that is ~1000 threads fighting for 32 cores -- measured 7x
    slowdown on parallel segment merge/write.  Two threads per worker keeps
    io overlap without thrashing."""
    if os.environ.get("_BLEVE_ARROW_CAPPED") != str(os.getpid()):
        pa.set_cpu_count(2)
        pa.set_io_thread_count(2)
        os.environ["_BLEVE_ARROW_CAPPED"] = str(os.getpid())



@dataclass
class FieldConfig:
    analyzer: str = "standard"
    positions: bool = True  # IncludeTermVectors equivalent (mapping/field.go:60)
    # "text" | "numeric" | "datetime": numeric/datetime index prefix-coded
    # trie terms (document/field_numeric.go, field_datetime.go) at
    # precisionStep 4 -- see index/numeric.py
    field_type: str = "text"
    # for a STRING column indexed as field_type="datetime": a datetime
    # parser SPEC resolved worker-side (analysis/datetime_parsers
    # .resolve_datetime_parser) -- a registry name ("iso", "flexible",
    # "dateTimeOptional", ...) or an inline instance spec
    # ("percent:%d/%m/%Y %H:%M:%S", "golayout:2006-01-02",
    # "strptime:..."), mirroring the reference mapping's date_format
    # property (mapping/field.go DateFormat)
    datetime_parser: Optional[str] = None


@dataclass
class IndexOptions:
    fields: Dict[str, FieldConfig] = dc_field(
        default_factory=lambda: {"content": FieldConfig()}
    )
    doc_id_fields: Optional[List[str]] = None  # None -> corpus doc_id rule
    num_shards: int = 8
    bucket_bits: int = 35  # docnum-range salt; >32 groups whole files
    # (docnum = file_idx<<32 | row, so bucket_bits=35 => 8 files/bucket;
    #  buckets stay disjoint docnum ranges -> concat-safe merges)
    scoring_model: str = "bm25"
    # columnar per-doc forward values (DocValueReader equivalent,
    # snapshot_index VisitDocValues): used by facets and sort-by-field
    docvalue_fields: List[str] = dc_field(default_factory=list)
    # stored source fields (store:true) -- needed for highlighting
    store_fields: List[str] = dc_field(default_factory=list)
    # composite _all field (document/field_composite.go:33-41): merged token
    # frequencies of all indexed text fields, keeping each source field's
    # own positions (term-vector composite) so phrase queries against
    # _all match within any single contributing field
    enable_all_field: bool = False
    # shuffle implementation for the groupby(shard,bucket) exchange:
    #   "storage": stage-1 tasks write per-group Arrow-IPC chunk files;
    #              stage-2 = one Ray task per group (external shuffle --
    #              the pattern real petabyte index builds use; measured
    #              ~4x faster than the object-store sort on this workload
    #              and naturally spill-friendly/resumable)
    #   "ray":     ds.groupby(...).map_groups(...) object-store sort
    shuffle: str = "storage"
    # index the external doc id as a keyword field "_id" (AddIDField,
    # index/scorch/README.md:39-43): id lookups become posting lookups
    # instead of a driver-side id map scan
    index_id_field: bool = False
    # mapping-level default analyzer: resolves query-time analysis for
    # fields without an explicit entry, notably the "_all" composite
    # (mapping/index.go DefaultAnalyzer)
    default_analyzer: str = "standard"
    analyze_rows: int = 1024  # rows per analyze sub-batch
    # optional root for the TRANSIENT chunk-exchange files (the storage
    # shuffle's scratch space; GC'd after segments build).  Pointing it at
    # a memory-backed fs (/dev/shm) keeps the exchange off the durable
    # disk -- the single-node stand-in for a cluster's memory/object-store
    # shuffle tier.  Durable outputs (segments, docvalues, manifest)
    # always stay under index_dir.
    chunk_root: Optional[str] = None
    merge_fan_in: int = 10
    # "builder" = the offline Builder loop (merge up to fan_in, repeat to
    # target_per_shard); "tiered" = the full TieredMergePolicy planner
    # (mergeplan.plan_tiered: CalcBudget + roster scoring) for
    # steady-state incremental indexes
    merge_policy: str = "builder"
    target_segments_per_shard: int = 1
    merge_concurrency: int = 16
    # term->shard router (part of the on-disk format; recorded in the
    # manifest so readers of older sha1-routed indexes keep routing
    # correctly).  "poly64" = vectorized seeded polynomial+splitmix64
    # (index/shard_hash.py); "sha1" = the legacy per-term digest.
    shard_hash: str = "poly64"
    # dotted property paths whose array elements are NESTED sub-documents
    # (mapping/document.go:48 DocumentMapping.Nested): conjunctions over
    # fields under the same nested path must match within the SAME array
    # element (search_nested_test.go).  Fields under a nested path are
    # excluded from _all (search_nested_test.go Test 13), and each path's
    # ROOT column should be a docvalue so the query-time same-element
    # verifier (search/nested.py) can re-scope candidate docs.
    nested_paths: List[str] = dc_field(default_factory=list)

    def to_dict(self) -> Dict[str, Any]:
        return {
            "fields": {
                k: {
                    "analyzer": v.analyzer,
                    "positions": v.positions,
                    "field_type": v.field_type,
                    **(
                        {"datetime_parser": v.datetime_parser}
                        if v.datetime_parser
                        else {}
                    ),
                }
                for k, v in self.fields.items()
            },
            "doc_id_fields": self.doc_id_fields,
            "num_shards": self.num_shards,
            "bucket_bits": self.bucket_bits,
            "scoring_model": self.scoring_model,
            "docvalue_fields": self.docvalue_fields,
            "store_fields": self.store_fields,
            "enable_all_field": self.enable_all_field,
            "index_id_field": self.index_id_field,
            "default_analyzer": self.default_analyzer,
            "shard_hash": self.shard_hash,
            "nested_paths": self.nested_paths,
        }

    @staticmethod
    def from_dict(d: Dict[str, Any]) -> "IndexOptions":
        """Rebuild options from a manifest's options dict (incremental
        adds must analyze exactly like the original build)."""
        return IndexOptions(
            fields={
                k: FieldConfig(
                    analyzer=v.get("analyzer", "standard"),
                    positions=v.get("positions", True),
                    field_type=v.get("field_type", "text"),
                    datetime_parser=v.get("datetime_parser"),
                )
                for k, v in d["fields"].items()
            },
            doc_id_fields=d.get("doc_id_fields"),
            num_shards=d["num_shards"],
            bucket_bits=d["bucket_bits"],
            scoring_model=d.get("scoring_model", "bm25"),
            docvalue_fields=list(d.get("docvalue_fields", [])),
            store_fields=list(d.get("store_fields", [])),
            enable_all_field=d.get("enable_all_field", False),
            index_id_field=d.get("index_id_field", False),
            default_analyzer=d.get("default_analyzer", "standard"),
            # manifests that predate the poly64 router were sha1-routed
            shard_hash=d.get("shard_hash", "sha1"),
            nested_paths=list(d.get("nested_paths", [])),
        )


def chunk_base(index_dir: str, chunk_root: Optional[str]) -> str:
    """Directory for transient shuffle chunk files (see
    IndexOptions.chunk_root)."""
    if chunk_root:
        tag = hashlib.sha1(
            os.path.abspath(index_dir).encode()
        ).hexdigest()[:12]
        return os.path.join(chunk_root, f"chunks_{tag}")
    return os.path.join(index_dir, "chunks")


def _is_list_type(t: pa.DataType) -> bool:
    return pa.types.is_list(t) or pa.types.is_large_list(t)


def _flatten_one(col: pa.Array):
    """One list level -> (flat child values, element count per row)."""
    counts = np.asarray(
        pc.fill_null(pc.list_value_length(col), 0), dtype=np.int64
    )
    return pc.list_flatten(col), counts


def resolve_field_column(tbl: pa.Table, fname: str):
    """Column for a (possibly dotted) field path; struct children descend
    like the reference's document-mapping tree paths (mapping/document.go
    DocumentMapping.Properties).  Array-of-struct levels (list<struct>,
    incl. nested lists) flatten vectorized and re-wrap to one list value
    per row, so "departments.name" over a list<struct> column indexes
    every element's name against the parent doc (mapping/document.go
    processProperty on arrays).  None when absent."""
    if fname in tbl.column_names:
        return tbl[fname]
    if "." not in fname:
        return None
    head, _, rest = fname.partition(".")
    if head not in tbl.column_names:
        return None
    col = tbl[head]
    n_rows = len(tbl)
    # element count per top-level row; None until a list level is crossed
    row_counts = None
    for part in rest.split("."):
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        while _is_list_type(col.type):
            col, counts = _flatten_one(col)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            if row_counts is None:
                row_counts = counts
            else:
                # counts are per current element; sum back to rows
                seg = np.repeat(
                    np.arange(len(row_counts), dtype=np.int64), row_counts
                )
                row_counts = np.bincount(
                    seg, weights=counts, minlength=len(row_counts)
                ).astype(np.int64)
        if not pa.types.is_struct(col.type):
            return None
        try:
            col = pc.struct_field(col, part)
        except (KeyError, pa.ArrowInvalid):
            return None
    if row_counts is None:
        return col
    # re-wrap flattened element values into one list per ORIGINAL row so
    # downstream multi-value handling (analyze_batch / _numeric_tokens
    # list branches) maps elements back to their parent doc
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    offsets = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(row_counts, out=offsets[1:])
    return pa.LargeListArray.from_arrays(
        pa.array(offsets, type=pa.int64()), col
    )


def compute_doc_ids(batch: pa.Table, options: IndexOptions) -> pa.Array:
    if options.doc_id_fields is None:
        from ..corpus import doc_id_array

        if "repo" in batch.column_names:
            return doc_id_array(batch)
        # generic fallback: first string-ish column named *id* else row hash
        for c in ("doc_id", "id"):
            if c in batch.column_names:
                return pc.cast(batch[c], pa.string())
        raise ValueError("cannot derive doc_id; set doc_id_fields")
    cols = [pc.cast(batch[c], pa.string()) for c in options.doc_id_fields]
    if len(cols) == 1:
        return cols[0]
    return pc.binary_join_element_wise(*cols, "/")


def _numeric_tokens(
    col: pa.ChunkedArray, field_type: str, datetime_parser: str = None
):
    """Numeric/datetime column -> prefix-coded trie term stream
    (16 terms per value at shifts 0,4,...,60), fully vectorized: the
    sortable mapping is a numpy bit flip, each shift level's terms are
    built as a (n, width) uint8 matrix viewed as fixed-width bytes.

    A STRING column with field_type="datetime" is parsed value-by-value
    through the named registry parser (date_format semantics,
    mapping/field.go); unparseable values are skipped like nulls."""
    import pyarrow as _pa

    from .numeric import PRECISION_STEP, SHIFT_START

    typ = col.type
    n_rows = len(col)
    if _pa.types.is_list(typ) or _pa.types.is_large_list(typ):
        # multi-valued numeric field ("tags": [1,2,3] -- the reference
        # indexes each array element as its own numeric field value,
        # mapping/document.go processProperty on arrays): flatten and
        # map each value back to its parent row
        arr = col.combine_chunks() if isinstance(col, _pa.ChunkedArray) else col
        counts = np.asarray(
            pc.fill_null(pc.list_value_length(arr), 0), dtype=np.int64
        )
        parent = np.repeat(np.arange(n_rows, dtype=np.int64), counts)
        flat = pc.list_flatten(arr)
        vt, vd, vp, _vf = _numeric_tokens(
            _pa.chunked_array([flat]), field_type, datetime_parser
        )
        doc_idx = parent[vd]
        field_len = np.bincount(doc_idx, minlength=n_rows).astype(np.int64)
        return vt, doc_idx, vp, field_len
    if field_type == "datetime" and (
        _pa.types.is_string(typ) or _pa.types.is_large_string(typ)
    ):
        from ..analysis.datetime_parsers import resolve_datetime_parser

        parse = resolve_datetime_parser(datetime_parser or "iso")
        vals = col.to_pylist()
        iv64 = np.zeros(n_rows, dtype=np.int64)
        valid = np.zeros(n_rows, dtype=bool)
        for i, v in enumerate(vals):
            if v is None:
                continue
            ns = parse(v)
            if ns is not None:
                iv64[i] = ns
                valid[i] = True
        valid_idx = np.flatnonzero(valid).astype(np.int64)
        return trie_terms_for_values(
            iv64[valid_idx], valid_idx, n_rows, PRECISION_STEP
        )
    if field_type == "datetime" or _pa.types.is_timestamp(typ):
        unit = typ.unit if _pa.types.is_timestamp(typ) else "us"
        mult = {"s": 10**9, "ms": 10**6, "us": 10**3, "ns": 1}[unit]
        casted = pc.cast(col, _pa.int64())
        if isinstance(casted, _pa.ChunkedArray):
            casted = casted.combine_chunks()
        valid = np.asarray(casted.is_valid())
        iv = np.asarray(casted.fill_null(0), dtype=np.int64) * np.int64(mult)
    else:
        casted = pc.cast(col, _pa.float64())
        if isinstance(casted, _pa.ChunkedArray):
            casted = casted.combine_chunks()
        valid = np.asarray(casted.is_valid())
        f = np.asarray(casted.fill_null(0.0), dtype=np.float64)
        # Float64ToInt64 sortable mapping (numeric/float.go), vectorized
        bits = f.view(np.int64).copy()
        neg = bits < 0
        bits[neg] ^= np.int64(0x7FFFFFFFFFFFFFFF)
        iv = bits
    valid_idx = np.flatnonzero(valid).astype(np.int64)
    iv = iv[valid_idx]
    return trie_terms_for_values(iv, valid_idx, n_rows, PRECISION_STEP)


def trie_terms_for_values(
    iv: np.ndarray, valid_idx: np.ndarray, n_rows: int, precision_step: int
):
    """Vectorized prefix-coded trie terms for int64 values at every shift
    level (shared by numeric/datetime [step 4] and geo morton [step 9,
    document/field_geopoint.go:35])."""
    from .numeric import SHIFT_START

    nv = len(iv)
    sortable0 = iv.view(np.uint64) ^ np.uint64(0x8000000000000000)
    term_chunks = []
    for sft in range(0, 64, precision_step):
        n_chars = ((63 - sft) // 7) + 1
        width = n_chars + 1
        mat = np.empty((nv, width), dtype=np.uint8)
        mat[:, 0] = SHIFT_START + sft
        s = sortable0 >> np.uint64(sft)
        for j in range(n_chars):
            sh = np.uint64(7 * (n_chars - 1 - j))
            mat[:, 1 + j] = (s >> sh) & np.uint64(0x7F)
        # fixed-width rows -> StringArray via raw buffers (S-dtype would
        # strip legitimate trailing 0x00 bytes from the coded terms)
        offsets = np.arange(0, (nv + 1) * width, width, dtype=np.int32)
        term_chunks.append(
            pa.StringArray.from_buffers(
                nv,
                pa.py_buffer(offsets.tobytes()),
                pa.py_buffer(mat.tobytes()),
            )
        )
    n_shifts = len(term_chunks)
    terms = pa.concat_arrays(term_chunks)
    doc_idx = np.tile(valid_idx, n_shifts)
    positions = np.zeros(len(doc_idx), dtype=np.int32)
    field_len = np.zeros(n_rows, dtype=np.int64)
    field_len[valid_idx] = n_shifts
    return terms, doc_idx, positions, field_len


def _geo_tokens(col: pa.ChunkedArray):
    """Geo column (struct{lon,lat} or list[lon,lat]) -> morton-hash trie
    terms at precision step 9 (document/field_geopoint.go:115-129,
    geo/geo.go:50 MortonHash)."""
    from .geo import GEO_PRECISION_STEP, morton_hash

    arr = col.combine_chunks()
    n_rows = len(arr)
    if pa.types.is_struct(arr.type):
        # field-name resolution mirrors geo/parse.go ExtractGeoPoint:
        # exact lon/lng/lat first, then case-insensitive prefix match
        names = [f.name for f in arr.type]

        def _pick(cands, prefixes):
            for c in cands:
                if c in names:
                    return c
            for nm in names:
                if any(nm.lower().startswith(p) for p in prefixes):
                    return nm
            return None

        lon_f = _pick(("lon", "lng"), ("lon", "lng"))
        lat_f = _pick(("lat",), ("lat",))
        if lon_f is None or lat_f is None:
            return trie_terms_for_values(
                np.empty(0, dtype=np.int64),
                np.empty(0, dtype=np.int64), n_rows, GEO_PRECISION_STEP,
            )
        lon = np.asarray(
            pc.cast(arr.field(lon_f), pa.float64()).fill_null(np.nan)
        )
        lat = np.asarray(
            pc.cast(arr.field(lat_f), pa.float64()).fill_null(np.nan)
        )
        valid = np.asarray(arr.is_valid()) & ~np.isnan(lon) & ~np.isnan(lat)
    elif pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
        # geo.go extractGeoPoint string forms: "lat,lon" or a geohash
        from .geo import decode_geohash

        valid = np.asarray(arr.is_valid())
        lon = np.full(n_rows, np.nan)
        lat = np.full(n_rows, np.nan)
        for i, v in enumerate(arr.to_pylist()):
            if not v:
                continue
            try:
                if "," in v:
                    a, b = v.split(",", 1)
                    lat[i], lon[i] = float(a), float(b)
                else:
                    lat[i], lon[i] = decode_geohash(v)
            except (ValueError, KeyError):
                pass
        valid &= ~np.isnan(lon) & ~np.isnan(lat)
    else:  # list<double> [lon, lat]
        valid = np.asarray(arr.is_valid())
        lon = np.full(n_rows, np.nan)
        lat = np.full(n_rows, np.nan)
        vals = arr.to_pylist()
        for i, v in enumerate(vals):
            if v is not None and len(v) == 2:
                lon[i], lat[i] = float(v[0]), float(v[1])
        valid &= ~np.isnan(lon) & ~np.isnan(lat)
    valid_idx = np.flatnonzero(valid).astype(np.int64)
    mh = morton_hash(lon[valid_idx], lat[valid_idx]).view(np.int64)
    return trie_terms_for_values(
        mh, valid_idx, n_rows, GEO_PRECISION_STEP
    )


def _geoshape_tokens(col: pa.ChunkedArray):
    """GeoJSON shape column (string/dict values) -> quadtree covering-cell
    tokens (document/field_geoshape.go role; cell scheme in
    index/geo_shapes.py).  Shape parsing + cover is inherently per-row
    (variable-geometry recursion); the per-doc loop here is the
    vectorization floor for this field type."""
    from .geo_shapes import shape_tokens

    vals = col.to_pylist()
    n_rows = len(vals)
    flat: list = []
    di: list = []
    field_len = np.zeros(n_rows, dtype=np.int64)
    for i, v in enumerate(vals):
        if v is None:
            continue
        toks = shape_tokens(v)
        flat.extend(toks)
        di.extend([i] * len(toks))
        field_len[i] = len(toks)
    terms = pa.array(flat, type=pa.string())
    doc_idx = np.asarray(di, dtype=np.int64)
    positions = np.zeros(len(doc_idx), dtype=np.int32)
    return terms, doc_idx, positions, field_len


# (field, term, num_shards) -> shard cache: terms follow a Zipf law, so in
# steady state nearly every lookup hits; sha1 runs once per distinct term
# per worker process.  Bounded to keep worker heaps flat.
_SHARD_CACHE: Dict = {}
_SHARD_CACHE_MAX = 2_000_000


def _boolean_tokens(col: pa.ChunkedArray):
    """Boolean field -> single term 'T'/'F' (document/field_boolean.go)."""
    arr = pc.cast(col.combine_chunks(), pa.bool_())
    n_rows = len(arr)
    valid = np.asarray(arr.is_valid())
    vals = np.asarray(arr.fill_null(False))
    valid_idx = np.flatnonzero(valid).astype(np.int64)
    terms = pa.array(
        np.where(vals[valid_idx], "T", "F"), type=pa.string()
    )
    positions = np.zeros(len(valid_idx), dtype=np.int32)
    field_len = np.zeros(n_rows, dtype=np.int64)
    field_len[valid_idx] = 1
    return terms, valid_idx, positions, field_len


def ip_term(value: str) -> str:
    """IP -> 16-byte term (net.IP.To16, query/ip_range.go:69), carried as
    a latin-1 string so byte order == codepoint order == term order."""
    import ipaddress

    ip = ipaddress.ip_address(value.strip())
    if isinstance(ip, ipaddress.IPv4Address):
        b = bytes(12)[:10] + b"\xff\xff" + ip.packed
    else:
        b = ip.packed
    return b.decode("latin-1")


def _ip_tokens(col: pa.ChunkedArray):
    """IP field -> one 16-byte term per value."""
    arr = pc.cast(col.combine_chunks(), pa.string())
    n_rows = len(arr)
    vals = arr.to_pylist()
    out, idx = [], []
    for i, v in enumerate(vals):
        if v is None:
            continue
        try:
            out.append(ip_term(v))
            idx.append(i)
        except ValueError:
            continue
    valid_idx = np.asarray(idx, dtype=np.int64)
    positions = np.zeros(len(valid_idx), dtype=np.int32)
    field_len = np.zeros(n_rows, dtype=np.int64)
    field_len[valid_idx] = 1
    return pa.array(out, type=pa.string()), valid_idx, positions, field_len


def shard_of_terms(
    field: str, terms: pa.Array, num_shards: int, method: str = "poly64"
) -> np.ndarray:
    """Deterministic shard id per term of one field.  Stable across
    runs/processes (no PYTHONHASHSEED dependence); the method is recorded
    in the manifest (IndexOptions.shard_hash) so readers route the same
    way forever.  poly64 = vectorized numpy hash (index/shard_hash.py);
    sha1 = legacy per-term digest for incremental adds to old indexes."""
    from .shard_hash import poly_shards

    if method != "sha1":
        return poly_shards(field, terms, num_shards)
    out = np.empty(len(terms), dtype=np.int32)
    tl = terms.to_pylist()
    cache = _SHARD_CACHE
    room = len(cache) < _SHARD_CACHE_MAX
    for i, t in enumerate(tl):
        key = (field, t, num_shards)
        s = cache.get(key)
        if s is None:
            h = hashlib.sha1(f"{field}\x1f{t}".encode()).digest()
            s = int.from_bytes(h[:4], "little") % num_shards
            if room:
                cache[key] = s
        out[i] = s
    return out


def _under_nested(field: str, nested_paths) -> bool:
    """True when any nested path is a dotted prefix of ``field`` — such
    fields stay out of the composite _all field (search_nested_test.go
    Test 13: unfielded queries match only top-level fields)."""
    return any(
        field == p or field.startswith(p + ".") for p in nested_paths or ()
    )


class ReadAnalyzeInvert:
    """Stage 1 UDF: row-group descriptor -> posting chunk rows.

    Side effects (deterministic, idempotent under retry): writes one docmeta
    parquet per analyze sub-batch, named by its docnum range.
    """

    def __init__(self, index_dir: str, options: IndexOptions):
        self.index_dir = index_dir
        self.options = options
        self.analyzers = {
            f: analyzer_named(cfg.analyzer)
            for f, cfg in options.fields.items()
            if cfg.field_type == "text"
        }

    def __call__(self, descs: pa.Table) -> Iterator[pa.Table]:
        _limit_arrow_threads()
        for d in descs.to_pylist():
            yield from self._process_rg(d)

    def _process_rg(self, d: dict) -> Iterator[pa.Table]:
        opts = self.options
        pf = pq.ParquetFile(d["path"])
        cols = list(
            dict.fromkeys(
                # dotted paths (document-mapping tree, mapping/document.go
                # sub-documents) prune to their ROOT parquet column
                [c.split(".", 1)[0] for c in opts.fields]
                + (opts.doc_id_fields or ["repo", "path", "commit", "doc_id", "id"])
                + [c.split(".", 1)[0] for c in opts.docvalue_fields]
                + [c.split(".", 1)[0] for c in opts.store_fields]
            )
        )
        cols = [c for c in cols if c in pf.schema_arrow.names]
        row = d["row_start"]
        for rb in pf.iter_batches(
            batch_size=opts.analyze_rows,
            row_groups=[d["rg"]],
            columns=cols,
        ):
            tbl = pa.Table.from_batches([rb])
            n = len(tbl)
            docnums = (
                (d["file_idx"] << DOCNUM_FILE_SHIFT) + np.arange(row, row + n)
            ).astype(np.int64)
            yield from self._process_subbatch(tbl, docnums)
            row += n

    def _process_subbatch(
        self, tbl: pa.Table, docnums: np.ndarray
    ) -> Iterator[pa.Table]:
        opts = self.options
        doc_ids = compute_doc_ids(tbl, opts)
        # docmeta side-write (one file per sub-batch, docnum-range named)
        meta_rows = {
            "docnum": [],
            "doc_id": [],
            "field": [],
            "field_len": [],
            "sha256": [],
        }
        chunk_tables = []
        primary_field = next(iter(opts.fields))
        _prim = resolve_field_column(tbl, primary_field)
        _prim_vals = (
            _prim.to_pylist() if _prim is not None else [None] * len(tbl)
        )
        shas = [
            hashlib.sha256(
                (
                    t if isinstance(t, str) else "" if t is None else repr(t)
                ).encode("utf-8")
            ).hexdigest()
            for t in _prim_vals
        ]
        all_terms, all_doc_idx, all_field_len = [], [], None
        all_positions = []
        for fname, fcfg in opts.fields.items():
            fcol = resolve_field_column(tbl, fname)
            if fcol is None or len(fcol) == 0:
                continue
            if fcfg.field_type == "geo":
                terms, doc_idx, positions, field_len = _geo_tokens(
                    fcol
                )
            elif fcfg.field_type == "geoshape":
                terms, doc_idx, positions, field_len = _geoshape_tokens(
                    fcol
                )
            elif fcfg.field_type == "boolean":
                terms, doc_idx, positions, field_len = _boolean_tokens(
                    fcol
                )
            elif fcfg.field_type == "ip":
                terms, doc_idx, positions, field_len = _ip_tokens(
                    fcol
                )
            elif fcfg.field_type != "text":
                terms, doc_idx, positions, field_len = _numeric_tokens(
                    fcol, fcfg.field_type, fcfg.datetime_parser
                )
            else:
                analyzer = self.analyzers[fname]
                terms, doc_idx, positions, field_len = analyze_batch(
                    fcol, analyzer
                )
            if (
                opts.enable_all_field
                and not _under_nested(fname, opts.nested_paths)
            ):
                # EVERY include-in-all field feeds the composite — text
                # tokens AND numeric/datetime/boolean/geo trie terms,
                # like the reference's _all (document.go composite over
                # all IncludeInAll fields).  Their lengths count toward
                # the composite field length, which is what makes the
                # reference's _all norms differ between docs with and
                # without numeric attributes (test/tests/sort scores).
                all_terms.append(terms)
                all_doc_idx.append(doc_idx)
                all_positions.append(positions)
                all_field_len = (
                    field_len
                    if all_field_len is None
                    else all_field_len + field_len
                )
            meta_rows["docnum"].extend(docnums.tolist())
            meta_rows["doc_id"].extend(doc_ids.to_pylist())
            meta_rows["field"].extend([fname] * len(tbl))
            meta_rows["field_len"].extend(field_len.tolist())
            meta_rows["sha256"].extend(shas)
            # split by bucket so chunk docnum ranges never span buckets
            bucket_per_doc = docnums >> opts.bucket_bits
            bucket_per_tok = bucket_per_doc[doc_idx]
            for b in np.unique(bucket_per_tok):
                sel = bucket_per_tok == b
                chunk = invert_batch_encoded(
                    terms.filter(pa.array(sel)),
                    doc_idx[sel],
                    positions[sel],
                    docnums,
                    field_len,
                    keep_positions=fcfg.positions
                    and fcfg.field_type == "text",
                )
                if len(chunk) == 0:
                    continue
                nrows = len(chunk)
                shard = shard_of_terms(
                    fname, chunk["term"], opts.num_shards, opts.shard_hash
                )
                chunk = (
                    chunk.append_column("field", pa.array([fname] * nrows))
                    .append_column("shard", pa.array(shard, type=pa.int32()))
                    .append_column(
                        "bucket", pa.array(np.full(nrows, b), type=pa.int64())
                    )
                )
                chunk_tables.append(chunk)
        if opts.index_id_field:
            # one keyword term per doc: the external id itself
            n = len(tbl)
            id_doc_idx = np.arange(n, dtype=np.int64)
            id_positions = np.zeros(n, dtype=np.int32)
            id_field_len = np.ones(n, dtype=np.int64)
            meta_rows["docnum"].extend(docnums.tolist())
            meta_rows["doc_id"].extend(doc_ids.to_pylist())
            meta_rows["field"].extend(["_id"] * n)
            meta_rows["field_len"].extend(id_field_len.tolist())
            meta_rows["sha256"].extend(shas)
            bucket_per_tok = docnums >> opts.bucket_bits
            for b in np.unique(bucket_per_tok):
                sel = bucket_per_tok == b
                chunk = invert_batch_encoded(
                    pc.cast(doc_ids, pa.string()).filter(pa.array(sel)),
                    id_doc_idx[sel],
                    id_positions[sel],
                    docnums,
                    id_field_len,
                    keep_positions=False,
                )
                if len(chunk) == 0:
                    continue
                nrows = len(chunk)
                shard = shard_of_terms(
                    "_id", chunk["term"], opts.num_shards, opts.shard_hash
                )
                chunk_tables.append(
                    chunk.append_column("field", pa.array(["_id"] * nrows))
                    .append_column("shard", pa.array(shard, type=pa.int32()))
                    .append_column(
                        "bucket", pa.array(np.full(nrows, b), type=pa.int64())
                    )
                )
        if opts.enable_all_field and all_terms:
            terms = pa.concat_arrays(
                [t.combine_chunks() if isinstance(t, pa.ChunkedArray) else t
                 for t in all_terms]
            )
            doc_idx = np.concatenate(all_doc_idx)
            # composite keeps each contributing field's OWN positions
            # (document/field_composite.go with term vectors): phrase
            # queries against _all match within any single source field
            positions = np.concatenate(all_positions).astype(np.int32)
            meta_rows["docnum"].extend(docnums.tolist())
            meta_rows["doc_id"].extend(doc_ids.to_pylist())
            meta_rows["field"].extend(["_all"] * len(tbl))
            meta_rows["field_len"].extend(all_field_len.tolist())
            meta_rows["sha256"].extend(shas)
            bucket_per_tok = (docnums >> opts.bucket_bits)[doc_idx]
            for b in np.unique(bucket_per_tok):
                sel = bucket_per_tok == b
                chunk = invert_batch_encoded(
                    terms.filter(pa.array(sel)),
                    doc_idx[sel],
                    positions[sel],
                    docnums,
                    all_field_len,
                    keep_positions=True,
                )
                if len(chunk) == 0:
                    continue
                nrows = len(chunk)
                shard = shard_of_terms(
                    "_all", chunk["term"], opts.num_shards, opts.shard_hash
                )
                chunk_tables.append(
                    chunk.append_column("field", pa.array(["_all"] * nrows))
                    .append_column("shard", pa.array(shard, type=pa.int32()))
                    .append_column(
                        "bucket", pa.array(np.full(nrows, b), type=pa.int64())
                    )
                )
        self._write_docmeta(meta_rows, docnums)
        self._write_docvalues(tbl, docnums)
        if chunk_tables:
            packed = _pack_chunks(pa.concat_tables(chunk_tables))
            if opts.shuffle == "storage":
                out = self._write_chunk_files(packed, docnums)
                # lineage row: per-sub-batch digest of the per-row content
                # sha256s (combined hierarchically on the driver)
                digest = hashlib.sha256("".join(shas).encode()).hexdigest()
                # payload carries the sub-batch's chunk-manifest row count
                # too: the streaming consumer may see this lineage row
                # BEFORE the chunk rows (Ray Data can split one task
                # output across blocks in any delivery order), so bucket
                # completion requires BOTH row accounting and chunk-row
                # accounting to close
                lineage = pa.table(
                    {
                        "shard": pa.array([-1], type=pa.int32()),
                        "bucket": pa.array(
                            [int(docnums[0])], type=pa.int64()
                        ),
                        "path": pa.array(
                            [f"{digest}:{len(tbl)}:{len(out)}"],
                            type=pa.string(),
                        ),
                    }
                )
                yield pa.concat_tables([out, lineage])
            else:
                yield packed

    def _write_docmeta(self, meta_rows: dict, docnums: np.ndarray) -> None:
        meta = pa.table(
            {
                "docnum": pa.array(meta_rows["docnum"], type=pa.int64()),
                "doc_id": pa.array(meta_rows["doc_id"], type=pa.string()),
                "field": pa.array(meta_rows["field"], type=pa.string()),
                "field_len": pa.array(meta_rows["field_len"], type=pa.int64()),
                "sha256": pa.array(meta_rows["sha256"], type=pa.string()),
            }
        )
        # per-file field-stats partial embedded in the parquet footer:
        # finalize_stats sums these footer partials instead of loading
        # every (doc, field) row onto the driver (100-TB safety)
        fl = pa.TableGroupBy(
            meta.select(["field", "field_len"]), "field"
        ).aggregate([("field_len", "sum"), ("field_len", "count")])
        partial = {
            r["field"]: [int(r["field_len_sum"]), int(r["field_len_count"])]
            for r in fl.to_pylist()
        }
        meta = meta.replace_schema_metadata(
            {b"field_stats": json.dumps(partial).encode()}
        )
        dmdir = os.path.join(self.index_dir, "docmeta")
        os.makedirs(dmdir, exist_ok=True)
        name = f"dm_{int(docnums[0]):016x}_{int(docnums[-1]):016x}.parquet"
        path = os.path.join(dmdir, name)
        tmp = path + f".tmp{os.getpid()}"
        pq.write_table(meta, tmp, compression="zstd")
        os.replace(tmp, path)

    def _write_chunk_files(
        self, packed: pa.Table, docnums: np.ndarray
    ) -> pa.Table:
        """Storage-exchange shuffle: persist ONE container file per
        (sub-batch, bucket) holding every shard's IPC blob back to back,
        named by the sub-batch's first docnum (deterministic -> idempotent
        under retry).  Manifest rows carry ``path:offset:length`` so
        stage-2 tasks do ranged reads of a shared file -- one
        create+rename per sub-batch instead of one per shard (~32x fewer
        fs-metadata ops, the chunk-exchange cost that does NOT scale with
        workers)."""
        base = chunk_base(self.index_dir, self.options.chunk_root)
        shards = packed["shard"].to_pylist()
        buckets = packed["bucket"].to_pylist()
        blobs = packed["ipc"].to_pylist()
        per_bucket: Dict[int, List[int]] = {}
        for i, b in enumerate(buckets):
            per_bucket.setdefault(b, []).append(i)
        refs = [""] * len(packed)
        for b, idxs in per_bucket.items():
            d = os.path.join(base, f"b{b:012x}")
            os.makedirs(d, exist_ok=True)
            path = os.path.join(d, f"{int(docnums[0]):016x}.arrow")
            tmp = path + f".tmp{os.getpid()}"
            off = 0
            with open(tmp, "wb") as f:
                for i in idxs:
                    f.write(blobs[i])
                    refs[i] = f"{path}:{off}:{len(blobs[i])}"
                    off += len(blobs[i])
            os.replace(tmp, path)
        return pa.table(
            {
                "shard": packed["shard"],
                "bucket": packed["bucket"],
                "path": pa.array(refs, type=pa.string()),
            }
        )

    def _write_docvalues(self, tbl: pa.Table, docnums: np.ndarray) -> None:
        """Columnar forward values (+ stored fields) per sub-batch; the
        docvalues/stored analogue of zap docvalue sections."""
        opts = self.options
        col_map = {}
        for c in dict.fromkeys(
            list(opts.docvalue_fields) + list(opts.store_fields)
        ):
            col = resolve_field_column(tbl, c)
            if col is not None:
                col_map[c] = col
        if not col_map:
            return
        dv = pa.table(
            {"docnum": pa.array(docnums, type=pa.int64()), **col_map}
        )
        dvdir = os.path.join(self.index_dir, "docvalues")
        os.makedirs(dvdir, exist_ok=True)
        name = f"dv_{int(docnums[0]):016x}_{int(docnums[-1]):016x}.parquet"
        path = os.path.join(dvdir, name)
        tmp = path + f".tmp{os.getpid()}"
        pq.write_table(dv, tmp, compression="zstd")
        os.replace(tmp, path)


def _blob_runs_from_offsets(buf, elem_off: np.ndarray) -> pa.Array:
    """Binary array whose i-th value is bytes elem_off[i]..elem_off[i+1]
    of buf -- zero-copy (offsets + one shared buffer)."""
    if len(elem_off) and elem_off[-1] > 0x7FFFFFFF:
        # >2 GiB group: fall back to per-value bytes (merge tasks at that
        # size should have been split by the merge planner)
        return pa.array(
            [bytes(buf[elem_off[i] : elem_off[i + 1]])
             for i in range(len(elem_off) - 1)],
            type=pa.binary(),
        )
    off32 = np.ascontiguousarray(elem_off, dtype=np.int32)
    return pa.Array.from_buffers(
        pa.binary(),
        len(elem_off) - 1,
        [None, pa.py_buffer(off32), pa.py_buffer(buf)],
    )


def _blob_runs(col, breaks: np.ndarray) -> pa.Array:
    """Concatenate consecutive runs of a binary column's values without
    copying: run bi = rows breaks[bi]..breaks[bi+1], whose bytes are
    contiguous in the column's data buffer (column must come from a
    freshly sorted/rebuilt table, which merge_encoded_rows' sort_by
    guarantees)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    odt = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
    bufs = arr.buffers()
    off = np.frombuffer(bufs[1], dtype=odt)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    data = (
        np.frombuffer(bufs[2], dtype=np.uint8)[off[0] : off[-1]]
        if bufs[2] is not None
        else np.empty(0, dtype=np.uint8)
    )
    return _blob_runs_from_offsets(data, off[breaks] - off[0])


def merge_encoded_rows(group: pa.Table) -> pa.Table:
    """Merge encoded posting rows (chunk or segment layout) that share
    (field, term) into one row each, ordered by min_docnum.

    Blob concat rules: tfs (independent varints), norms (fixed-width
    float32) and positions (per-doc delta restart) blobs concatenate raw;
    docnum blobs must be decoded/re-encoded because the delta chain restarts
    per blob.  Segments hold disjoint docnum ranges so concat in
    min_docnum order IS the sorted merge."""
    group = group.sort_by(
        [
            ("field", "ascending"),
            ("term", "ascending"),
            ("min_docnum", "ascending"),
        ]
    )
    n = len(group)
    if n == 0:
        return group
    dfs = np.asarray(group["df"], dtype=np.int64)
    has_bounds = "max_tf" in group.column_names
    if has_bounds:
        mtf_col = np.asarray(group["max_tf"], dtype=np.int64)
        mnm_col = np.asarray(group["max_norm"], dtype=np.float32)

    # vectorized run boundaries per (field, term) over the sorted rows
    fcol = group["field"].combine_chunks()
    tcol = group["term"].combine_chunks()
    if n > 1:
        same = pc.and_(
            pc.equal(fcol.slice(1), fcol.slice(0, n - 1)),
            pc.equal(tcol.slice(1), tcol.slice(0, n - 1)),
        )
        diff_idx = np.flatnonzero(~np.asarray(same)) + 1
    else:
        diff_idx = np.empty(0, dtype=np.int64)
    breaks = np.concatenate(([0], diff_idx, [n])).astype(np.int64)

    m = len(breaks) - 1
    # batch docnum decode/re-encode: one vectorized pass over ALL rows'
    # delta chains (restart per input row), one re-encode (restart per
    # output term), per-term blobs sliced out by byte offsets
    val_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(dfs, out=val_off[1:])
    # all rows' docnum blobs are contiguous in the sorted column's data
    # buffer -- the batch decode input is the buffer itself, no join
    dn_arr = group["docnums"].combine_chunks()
    dn_bufs = dn_arr.buffers()
    dn_odt = np.int64 if pa.types.is_large_binary(dn_arr.type) else np.int32
    dn_aoff = np.frombuffer(dn_bufs[1], dtype=dn_odt)
    big = np.frombuffer(dn_bufs[2], dtype=np.uint8)[
        int(dn_aoff[dn_arr.offset]) : int(dn_aoff[dn_arr.offset + n])
    ]
    deltas = codec.varint_decode(big).astype(np.int64)
    docnums_all = codec.segmented_cumsum(deltas, val_off[:-1])
    out_voff = val_off[breaks]  # value ranges per output term
    dn_buf, dn_boff = codec.encode_with_restarts(docnums_all, out_voff[:-1])

    o_df = (out_voff[1:] - out_voff[:-1]).astype(np.int64)
    o_min = docnums_all[out_voff[:-1]] if n else np.empty(0, dtype=np.int64)
    o_max = docnums_all[out_voff[1:] - 1] if n else np.empty(0, dtype=np.int64)
    take_idx = pa.array(breaks[:-1], type=pa.int64())
    # in the SORTED table, rows lo..hi of a blob column occupy contiguous
    # bytes of its data buffer -- each merged term's concatenated blob is
    # a (byte-offset, buffer) pair, no per-term joins or copies
    cols = {
        "field": fcol.take(take_idx),
        "term": tcol.take(take_idx),
        "df": pa.array(o_df),
        "docnums": _blob_runs_from_offsets(dn_buf, dn_boff[out_voff]),
        "tfs": _blob_runs(group["tfs"], breaks),
        "norms": _blob_runs(group["norms"], breaks),
        "positions": _blob_runs(group["positions"], breaks),
        "min_docnum": pa.array(o_min),
        "max_docnum": pa.array(o_max),
    }
    if has_bounds:
        cols["max_tf"] = pa.array(
            np.maximum.reduceat(mtf_col, breaks[:-1])
        )
        cols["max_norm"] = pa.array(
            np.maximum.reduceat(mnm_col, breaks[:-1]), type=pa.float32()
        )
    return pa.table(cols)




# posting rows longer than this split into block rows with per-block
# (min/max docnum, max_tf, max_norm) -- the decode-skippable unit of
# block-max WAND (north star §7.2-7).  Segments already merge multi-row
# postings by docnum-range concat, so blocks need no new reader format.
BLOCK_POSTINGS = 4096


def split_long_posting_rows(
    tbl: pa.Table, block: Optional[int] = None
) -> pa.Table:
    """Split posting rows with df > block into per-block rows carrying
    EXACT per-block bounds.  Only hot terms (Zipf head) pay the
    decode/re-encode; all other rows pass through untouched.

    Tried and rejected (round 4): a fully batch-level re-encode (one
    codec pass over all long rows' values, zero-copy per-block slices,
    mirroring invert_batch_encoded) measured 115 -> 136-156 ms on a
    representative merge group -- long rows are FEW and HUGE (17 rows,
    567k values here), so per-row Python overhead is negligible while
    the batch path pays an extra full copy (take of the long rows) and
    loses the per-block small-encode fast paths."""
    if block is None:
        block = BLOCK_POSTINGS  # read at call time so tests can shrink it
    if len(tbl) == 0:
        return tbl
    dfs = np.asarray(tbl["df"], dtype=np.int64)
    long_idx = np.flatnonzero(dfs > block)
    if len(long_idx) == 0:
        return tbl
    keep_mask = np.ones(len(tbl), dtype=bool)
    keep_mask[long_idx] = False
    kept = tbl.filter(pa.array(keep_mask))
    # only the split rows (Zipf head, rare) materialize as Python values
    out_rows: Dict[str, list] = {c: [] for c in tbl.column_names}
    has_bounds = "max_tf" in tbl.column_names
    for ri in long_idx.tolist():
        row = {c: tbl[c][ri].as_py() for c in tbl.column_names}
        docnums = codec.delta_varint_decode(row["docnums"]).astype(np.int64)
        tfs = codec.varint_decode(row["tfs"]).astype(np.int64)
        norms = codec.norms_decode(row["norms"])
        pos_flat = (
            codec.positions_decode(row["positions"], tfs)
            if row["positions"]
            else None
        )
        pos_off = np.zeros(len(tfs) + 1, dtype=np.int64)
        np.cumsum(tfs, out=pos_off[1:])
        n = len(docnums)
        for s in range(0, n, block):
            e = min(n, s + block)
            b_tfs = tfs[s:e]
            out_rows["field"].append(row["field"])
            out_rows["term"].append(row["term"])
            out_rows["df"].append(int(e - s))
            out_rows["docnums"].append(
                codec.delta_varint_encode(docnums[s:e])
            )
            out_rows["tfs"].append(
                codec.varint_encode(b_tfs.astype(np.uint64))
            )
            out_rows["norms"].append(codec.norms_encode(norms[s:e]))
            out_rows["positions"].append(
                codec.positions_encode(
                    pos_flat[pos_off[s] : pos_off[e]], b_tfs
                )
                if pos_flat is not None
                else b""
            )
            out_rows["min_docnum"].append(int(docnums[s]))
            out_rows["max_docnum"].append(int(docnums[e - 1]))
            if has_bounds:
                out_rows["max_tf"].append(int(b_tfs.max()))
                out_rows["max_norm"].append(float(norms[s:e].max()))
    split_tbl = pa.table(
        {
            c: pa.array(out_rows[c], type=tbl.schema.field(c).type)
            for c in tbl.column_names
        }
    )
    return pa.concat_tables([kept, split_tbl]).sort_by(
        [
            ("field", "ascending"),
            ("term", "ascending"),
            ("min_docnum", "ascending"),
        ]
    )


def _pack_chunks(chunks: pa.Table) -> pa.Table:
    """Pack a sub-batch's chunk rows into ONE row per (shard, bucket) with
    the rows serialized as an Arrow IPC blob.

    Why: the groupby shuffle's sort cost is dominated by per-ROW handling,
    not bytes -- packing turns millions of tiny chunk rows into
    (#tasks x #shards) rows, making the all-to-all scale with data volume
    instead of term count (measured: 17s -> <2s for the 400k-doc sort)."""
    import pyarrow.ipc as ipc

    out_shard, out_bucket, out_blob = [], [], []
    # chunk tables are small; group indices by (shard, bucket) vectorized
    import numpy as _np

    sh = _np.asarray(chunks["shard"], dtype=_np.int64)
    bk = _np.asarray(chunks["bucket"], dtype=_np.int64)
    key = sh * (1 << 32) + bk
    order = _np.argsort(key, kind="stable")
    k_sorted = key[order]
    breaks = _np.flatnonzero(_np.diff(k_sorted)) + 1
    starts = _np.concatenate(([0], breaks, [len(key)]))
    payload = chunks.drop_columns(["shard", "bucket"])
    # compress the exchange blobs: disk/object-store bandwidth is the
    # fixed resource (does not grow with vCPUs on one box), compression
    # cycles scale with workers.  lz4 over zstd-1: measured 2.6x faster
    # encode for 35% more bytes (0.78 -> 1.05 MB per MB-scale chunk) --
    # the standard shuffle tradeoff; encode sits on the stage-1 hot path
    # while the blobs live only minutes.
    opts = ipc.IpcWriteOptions(compression=pa.Codec("lz4"))
    payload = payload.take(pa.array(order))  # one gather, then slices
    for i in range(len(starts) - 1):
        lo, hi = int(starts[i]), int(starts[i + 1])
        sub = payload.slice(lo, hi - lo)
        sink = pa.BufferOutputStream()
        with ipc.new_stream(sink, sub.schema, options=opts) as w:
            w.write_table(sub)
        first = order[lo]
        out_shard.append(int(sh[first]))
        out_bucket.append(int(bk[first]))
        out_blob.append(sink.getvalue().to_pybytes())
    return pa.table(
        {
            "shard": pa.array(out_shard, type=pa.int32()),
            "bucket": pa.array(out_bucket, type=pa.int64()),
            "ipc": pa.array(out_blob, type=pa.large_binary()),
        }
    )


def _unpack_chunks(group: pa.Table) -> pa.Table:
    import pyarrow.ipc as ipc

    tables = [
        ipc.open_stream(pa.py_buffer(b)).read_all()
        for b in group["ipc"].to_pylist()
    ]
    return pa.concat_tables(tables)

def build_segment_from_chunk_files(
    index_dir: str, partition_id: int, shard: int, bucket: int,
    paths: List[str],
) -> dict:
    """Stage-2 of the storage-exchange shuffle: concat a group's IPC chunk
    blobs (``path:offset:length`` ranged reads of shared per-bucket
    container files, sorted by first-docnum filename = docnum order) into
    one segment."""
    import pyarrow.ipc as ipc

    _limit_arrow_threads()
    tables = []
    for ref in paths:
        path, off_s, len_s = ref.rsplit(":", 2)
        with open(path, "rb") as f:
            f.seek(int(off_s))
            blob = f.read(int(len_s))
        tables.append(ipc.open_stream(pa.py_buffer(blob)).read_all())
    seg_tbl = split_long_posting_rows(
        merge_encoded_rows(pa.concat_tables(tables))
    )
    seg_id = f"p{partition_id:05d}_s{shard:04d}_b{bucket:012x}"
    rel = os.path.join("segments", f"{seg_id}.parquet")
    out = os.path.join(index_dir, rel)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    segment_mod.write_segment(out, seg_tbl)
    return {
        "seg_id": seg_id,
        "path": rel,
        "shard": shard,
        "min_docnum": int(pc.min(seg_tbl["min_docnum"]).as_py()),
        "max_docnum": int(pc.max(seg_tbl["max_docnum"]).as_py()),
        "term_count": len(seg_tbl),
        "posting_count": int(pc.sum(seg_tbl["df"]).as_py()),
        "size_bytes": os.path.getsize(out),
        "tier": 0,
    }


def make_build_segment_group(index_dir: str, partition_id: int):
    """map_groups fn: all chunk rows of one (shard, bucket) -> one segment."""

    def build_segment_group(group: pa.Table) -> pa.Table:
        shard = group["shard"][0].as_py()
        bucket = group["bucket"][0].as_py()
        seg_tbl = split_long_posting_rows(
            merge_encoded_rows(_unpack_chunks(group))
        )
        seg_id = f"p{partition_id:05d}_s{shard:04d}_b{bucket:012x}"
        rel = os.path.join("segments", f"{seg_id}.parquet")
        path = os.path.join(index_dir, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        segment_mod.write_segment(path, seg_tbl)
        entry = {
            "seg_id": seg_id,
            "path": rel,
            "shard": shard,
            "min_docnum": int(pc.min(seg_tbl["min_docnum"]).as_py()),
            "max_docnum": int(pc.max(seg_tbl["max_docnum"]).as_py()),
            "term_count": len(seg_tbl),
            "posting_count": int(pc.sum(seg_tbl["df"]).as_py()),
            "size_bytes": os.path.getsize(path),
            "tier": 0,
        }
        return pa.table({k: [v] for k, v in entry.items()})

    return build_segment_group


class MergeWorker:
    """Stateful merge actor (the merger loop, index/scorch/merge.go:305-520):
    merges up to fan-in segments into one, tier by tier.  Being an actor pool
    lets readers/buffers persist across merge tasks within a round."""

    def __init__(self, index_dir: str):
        self.index_dir = index_dir

    def __call__(self, tasks: pa.Table) -> pa.Table:
        rows = []
        for t in tasks.to_pylist():
            rows.append(self.merge_one(t))
        return pa.Table.from_pylist(rows)

    def merge_one(self, t: dict) -> dict:
        _limit_arrow_threads()
        inputs = json.loads(t["inputs_json"])
        out_id = t["out_id"]
        rel = os.path.join("segments", f"{out_id}.parquet")
        path = os.path.join(self.index_dir, rel)
        if not os.path.exists(path):
            tables = [
                pq.read_table(os.path.join(self.index_dir, rel_in))
                for rel_in in inputs
            ]
            seg_tbl = split_long_posting_rows(
                merge_encoded_rows(pa.concat_tables(tables))
            )
            segment_mod.write_segment(path, seg_tbl)
        pf = pq.ParquetFile(path)
        tbl_meta = pq.read_table(path, columns=["df", "min_docnum", "max_docnum"])
        return {
            "seg_id": out_id,
            "path": rel,
            "shard": int(t["shard"]),
            "min_docnum": int(pc.min(tbl_meta["min_docnum"]).as_py()),
            "max_docnum": int(pc.max(tbl_meta["max_docnum"]).as_py()),
            "term_count": pf.metadata.num_rows,
            "posting_count": int(pc.sum(tbl_meta["df"]).as_py()),
            "size_bytes": os.path.getsize(path),
            "tier": int(t["out_tier"]),
        }


def build_index(
    input_files: List[str],
    index_dir: str,
    options: Optional[IndexOptions] = None,
    files_per_partition: int = 512,
    resume: bool = True,
) -> Manifest:
    """Build (or resume building) an index over parquet input files."""
    import ray.data

    options = options or IndexOptions()
    # fail fast on unknown analyzers (mapping.Validate role) instead of
    # erroring inside remote analyze tasks
    for fname, fcfg in options.fields.items():
        if fcfg.field_type == "text":
            analyzer_named(fcfg.analyzer)
    # geo queries need the source lon/lat for exact boundary filtering
    # (the reference's DocValueReader path, search_geoboundingbox.go:78)
    for fname, fcfg in options.fields.items():
        if (
            fcfg.field_type in ("geo", "geoshape")
            and fname not in options.docvalue_fields
        ):
            options.docvalue_fields.append(fname)
    os.makedirs(index_dir, exist_ok=True)
    man = manifest_mod.load(index_dir) if resume else None
    if man is None:
        man = Manifest(options=options.to_dict())
    done = man.completed_partition_ids()

    input_files = sorted(input_files)
    partitions = [
        (pid, input_files[i : i + files_per_partition])
        for pid, i in enumerate(range(0, len(input_files), files_per_partition))
    ]

    from . import events

    events.fire(events.EVENT_INDEX_START,
                detail={"index_dir": index_dir, "files": len(input_files)})
    for pid, files in partitions:
        if pid in done:
            continue
        t0 = time.time()
        seg_entries, part_entry = _build_partition(
            pid, files, [input_files.index(f) for f in files], index_dir, options
        )
        part_entry.metrics["build_seconds"] = round(time.time() - t0, 3)
        man.segments.extend(seg_entries)
        man.partitions.append(part_entry)
        man.merge_done = False
        manifest_mod.commit(index_dir, man)
        events.fire(
            events.EVENT_SEGMENTS_BUILT,
            duration_ms=part_entry.metrics["build_seconds"] * 1e3,
            detail={"partition": pid, "segments": len(seg_entries)},
        )

    # tiered merge to target_per_shard (builder.go:169-236 doMerge loop)
    t_m = time.time()
    man = run_merge_phase(index_dir, man, options)
    t_f = time.time()
    man = finalize_stats(index_dir, man, options)
    man.stats["phase_seconds"] = {
        "build_partitions": round(
            sum(p_.metrics.get("build_seconds", 0) for p_ in man.partitions), 3
        ),
        "merge": round(t_f - t_m, 3),
        "finalize": round(time.time() - t_f, 3),
    }
    manifest_mod.commit(index_dir, man)
    return man


def _build_partition(
    partition_id: int,
    files: List[str],
    file_indexes: List[int],
    index_dir: str,
    options: IndexOptions,
):
    import ray
    import ray.data

    from concurrent.futures import ThreadPoolExecutor

    def _file_descs(args):
        fi, path = args
        pf = pq.ParquetFile(path)
        out, row = [], 0
        for rg in range(pf.metadata.num_row_groups):
            out.append(
                {"path": path, "file_idx": fi, "rg": rg, "row_start": row}
            )
            row += pf.metadata.row_group(rg).num_rows
        return out, row

    descs = []
    total_rows = 0
    rows_per_file: Dict[int, int] = {}
    with ThreadPoolExecutor(max_workers=16) as ex:
        for (fi, _), (out, row) in zip(
            zip(file_indexes, files),
            ex.map(_file_descs, zip(file_indexes, files)),
        ):
            descs.extend(out)
            total_rows += row
            rows_per_file[fi] = row

    # ~2 blocks per CPU: one-desc-per-block maximizes scheduling and
    # FromItems overhead (400 tiny blocks built serially measured ~10%
    # of stage-1 wall); a handful of row-group descriptors per task
    # keeps tasks ~1 s with two waves of work per core.  Sub-batch
    # side effects stay idempotent per descriptor, so retry/resume
    # granularity is unchanged.
    total_cpus = int(ray.cluster_resources().get("CPU", 8))
    n_blocks = min(len(descs), max(32, 2 * total_cpus))
    ds = ray.data.from_items(descs, override_num_blocks=max(1, n_blocks))
    chunks = ds.map_batches(
        ReadAnalyzeInvert(index_dir, options),
        batch_size=None,
        batch_format="pyarrow",
    )
    lineage_rows: List[tuple] = []
    if options.shuffle == "storage":
        # external shuffle: stage-1 emits (shard,bucket,path) manifest rows;
        # stage-2 = one Ray task per group over its chunk files.  The
        # manifest rows are consumed STREAMING and each bucket's segment
        # tasks are submitted the moment its input files are fully analyzed
        # (bucket completion tracked via the per-sub-batch lineage row
        # counts), so stage 2 overlaps stage 1's tail instead of waiting
        # behind a global barrier.
        @ray.remote
        def _seg_task(shard: int, bucket: int, paths: List[str]) -> dict:
            return build_segment_from_chunk_files(
                index_dir, partition_id, shard, bucket, paths
            )

        groups: Dict[tuple, List[str]] = {}
        futures: Dict[tuple, object] = {}
        # bucket -> expected analyzed rows; only derivable when buckets are
        # file-aligned (bucket_bits >= DOCNUM_FILE_SHIFT); otherwise all
        # groups are submitted after the stream drains (still correct)
        expected: Dict[int, int] = {}
        got: Dict[int, int] = {}
        # chunk-manifest row accounting: Ray Data's streaming executor
        # gives no cross-block delivery-order guarantee, so a bucket's
        # lineage rows can arrive before its chunk rows.  A bucket is
        # complete only when BOTH its analyzed-row count and its
        # chunk-row count (expected total carried in each lineage row)
        # have fully arrived.
        expected_chunks: Dict[int, int] = {}
        got_chunks: Dict[int, int] = {}
        lineage_done: Dict[int, bool] = {}
        track = options.bucket_bits >= DOCNUM_FILE_SHIFT
        if track:
            fshift = options.bucket_bits - DOCNUM_FILE_SHIFT
            for fi, n in rows_per_file.items():
                b = fi >> fshift
                expected[b] = expected.get(b, 0) + n

        submitted: set = set()

        def _bucket_complete(bb: int) -> bool:
            return (
                got.get(bb) == expected.get(bb, -1)
                and got_chunks.get(bb, 0) == expected_chunks.get(bb, -1)
            )

        def _submit_bucket(b: int) -> None:
            submitted.add(b)
            for key in [k for k in groups if k[1] == b]:
                futures[key] = _seg_task.remote(
                    key[0], key[1], sorted(groups.pop(key))
                )

        for batch in chunks.iter_batches(
            batch_size=None, batch_format="pyarrow"
        ):
            shards = batch["shard"].to_pylist()
            buckets = batch["bucket"].to_pylist()
            paths = batch["path"].to_pylist()
            touched = set()
            for sh, b, p in zip(shards, buckets, paths):
                if sh == -1:
                    digest, cnt, n_chunk = p.split(":")
                    lineage_rows.append((b, digest, int(cnt)))
                    if track:
                        bb = b >> options.bucket_bits
                        got[bb] = got.get(bb, 0) + int(cnt)
                        expected_chunks[bb] = (
                            expected_chunks.get(bb, 0) + int(n_chunk)
                        )
                        touched.add(bb)
                    continue
                groups.setdefault((sh, b), []).append(p)
                if track:
                    got_chunks[b] = got_chunks.get(b, 0) + 1
                    touched.add(b)
            for bb in touched:
                if bb not in submitted and _bucket_complete(bb):
                    _submit_bucket(bb)
        # any bucket not closed by row accounting (empty docs emit no
        # lineage-bearing chunk table) drains here
        leftover_submitted = sorted(
            {k[1] for k in groups} & submitted
        )
        if leftover_submitted:
            raise RuntimeError(
                "storage-shuffle ordering violation: chunk rows arrived "
                f"after their bucket(s) {leftover_submitted} were "
                "submitted; the build would be missing postings"
            )
        for key in list(sorted(groups)):
            futures[key] = _seg_task.remote(key[0], key[1], sorted(groups.pop(key)))
        seg_rows = ray.get([futures[k] for k in sorted(futures)])
        # chunk files consumed; GC them (segments are the checkpoint)
        import shutil as _sh

        _sh.rmtree(
            chunk_base(index_dir, options.chunk_root), ignore_errors=True
        )
    else:
        seg_rows = (
            chunks.groupby(["shard", "bucket"])
            .map_groups(
                make_build_segment_group(index_dir, partition_id),
                batch_format="pyarrow",
            )
            .take_all()
        )
    seg_entries = [SegmentEntry(**r) for r in seg_rows]

    # lineage: combine the per-sub-batch content-sha digests in docnum
    # order (hierarchical aggregate; per-row sha256 stays in docmeta for
    # row-level verification)
    if lineage_rows:
        lineage_rows.sort()
        agg = manifest_mod.sha_agg([d for _, d, _ in lineage_rows])
        row_count = sum(c for _, _, c in lineage_rows)
    else:
        lo = min(file_indexes) << DOCNUM_FILE_SHIFT
        hi = ((max(file_indexes) + 1) << DOCNUM_FILE_SHIFT) - 1
        dm_tbl = _read_docmeta_range(
            index_dir, lo, hi, columns=["docnum", "field", "sha256"]
        )
        primary = next(iter(options.fields))
        prim = dm_tbl.filter(
            pc.equal(dm_tbl["field"], primary)
        ).sort_by("docnum")
        batch_digests = []
        shas = prim["sha256"].to_pylist()
        batch_digests = [hashlib.sha256("".join(shas).encode()).hexdigest()]
        agg = manifest_mod.sha_agg(batch_digests)
        row_count = len(prim)
    part_entry = PartitionEntry(
        partition_id=partition_id,
        input_files=files,
        file_indexes=file_indexes,
        row_count=row_count,
        content_sha256_agg=agg,
        metrics={"rows": total_rows, "segments": len(seg_entries)},
    )
    return seg_entries, part_entry


def _docmeta_files(index_dir: str):
    import glob as _glob

    out = []
    for p in sorted(_glob.glob(os.path.join(index_dir, "docmeta", "dm_*.parquet"))):
        base = os.path.basename(p)[3 : -len(".parquet")]
        lo_s, hi_s = base.split("_")
        out.append((p, int(lo_s, 16), int(hi_s, 16)))
    return out


def _read_docmeta_range(
    index_dir: str, lo: int, hi: int, columns=None
) -> pa.Table:
    import pyarrow.dataset as pads

    paths = [
        p
        for p, flo, fhi in _docmeta_files(index_dir)
        if not (fhi < lo or flo > hi)
    ]
    if not paths:
        return pa.table({})
    # parallel multi-file read (driver keeps arrow's full thread pool)
    return pads.dataset(paths).to_table(columns=columns)


def run_merge_phase(
    index_dir: str, man: Manifest, options: IndexOptions
) -> Manifest:
    """Tier-by-tier merge (the merger loop, merge.go:305-520) executed as
    plain Ray tasks per MergeTask, committed to the manifest per round.

    NOTE on actors-vs-tasks: an actor-pool variant was measured 10-30x
    slower here -- merge inputs are distinct immutable files consumed once,
    so there is no cross-task state for an actor to hold, while dedicated
    actor processes forgo Ray's warm idle-worker reuse and pay process
    startup + scheduling latency per round.  Tasks get the same parallelism
    with zero warmup; idempotent outputs (path keyed by input seg ids) keep
    retries and resumes safe."""
    import ray

    @ray.remote
    def _merge_task(row: dict) -> dict:
        return MergeWorker(index_dir).merge_one(row)

    while True:
        if options.merge_policy == "tiered":
            from .mergeplan import DEFAULT_MERGE_PLAN_OPTIONS, plan_tiered

            tasks = plan_tiered(man.segments, DEFAULT_MERGE_PLAN_OPTIONS)
        else:
            tasks = plan_merges(
                man.segments,
                fan_in=options.merge_fan_in,
                target_per_shard=options.target_segments_per_shard,
            )
        if not tasks:
            break
        from . import events as _events

        _round_t0 = time.time()
        task_rows = []
        for t in tasks:
            ids = "+".join(s.seg_id for s in t.inputs)
            out_id = "m" + hashlib.sha1(ids.encode()).hexdigest()[:16]
            task_rows.append(
                {
                    "shard": t.shard,
                    "out_tier": t.out_tier,
                    "out_id": out_id,
                    "inputs_json": json.dumps([s.path for s in t.inputs]),
                    "input_ids_json": json.dumps(
                        [s.seg_id for s in t.inputs]
                    ),
                }
            )
        results = ray.get([_merge_task.remote(r) for r in task_rows])
        merged_inputs = set()
        for tr in task_rows:
            merged_inputs.update(json.loads(tr["input_ids_json"]))
        man.segments = [
            s for s in man.segments if s.seg_id not in merged_inputs
        ] + [SegmentEntry(**r) for r in results]
        manifest_mod.commit(index_dir, man)
        _events.fire(
            _events.EVENT_MERGER_PROGRESS,
            duration_ms=(time.time() - _round_t0) * 1e3,
            detail={"tasks": len(task_rows),
                    "segments": len(man.segments)},
        )
        # old segment files kept for rollback; GC beyond KEEP_EPOCHS [later]
    man.merge_done = True
    return man


def finalize_stats(
    index_dir: str, man: Manifest, options: IndexOptions
) -> Manifest:
    """Global BM25 stats (the 'presearch' data, computed once at build time:
    SURVEY.md §2.9 -- DocCount + FieldCardinality per field summed over
    partitions, consumed by every query without an extra round-trip)."""
    files = _docmeta_files(index_dir)
    field_stats: Dict[str, Dict[str, int]] = {}
    dm_entries = []
    primary = next(iter(options.fields))
    if files:
        # distributed footer scan: each docmeta file carries its own
        # (field -> [sum_field_len, row_count]) partial in the parquet
        # footer (written by _write_docmeta), so the driver only sums
        # per-task partial dicts -- never the (doc, field) rows.  Files
        # written before the footer partial existed fall back to a
        # column read of THAT file inside the same remote task.
        import ray as _ray

        @_ray.remote
        def _footer_stats(paths: List[str]) -> tuple:
            agg: Dict[str, List[int]] = {}
            rows: Dict[str, int] = {}
            for p in paths:
                f = pq.ParquetFile(p)
                rows[p] = f.metadata.num_rows
                md = (f.schema_arrow.metadata or {}).get(b"field_stats")
                if md is not None:
                    partial = json.loads(md)
                else:
                    t = f.read(columns=["field", "field_len"])
                    g = pa.TableGroupBy(t, "field").aggregate(
                        [("field_len", "sum"), ("field_len", "count")]
                    )
                    partial = {
                        r["field"]: [
                            int(r["field_len_sum"]),
                            int(r["field_len_count"]),
                        ]
                        for r in g.to_pylist()
                    }
                for fld, (s, c) in partial.items():
                    cur = agg.setdefault(fld, [0, 0])
                    cur[0] += int(s)
                    cur[1] += int(c)
            return agg, rows

        paths = [p for p, _, _ in files]
        step = max(1, (len(paths) + 63) // 64)
        futs = [
            _footer_stats.remote(paths[i : i + step])
            for i in range(0, len(paths), step)
        ]
        rows_per_file: Dict[str, int] = {}
        acc: Dict[str, List[int]] = {}
        for agg, rows in _ray.get(futs):
            rows_per_file.update(rows)
            for fld, (s, c) in agg.items():
                cur = acc.setdefault(fld, [0, 0])
                cur[0] += s
                cur[1] += c
        field_stats = {
            fld: {"sum_field_len": s, "doc_count": c}
            for fld, (s, c) in acc.items()
        }
        for p, lo, hi in files:
            dm_entries.append(
                DocmetaEntry(
                    path=os.path.relpath(p, index_dir),
                    min_docnum=lo,
                    max_docnum=hi,
                    rows=rows_per_file[p],
                )
            )
    doc_count = field_stats.get(primary, {}).get("doc_count", 0)
    man.docmeta = dm_entries
    man.stats = {
        "doc_count": doc_count,
        "field_stats": field_stats,
        "scoring_model": options.scoring_model,
    }
    manifest_mod.commit(index_dir, man)
    return man
