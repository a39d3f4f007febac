"""Batch analysis + within-batch inversion (the TokenFrequency equivalent,
reference analysis/freq.go:21-70, vectorized over an Arrow batch).

``analyze_batch`` turns a batch of documents into flat numpy/arrow arrays
(token terms, doc index, 1-based positions) -- positions are assigned BEFORE
stop-word removal is applied, so gaps remain exactly like the reference's
stop filter (analysis/token/stop/stop.go:43-54 removes tokens without
renumbering).

``invert_batch`` groups the flat arrays by (term, doc) to produce one row per
term with parallel posting arrays -- the "partial inversion" / mini-segment
chunk that the groupby-term shuffle moves (SURVEY.md §2.4, §4-skew).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .analyzers import Analyzer

# array-element ordinal packed into the high bits of a token position
# (element 0 encodes as 0, so scalar fields are unchanged); decoded by
# readers into Location.ArrayPositions
ARRAY_POS_SHIFT = 20
ARRAY_POS_MASK = (1 << ARRAY_POS_SHIFT) - 1

# frozenset -> pa.Array value_set for pc.is_in (built once per stop list,
# not once per batch)
_STOP_PA_CACHE: dict = {}


def _stop_value_set(stop_set: frozenset) -> pa.Array:
    arr = _STOP_PA_CACHE.get(stop_set)
    if arr is None:
        arr = pa.array(sorted(stop_set), type=pa.string())
        _STOP_PA_CACHE[stop_set] = arr
    return arr


# byte-class tables for the ASCII UAX#29 collapse (see tokenizers.py):
# superset run chars, and the mid chars that only join under the grammar
_SUPERSET_BYTE = np.zeros(256, dtype=bool)
for _c in b"'.:,;_":
    _SUPERSET_BYTE[_c] = True
for _lo, _hi in ((48, 58), (65, 91), (97, 123)):  # 0-9 A-Z a-z
    _SUPERSET_BYTE[_lo:_hi] = True
_MID_BYTE = np.zeros(256, dtype=bool)
for _c in b"'.:,;":
    _MID_BYTE[_c] = True
# junk = chars that never make a token a word on their own (mid + '_')
_JUNK_BYTE = _MID_BYTE.copy()
_JUNK_BYTE[ord("_")] = True


def _string_view(arr: pa.Array) -> Tuple[np.ndarray, np.ndarray]:
    """(data bytes, int64 char offsets) view of an ASCII string array,
    normalized for slice offset -- zero-copy except the offset cast."""
    off_dt = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    bufs = arr.buffers()
    buf_offs = np.frombuffer(bufs[1], dtype=off_dt)
    o0 = int(buf_offs[arr.offset])
    oN = int(buf_offs[arr.offset + len(arr)])
    data = np.frombuffer(bufs[2], dtype=np.uint8)[o0:oN]
    offs = (buf_offs[arr.offset : arr.offset + len(arr) + 1] - o0).astype(
        np.int64
    )
    return data, offs


def _arrow_batch_tokens(
    col: pa.Array,
) -> Tuple[pa.Array, np.ndarray, np.ndarray]:
    """Batch-level UAX#29 tokenization for an Arrow string column (the
    UnicodeTokenizer grammar; see analysis/tokenizers.py ASCII collapse).
    Returns ``(flat token array, int64 doc offsets, bad_docs)`` with
    tokens never materialized as Python strings.  Docs that need the
    exact per-doc path (non-ASCII text, or a superset run whose internal
    mid-chars break the word grammar -- e.g. ``a,b`` must split) are
    listed in ``bad_docs`` and contribute ZERO tokens here; the caller
    runs the per-doc tokenizer on just those and merges -- so one exotic
    doc no longer sends the whole batch down the slow path.

    Pipeline: numpy byte-class mask -> run boundaries (tokens = superset
    runs, split at doc boundaries), utf8_trim of the leading/trailing
    mid-chars ('.:,; -- '_' is ExtendNumLet and legally edge-joins), then
    an anchored grammar check on ONLY the mid-char-bearing tokens to
    DETECT the rare hard cases.  Equivalence with the per-doc findall is
    locked by tests/test_freq_batch.py's differential sweep."""
    from .tokenizers import ASCII_WORD_ANCHORED

    filled = pc.fill_null(col, "")
    if isinstance(filled, pa.ChunkedArray):
        filled = filled.combine_chunks()
    n = len(filled)
    bad = np.flatnonzero(
        np.invert(np.asarray(pc.string_is_ascii(filled)))
    ).astype(np.int64)
    if len(bad):
        # blank the non-ASCII docs: they tokenize per-doc in the caller
        sel = np.ones(n, dtype=bool)
        sel[bad] = False
        filled = pc.if_else(pa.array(sel), filled, "")
        if isinstance(filled, pa.ChunkedArray):
            filled = filled.combine_chunks()
    empty = (
        pa.array([], type=pa.string()),
        np.zeros(n + 1, dtype=np.int64),
        bad,
    )
    if n == 0:
        return empty
    data, offs = _string_view(filled)
    if len(data) == 0:
        return empty
    mask = _SUPERSET_BYTE[data]
    # run boundaries in ONE pass: transitions alternate start/end, with
    # the phase fixed by mask[0] (vs two masked flatnonzero scans)
    change = np.flatnonzero(mask[1:] != mask[:-1]) + 1
    if mask[0]:
        starts = np.concatenate(([0], change[1::2]))
        ends = change[0::2]
    else:
        starts = change[0::2]
        ends = change[1::2]
    if mask[-1]:
        ends = np.concatenate((ends, [len(data)]))
    # a doc boundary inside a run still breaks the token
    inner = offs[1:-1]
    if len(inner):
        p = inner[(inner > 0) & (inner < len(data))]
        cut = np.unique(p[mask[p] & mask[p - 1]])
        if len(cut):
            starts = np.sort(np.concatenate((starts, cut)))
            ends = np.sort(np.concatenate((ends, cut)))
    if len(starts) == 0:
        return empty
    tok_offs = np.zeros(len(starts) + 1, dtype=np.int32)
    np.cumsum(ends - starts, out=tok_offs[1:])
    flat = pa.StringArray.from_buffers(
        len(starts),
        pa.py_buffer(tok_offs),
        pa.py_buffer(np.ascontiguousarray(data[mask])),
    )
    trimmed = pc.utf8_trim(flat, "'.:,;")
    tdata, toffs = _string_view(trimmed)
    lens = toffs[1:] - toffs[:-1]
    # pure ExtendNumLet/punct residue ("___", "_._") is not a word
    # segment (UAX#29: no LNSEQ) -- require an alphanumeric.  Junk/mid
    # bytes are rare, so locate them with flatnonzero + searchsorted
    # instead of a byte-level cumsum (cheaper and smaller allocations).
    jp = np.flatnonzero(_JUNK_BYTE[tdata])
    if len(jp):
        junk_cnt = np.bincount(
            np.searchsorted(toffs, jp, side="right") - 1,
            minlength=len(trimmed),
        )
        keep_np = junk_cnt < lens
    else:
        keep_np = lens > 0
    mp = jp[_MID_BYTE[tdata[jp]]] if len(jp) else jp
    if len(mp):
        mid_tok = np.unique(np.searchsorted(toffs, mp, side="right") - 1)
        hard_idx = mid_tok[keep_np[mid_tok]]
    else:
        hard_idx = mp
    if len(hard_idx):
        sel = trimmed.take(pa.array(hard_idx, type=pa.int64()))
        ok = np.asarray(
            pc.match_substring_regex(sel, ASCII_WORD_ANCHORED)
        )
        if not ok.all():
            # per-DOC decline: blank the offending docs and re-run once
            # (blanking only removes tokens, so the second pass is
            # hard-free by construction)
            hard_docs = np.unique(
                np.searchsorted(
                    offs, starts[hard_idx[~ok]], side="right"
                )
                - 1
            )
            sel2 = np.ones(n, dtype=bool)
            sel2[hard_docs] = False
            refill = pc.if_else(pa.array(sel2), filled, "")
            terms2, doc_offs2, _ = _arrow_batch_tokens(refill)
            all_bad = np.union1d(bad, hard_docs).astype(np.int64)
            return terms2, doc_offs2, all_bad
    cs = np.zeros(len(keep_np) + 1, dtype=np.int64)
    np.cumsum(keep_np, out=cs[1:])
    doc_offs = cs[np.searchsorted(starts, offs, side="left")]
    return trimmed.filter(pa.array(keep_np)), doc_offs, bad


def analyze_batch(
    texts, analyzer: Analyzer
) -> Tuple[pa.Array, np.ndarray, np.ndarray, np.ndarray]:
    """Analyze a batch of docs (list of strings OR an Arrow string array
    -- pass the Arrow column straight through so the batch tokenizer
    stays zero-copy).

    Returns ``(terms, doc_idx, positions, field_len)`` where

    - terms: pa.StringArray of analyzed terms (stop words removed), flat
    - doc_idx: int64 index into ``texts`` per token
    - positions: int32 1-based position per token (pre-stop-removal numbering)
    - field_len: int64 per doc = token count AFTER the filter chain
      (reference document/field_text.go:104 sets length = len(analyzed tokens))
    """
    is_arrow = isinstance(texts, (pa.Array, pa.ChunkedArray))
    n_docs = len(texts)
    # multi-valued text field (array values; reference mapping/document.go
    # processProperty indexes each array element as its own field value,
    # positions restarting per element): flatten, analyze the flat
    # values, remap to parent rows
    if is_arrow and (
        pa.types.is_list(texts.type) or pa.types.is_large_list(texts.type)
    ):
        arr = (
            texts.combine_chunks()
            if isinstance(texts, pa.ChunkedArray)
            else texts
        )
        counts = np.asarray(
            pc.fill_null(pc.list_value_length(arr), 0), dtype=np.int64
        )
        parent = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
        terms, doc_idx, positions, _ = analyze_batch(
            pc.list_flatten(arr), analyzer
        )
        # element ordinal in the HIGH position bits (ARRAY_POS_SHIFT):
        # positions restart per element like the reference, and the
        # ordinal scopes phrase adjacency to ONE element (the reference's
        # Location.ArrayPositions check in findPhrasePaths — "bad call",
        # "defenseless receiver" must not phrase-match "bad receiver",
        # test/tests/phrase).  Readers decode pos & ARRAY_POS_MASK and
        # array_positions = pos >> ARRAY_POS_SHIFT.
        starts = np.concatenate(([0], np.cumsum(counts[:-1])))
        elem_ord = np.arange(int(counts.sum()), dtype=np.int64) - np.repeat(
            starts, counts
        )
        elem_ord = np.minimum(elem_ord, (1 << 11) - 1)  # int32 headroom
        positions = positions + (
            elem_ord[doc_idx] << ARRAY_POS_SHIFT
        ).astype(positions.dtype)
        doc_idx = parent[doc_idx]
        field_len = np.bincount(doc_idx, minlength=n_docs).astype(np.int64)
        return terms, doc_idx, positions, field_len
    if not is_arrow and any(isinstance(t, (list, tuple)) for t in texts):
        wrapped = [
            list(t)
            if isinstance(t, (list, tuple))
            else ([] if t is None else [t])
            for t in texts
        ]
        return analyze_batch(
            pa.array(wrapped, type=pa.list_(pa.string())), analyzer
        )
    if analyzer.fast_path and (analyzer.char_filters == () or not analyzer.char_filters):
        from .tokenizers import UnicodeTokenizer

        tok = analyzer.tokenizer
        if isinstance(tok, UnicodeTokenizer):
            col = texts if is_arrow else pa.array(texts, type=pa.string())
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            terms, doc_offs, bad = _arrow_batch_tokens(col)
            total = int(doc_offs[-1])
            counts = doc_offs[1:] - doc_offs[:-1]
            doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
            positions = (
                np.arange(total, dtype=np.int64)
                - np.repeat(doc_offs[:-1], counts)
                + 1
            ).astype(np.int32)
            if len(bad):
                # exact per-doc tokenize for ONLY the declined docs, then
                # stable-merge by doc index (docs are disjoint, so the
                # within-doc token order of each side is preserved)
                bad_texts = col.take(pa.array(bad)).to_pylist()
                flat_b: List[str] = []
                di_b: List[int] = []
                pos_list: List[np.ndarray] = []
                for j, t in zip(bad, bad_texts):
                    toks = tok.findall(t) if t else []
                    flat_b.extend(toks)
                    di_b.extend([int(j)] * len(toks))
                    pos_list.append(
                        np.arange(1, len(toks) + 1, dtype=np.int32)
                    )
                if flat_b:
                    pos_b = np.concatenate(pos_list)
                    terms = pa.concat_arrays(
                        [
                            terms.combine_chunks()
                            if isinstance(terms, pa.ChunkedArray)
                            else terms,
                            pa.array(flat_b, type=pa.string()),
                        ]
                    )
                    doc_idx = np.concatenate(
                        [doc_idx, np.asarray(di_b, dtype=np.int64)]
                    )
                    positions = np.concatenate([positions, pos_b])
                    order = np.argsort(doc_idx, kind="stable")
                    terms = terms.take(pa.array(order))
                    doc_idx = doc_idx[order]
                    positions = positions[order]
            if analyzer.lowercase:
                # bad docs may be non-ASCII; utf8_lower covers both
                terms = (
                    pc.utf8_lower(terms) if len(bad) else pc.ascii_lower(terms)
                )
            if analyzer.stop_set is not None:
                keep = np.asarray(
                    pc.invert(
                        pc.is_in(
                            terms,
                            value_set=_stop_value_set(analyzer.stop_set),
                        )
                    )
                )
                terms = terms.filter(pa.array(keep))
                doc_idx = doc_idx[keep]
                positions = positions[keep]
            field_len = np.bincount(
                doc_idx, minlength=n_docs
            ).astype(np.int64)
            return terms, doc_idx, positions, field_len
        if is_arrow:
            texts = texts.to_pylist()
        toks_per_doc = [
            tok.findall(t) if t is not None else [] for t in texts
        ]
        counts = np.fromiter(
            (len(t) for t in toks_per_doc), dtype=np.int64, count=n_docs
        )
        total = int(counts.sum())
        flat: List[str] = []
        for t in toks_per_doc:
            flat.extend(t)
        terms = pa.array(flat, type=pa.string())
        if analyzer.lowercase:
            terms = pc.utf8_lower(terms)
        doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
        starts = np.zeros(n_docs, dtype=np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        positions = (
            np.arange(total, dtype=np.int64) - np.repeat(starts, counts) + 1
        ).astype(np.int32)
        if analyzer.stop_set is not None:
            keep = np.asarray(
                pc.invert(
                    pc.is_in(
                        terms,
                        value_set=_stop_value_set(analyzer.stop_set),
                    )
                )
            )
            terms = terms.filter(pa.array(keep))
            doc_idx = doc_idx[keep]
            positions = positions[keep]
    else:
        # exact per-doc chain fallback (custom filter chains)
        if is_arrow:
            texts = texts.to_pylist()
        flat = []
        di = []
        pos = []
        for i, t in enumerate(texts):
            if t is None:
                continue
            for tk in analyzer.analyze(t):
                flat.append(tk.term)
                di.append(i)
                pos.append(tk.position)
        terms = pa.array(flat, type=pa.string())
        doc_idx = np.asarray(di, dtype=np.int64)
        positions = np.asarray(pos, dtype=np.int32)

    field_len = np.bincount(doc_idx, minlength=n_docs).astype(np.int64)
    return terms, doc_idx, positions, field_len


def invert_batch(
    terms: pa.Array,
    doc_idx: np.ndarray,
    positions: np.ndarray,
    docnums: np.ndarray,
    field_len: np.ndarray,
    keep_positions: bool = True,
) -> pa.Table:
    """Group flat token arrays by (term, doc) -> one row per distinct term.

    Output schema (the shuffle chunk):
      term: string
      df: int32                       docs containing term in this batch
      docnums: list<int64>            ascending (batch docnums are ascending)
      tfs: list<int32>
      norms: list<float32>            float32(1/sqrt(field_len[doc])), the
                                      quantization bleve stores
                                      (index/upsidedown/row.go:388)
      positions: list<list<int32>>    per doc, ascending (absent if
                                      keep_positions=False)
    """
    n_tokens = len(terms)
    if n_tokens == 0:
        schema = _chunk_schema(keep_positions)
        return schema.empty_table()

    enc = pc.dictionary_encode(terms)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    term_codes = np.asarray(enc.indices, dtype=np.int64)
    dictionary = enc.dictionary

    # sort by (term_code, doc_idx), stable so positions stay ascending per doc
    key = term_codes * len(field_len) + doc_idx
    order = np.argsort(key, kind="stable")
    k_sorted = key[order]
    # run boundaries per (term, doc)
    runs = np.flatnonzero(np.diff(k_sorted)) + 1
    run_starts = np.concatenate(([0], runs))
    run_ends = np.concatenate((runs, [n_tokens]))
    tfs_flat = (run_ends - run_starts).astype(np.int32)
    tdoc = doc_idx[order][run_starts]
    tcode = term_codes[order][run_starts]

    # per-term boundaries over the run arrays
    term_breaks = np.flatnonzero(np.diff(tcode)) + 1
    term_offsets = np.concatenate(([0], term_breaks, [len(tcode)])).astype(
        np.int32
    )
    uniq_codes = tcode[term_offsets[:-1]]
    term_strs = dictionary.take(pa.array(uniq_codes, type=pa.int64()))

    docnums_flat = docnums[tdoc].astype(np.int64, copy=False)
    norms_flat = (
        1.0 / np.sqrt(field_len[tdoc].astype(np.float64))
    ).astype(np.float32)

    offsets = pa.array(term_offsets, type=pa.int32())
    cols = {
        "term": term_strs,
        "df": pa.array(np.diff(term_offsets).astype(np.int32)),
        "docnums": pa.ListArray.from_arrays(
            offsets, pa.array(docnums_flat, type=pa.int64())
        ),
        "tfs": pa.ListArray.from_arrays(
            offsets, pa.array(tfs_flat, type=pa.int32())
        ),
        "norms": pa.ListArray.from_arrays(
            offsets, pa.array(norms_flat, type=pa.float32())
        ),
    }
    if keep_positions:
        # inner: positions per (term,doc) run; outer: runs per term
        pos_sorted = positions[order]
        inner_offsets = pa.array(
            np.concatenate((run_starts, [n_tokens])).astype(np.int32)
        )
        inner = pa.ListArray.from_arrays(
            inner_offsets, pa.array(pos_sorted, type=pa.int32())
        )
        cols["positions"] = pa.ListArray.from_arrays(offsets, inner)
    return pa.table(cols)


def invert_batch_encoded(
    terms: pa.Array,
    doc_idx: np.ndarray,
    positions: np.ndarray,
    docnums: np.ndarray,
    field_len: np.ndarray,
    keep_positions: bool = True,
) -> pa.Table:
    """Like invert_batch but emits delta-varint-ENCODED posting blobs --
    the shuffle then moves compressed binary columns instead of nested
    lists, and segment build / merge is a cheap blob concat+reencode.

    Output schema (chunk == segment row layout):
      term, df:int64, docnums:binary, tfs:binary, norms:binary,
      positions:binary, min_docnum:int64, max_docnum:int64
    """
    from ..index import codec

    n_tokens = len(terms)
    if n_tokens == 0:
        return ENCODED_CHUNK_SCHEMA.empty_table()

    enc = pc.dictionary_encode(terms)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    dictionary = enc.dictionary

    if len(doc_idx) and (np.diff(doc_idx) >= 0).all():
        # tokens arrive doc-major (every per-field call site), so a stable
        # sort on the narrow int32 codes alone yields (term, doc) order --
        # cheaper than the widened composite key below
        term_codes = np.asarray(enc.indices)
        order = np.argsort(term_codes, kind="stable")
        ts = term_codes[order].astype(np.int64, copy=False)
        ds = doc_idx[order]
        runs = (
            np.flatnonzero((np.diff(ts) != 0) | (np.diff(ds) != 0)) + 1
        )
        term_codes = term_codes.astype(np.int64, copy=False)
    else:  # _all concatenates per-field streams; doc order interleaves
        term_codes = np.asarray(enc.indices, dtype=np.int64)
        key = term_codes * len(field_len) + doc_idx
        order = np.argsort(key, kind="stable")
        runs = np.flatnonzero(np.diff(key[order])) + 1
    run_starts = np.concatenate(([0], runs))
    run_ends = np.concatenate((runs, [n_tokens]))
    tfs_all = (run_ends - run_starts).astype(np.int64, copy=False)
    tdoc = doc_idx[order][run_starts]
    tcode = term_codes[order][run_starts]
    pos_sorted = positions[order]

    term_breaks = np.flatnonzero(np.diff(tcode)) + 1
    t_off = np.concatenate(([0], term_breaks, [len(tcode)]))
    uniq_codes = tcode[t_off[:-1]]
    term_strs = dictionary.take(pa.array(uniq_codes, type=pa.int64()))

    docnums_flat = docnums[tdoc].astype(np.int64, copy=False)
    norms_flat = (
        1.0 / np.sqrt(field_len[tdoc].astype(np.float64))
    ).astype(np.float32)

    n_terms = len(uniq_codes)
    # batch-level vectorized encodes; per-term blobs are byte slices
    dn_buf, dn_off = codec.encode_with_restarts(docnums_flat, t_off[:-1])
    tf_buf, tf_off = codec.plain_varint_with_offsets(tfs_all)
    nm_buf = codec.norms_encode(norms_flat)
    if keep_positions:
        # positions deltas restart at every (term, doc) run start, which
        # includes every term boundary -- safe to slice per term
        ps_buf, ps_off = codec.encode_with_restarts(
            pos_sorted.astype(np.int64, copy=False), run_starts
        )
    min_dn = docnums_flat[t_off[:-1]]
    max_dn = docnums_flat[t_off[1:] - 1]

    # consecutive terms' blobs are CONTIGUOUS in each batch-level encode
    # buffer, so every per-term binary column is just (offsets, buffer) --
    # zero per-term Python work and zero copies of the blob bytes
    def _blob_col(buf, elem_off: np.ndarray) -> pa.Array:
        if len(elem_off) and elem_off[-1] > 0x7FFFFFFF:
            raise ValueError(
                "sub-batch posting buffer exceeds 2 GiB; lower "
                "analyze_rows"
            )
        off32 = np.ascontiguousarray(elem_off, dtype=np.int32)
        return pa.Array.from_buffers(
            pa.binary(),
            n_terms,
            [None, pa.py_buffer(off32), pa.py_buffer(buf)],
        )

    dn_col = _blob_col(dn_buf, dn_off[t_off])
    tf_col = _blob_col(tf_buf, tf_off[t_off])
    nm_col = _blob_col(nm_buf, t_off * 4)
    if keep_positions:
        # term i's positions span run_starts[t_off[i]] ..
        # run_starts[t_off[i+1]] (run_ends[j-1] == run_starts[j])
        rs_ext = np.concatenate((run_starts, [n_tokens]))
        ps_col = _blob_col(ps_buf, ps_off[rs_ext[t_off]])
    else:
        ps_col = _blob_col(b"", np.zeros(n_terms + 1, dtype=np.int64))
    # per-term score-bound metadata (block-max support): BM25 score is
    # monotone increasing in tf and in norm, so (max_tf, max_norm) bounds
    # any doc's contribution for the term
    max_tf = np.maximum.reduceat(tfs_all, t_off[:-1])
    max_nm = np.maximum.reduceat(norms_flat, t_off[:-1])
    return pa.table(
        {
            "term": term_strs,
            "df": pa.array((t_off[1:] - t_off[:-1]).astype(np.int64)),
            "docnums": dn_col,
            "tfs": tf_col,
            "norms": nm_col,
            "positions": ps_col,
            "min_docnum": pa.array(min_dn),
            "max_docnum": pa.array(max_dn),
            "max_tf": pa.array(max_tf.astype(np.int64)),
            "max_norm": pa.array(max_nm.astype(np.float32), type=pa.float32()),
        }
    )


ENCODED_CHUNK_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("df", pa.int64()),
        ("docnums", pa.binary()),
        ("tfs", pa.binary()),
        ("norms", pa.binary()),
        ("positions", pa.binary()),
        ("min_docnum", pa.int64()),
        ("max_docnum", pa.int64()),
        ("max_tf", pa.int64()),
        ("max_norm", pa.float32()),
    ]
)


def _chunk_schema(keep_positions: bool) -> pa.Schema:
    fields = [
        ("term", pa.string()),
        ("df", pa.int32()),
        ("docnums", pa.list_(pa.int64())),
        ("tfs", pa.list_(pa.int32())),
        ("norms", pa.list_(pa.float32())),
    ]
    if keep_positions:
        fields.append(("positions", pa.list_(pa.list_(pa.int32()))))
    return pa.schema(fields)
