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


def _arrow_batch_tokens(
    col: pa.Array,
) -> Optional[Tuple[pa.Array, np.ndarray]]:
    """Batch-level UAX#29 tokenization for an ASCII Arrow string column
    (the UnicodeTokenizer grammar; see analysis/tokenizers.py ASCII
    collapse).  Returns (flat token array, int64 doc offsets) with tokens
    never materialized as Python strings, or None when some doc needs the
    exact per-doc path (non-ASCII text, or a superset run whose internal
    mid-chars break the word grammar -- e.g. ``a,b`` must split).

    Pipeline: one RE2 split on the superset char class, utf8_trim of the
    leading/trailing mid-chars ('.:,; -- '_' is ExtendNumLet and legally
    edge-joins), then an anchored grammar check only to DETECT the rare
    hard cases.  Equivalence with the per-doc findall is locked by
    tests/test_freq_batch.py's differential sweep."""
    from .tokenizers import ASCII_WORD_ANCHORED

    filled = pc.fill_null(col, "")
    if not pc.all(pc.string_is_ascii(filled)).as_py():
        return None
    splits = pc.split_pattern_regex(
        filled, pattern="[^A-Za-z0-9_'.:,;]+"
    )
    if isinstance(splits, pa.ChunkedArray):
        splits = splits.combine_chunks()
    flat = pc.list_flatten(splits)
    loffs = np.asarray(splits.offsets).astype(np.int64)
    trimmed = pc.utf8_trim(flat, "'.:,;")
    # pure ExtendNumLet/punct residue ("___", "_._") is not a word
    # segment (UAX#29: no LNSEQ) -- require an alphanumeric
    keep = pc.match_substring_regex(trimmed, "[A-Za-z0-9]")
    hard = pc.and_(
        pc.match_substring_regex(trimmed, "['.:,;]"),
        pc.invert(pc.match_substring_regex(trimmed, ASCII_WORD_ANCHORED)),
    )
    if pc.any(pc.and_(hard, keep)).as_py():
        return None
    keep_np = np.asarray(keep)
    cs = np.concatenate(([0], np.cumsum(keep_np)))
    doc_offs = cs[loffs]
    return trimmed.filter(keep), doc_offs


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
    if analyzer.fast_path and (analyzer.char_filters == () or not analyzer.char_filters):
        from .tokenizers import UnicodeTokenizer

        tok = analyzer.tokenizer
        if isinstance(tok, UnicodeTokenizer):
            col = texts if is_arrow else pa.array(texts, type=pa.string())
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            batch = _arrow_batch_tokens(col)
            if batch is not None:
                terms, doc_offs = batch
                total = int(doc_offs[-1])
                counts = doc_offs[1:] - doc_offs[:-1]
                doc_idx = np.repeat(
                    np.arange(n_docs, dtype=np.int64), counts
                )
                positions = (
                    np.arange(total, dtype=np.int64)
                    - np.repeat(doc_offs[:-1], counts)
                    + 1
                ).astype(np.int32)
                if analyzer.lowercase:
                    terms = pc.ascii_lower(terms)
                if analyzer.stop_set is not None:
                    keep = np.asarray(
                        pc.invert(
                            pc.is_in(
                                terms,
                                value_set=pa.array(
                                    sorted(analyzer.stop_set)
                                ),
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
                        value_set=pa.array(sorted(analyzer.stop_set)),
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

    docnums_flat = docnums[tdoc].astype(np.int64)
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
    term_codes = np.asarray(enc.indices, dtype=np.int64)
    dictionary = enc.dictionary

    key = term_codes * len(field_len) + doc_idx
    order = np.argsort(key, kind="stable")
    k_sorted = key[order]
    runs = np.flatnonzero(np.diff(k_sorted)) + 1
    run_starts = np.concatenate(([0], runs))
    run_ends = np.concatenate((runs, [n_tokens]))
    tfs_all = (run_ends - run_starts).astype(np.int64)
    tdoc = doc_idx[order][run_starts]
    tcode = term_codes[order][run_starts]
    pos_sorted = positions[order]

    term_breaks = np.flatnonzero(np.diff(tcode)) + 1
    t_off = np.concatenate(([0], term_breaks, [len(tcode)]))
    uniq_codes = tcode[t_off[:-1]]
    term_strs = dictionary.take(pa.array(uniq_codes, type=pa.int64()))

    docnums_flat = docnums[tdoc].astype(np.int64)
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
            pos_sorted.astype(np.int64), run_starts
        )
    dn_blobs: List[bytes] = [b""] * n_terms
    tf_blobs: List[bytes] = [b""] * n_terms
    nm_blobs: List[bytes] = [b""] * n_terms
    ps_blobs: List[bytes] = [b""] * n_terms
    min_dn = docnums_flat[t_off[:-1]]
    max_dn = docnums_flat[t_off[1:] - 1]
    for i in range(n_terms):
        lo, hi = t_off[i], t_off[i + 1]
        dn_blobs[i] = dn_buf[dn_off[lo] : dn_off[hi]]
        tf_blobs[i] = tf_buf[tf_off[lo] : tf_off[hi]]
        nm_blobs[i] = nm_buf[lo * 4 : hi * 4]
        if keep_positions:
            p0, p1 = run_starts[lo], run_ends[hi - 1]
            ps_blobs[i] = ps_buf[ps_off[p0] : ps_off[p1]]
    # per-term score-bound metadata (block-max support): BM25 score is
    # monotone increasing in tf and in norm, so (max_tf, max_norm) bounds
    # any doc's contribution for the term
    max_tf = np.maximum.reduceat(tfs_all, t_off[:-1])
    max_nm = np.maximum.reduceat(norms_flat, t_off[:-1])
    return pa.table(
        {
            "term": term_strs,
            "df": pa.array((t_off[1:] - t_off[:-1]).astype(np.int64)),
            "docnums": pa.array(dn_blobs, type=pa.binary()),
            "tfs": pa.array(tf_blobs, type=pa.binary()),
            "norms": pa.array(nm_blobs, type=pa.binary()),
            "positions": pa.array(ps_blobs, type=pa.binary()),
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
