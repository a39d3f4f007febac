"""Vectorized same-element verification for the COMMON nested query
shape: a conjunction whose scoped clauses all sit directly under ONE
single-level nested path (e.g. ``lineitems.l_returnflag`` AND
``lineitems.l_quantity``), with term / match / prefix / numeric-range
predicates.

Instead of converting candidate docs' nested structures to Python and
walking them per doc (search/nested.py, the general path), this path
stays Arrow end-to-end: flatten the candidates' ``list<struct>`` column
once, evaluate every clause as a vectorized mask over the flattened
elements (text predicates run through the same batch analyzer as the
index build), AND the masks, and reduce element→doc with one
``np.repeat``-indexed scatter.  Work is O(total elements of the
candidate set) with no per-doc Python — the shape that holds when the
candidate set is millions of docs on a cluster (the identical kernel
body runs inside ``map_batches`` over candidate blocks).

Queries that don't fit (multi-level nesting, cross-path scoping,
phrases, fuzzy, synonyms) fall back to the general verifier.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..analysis.analyzers import analyzer_named
from . import query as q

_SUPPORTED = (q.TermQuery, q.MatchQuery, q.PrefixQuery,
              q.NumericRangeQuery, q.TermRangeQuery)


def fast_plan(verifier, node) -> Optional[Tuple[str, List]]:
    """(nested_path, scoped_leaves) when the query tree is a
    conjunction-like node whose scoped clauses are all supported leaves
    directly under the SAME single-level nested path; None otherwise."""
    from .synonyms import thesaurus_for

    children = verifier.children_of(node)
    if children is None or isinstance(node, q.DisjunctionQuery):
        return None
    # inner conjunctions scoped at the same single path intersect at
    # that path exactly like their inlined leaves: flatten them
    stack = list(children)
    flat: List = []
    while stack:
        c = stack.pop(0)
        if isinstance(c, q.ConjunctionQuery):
            stack = list(c.conjuncts) + stack
        else:
            flat.append(c)
    path = None
    scoped: List = []
    for c in flat:
        chain = verifier.chain_of(c)
        if not chain:
            # doc-level clause: already enforced by the doc-level
            # search, but only if it is a LEAF (an inner node might
            # itself need scoping)
            if verifier.children_of(c) is not None and (
                verifier.needs_filter(c)
            ):
                return None
            continue
        if len(chain) != 1 or not isinstance(c, _SUPPORTED):
            return None
        field = verifier.field_of(c)
        root = field.split(".", 1)[0]
        # the nested path must BE the root column (single-level layout)
        if chain[0] != root:
            return None
        if path is None:
            path = chain[0]
        elif path != chain[0]:
            return None
        if isinstance(c, (q.TermQuery, q.MatchQuery)) and (
            thesaurus_for(verifier.mapping, field) is not None
            or verifier.mapping.synonyms is not None
        ):
            return None
        if isinstance(c, q.MatchQuery) and c.fuzziness not in (
            0, "0", None,
        ):
            return None
        scoped.append(c)
    if path is None or len(scoped) < 1:
        return None
    return path, scoped


def _flatten_all(col: pa.Array, parent: np.ndarray):
    """Flatten every list level, tracking the top-level parent index."""
    while pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
        counts = np.asarray(
            pc.fill_null(pc.list_value_length(col), 0), dtype=np.int64
        )
        parent = np.repeat(parent, counts)
        col = pc.list_flatten(col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
    return col, parent


def _leaf_column(elems: pa.Array, parts: Sequence[str], eidx: np.ndarray):
    """Descend struct parts below the element, flattening any inner
    list levels (values map back to their element via eidx)."""
    col = elems
    for part in parts:
        col, eidx = _flatten_all(col, eidx)
        if not pa.types.is_struct(col.type):
            return None, None
        try:
            col = pc.struct_field(col, part)
        except (KeyError, pa.ArrowInvalid):
            return None, None
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
    col, eidx = _flatten_all(col, eidx)
    return col, eidx


def _text_mask(
    clause, col: pa.Array, eidx: np.ndarray, n_elems: int, mapping
) -> np.ndarray:
    """Element mask for term/match/prefix/term-range over a string
    column, via the SAME batch analyzer the build used."""
    from ..analysis.freq import analyze_batch

    field = clause.field or mapping.default_field
    ana = analyzer_named(
        getattr(clause, "analyzer", "") or mapping.analyzer_for(field)
    )
    col = pc.cast(col, pa.string())
    terms, tok_doc, _pos, _fl = analyze_batch(col, ana)
    if isinstance(terms, pa.ChunkedArray):
        terms = terms.combine_chunks()
    tok_elem = eidx[tok_doc]
    mask = np.zeros(n_elems, dtype=bool)
    if isinstance(clause, q.TermQuery):
        hit = np.asarray(pc.equal(terms, clause.term).fill_null(False))
        mask[tok_elem[hit]] = True
        return mask
    if isinstance(clause, q.PrefixQuery):
        hit = np.asarray(
            pc.starts_with(terms, pattern=clause.prefix).fill_null(False)
        )
        mask[tok_elem[hit]] = True
        return mask
    if isinstance(clause, q.TermRangeQuery):
        ok = np.ones(len(terms), dtype=bool)
        t_np = np.asarray(terms, dtype=object)
        if clause.min is not None:
            ok &= (
                (t_np > clause.min)
                | ((t_np == clause.min) & clause.inclusive_min)
            )
        if clause.max is not None:
            ok &= (
                (t_np < clause.max)
                | ((t_np == clause.max) & clause.inclusive_max)
            )
        mask[tok_elem[ok]] = True
        return mask
    # MatchQuery
    qana = analyzer_named(
        clause.analyzer or mapping.analyzer_for(field)
    )
    qtoks = [t.term for t in qana.analyze(clause.match)]
    if not qtoks:
        return mask
    if clause.operator == "and":
        acc = np.ones(n_elems, dtype=bool)
        for tq in qtoks:
            m = np.zeros(n_elems, dtype=bool)
            hit = np.asarray(pc.equal(terms, tq).fill_null(False))
            m[tok_elem[hit]] = True
            acc &= m
        return acc
    hit = np.asarray(
        pc.is_in(terms, value_set=pa.array(qtoks)).fill_null(False)
    )
    mask[tok_elem[hit]] = True
    return mask


def _numeric_mask(
    clause: q.NumericRangeQuery, col: pa.Array, eidx: np.ndarray,
    n_elems: int,
) -> np.ndarray:
    vals = np.asarray(
        pc.cast(col, pa.float64()).fill_null(np.nan), dtype=np.float64
    )
    ok = ~np.isnan(vals)
    if clause.min is not None:
        ok &= (
            (vals > clause.min)
            if not clause.inclusive_min
            else (vals >= clause.min)
        )
    if clause.max is not None:
        ok &= (
            (vals < clause.max)
            if not clause.inclusive_max
            else (vals <= clause.max)
        )
    mask = np.zeros(n_elems, dtype=bool)
    mask[eidx[ok]] = True
    return mask


def fast_filter(
    verifier, path: str, scoped: List, docnums: np.ndarray
) -> Optional[np.ndarray]:
    """Keep-mask over docnums, or None when the data shape declines
    (missing arrow fetch, non-list column)."""
    fetch = getattr(verifier.reader, "docvalues_arrow", None)
    if fetch is None:
        return None
    col = fetch(docnums, path)
    if col is None:
        return None
    if not (
        pa.types.is_list(col.type) or pa.types.is_large_list(col.type)
    ):
        return None
    n = len(docnums)
    elems, parent = _flatten_all(col, np.arange(n, dtype=np.int64))
    n_elems = len(elems)
    if n_elems == 0:
        return np.zeros(n, dtype=bool)
    eidx0 = np.arange(n_elems, dtype=np.int64)
    ok = np.ones(n_elems, dtype=bool)
    for clause in scoped:
        field = clause.field or verifier.mapping.default_field
        parts = field.split(".")[1:]
        leaf, eidx = _leaf_column(elems, parts, eidx0)
        if leaf is None:
            return None
        if isinstance(clause, q.NumericRangeQuery):
            m = _numeric_mask(clause, leaf, eidx, n_elems)
        else:
            if not (
                pa.types.is_string(leaf.type)
                or pa.types.is_large_string(leaf.type)
            ):
                return None
            m = _text_mask(
                clause, leaf, eidx, n_elems, verifier.mapping
            )
        ok &= m
        if not ok.any():
            return np.zeros(n, dtype=bool)
    keep = np.zeros(n, dtype=bool)
    keep[parent[ok]] = True
    return keep
