"""Query-time same-element scoping for nested document mappings
(reference search_nested_test.go semantics; mapping/document.go:48).

The index stores nested array elements flattened into their parent
doc's postings (index/nested.py explains why), so the doc-level result
of a conjunction over nested fields is a SUPERSET of the reference's:
it contains docs where the clauses matched in different elements.
This module removes those: for each candidate doc it reads the stored
nested structure (docvalues of the nested path's root column) and
re-evaluates the query tree per element, joining clause matches at
each conjunction's deepest common nested ancestor — the query-time
equivalent of the reference's block-join over adjacent sub-documents
(index/scorch nested introducer).

Scale shape: the verifier runs on the doc-level candidate set (already
intersected, so bounded); work per doc is the doc's own element count.
On a cluster the same verifier body is a `map_batches` post-filter
stage over candidate blocks — no second index scan, no shuffle.

Scoping rules (derived from the reference conformance vectors):
- A leaf clause on a field under nested path chain P returns the SET
  of element-ordinal tuples (relative to P) where it matches.
- A conjunction returns matches at the deepest common prefix of its
  children's chains: children's ordinal sets are truncated to that
  prefix and intersected.  Children with no nested ancestors are
  booleans.
- A disjunction is satisfied per doc if any child matches anywhere;
  scoped children project to the common prefix and union.
- must_not and pure score clauses stay doc-level (the doc-level
  search already enforced them).
- Leaves the verifier cannot element-evaluate (geo, ip, _all, _id,
  match_all, synonyms-expanded) count as doc-level TRUE — they can
  never over-filter relative to the doc-level result, only decline to
  scope; the supported set covers every reference vector.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..analysis.analyzers import analyzer_named
from ..index.nested import nested_prefixes
from . import query as q


# --------------------------------------------------------------------------
# element enumeration
# --------------------------------------------------------------------------


def _iter_structs(v):
    """Depth-first struct elements of an arbitrarily nested list value —
    flat ordinal assignment (search_nested_test.go
    TestNestedArrayConjunctionQuery: [[a,b],[c,d]] scopes like
    [a,b,c,d])."""
    if isinstance(v, dict):
        yield v
    elif isinstance(v, (list, tuple)):
        for x in v:
            yield from _iter_structs(x)


def _flatten_values(v, out: list) -> None:
    if v is None:
        return
    if isinstance(v, (list, tuple)):
        for x in v:
            _flatten_values(x, out)
    else:
        out.append(v)


def collect_leaf_values(
    value,
    parts: Sequence[str],
    cur_path: str,
    nested_set,
    ordinal: Tuple[int, ...],
    out: Dict[Tuple[int, ...], list],
) -> None:
    """Gather leaf values of dotted path ``parts`` under ``value``,
    keyed by the ordinal tuple of nested ancestors crossed on the way.
    Non-nested arrays flatten WITHOUT extending the ordinal (they do
    not scope)."""
    if value is None:
        return
    if not parts:
        vals = out.setdefault(ordinal, [])
        _flatten_values(value, vals)
        return
    part, rest = parts[0], parts[1:]
    child_path = f"{cur_path}.{part}" if cur_path else part
    for struct in _iter_structs(value) if not isinstance(value, dict) else (
        value,
    ):
        child = struct.get(part)
        if child is None:
            continue
        if child_path in nested_set:
            # a single struct under a nested mapping scopes as a
            # one-element array (ordinal 0)
            for k, elem in enumerate(_iter_structs(child)):
                collect_leaf_values(
                    elem, rest, child_path, nested_set, ordinal + (k,), out
                )
        else:
            collect_leaf_values(
                child, rest, child_path, nested_set, ordinal, out
            )


def collect_root_leaf_values(
    value, rootcol: str, parts: Sequence[str], nested_set
) -> Dict[Tuple[int, ...], list]:
    """Entry point handling the case where the ROOT column itself is the
    nested path (e.g. a top-level list<struct> column)."""
    out: Dict[Tuple[int, ...], list] = {}
    if rootcol in nested_set:
        for k, elem in enumerate(_iter_structs(value)):
            collect_leaf_values(
                elem, parts, rootcol, nested_set, (k,), out
            )
    else:
        collect_leaf_values(value, parts, rootcol, nested_set, (), out)
    return out


# --------------------------------------------------------------------------
# leaf predicates: does THIS element's value set satisfy the clause?
# --------------------------------------------------------------------------


class _ElementMatcher:
    """Per-clause element predicate, reusing the query's own analysis
    semantics over a single element's values."""

    def __init__(self, verifier: "NestedVerifier", node):
        self.v = verifier
        self.node = node
        self._memo: dict = {}

    def once(self, key, fn):
        """Query-side derived state (analyzed tokens, compiled regex,
        parsed bounds) computes ONCE per clause, not per candidate doc."""
        if key not in self._memo:
            self._memo[key] = fn()
        return self._memo[key]

    def field_analyzer(self, field: str):
        return analyzer_named(self.v.mapping.analyzer_for(field))

    def tokens(self, values, field: str):
        ana = self.field_analyzer(field)
        toks: List[str] = []
        for val in values:
            if isinstance(val, str):
                toks.extend(t.term for t in ana.analyze(val))
            elif isinstance(val, bool):
                toks.append("T" if val else "F")
            elif val is not None:
                toks.append(str(val))
        return toks

    def __call__(self, values) -> bool:
        n = self.node
        if isinstance(n, q.TermQuery):
            return n.term in self.tokens(values, n.field)
        if isinstance(n, q.PrefixQuery):
            return any(
                t.startswith(n.prefix)
                for t in self.tokens(values, n.field)
            )
        if isinstance(n, q.TermRangeQuery):
            for t in self.tokens(values, n.field):
                if n.min is not None and (
                    t < n.min or (t == n.min and not n.inclusive_min)
                ):
                    continue
                if n.max is not None and (
                    t > n.max or (t == n.max and not n.inclusive_max)
                ):
                    continue
                return True
            return False
        if isinstance(n, (q.RegexpQuery, q.WildcardQuery)):
            import re

            def compile_pat():
                if isinstance(n, q.WildcardQuery):
                    return re.compile(
                        "".join(
                            ".*" if c == "*" else "." if c == "?"
                            else re.escape(c)
                            for c in n.wildcard
                        )
                    )
                return re.compile(n.regexp)

            pat = self.once("pat", compile_pat)
            return any(
                pat.fullmatch(t) for t in self.tokens(values, n.field)
            )
        if isinstance(n, q.FuzzyQuery):
            from .levenshtein import bounded_distance
            from .query import resolve_fuzziness

            fuzz = resolve_fuzziness(n.fuzziness, n.term)
            pl = n.prefix_length or 0
            return any(
                (not pl or t[:pl] == n.term[:pl])
                and bounded_distance(n.term, t, fuzz) <= fuzz
                for t in self.tokens(values, n.field)
            )
        if isinstance(n, q.MatchQuery):
            qtoks = self.once(
                "qtoks",
                lambda: [
                    t.term
                    for t in analyzer_named(
                        n.analyzer or self.v.mapping.analyzer_for(n.field)
                    ).analyze(n.match)
                ],
            )
            if not qtoks:
                return False
            etoks = set(self.tokens(values, n.field))
            if n.fuzziness not in (0, "0", None):
                from .levenshtein import bounded_distance
                from .query import resolve_fuzziness

                def has(tq):
                    f = resolve_fuzziness(n.fuzziness, tq)
                    pl = n.prefix_length or 0
                    return any(
                        (not pl or t[:pl] == tq[:pl])
                        and bounded_distance(tq, t, f) <= f
                        for t in etoks
                    )

            else:

                def has(tq):
                    return tq in etoks

            if n.operator == "and":
                return all(has(t) for t in qtoks)
            return any(has(t) for t in qtoks)
        if isinstance(n, (q.MatchPhraseQuery, q.MultiPhraseQuery)):
            def mk_slots():
                if isinstance(n, q.MatchPhraseQuery):
                    ana_q = analyzer_named(
                        n.analyzer or self.v.mapping.analyzer_for(n.field)
                    )
                    return [
                        [t.term] for t in ana_q.analyze(n.match_phrase)
                    ]
                return [list(s) for s in n.terms]

            slots = self.once("slots", mk_slots)
            if not slots:
                return False
            ana = self.field_analyzer(n.field)
            for val in values:
                if not isinstance(val, str):
                    continue
                toks = ana.analyze(val)
                # position-adjacent slot walk within ONE element value
                by_pos = {}
                for t in toks:
                    by_pos.setdefault(t.position, set()).add(t.term)
                for start in sorted(by_pos):
                    if all(
                        any(
                            term in by_pos.get(start + i, ())
                            for term in slot
                        )
                        for i, slot in enumerate(slots)
                    ):
                        return True
            return False
        if isinstance(n, q.NumericRangeQuery):
            for val in values:
                if not isinstance(val, (int, float)) or isinstance(
                    val, bool
                ):
                    continue
                f = float(val)
                if n.min is not None and (
                    f < n.min or (f == n.min and not n.inclusive_min)
                ):
                    continue
                if n.max is not None and (
                    f > n.max or (f == n.max and not n.inclusive_max)
                ):
                    continue
                return True
            return False
        if isinstance(n, q.DateRangeQuery):
            from ..analysis.datetime_parsers import (
                resolve_datetime_parser,
            )

            fcfg = (self.v.field_configs or {}).get(n.field) or {}
            parse = self.once(
                "parse",
                lambda: resolve_datetime_parser(
                    fcfg.get("datetime_parser") or "iso"
                ),
            )
            lo = self.once(
                "lo",
                lambda: n._bound_nanos(n.start, "start")
                if n.start
                else None,
            )
            hi = self.once(
                "hi",
                lambda: n._bound_nanos(n.end, "end") if n.end else None,
            )
            for val in values:
                ns = parse(val) if isinstance(val, str) else None
                if ns is None:
                    continue
                if lo is not None and (
                    ns < lo or (ns == lo and not n.inclusive_start)
                ):
                    continue
                if hi is not None and (
                    ns > hi or (ns == hi and not n.inclusive_end)
                ):
                    continue
                return True
            return False
        raise _Unsupported()


class _Unsupported(Exception):
    pass


# --------------------------------------------------------------------------
# recursive scoped evaluation
# --------------------------------------------------------------------------

_DOC_TRUE = ((), True)


def _common_prefix_len(chains) -> int:
    if not chains:
        return 0
    n = min(len(c) for c in chains)
    common = 0
    for i in range(n):
        first = chains[0][i]
        if all(c[i] == first for c in chains):
            common = i + 1
        else:
            break
    return common


class NestedVerifier:
    """Filter doc-level candidate docnums down to docs satisfying
    same-element nested scoping for a parsed query tree."""

    def __init__(self, reader, mapping, nested_paths: Sequence[str]):
        self.reader = reader
        self.mapping = mapping
        self.nested_paths = list(nested_paths)
        self.nested_set = set(nested_paths)
        self.field_configs = (reader.options or {}).get("fields") or {}
        # one matcher per clause node, reused across candidate docs so
        # query-side analysis happens once per clause
        self._matchers: dict = {}

    # -- query-tree shape ------------------------------------------------

    def field_of(self, node) -> str:
        return getattr(node, "field", "") or self.mapping.default_field

    def chain_of(self, node) -> Tuple[str, ...]:
        """Nested ancestor chain of a node: leaf -> its field's chain;
        inner node -> common prefix of children's chains."""
        children = self.children_of(node)
        if children is None:
            return nested_prefixes(self.field_of(node), self.nested_paths)
        chains = [self.chain_of(c) for c in children]
        if not chains:
            return ()
        return chains[0][: _common_prefix_len(chains)]

    def children_of(self, node) -> Optional[List]:
        """Scoping-relevant children of an inner node; None for leaves."""
        if isinstance(node, q.ConjunctionQuery):
            return list(node.conjuncts)
        if isinstance(node, q.DisjunctionQuery):
            return list(node.disjuncts)
        if isinstance(node, q.BooleanQuery):
            out = []
            if node.must is not None:
                out.append(node.must)
            if node.filter is not None:
                out.append(node.filter)
            if node.must is None and node.should is not None:
                out.append(node.should)
            return out
        return None

    def needs_filter(self, node) -> bool:
        """True when some conjunction-like node joins >= 2 clauses that
        share a nested ancestor, or a leaf on a nested field carries its
        own same-element constraint: match operator=and (all tokens in
        ONE element) and phrases (position restarts per element make
        cross-element adjacency possible at doc level)."""
        children = self.children_of(node)
        if children is None:
            if not nested_prefixes(
                self.field_of(node), self.nested_paths
            ):
                return False
            return isinstance(
                node, (q.MatchPhraseQuery, q.MultiPhraseQuery)
            ) or (
                isinstance(node, q.MatchQuery) and node.operator == "and"
            )
        if not isinstance(node, q.DisjunctionQuery) and len(children) >= 2:
            chains = [self.chain_of(c) for c in children]
            nonempty = [c for c in chains if c]
            if len(nonempty) >= 2 and _common_prefix_len(nonempty) >= 1:
                return True
        return any(self.needs_filter(c) for c in children)

    # -- evaluation -------------------------------------------------------

    def eval(self, node, doc_data: dict):
        """-> (scope_chain, matches) where matches is a bool (scope ())
        or a set of ordinal tuples of len == len(scope_chain)."""
        children = self.children_of(node)
        if children is None:
            return self._eval_leaf(node, doc_data)
        if isinstance(node, q.DisjunctionQuery):
            results = [self.eval(c, doc_data) for c in children]
            sat = sum(
                1
                for s, m in results
                if (m is True) or (not isinstance(m, bool) and m)
            )
            need = max(1, node.min or 0)
            return ((), sat >= need)
        if isinstance(node, q.BooleanQuery) and node.must is None and (
            node.filter is None
        ):
            # pure should/must_not boolean: doc-level
            return _DOC_TRUE
        # conjunction scoping (ConjunctionQuery / BooleanQuery must+filter)
        results = [self.eval(c, doc_data) for c in children]
        # booleans (doc-level children) must all hold regardless of scope
        for _, m in results:
            if isinstance(m, bool) and not m:
                return ((), False)
        sets = [
            (s, m) for s, m in results if not isinstance(m, bool)
        ]
        if not sets:
            return _DOC_TRUE
        common = _common_prefix_len([s for s, _ in sets])
        if common == 0:
            ok = all(len(m) > 0 for _, m in sets)
            return ((), ok)
        target_chain = sets[0][0][:common]
        inter = None
        for s, m in sets:
            p = {t[:common] for t in m}
            inter = p if inter is None else (inter & p)
            if not inter:
                return (target_chain, set())
        return (target_chain, inter)

    def _eval_leaf(self, node, doc_data: dict):
        if isinstance(node, q.MatchAllQuery):
            return _DOC_TRUE
        if isinstance(node, q.MatchNoneQuery):
            return ((), False)
        field = self.field_of(node)
        chain = nested_prefixes(field, self.nested_paths)
        if not chain:
            # doc-level leaf: the doc-level search already enforced it
            return _DOC_TRUE
        rootcol = field.split(".", 1)[0]
        value = doc_data.get(rootcol)
        if value is None:
            return (chain, set())
        try:
            if isinstance(node, (q.TermQuery, q.MatchQuery)):
                # synonym-expanded fields match terms the literal
                # element text does not contain: decline to scope
                # rather than over-filter
                from .synonyms import thesaurus_for

                if (
                    thesaurus_for(self.mapping, field) is not None
                    or self.mapping.synonyms is not None
                ):
                    return _DOC_TRUE
            matcher = self._matchers.get(id(node))
            if matcher is None:
                matcher = _ElementMatcher(self, node)
                self._matchers[id(node)] = matcher
            groups = collect_root_leaf_values(
                value, rootcol, field.split(".")[1:], self.nested_set
            )
            # ordinals are relative to the leaf's full chain; elements
            # that exist but lack the leaf field still count as ordinals
            # with no values (they simply don't match)
            matched = {
                ordi
                for ordi, vals in groups.items()
                if vals and matcher(vals)
            }
            return (chain, matched)
        except _Unsupported:
            return _DOC_TRUE

    def filter(self, node, docnums: np.ndarray) -> np.ndarray:
        """Boolean keep-mask over candidate docnums."""
        n = len(docnums)
        if n == 0:
            return np.ones(0, dtype=bool)
        roots = sorted(
            {p.split(".", 1)[0] for p in self.nested_paths}
        )
        # rows-bounded fetch: only the candidate docs' nested structures
        # convert to Python (reader.docvalues_rows), never whole columns
        fetch = getattr(self.reader, "docvalues_rows", None)
        if fetch is None:
            fetch = self.reader.docvalues_for
        dv = fetch(docnums, roots)
        keep = np.ones(n, dtype=bool)
        for i in range(n):
            doc_data = {r: dv[r][i] for r in roots}
            _, m = self.eval(node, doc_data)
            keep[i] = bool(m) if isinstance(m, bool) else len(m) > 0
        return keep


def apply_nested_filter(reader, mapping, query_node, hits):
    """Hook for Index.search: same-element scoping post-filter.  No-op
    unless the index has nested paths AND the query joins clauses under
    a shared nested ancestor."""
    nested = (reader.options or {}).get("nested_paths") or []
    if not nested:
        return hits
    v = NestedVerifier(reader, mapping, nested)
    if not v.needs_filter(query_node):
        return hits
    from .searcher import SearchHits

    # vectorized fast path for the common shape (all scoped clauses
    # directly under one single-level nested path); general per-doc
    # verifier otherwise
    keep = None
    from .nested_fast import fast_filter, fast_plan

    plan = fast_plan(v, query_node)
    if plan is not None:
        import pyarrow as _pa

        try:
            keep = fast_filter(v, plan[0], plan[1], hits.docnums)
        except _pa.ArrowInvalid:
            keep = None  # data shape the kernel can't take: general path
    if keep is None:
        keep = v.filter(query_node, hits.docnums)
    if keep.all():
        return hits
    return SearchHits(hits.docnums[keep], hits.scores[keep])
