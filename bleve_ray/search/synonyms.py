"""Synonym support (reference SynonymDefinition, index.go:358-390, and
query-time expansion via NewSynonymSearcher, search_term.go:154-196).

A Thesaurus maps term -> equivalent terms.  Definitions follow the
reference shape:

- {"synonyms": [...]}               bidirectional: every listed term maps
                                    to all the others
- {"input": [...], "synonyms":[..]} unidirectional: each input term maps
                                    to every synonym (but not back)

At query time a term with synonyms becomes a disjunction of the term
itself (full boost) and each synonym at boost/2 (search_term.go:183).
Terms are normalized through the field analyzer when one is supplied,
like the reference analyzes thesaurus entries at index time.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Set


class Thesaurus:
    def __init__(self):
        self._map: Dict[str, Set[str]] = {}

    @staticmethod
    def from_definitions(
        definitions: Sequence[dict], analyzer=None
    ) -> "Thesaurus":
        th = Thesaurus()
        for d in definitions:
            syns = [th._norm(s, analyzer) for s in d.get("synonyms", [])]
            syns = [s for s in syns if s]
            inputs = [th._norm(s, analyzer) for s in d.get("input", [])]
            inputs = [s for s in inputs if s]
            if inputs:
                for i in inputs:
                    th._map.setdefault(i, set()).update(syns)
                    th._map[i].discard(i)
            else:
                for s in syns:
                    th._map.setdefault(s, set()).update(
                        x for x in syns if x != s
                    )
        return th

    @staticmethod
    def _norm(term: str, analyzer) -> Optional[str]:
        if analyzer is None:
            return term
        toks = analyzer.terms(term)
        return toks[0] if toks else None

    def synonyms_of(self, term: str) -> List[str]:
        return sorted(self._map.get(term, ()))

    def __len__(self) -> int:
        return len(self._map)

    # ThesaurusKeys iterators (same surface as index.thesaurus.
    # ThesaurusReader so the query path treats both uniformly)
    def keys(self) -> List[str]:
        return sorted(self._map)

    def keys_prefix(self, prefix: str) -> List[str]:
        return [k for k in self.keys() if k.startswith(prefix)]

    def keys_fuzzy(
        self, term: str, fuzziness: int, prefix_len: int = 0
    ) -> List[str]:
        from .levenshtein import within_distance

        pre = term[:prefix_len]
        return [
            k
            for k in self.keys()
            if k.startswith(pre) and within_distance(term, k, fuzziness)
        ]

    def keys_regexp(self, pattern: str) -> List[str]:
        import re

        rx = re.compile(pattern)
        return [k for k in self.keys() if rx.fullmatch(k)]


class UnionThesaurus:
    """Union view over several members' thesauri for the same source --
    the alias synonym-presearch role (reference pre_search.go synonym
    processor): synonym documents are distributed across alias members
    like regular documents, so query expansion must see the UNION."""

    def __init__(self, parts):
        self.parts = list(parts)

    def synonyms_of(self, term: str) -> List[str]:
        out: Set[str] = set()
        for p in self.parts:
            out.update(p.synonyms_of(term))
        return sorted(out)

    def keys(self) -> List[str]:
        out: Set[str] = set()
        for p in self.parts:
            out.update(p.keys())
        return sorted(out)

    def keys_prefix(self, prefix: str) -> List[str]:
        out: Set[str] = set()
        for p in self.parts:
            out.update(p.keys_prefix(prefix))
        return sorted(out)

    def keys_fuzzy(
        self, term: str, fuzziness: int, prefix_len: int = 0
    ) -> List[str]:
        out: Set[str] = set()
        for p in self.parts:
            out.update(p.keys_fuzzy(term, fuzziness, prefix_len))
        return sorted(out)

    def keys_regexp(self, pattern: str) -> List[str]:
        out: Set[str] = set()
        for p in self.parts:
            out.update(p.keys_regexp(pattern))
        return sorted(out)

    def __len__(self) -> int:
        return len(self.keys())


def thesaurus_for(mapping, field: str):
    """Resolve the thesaurus for a field: a per-field synonym source
    (index-time thesaurus segments, mapping/document.go:126
    synonymSourceForPath) wins, then the default source, then the legacy
    single manifest-KV thesaurus."""
    ths = getattr(mapping, "thesauri", None)
    if ths:
        src = None
        srcs = getattr(mapping, "synonym_sources", None)
        if srcs:
            src = srcs.get(field)
        if not src:
            src = getattr(mapping, "default_synonym_source", "")
        # no implicit source: like the reference, a thesaurus applies
        # only when the mapping associates it with the field (or sets
        # the default source) -- indexed collections alone change nothing
        if src and src in ths:
            return ths[src]
    return getattr(mapping, "synonyms", None)


def synonym_term_searcher(reader, term, field, boost, options, thesaurus):
    """NewSynonymSearcher: disjunction of the term (boost) and each
    synonym (boost/2); plain TermSearcher when no synonyms exist."""
    from .searcher import DisjunctionSearcher, TermSearcher

    syns = thesaurus.synonyms_of(term) if thesaurus is not None else []
    if not syns:
        return TermSearcher(reader, term, field, boost, options)
    children = [TermSearcher(reader, term, field, boost, options)]
    children.extend(
        TermSearcher(reader, s, field, boost / 2.0, options) for s in syns
    )
    return DisjunctionSearcher(children, min_match=0)
