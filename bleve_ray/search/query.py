"""Query AST + JSON-dict parsing, mirroring the reference's
search/query/query.go:146-382 JSON dispatch and the query constructors:

- {"term": t, "field": f}                      -> TermQuery
- {"match": text, "field": f, "operator": o}   -> MatchQuery (match.go:123-186)
- {"match_phrase": text, "field": f}           -> MatchPhraseQuery
  (match_phrase.go:37-90 + tokenStreamToPhrase keeping stop-word gaps)
- {"prefix": p, "field": f}                    -> PrefixQuery
- {"conjuncts": [...]}                         -> ConjunctionQuery
- {"disjuncts": [...], "min": n}               -> DisjunctionQuery
- {"must":..., "should":..., "must_not":...}   -> BooleanQuery (boolean.go)
- {"match_all": {}} / {"match_none": {}}
- {"terms": [[...], ...], "field": f}          -> MultiPhraseQuery
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field as dc_field
from typing import Dict, List, Optional, Sequence

from ..analysis.analyzers import analyzer_named
from .searcher import (
    BooleanSearcher,
    ConjunctionSearcher,
    DisjunctionSearcher,
    MatchAllSearcher,
    MatchNoneSearcher,
    MultiTermSearcher,
    PhraseSearcher,
    Searcher,
    TermSearcher,
)


class Query:
    boost: float = 1.0

    def searcher(self, reader, mapping, options) -> Searcher:
        raise NotImplementedError


@dataclass
class TermQuery(Query):
    term: str
    field: str = ""
    boost: float = 1.0

    def searcher(self, reader, mapping, options):
        field = self.field or mapping.default_field
        from .synonyms import thesaurus_for

        th = thesaurus_for(mapping, field)
        if th is not None:
            from .synonyms import synonym_term_searcher

            return synonym_term_searcher(
                reader, self.term, field, self.boost, options, th
            )
        return TermSearcher(reader, self.term, field, self.boost, options)


@dataclass
class MatchQuery(Query):
    """match.go:123-186: analyze text -> term queries -> disjunction(min=1)
    for operator 'or' (default) / conjunction for 'and'."""

    match: str
    field: str = ""
    operator: str = "or"
    analyzer: str = ""
    boost: float = 1.0
    # match.go:150-170: per-analyzed-term fuzzy expansion; 0 = exact,
    # "auto" = length thresholds
    fuzziness: object = 0
    prefix_length: int = 0

    def searcher(self, reader, mapping, options):
        field = self.field or mapping.default_field
        analyzer = analyzer_named(
            self.analyzer or mapping.analyzer_for(field)
        )
        tokens = analyzer.analyze(self.match)
        if not tokens:
            return MatchNoneSearcher()
        from .synonyms import thesaurus_for

        th = thesaurus_for(mapping, field)
        if self.fuzziness not in (0, "0", None):
            tqs = [
                FuzzyQuery(
                    t.term,
                    field=field,
                    fuzziness=self.fuzziness,
                    prefix_length=self.prefix_length,
                    boost=self.boost,
                ).searcher(reader, mapping, options)
                for t in tokens
            ]
        elif th is not None:
            from .synonyms import synonym_term_searcher

            tqs = [
                synonym_term_searcher(
                    reader, t.term, field, self.boost, options, th
                )
                for t in tokens
            ]
        else:
            tqs = [
                TermSearcher(reader, t.term, field, self.boost, options)
                for t in tokens
            ]
        if self.operator == "and":
            return ConjunctionSearcher(tqs)
        return DisjunctionSearcher(tqs, min_match=1)


def token_stream_to_phrase(tokens) -> List[List[str]]:
    """match_phrase.go:119-130 tokenStreamToPhrase: position-indexed slots
    relative to the first token position; stop-word gaps become empty slots."""
    if not tokens:
        return []
    first = min(t.position for t in tokens)
    last = max(t.position for t in tokens)
    phrase: List[List[str]] = [[] for _ in range(last - first + 1)]
    for t in tokens:
        phrase[t.position - first].append(t.term)
    return phrase


MAX_FUZZINESS = 2  # search_fuzzy.go:26


def _fuzzy_candidate_terms(reader, term, fuzz, prefix_length, field):
    """Dictionary terms within edit distance (the FuzzySearcher expansion,
    search_fuzzy.go); shared by FuzzyQuery and fuzzy phrases.
    Fuzziness is bounded like NewFuzzySearcher (search_fuzzy.go:30-38)."""
    if fuzz > MAX_FUZZINESS:
        raise ValueError(f"fuzziness exceeds max ({MAX_FUZZINESS})")
    if fuzz < 0:
        raise ValueError("invalid fuzziness, negative")
    prefix = term[:prefix_length]
    if hasattr(reader, "terms_matching_automaton"):
        from .lev_automaton import LevAutomaton

        aut = LevAutomaton(term, fuzz, prefix=prefix)
        return reader.terms_matching_automaton(field, aut)
    from .levenshtein import within_distance

    terms = (
        reader.terms_with_prefix(field, prefix)
        if prefix
        else reader.terms_in_range(field, None, None)
    )
    tl = len(term)
    return [
        t
        for t in terms
        if abs(len(t) - tl) <= fuzz and within_distance(term, t, fuzz)
    ]


def _expand_phrase_slots(reader, mapping, field, phrase, fuzziness):
    """Per-slot expansion for fuzzy/synonym phrases (reference
    search_phrase.go:95-200 NewMultiPhraseSearcher: each slot term becomes
    a fuzzy expansion [prefix hardcoded 0], and the FieldTermSynonymMap
    adds synonyms of the term AND of fuzzy-matching thesaurus keys as
    acceptable terms at that position)."""
    from .levenshtein import bounded_distance
    from .synonyms import thesaurus_for

    th = thesaurus_for(mapping, field)
    fuzzy_on = fuzziness not in (0, "0", None)
    if th is None and not fuzzy_on:
        return phrase
    out: List[List[tuple]] = []
    for slot in phrase:
        terms = [t for t in slot if t != ""]
        if not terms:
            out.append(slot)
            continue
        # term -> max boost multiplier: the query term itself at 1,
        # fuzzy candidates at 1/(distance+1) (makeBatchSearchersBoosted),
        # synonym-derived terms at 1/2 (NewSynonymSearcher)
        mult: dict = {}

        def _add(t, m):
            if m > mult.get(t, 0.0):
                mult[t] = m

        for t in terms:
            _add(t, 1.0)
            fuzz = resolve_fuzziness(fuzziness, t) if fuzzy_on else 0
            if fuzz:
                for c in _fuzzy_candidate_terms(reader, t, fuzz, 0, field):
                    _add(c, 1.0 / (bounded_distance(t, c, fuzz) + 1))
            if th is not None:
                for s in th.synonyms_of(t):
                    _add(s, 0.5)
                if fuzz:
                    for k in th.keys_fuzzy(t, fuzz, 0):
                        for s in th.synonyms_of(k):
                            _add(s, 0.5)
        out.append(sorted(mult.items()))
    return out


@dataclass
class MatchPhraseQuery(Query):
    match_phrase: str
    field: str = ""
    analyzer: str = ""
    boost: float = 1.0
    # match_phrase.go:43-48: per-slot fuzzy expansion (prefix fixed at 0)
    fuzziness: object = 0
    # extension beyond the reference query surface: positional slop fed
    # to findPhrasePaths semantics (the reference exposes the machinery
    # in search_phrase.go:439 but pins production slop to 0)
    slop: int = 0

    def searcher(self, reader, mapping, options):
        field = self.field or mapping.default_field
        analyzer = analyzer_named(
            self.analyzer or mapping.analyzer_for(field)
        )
        tokens = analyzer.analyze(self.match_phrase)
        if not tokens:
            return MatchNoneSearcher()
        phrase = _expand_phrase_slots(
            reader,
            mapping,
            field,
            token_stream_to_phrase(tokens),
            self.fuzziness,
        )
        return PhraseSearcher(reader, phrase, field, self.boost, options,
                              slop=self.slop)


@dataclass
class MultiPhraseQuery(Query):
    terms: List[List[str]]
    field: str = ""
    boost: float = 1.0
    fuzziness: object = 0
    slop: int = 0

    def searcher(self, reader, mapping, options):
        field = self.field or mapping.default_field
        phrase = _expand_phrase_slots(
            reader, mapping, field, self.terms, self.fuzziness
        )
        return PhraseSearcher(reader, phrase, field, self.boost, options,
                              slop=self.slop)


def _key_synonym_searcher(
    reader, mapping, options, field, boost, base, key_match
):
    """ExtractSynonyms for multi-term queries (reference
    search/query/query.go:700-775 addSynonymsForTermWithMatchType):
    thesaurus KEYS matching the query's own prefix/fuzzy/regexp criterion
    contribute their synonyms as extra term searchers at boost/2, OR-ed
    with the dictionary expansion (min_match=0 like NewSynonymSearcher)."""
    from .synonyms import thesaurus_for

    th = thesaurus_for(mapping, field)
    syn_terms: List[str] = []
    if th is not None:
        for k in key_match(th):
            syn_terms.extend(th.synonyms_of(k))
    if not syn_terms:
        return base if base is not None else MatchNoneSearcher()
    children = [] if base is None else [base]
    children.extend(
        TermSearcher(reader, s, field, boost / 2.0, options)
        for s in sorted(set(syn_terms))
    )
    return DisjunctionSearcher(children, min_match=0)


@dataclass
class PrefixQuery(Query):
    prefix: str
    field: str = ""
    boost: float = 1.0

    def searcher(self, reader, mapping, options):
        field = self.field or mapping.default_field
        terms = reader.terms_with_prefix(field, self.prefix)
        base = (
            MultiTermSearcher(reader, terms, field, self.boost, options)
            if terms
            else None
        )
        return _key_synonym_searcher(
            reader,
            mapping,
            options,
            field,
            self.boost,
            base,
            lambda th: th.keys_prefix(self.prefix),
        )


@dataclass
class TermRangeQuery(Query):
    """search_term_range.go equivalent over the dictionary."""

    min: Optional[str] = None
    max: Optional[str] = None
    field: str = ""
    inclusive_min: bool = True
    inclusive_max: bool = False
    boost: float = 1.0

    def searcher(self, reader, mapping, options):
        field = self.field or mapping.default_field
        terms = [
            t
            for t in reader.terms_in_range(
                field, self.min, self.max, self.inclusive_max
            )
            if self.min is None
            or t > self.min
            or (self.inclusive_min and t == self.min)
        ]
        if not terms:
            return MatchNoneSearcher()
        return MultiTermSearcher(reader, terms, field, self.boost, options)


@dataclass
class NumericRangeQuery(Query):
    """search_numeric_range.go: split [min,max] into prefix-coded covering
    term ranges (precisionStep 4), expand against the dictionary, run as a
    MultiTermSearcher."""

    min: Optional[float] = None
    max: Optional[float] = None
    field: str = ""
    inclusive_min: bool = True
    inclusive_max: bool = False
    boost: float = 1.0

    def searcher(self, reader, mapping, options):
        from ..index.numeric import range_bounds_from_floats, split_int64_range

        field = self.field or mapping.default_field
        lo, hi = range_bounds_from_floats(
            self.min, self.max, self.inclusive_min, self.inclusive_max
        )
        terms: List[str] = []
        for start_t, end_t in split_int64_range(lo, hi):
            terms.extend(
                reader.terms_in_range(field, start_t, end_t, inclusive_hi=True)
            )
        if not terms:
            return MatchNoneSearcher()
        return MultiTermSearcher(reader, terms, field, self.boost, options)


_DT_MIN_NANOS = -(1 << 63)  # ~1677-09-21, time.Time UnixNano range
_DT_MAX_NANOS = (1 << 63) - 1  # ~2262-04-11


@dataclass
class DateRangeQuery(Query):
    """document/field_datetime.go semantics: datetimes indexed as unix-nano
    int64 trie terms; range query = NumericRangeQuery over nanos.  A
    ``date_time_parser`` names a registry parser for the query's OWN
    start/end strings (date_range_string.go DateRangeStringQuery)."""

    start: Optional[str] = None
    end: Optional[str] = None
    field: str = ""
    inclusive_start: bool = True
    inclusive_end: bool = False
    boost: float = 1.0
    date_time_parser: str = ""

    def _bound_nanos(self, value, which: str) -> int:
        if self.date_time_parser:
            from ..analysis.datetime_parsers import resolve_datetime_parser

            ns = resolve_datetime_parser(self.date_time_parser)(str(value))
            if ns is None:
                raise ValueError(
                    "unable to parse datetime with any of the layouts, "
                    f"date time parser name: {self.date_time_parser}"
                )
        else:
            try:
                ns = _parse_dt_nanos(value)
            except (ValueError, OverflowError) as e:
                raise ValueError(
                    f"invalid/unsupported date range, {which}: {value}"
                ) from e
        if not (_DT_MIN_NANOS <= ns <= _DT_MAX_NANOS):
            # beyond time.Time's UnixNano range (date_range.go validation)
            raise ValueError(
                f"invalid/unsupported date range, {which}: {value}"
            )
        return ns

    def searcher(self, reader, mapping, options):
        from ..index.numeric import range_bounds_from_floats, split_int64_range

        field = self.field or mapping.default_field
        if self.start is None and self.end is None:
            raise ValueError(
                "date range query must specify at least one of start/end"
            )
        lo = (
            self._bound_nanos(self.start, "start")
            if self.start
            else -(1 << 63)
        )
        hi = (
            self._bound_nanos(self.end, "end")
            if self.end
            else (1 << 63) - 1
        )
        if self.start and not self.inclusive_start:
            lo += 1
        if self.end and not self.inclusive_end:
            hi -= 1
        terms: List[str] = []
        for start_t, end_t in split_int64_range(lo, hi):
            terms.extend(
                reader.terms_in_range(field, start_t, end_t, inclusive_hi=True)
            )
        if not terms:
            return MatchNoneSearcher()
        return MultiTermSearcher(reader, terms, field, self.boost, options)


def _parse_dt_nanos(s) -> int:
    import datetime as _dt
    import re as _re

    if isinstance(s, (int, float)):
        return int(s)
    txt = str(s).replace("Z", "+00:00")
    # fromisoformat keeps only microseconds; peel the fraction off and
    # account for all 9 nano digits exactly
    frac_ns = 0
    m = _re.search(r"\.(\d+)", txt)
    if m:
        frac_ns = int(m.group(1).ljust(9, "0")[:9])
        txt = txt[: m.start()] + txt[m.end():]
    d = _dt.datetime.fromisoformat(txt)
    if d.tzinfo is None:
        d = d.replace(tzinfo=_dt.timezone.utc)
    # exact integer arithmetic (reference indexes exact UnixNano); float
    # d.timestamp() can lose a microsecond to rounding at boundaries
    epoch = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)
    delta = d - epoch
    whole_s = delta.days * 86400 + delta.seconds
    return whole_s * 1_000_000_000 + frac_ns


def resolve_fuzziness(fuzz, term: str) -> int:
    """Validated edit distance.  "auto" follows GetAutoFuzziness
    (search_fuzzy.go:115-123): byte length > 5 -> 2, > 2 -> 1, else 0;
    numeric values are capped like the reference's query validation
    (query.go:725-730)."""
    if fuzz == "auto":
        n = len(term.encode("utf-8"))
        if n > 5:
            return 2
        if n > 2:
            return 1
        return 0
    f = int(fuzz)
    if f > 2:
        raise ValueError("fuzziness exceeds max (2)")
    if f < 0:
        raise ValueError("invalid fuzziness, negative")
    return f


@dataclass
class FuzzyQuery(Query):
    """search_fuzzy.go: Levenshtein (<=2) expansion over the dictionary;
    fuzziness may be "auto" (term-length thresholds)."""

    term: str
    field: str = ""
    fuzziness: object = 1
    prefix_length: int = 0
    boost: float = 1.0

    def searcher(self, reader, mapping, options):
        field = self.field or mapping.default_field
        fuzz = resolve_fuzziness(self.fuzziness, self.term)
        if fuzz == 0:
            # empty candidate expansion degenerates to the exact term
            # (search_fuzzy.go:100-108)
            return TermSearcher(reader, self.term, field, self.boost, options)
        # Levenshtein automaton intersected with the sorted dictionary
        # (search/levenshtein.go + vellum FST walk): row groups with no
        # accepted string in their term interval are never read, and
        # the in-group seek loop visits O(matches) terms
        cands = _fuzzy_candidate_terms(
            reader, self.term, fuzz, self.prefix_length, field
        )
        from .levenshtein import bounded_distance

        dists = [bounded_distance(self.term, t, fuzz) for t in cands]
        base = (
            MultiTermSearcher(
                reader,
                cands,
                field,
                self.boost,
                options,
                edit_distances=dists,
            )
            if cands
            else None
        )
        return _key_synonym_searcher(
            reader,
            mapping,
            options,
            field,
            self.boost,
            base,
            lambda th: th.keys_fuzzy(self.term, fuzz, self.prefix_length),
        )


_REGEX_SPECIAL = set(".^$*+?{}[]|()\\")


def _split_top_level_alternation(pattern: str):
    """Split a regex on '|' at nesting depth 0; None when unsplittable
    (escapes into classes are respected conservatively)."""
    parts, buf, depth, i = [], [], 0, 0
    while i < len(pattern):
        c = pattern[i]
        if c == "\\" and i + 1 < len(pattern):
            buf.append(pattern[i : i + 2])
            i += 2
            continue
        if c in "([":
            depth += 1
        elif c in ")]":
            depth -= 1
        elif c == "|" and depth == 0:
            parts.append("".join(buf))
            buf = []
            i += 1
            continue
        buf.append(c)
        i += 1
    parts.append("".join(buf))
    return parts


def _regex_literal_prefixes(pattern: str):
    """Per-branch literal prefixes for pruning: a top-level alternation
    ('foo.*|barz?') or a LEADING alternation group ('(foo|bar)rest')
    yields one prefix per branch; [] means no pruning possible.  The
    reference derives the same bounds from the compiled automaton
    (search_regexp.go:38-66); this is the conservative syntactic cut."""
    branches = _split_top_level_alternation(pattern)
    if len(branches) > 1:
        prefixes = [_regex_literal_prefix(b) for b in branches]
        return prefixes if all(prefixes) else []
    # leading non-capturing/capturing group of literal alternatives
    m = None
    if pattern.startswith("(?:"):
        body_start = 3
    elif pattern.startswith("(") and not pattern.startswith("(?"):
        body_start = 1
    else:
        body_start = None
    if body_start is not None:
        depth, i = 1, body_start
        while i < len(pattern) and depth:
            if pattern[i] == "\\":
                i += 2
                continue
            if pattern[i] == "(":
                depth += 1
            elif pattern[i] == ")":
                depth -= 1
            i += 1
        if depth == 0 and not (i < len(pattern) and pattern[i] in "*+?{"):
            inner = pattern[body_start : i - 1]
            alts = _split_top_level_alternation(inner)
            prefixes = [_regex_literal_prefix(a) for a in alts]
            if all(prefixes):
                return prefixes
    p = _regex_literal_prefix(pattern)
    return [p] if p else []


def _regex_literal_prefix(pattern: str) -> str:
    """Longest leading run of literal characters in a regex (conservative:
    stops at any metacharacter; a literal followed by a quantifier is
    excluded).  Single-character classes ``[c]`` / ``[c-c]`` simplify to
    the literal c like the reference's parsed-syntax walk
    (index/scorch/regexp.go literalPrefix vectors ``[h][e][l][l][o]``)."""
    out = []
    i = 0
    n = len(pattern)
    while i < n:
        c = pattern[i]
        if c == "[":
            # [c] or [c-c] with a literal c collapses to c
            lit, end = None, None
            if (
                i + 2 < n
                and pattern[i + 2] == "]"
                and pattern[i + 1] not in _REGEX_SPECIAL
            ):
                lit, end = pattern[i + 1], i + 3
            elif (
                i + 4 < n
                and pattern[i + 4] == "]"
                and pattern[i + 2] == "-"
                and pattern[i + 1] == pattern[i + 3]
                and pattern[i + 1] not in _REGEX_SPECIAL
            ):
                lit, end = pattern[i + 1], i + 5
            if lit is None:
                break
            if end < n and pattern[end] in "*+?{":
                break  # quantifier applies to the class
            out.append(lit)
            i = end
            continue
        if c in _REGEX_SPECIAL:
            break
        if i + 1 < n and pattern[i + 1] in "*+?{":
            break  # quantifier applies to this char
        out.append(c)
        i += 1
    return "".join(out)


@dataclass
class RegexpQuery(Query):
    """search_regexp.go: dictionary scan by regex (anchored, like Bleve)."""

    regexp: str
    field: str = ""
    boost: float = 1.0

    def searcher(self, reader, mapping, options):
        import re

        field = self.field or mapping.default_field
        pat = re.compile(self.regexp)
        # literal-prefix pruning (the reference computes the same bound
        # from the regexp automaton, search_regexp.go:38-66
        # LiteralPrefix): only the dictionary slice sharing the prefix is
        # scanned, via row-group-pruned range reads
        prefixes = _regex_literal_prefixes(self.regexp)
        if prefixes:
            seen = set()
            cand = []
            for p in sorted(set(prefixes)):
                for t in reader.terms_with_prefix(field, p):
                    if t not in seen:
                        seen.add(t)
                        cand.append(t)
        else:
            cand = reader.terms_in_range(field, None, None)
        terms = sorted(t for t in cand if pat.fullmatch(t))
        base = (
            MultiTermSearcher(reader, terms, field, self.boost, options)
            if terms
            else None
        )
        return _key_synonym_searcher(
            reader,
            mapping,
            options,
            field,
            self.boost,
            base,
            lambda th: th.keys_regexp(self.regexp),
        )


@dataclass
class WildcardQuery(Query):
    """wildcard.go: * and ? translated to an anchored regex."""

    wildcard: str
    field: str = ""
    boost: float = 1.0

    def searcher(self, reader, mapping, options):
        import re

        regex = "".join(
            ".*" if c == "*" else "." if c == "?" else re.escape(c)
            for c in self.wildcard
        )
        return RegexpQuery(regex, self.field, self.boost).searcher(
            reader, mapping, options
        )


@dataclass
class ConjunctionQuery(Query):
    conjuncts: Sequence[Query] = ()
    boost: float = 1.0

    def searcher(self, reader, mapping, options):
        children = [q.searcher(reader, mapping, options) for q in self.conjuncts]
        return ConjunctionSearcher(children)


@dataclass
class DisjunctionQuery(Query):
    disjuncts: Sequence[Query] = ()
    min: int = 0
    boost: float = 1.0
    # RetrieveScoreBreakdown (disjunction.go): per-hit clause-index ->
    # score map on the DocumentMatch
    retrieve_score_breakdown: bool = False

    def searcher(self, reader, mapping, options):
        children = [q.searcher(reader, mapping, options) for q in self.disjuncts]
        s = DisjunctionSearcher(children, min_match=self.min)
        if self.retrieve_score_breakdown:
            s.retrieve_score_breakdown = True
        return s


@dataclass
class BooleanQuery(Query):
    """boolean.go: must -> conjunction, should -> disjunction(minShould,
    default 0 -- boolean.go:71-74), must_not -> disjunction, filter ->
    score-neutral membership restriction (boolean.go:173-263: the filter
    child runs with Score=none and wraps the result in a
    FilteringSearcher, so scores equal the same query without the
    filter)."""

    must: Optional[Query] = None
    should: Optional[Query] = None
    must_not: Optional[Query] = None
    filter: Optional[Query] = None
    boost: float = 1.0

    def searcher(self, reader, mapping, options):
        m = self.must.searcher(reader, mapping, options) if self.must else None
        s = self.should.searcher(reader, mapping, options) if self.should else None
        mn = (
            self.must_not.searcher(reader, mapping, options)
            if self.must_not
            else None
        )
        predicate = None
        if self.filter is not None:
            from dataclasses import replace as _dc_replace

            fopts = _dc_replace(options, score="none")
            fsearcher = self.filter.searcher(reader, mapping, fopts)
            member = fsearcher.search().docnums

            def predicate(docnums):
                import numpy as _np

                return _np.isin(docnums, member)

        if m is None and s is None and mn is None:
            if predicate is None:
                return MatchNoneSearcher()
            from .searcher import MatchAllSearcher

            return FilteringSearcher(
                MatchAllSearcher(reader, 1.0), predicate
            )
        if m is None and s is None and mn is not None:
            # only mustNot: start from MatchAll (boolean.go:249-255)
            from .searcher import MatchAllSearcher

            m = MatchAllSearcher(reader, 1.0)
        bs = BooleanSearcher(m, s, mn)
        if predicate is not None:
            return FilteringSearcher(bs, predicate)
        return bs


@dataclass
class DocIDQuery(Query):
    """query.go docids dispatch -> DocIDSearcher."""

    ids: Sequence[str] = ()
    boost: float = 1.0

    def searcher(self, reader, mapping, options):
        from .searcher import DocIDSearcher

        return DocIDSearcher(reader, list(self.ids), self.boost)


@dataclass
class MatchAllQuery(Query):
    boost: float = 1.0

    def searcher(self, reader, mapping, options):
        # score=none zeroes even the constant scorer
        # (TestMatchAllScorer: every hit scores 0.0 under Score="none")
        s = MatchAllSearcher(reader, self.boost)
        if options.score == "none":
            s.scorer.constant = 0.0
        return s


@dataclass
class MatchNoneQuery(Query):
    boost: float = 1.0

    def searcher(self, reader, mapping, options):
        return MatchNoneSearcher()


# registered JSON parsers for app-defined wrapper queries
# (query.go CustomScoreQueryParser / CustomFilterQueryParser hooks)
CUSTOM_SCORE_QUERY_PARSER = None
CUSTOM_FILTER_QUERY_PARSER = None


def register_custom_query_parsers(score=None, filter=None) -> None:
    """Register app callbacks mapping {"custom_score"/"custom_filter": ...}
    JSON onto CustomScoreQuery/CustomFilterQuery instances."""
    global CUSTOM_SCORE_QUERY_PARSER, CUSTOM_FILTER_QUERY_PARSER
    if score is not None:
        CUSTOM_SCORE_QUERY_PARSER = score
    if filter is not None:
        CUSTOM_FILTER_QUERY_PARSER = filter


def validate_query(q: Query) -> None:
    """ValidatableQuery walk (the per-type Validate methods,
    query/{boolean,disjunction,conjunction,numeric_range,term_range,
    phrase,multi_phrase}.go), recursing into compound clauses.

    Like the reference, this is an EXPLICIT surface
    (SearchRequest.Validate, search.go:324) -- Index.Search does NOT
    call it, so e.g. a disjunction with min > len(disjuncts) searches
    to zero hits rather than erroring (TestBooleanMust... semantics),
    while API layers that opt into validation reject it up front."""
    if isinstance(q, BooleanQuery):
        if (
            q.must is None
            and q.should is None
            and q.must_not is None
            and q.filter is None
        ):
            raise ValueError(
                "boolean query must contain at least one must or should "
                "or not must or filter clause"
            )
        for c in (q.must, q.should, q.must_not, q.filter):
            if c is not None:
                validate_query(c)
    elif isinstance(q, DisjunctionQuery):
        if int(q.min) > len(q.disjuncts):
            raise ValueError(
                "disjunction query has fewer than the minimum number "
                "of clauses to satisfy"
            )
        for c in q.disjuncts:
            validate_query(c)
    elif isinstance(q, ConjunctionQuery):
        for c in q.conjuncts:
            validate_query(c)
    elif isinstance(q, NumericRangeQuery):
        if q.min is None and q.max is None:
            raise ValueError("numeric range query must specify min or max")
    elif isinstance(q, DateRangeQuery):
        # date_range.go:174-192 Validate: at least one endpoint, and
        # RFC3339-parsed endpoints must fall inside the
        # [MinRFC3339CompatibleTime, MaxRFC3339CompatibleTime] window
        # (1677-12-01T00:00:00Z .. 2262-04-11T11:59:59Z)
        if not q.start and not q.end:
            raise ValueError("must specify start or end")
        min_ns = _parse_dt_nanos("1677-12-01T00:00:00Z")
        max_ns = _parse_dt_nanos("2262-04-11T11:59:59Z")
        for which, val in (("start", q.start), ("end", q.end)):
            if not val:
                continue
            ns = q._bound_nanos(val, which)
            if not q.date_time_parser and not (min_ns <= ns <= max_ns):
                raise ValueError(
                    f"invalid/unsupported date range, {which}: {val}"
                )
    elif isinstance(q, TermRangeQuery):
        if not q.min and not q.max:
            raise ValueError("term range query must specify min or max")
    elif isinstance(q, MultiPhraseQuery):
        if len(q.terms) < 1:
            raise ValueError(
                "phrase query must contain at least one term"
            )


def parse_query(d: Dict) -> Query:
    """JSON-dict -> Query (dispatch mirrors query.go:146-382)."""
    boost = d.get("boost", 1.0)
    if "match" in d:
        return MatchQuery(
            d["match"],
            field=d.get("field", ""),
            operator=d.get("operator", "or"),
            analyzer=d.get("analyzer", ""),
            boost=boost,
            fuzziness=d.get("fuzziness", 0),
            prefix_length=d.get("prefix_length", 0),
        )
    if "match_phrase" in d:
        return MatchPhraseQuery(
            d["match_phrase"],
            field=d.get("field", ""),
            analyzer=d.get("analyzer", ""),
            boost=boost,
            fuzziness=d.get("fuzziness", 0),
            slop=d.get("slop", 0),
        )
    if "fuzziness" in d and "term" in d:
        return FuzzyQuery(
            d["term"],
            field=d.get("field", ""),
            fuzziness=d.get("fuzziness", 1),
            prefix_length=d.get("prefix_length", 0),
            boost=boost,
        )
    if "term" in d:
        return TermQuery(d["term"], field=d.get("field", ""), boost=boost)
    if "prefix" in d:
        return PrefixQuery(d["prefix"], field=d.get("field", ""), boost=boost)
    if "regexp" in d:
        return RegexpQuery(d["regexp"], field=d.get("field", ""), boost=boost)
    if "wildcard" in d:
        return WildcardQuery(d["wildcard"], field=d.get("field", ""), boost=boost)
    if "terms" in d:
        terms = d["terms"]
        if terms and isinstance(terms[0], str):
            terms = [[t] for t in terms]
        return MultiPhraseQuery(
            terms,
            field=d.get("field", ""),
            boost=boost,
            fuzziness=d.get("fuzziness", 0),
            slop=d.get("slop", 0),
        )
    if "conjuncts" in d:
        return ConjunctionQuery(
            [parse_query(c) for c in d["conjuncts"]], boost=boost
        )
    if "disjuncts" in d:
        return DisjunctionQuery(
            [parse_query(c) for c in d["disjuncts"]],
            retrieve_score_breakdown=bool(
                d.get("retrieve_score_breakdown")
            ),
            min=d.get("min", 0),
            boost=boost,
        )
    if (
        "must" in d
        or "should" in d
        or "must_not" in d
        or "filter" in d
    ):
        def _sub(key, min_default):
            v = d.get(key)
            if v is None:
                return None
            if isinstance(v, dict) and ("conjuncts" in v or "disjuncts" in v):
                return parse_query(v)
            if isinstance(v, list):
                if key in ("must", "filter"):
                    return ConjunctionQuery([parse_query(c) for c in v])
                return DisjunctionQuery(
                    [parse_query(c) for c in v], min=min_default
                )
            return parse_query(v)

        return BooleanQuery(
            must=_sub("must", 0),
            should=_sub("should", d.get("min_should", 0)),
            must_not=_sub("must_not", 0),
            filter=_sub("filter", 0),
            boost=boost,
        )
    if "top_left" in d and "bottom_right" in d:
        # geo bounding box (query.go:255-270 dispatch)
        def _pt(p):
            if isinstance(p, str):
                from ..index.geo import decode_geohash

                lat, lon = decode_geohash(p)
                return lon, lat
            if isinstance(p, dict):
                return float(p["lon"]), float(p["lat"])
            return float(p[0]), float(p[1])

        tl, br = _pt(d["top_left"]), _pt(d["bottom_right"])
        return GeoBoundingBoxQuery(
            tl[0], tl[1], br[0], br[1], field=d.get("field", ""), boost=boost
        )
    if "polygon_points" in d:
        return GeoPolygonQuery(
            d["polygon_points"], field=d.get("field", ""), boost=boost
        )
    if "geometry" in d:
        geom = d["geometry"]
        return GeoShapeQuery(
            shape=geom["shape"],
            relation=geom.get("relation", "intersects"),
            field=d.get("field", ""),
            boost=boost,
        )
    if "location" in d and "distance" in d:
        loc = d["location"]
        if isinstance(loc, str):
            from ..index.geo import decode_geohash

            lat, lon = decode_geohash(loc)
        elif isinstance(loc, dict):
            lon, lat = float(loc["lon"]), float(loc["lat"])
        else:
            lon, lat = float(loc[0]), float(loc[1])
        return GeoDistanceQuery(
            lon, lat, d["distance"], field=d.get("field", ""), boost=boost
        )
    if "min" in d or "max" in d:
        lo, hi = d.get("min"), d.get("max")
        if isinstance(lo, (int, float)) or isinstance(hi, (int, float)):
            # numeric range (query.go:219-232 dispatch on number type)
            return NumericRangeQuery(
                lo,
                hi,
                field=d.get("field", ""),
                inclusive_min=d.get("inclusive_min", True),
                inclusive_max=d.get("inclusive_max", False),
                boost=boost,
            )
        return TermRangeQuery(
            lo,
            hi,
            field=d.get("field", ""),
            inclusive_min=d.get("inclusive_min", True),
            inclusive_max=d.get("inclusive_max", False),
            boost=boost,
        )
    if "start" in d or "end" in d:
        return DateRangeQuery(
            d.get("start"),
            d.get("end"),
            field=d.get("field", ""),
            inclusive_start=d.get("inclusive_start", True),
            inclusive_end=d.get("inclusive_end", False),
            boost=boost,
            date_time_parser=d.get("datetime_parser", "")
            or d.get("date_time_parser", ""),
        )
    if "ids" in d:
        return DocIDQuery(d["ids"], boost=boost)
    if "bool" in d and isinstance(d["bool"], bool):
        return BoolFieldQuery(d["bool"], field=d.get("field", ""), boost=boost)
    if "cidr" in d:
        return IPRangeQuery(d["cidr"], field=d.get("field", ""), boost=boost)
    if "custom_filter" in d:
        # pluggable parser hook (query.go:311-317): apps register how
        # their custom-filter JSON maps onto a CustomFilterQuery.
        # Without one, the reference's default UnmarshalJSON applies
        # (custom_query_test.go): the payload must be a JSON object and
        # its "query" sub-object parses as the inner query; the filter
        # callback is attached later by the app (None = keep all).
        if CUSTOM_FILTER_QUERY_PARSER is not None:
            return CUSTOM_FILTER_QUERY_PARSER(d)
        body = d["custom_filter"]
        if not isinstance(body, dict):
            raise ValueError("custom_filter query must be a JSON object")
        return CustomFilterQuery(
            parse_query(body.get("query", {"match_none": {}})),
            fields=body.get("fields", ()),
            boost=boost,
        )
    if "custom_score" in d:
        if CUSTOM_SCORE_QUERY_PARSER is not None:
            return CUSTOM_SCORE_QUERY_PARSER(d)
        body = d["custom_score"]
        if not isinstance(body, dict):
            raise ValueError("custom_score query must be a JSON object")
        return CustomScoreQuery(
            parse_query(body.get("query", {"match_none": {}})),
            fields=body.get("fields", ()),
            boost=boost,
        )
    if "match_all" in d:
        return MatchAllQuery(boost=boost)
    if "match_none" in d:
        return MatchNoneQuery(boost=boost)
    if "query" in d and isinstance(d["query"], str):
        # query-string query (query.go:292-296 -> query_string.y grammar)
        from .query_string import parse_query_string

        return parse_query_string(d["query"])
    raise ValueError(f"unrecognized query: {d!r}")


class FilteringSearcher(Searcher):
    """NewFilteringSearcher (search_filter.go): wraps a searcher and keeps
    only hits passing a docnum-level predicate."""

    def __init__(self, inner: Searcher, predicate):
        import inspect

        self.inner = inner
        self.predicate = predicate
        try:
            self._scored = (
                len(inspect.signature(predicate).parameters) >= 2
            )
        except (TypeError, ValueError):
            self._scored = False

    def weight(self) -> float:
        return self.inner.weight()

    def set_query_norm(self, qnorm: float) -> None:
        self.inner.set_query_norm(qnorm)

    def search(self):
        hits = self.inner.search()
        if len(hits.docnums) == 0:
            return hits
        keep = (
            self.predicate(hits.docnums, hits.scores)
            if self._scored else self.predicate(hits.docnums)
        )
        from .searcher import SearchHits

        return SearchHits(hits.docnums[keep], hits.scores[keep])

    def explain(self, docnum: int, doc_id: str = ""):
        return self.inner.explain(docnum, doc_id)

    def locations(self, docnum: int):
        return self.inner.locations(docnum)


def _geo_values(reader, field, docnums):
    """lon/lat arrays for docnums from the geo field's docvalues (struct
    or [lon, lat] list values)."""
    import numpy as np

    from ..index.geo import extract_geo_point

    vals = reader.docvalues_for(docnums, [field])[field]
    lon = np.full(len(vals), np.nan)
    lat = np.full(len(vals), np.nan)
    for i, v in enumerate(vals):
        lo, la, ok = extract_geo_point(v)
        if ok:
            lon[i], lat[i] = lo, la
    return lon, lat


_GEO_MIN_LON, _GEO_MAX_LON = -180.0, 180.0


def _geo_multi_rect_searcher(reader, field, rects, boost, options):
    """Candidate searcher covering a union of rects (dateline splits):
    one morton-cover searcher per rect, unioned with min_match=0
    disjunction — mirrors geo_boundingbox.go's two-box NewDisjunction."""
    inners = [
        _geo_candidate_searcher(reader, field, r, boost, options)
        for r in rects
    ]
    inners = [s for s in inners if not isinstance(s, MatchNoneSearcher)]
    if not inners:
        return MatchNoneSearcher()
    if len(inners) == 1:
        return inners[0]
    return DisjunctionSearcher(inners, min_match=0, options=options)


def _geo_candidate_searcher(reader, field, rect, boost, options):
    """Morton-interval candidates -> trie terms -> MultiTermSearcher
    (the ComputeGeoRange role, search_geoboundingbox.go:70-126)."""
    from ..index.geo import GEO_PRECISION_STEP, morton_ranges_for_rect
    from ..index.numeric import split_int64_range

    terms: List[str] = []
    for lo, hi in morton_ranges_for_rect(*rect):
        for start_t, end_t in split_int64_range(
            lo, hi, precision_step=GEO_PRECISION_STEP
        ):
            terms.extend(
                reader.terms_in_range(field, start_t, end_t, inclusive_hi=True)
            )
    terms = sorted(set(terms))
    if not terms:
        return MatchNoneSearcher()
    return MultiTermSearcher(reader, terms, field, boost, options)


@dataclass
class GeoBoundingBoxQuery(Query):
    """search_geoboundingbox.go: morton-range candidates + exact rect
    filter over the geo docvalues."""

    top_left_lon: float
    top_left_lat: float
    bottom_right_lon: float
    bottom_right_lat: float
    field: str = ""
    boost: float = 1.0

    def searcher(self, reader, mapping, options):
        field = self.field or mapping.default_field
        min_lon, max_lon = self.top_left_lon, self.bottom_right_lon
        min_lat, max_lat = self.bottom_right_lat, self.top_left_lat
        if max_lon < min_lon:
            # dateline-crossing box: the reference rewrites it as two
            # boxes joined by a disjunction (geo_boundingbox.go:68-82)
            inner = _geo_multi_rect_searcher(
                reader,
                field,
                [
                    (_GEO_MIN_LON, min_lat, max_lon, max_lat),
                    (min_lon, min_lat, _GEO_MAX_LON, max_lat),
                ],
                self.boost,
                options,
            )

            def rect_ok(docnums):
                lon, lat = _geo_values(reader, field, docnums)
                return (
                    ((lon >= min_lon) | (lon <= max_lon))
                    & (lat >= min_lat) & (lat <= max_lat)
                )

        else:
            inner = _geo_candidate_searcher(
                reader, field, (min_lon, min_lat, max_lon, max_lat),
                self.boost, options,
            )

            def rect_ok(docnums):
                lon, lat = _geo_values(reader, field, docnums)
                return (
                    (lon >= min_lon) & (lon <= max_lon)
                    & (lat >= min_lat) & (lat <= max_lat)
                )

        return FilteringSearcher(inner, rect_ok)


@dataclass
class GeoDistanceQuery(Query):
    """search_geopointdistance.go: circle bounding-rect candidates +
    exact reference-haversine filter."""

    lon: float
    lat: float
    distance: str = "100km"
    field: str = ""
    boost: float = 1.0

    def searcher(self, reader, mapping, options):
        from ..index.geo import (
            haversin_km,
            parse_distance_km,
            rects_from_point_distance,
        )

        field = self.field or mapping.default_field
        dist_km = parse_distance_km(self.distance)
        # circles near ±180 wrap: cover with one rect per side of the
        # antimeridian (the exact haversine filter below is wrap-safe)
        rects = rects_from_point_distance(self.lon, self.lat, dist_km)
        inner = _geo_multi_rect_searcher(
            reader, field, rects, self.boost, options
        )

        def dist_ok(docnums):
            lon, lat = _geo_values(reader, field, docnums)
            return haversin_km(self.lon, self.lat, lon, lat) <= dist_km

        return FilteringSearcher(inner, dist_ok)


@dataclass
class BoolFieldQuery(Query):
    """bool_field.go: term search on 'T'/'F'."""

    bool_val: bool
    field: str = ""
    boost: float = 1.0

    def searcher(self, reader, mapping, options):
        field = self.field or mapping.default_field
        return TermSearcher(
            reader, "T" if self.bool_val else "F", field, self.boost, options
        )


@dataclass
class IPRangeQuery(Query):
    """ip_range.go: a bare IP is a term search on its 16-byte form; a
    CIDR expands the dictionary range [network, broadcast] like
    NewIPRangeSearcher (search_ip_range.go:43-67)."""

    cidr: str
    field: str = ""
    boost: float = 1.0

    def searcher(self, reader, mapping, options):
        import ipaddress

        from ..index.build import ip_term

        field = self.field or mapping.default_field
        try:
            net = ipaddress.ip_network(self.cidr, strict=False)
        except ValueError:
            return MatchNoneSearcher()
        if net.num_addresses == 1:
            return TermSearcher(
                reader, ip_term(str(net.network_address)), field, self.boost,
                options,
            )
        lo = ip_term(str(net.network_address))
        hi = ip_term(str(net.broadcast_address))
        terms = reader.terms_in_range(field, lo, hi, inclusive_hi=True)
        if not terms:
            return MatchNoneSearcher()
        return MultiTermSearcher(reader, terms, field, self.boost, options)


def _expand_udf_fields(reader, fields) -> List[str]:
    """Field list for a custom score/filter callback; "*" expands to
    every retrievable (stored + docvalue) field, like SearchRequest
    fields (search.go:53).  These fields feed ONLY the callback — they
    never leak into the response's hit.fields
    (TestCustom*QueryFieldsDoNotLeakIntoResponse)."""
    fields = list(fields or ())
    if "*" not in fields:
        return fields
    opts = reader.options
    return sorted(
        set(opts.get("store_fields", []))
        | set(opts.get("docvalue_fields", []))
    )


@dataclass
class CustomScoreQuery(Query):
    """custom_score.go: wrap a child query and re-score each hit via an
    embedder callback ``score_func(doc_id, score, fields) -> float``;
    ``fields`` holds the requested docvalues for the hit ("*" = all
    retrievable fields)."""

    query: "Query"
    score_func: object = None
    fields: Sequence[str] = ()
    boost: float = 1.0

    def searcher(self, reader, mapping, options):
        import numpy as np

        inner = self.query.searcher(reader, mapping, options)
        outer = self
        want = _expand_udf_fields(reader, self.fields)

        class _Rescoring(Searcher):
            def weight(self):
                return inner.weight()

            def set_query_norm(self, qnorm):
                inner.set_query_norm(qnorm)

            def count(self):
                return inner.count()

            def locations(self, docnum):
                return inner.locations(docnum)

            def explain(self, docnum, doc_id=""):
                # reference custom_score.go: the wrap explanation carries
                # the custom value with NO children (inner score dropped)
                from .scorer import Explanation

                base = inner.explain(docnum, doc_id)
                score = float(base["value"]) if base else 0.0
                if outer.score_func is not None:
                    f = self._doc_fields(np.array([docnum]))[0]
                    score = outer.score_func(doc_id, score, f)
                return Explanation(
                    score * outer.boost, "custom_score function result"
                )

            def _doc_fields(self, docnums):
                dv = (
                    reader.docvalues_for(docnums, want) if want else {}
                )
                return [
                    {k: dv[k][i] for k in dv if dv[k][i] is not None}
                    for i in range(len(docnums))
                ]

            def search(self):
                from .searcher import SearchHits

                hits = inner.search()
                if len(hits.docnums) == 0 or outer.score_func is None:
                    return hits
                fvals = self._doc_fields(hits.docnums)
                ids = reader.doc_ids_for(hits.docnums)
                new = np.empty(len(hits.docnums), dtype=np.float64)
                for i in range(len(hits.docnums)):
                    new[i] = outer.score_func(
                        ids[i], float(hits.scores[i]), fvals[i]
                    )
                return SearchHits(hits.docnums, new * outer.boost)

        return _Rescoring()


@dataclass
class CustomFilterQuery(Query):
    """custom_filter.go: wrap a child query, keep hits for which
    ``filter_func(doc_id, score, fields) -> bool`` is true."""

    query: "Query"
    filter_func: object = None
    fields: Sequence[str] = ()
    boost: float = 1.0

    def searcher(self, reader, mapping, options):
        import numpy as np

        inner = self.query.searcher(reader, mapping, options)
        if self.filter_func is None:
            # default-unmarshaled wrapper (custom_query_test.go): no app
            # callback attached yet — behaves as the inner query
            return inner
        outer = self
        want = _expand_udf_fields(reader, self.fields)

        def predicate(docnums, scores=None):
            dv = reader.docvalues_for(docnums, want) if want else {}
            ids = reader.doc_ids_for(docnums)
            keep = np.zeros(len(docnums), dtype=bool)
            for i in range(len(docnums)):
                f = {k: dv[k][i] for k in dv if dv[k][i] is not None}
                sc = float(scores[i]) if scores is not None else 0.0
                keep[i] = bool(outer.filter_func(ids[i], sc, f))
            return keep

        return FilteringSearcher(inner, predicate)


@dataclass
class GeoPolygonQuery(Query):
    """search_geopolygon.go: polygon bounding-box candidates + pnpoly
    ray-cast filter (vertex-tolerant) over the geo docvalues.  ``holes``
    (GeoJSON inner rings) exclude contained points — even-odd rule."""

    points: Sequence = ()  # [(lon, lat), ...] or [{"lon":..,"lat":..}]
    field: str = ""
    boost: float = 1.0
    holes: Sequence = ()  # list of rings, each [(lon, lat), ...]

    def searcher(self, reader, mapping, options):
        import numpy as np

        from ..index.geo import point_in_polygon

        field = self.field or mapping.default_field

        def _ring(pts):
            # accepts {"lat","lon"} dicts, [lon, lat] pairs, "lat,lon"
            # strings and geohashes (geo.go extractGeoPoint forms used by
            # test/tests/geo polygon searches 7-9)
            from ..index.geo import extract_geo_point

            out = []
            for p in pts:
                lon, lat, ok = extract_geo_point(p)
                if not ok:
                    raise ValueError(f"invalid polygon point: {p!r}")
                out.append((lon, lat))
            return out

        coords = _ring(self.points)
        hole_rings = [_ring(h) for h in self.holes if len(h) >= 3]
        if len(coords) < 3:
            return MatchNoneSearcher()
        lons = [c[0] for c in coords]
        lats = [c[1] for c in coords]
        rect = (min(lons), min(lats), max(lons), max(lats))
        inner = _geo_candidate_searcher(
            reader, field, rect, self.boost, options
        )

        def poly_ok(docnums):
            from ..index.geo import morton_hash, morton_unhash

            lon, lat = _geo_values(reader, field, docnums)
            # the reference filter tests the morton-UNHASHED indexed term
            # (search_geopolygon.go:96-104 MortonUnhashLon/Lat), so points
            # lying exactly on a polygon edge resolve by the codec's
            # quantization, not the stored float (TestSimpleGeoPolygons
            # doc "s" on the lon=2 edge)
            lon, lat = morton_unhash(morton_hash(lon, lat))
            keep = np.zeros(len(docnums), dtype=bool)
            for i in range(len(docnums)):
                ok = point_in_polygon(lon[i], lat[i], coords)
                if ok:
                    for h in hole_rings:
                        if point_in_polygon(lon[i], lat[i], h):
                            ok = False
                            break
                keep[i] = ok
            return keep

        return FilteringSearcher(inner, poly_ok)


@dataclass
class GeoShapeQuery(Query):
    """search/query/geo_shape.go request surface, adapted to geoPOINT
    fields (the reference's geoshape FIELD type with s2 cell tokens is out
    of scope — SURVEY §2.14): the query shape is GeoJSON; a point doc
    matches when it lies inside/on the shape.  For point docs the
    relations ``intersects`` and ``within`` coincide; ``contains`` only
    matches point/multipoint shapes equal to the doc point.

    Shapes: point, multipoint, linestring (exact on-segment),
    multilinestring, polygon (with holes), multipolygon, envelope,
    circle, geometrycollection."""

    shape: dict = None  # {"type":..., "coordinates":...[, "radius":...]}
    relation: str = "intersects"
    field: str = ""
    boost: float = 1.0

    def _point_query(self, lon: float, lat: float) -> Query:
        return GeoBoundingBoxQuery(
            lon, lat, lon, lat, field=self.field, boost=self.boost
        )

    def _to_query(self, shape: dict) -> Query:
        typ = shape.get("type", "").lower()
        co = shape.get("coordinates")
        rel = self.relation.lower()
        if rel == "contains":
            # a point doc contains only a coincident point shape
            if typ == "point":
                return self._point_query(float(co[0]), float(co[1]))
            if typ == "multipoint":
                pts = {(float(p[0]), float(p[1])) for p in co}
                if len(pts) == 1:
                    (lon, lat), = pts
                    return self._point_query(lon, lat)
            return MatchNoneQuery()
        if typ == "point":
            return self._point_query(float(co[0]), float(co[1]))
        if typ == "multipoint":
            return DisjunctionQuery(
                [self._point_query(float(p[0]), float(p[1])) for p in co],
                min=1,
            )
        if typ == "envelope":
            # bleve envelope coords: [[topLeft lon,lat],[bottomRight lon,lat]]
            (x1, y1), (x2, y2) = (
                (float(co[0][0]), float(co[0][1])),
                (float(co[1][0]), float(co[1][1])),
            )
            return GeoBoundingBoxQuery(
                min(x1, x2), max(y1, y2), max(x1, x2), min(y1, y2),
                field=self.field, boost=self.boost,
            )
        if typ == "circle":
            lon, lat = float(co[0]), float(co[1])
            return GeoDistanceQuery(
                lon, lat, shape.get("radius", "100m"),
                field=self.field, boost=self.boost,
            )
        if typ == "polygon":
            return GeoPolygonQuery(
                co[0], field=self.field, boost=self.boost, holes=co[1:]
            )
        if typ == "multipolygon":
            return DisjunctionQuery(
                [
                    GeoPolygonQuery(
                        poly[0], field=self.field, boost=self.boost,
                        holes=poly[1:],
                    )
                    for poly in co
                ],
                min=1,
            )
        if typ in ("linestring", "multilinestring"):
            lines = [co] if typ == "linestring" else co
            return _GeoLineStringQuery(
                lines, field=self.field, boost=self.boost
            )
        if typ == "geometrycollection":
            return DisjunctionQuery(
                [self._to_query(s) for s in shape.get("geometries", [])],
                min=1,
            )
        raise ValueError(f"unsupported geo shape type {typ!r}")

    def searcher(self, reader, mapping, options):
        field = self.field or mapping.default_field
        all_fields = reader.options.get("fields") or {}
        fcfg = all_fields.get(field) or {}
        if fcfg.get("field_type") == "geoshape":
            return self._shape_field_searcher(reader, field, options)
        if not self.field:
            # no explicit field: the reference routes through the default
            # "_all" composite, whose shape cell tokens come only from
            # geoshape-typed fields (test/tests/geoshapes searches carry
            # no field) — search those fields directly
            gs = [f for f, c in all_fields.items()
                  if c.get("field_type") == "geoshape"]
            if len(gs) == 1:
                return self._shape_field_searcher(reader, gs[0], options)
            if gs:
                from .searcher import DisjunctionSearcher

                return DisjunctionSearcher(
                    [self._shape_field_searcher(reader, f, options)
                     for f in gs],
                    min_match=1,
                )
        q = dataclasses.replace(self, field=field)._to_query(self.shape)
        return q.searcher(reader, mapping, options)

    def _shape_field_searcher(self, reader, field: str, options):
        """geoshape FIELD path (search_geoshape.go NewGeoShapeSearcher):
        query cover cells -> candidate tokens (each cover cell's
        descendants are a dictionary prefix range; its ancestors are the
        token's proper prefixes) -> MultiTermSearcher -> exact relation
        filter on the docvalue GeoJSON (buildRelationFilterOnShapes
        role, planar predicates in index/geo_shapes.py)."""
        import numpy as np

        from ..index.geo_shapes import (
            SHAPE_TOKEN_PREFIX,
            cover_cells,
            parse_geojson,
            shape_relation,
        )

        qprims = parse_geojson(self.shape)
        if not qprims:
            return MatchNoneSearcher()
        paths = cover_cells(qprims, max_level=12, max_cells=32)
        tokens = set()
        for p in paths:
            tok = SHAPE_TOKEN_PREFIX + p
            tokens.update(reader.terms_with_prefix(field, tok))
            for k in range(len(p)):
                tokens.add(SHAPE_TOKEN_PREFIX + p[:k])
        if not tokens:
            return MatchNoneSearcher()
        inner = MultiTermSearcher(
            reader, sorted(tokens), field, self.boost, options
        )
        rel = self.relation.lower()

        def rel_ok(docnums):
            vals = reader.docvalues_for(docnums, [field])[field]
            keep = np.zeros(len(docnums), dtype=bool)
            for i, v in enumerate(vals):
                if v is None:
                    continue
                keep[i] = shape_relation(parse_geojson(v), qprims, rel)
            return keep

        return FilteringSearcher(inner, rel_ok)


@dataclass
class _GeoLineStringQuery(Query):
    """Point docs exactly on any segment of the line(s) (tolerance 1e-9
    degrees): bbox candidates + collinearity filter."""

    lines: Sequence = ()
    field: str = ""
    boost: float = 1.0

    def searcher(self, reader, mapping, options):
        import numpy as np

        field = self.field or mapping.default_field
        segs = []
        for line in self.lines:
            pts = [(float(p[0]), float(p[1])) for p in line]
            segs.extend(zip(pts, pts[1:]))
        if not segs:
            return MatchNoneSearcher()
        xs = [c for s in segs for c in (s[0][0], s[1][0])]
        ys = [c for s in segs for c in (s[0][1], s[1][1])]
        rect = (min(xs), min(ys), max(xs), max(ys))
        inner = _geo_candidate_searcher(
            reader, field, rect, self.boost, options
        )
        eps = 1e-9

        def on_seg(docnums):
            lon, lat = _geo_values(reader, field, docnums)
            keep = np.zeros(len(docnums), dtype=bool)
            for i in range(len(docnums)):
                px, py = lon[i], lat[i]
                for (ax, ay), (bx, by) in segs:
                    if (
                        min(ax, bx) - eps <= px <= max(ax, bx) + eps
                        and min(ay, by) - eps <= py <= max(ay, by) + eps
                        and abs(
                            (bx - ax) * (py - ay) - (by - ay) * (px - ax)
                        ) <= eps
                    ):
                        keep[i] = True
                        break
            return keep

        return FilteringSearcher(inner, on_seg)
