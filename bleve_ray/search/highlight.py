"""Highlighting: fragment selection + term marking over stored field text
(reference search/highlight/{fragmenter/simple,highlighter/{simple,ansi,
html}}, invoked index_impl.go:977-1050).  Runs only over the final top-k
hits (tiny post-processing step).

Simple-fragmenter semantics: fixed-size fragments (200 chars) anchored at
match clusters; fragments scored by number of distinct matched terms; best
fragment per field returned with matches wrapped in the style's tags.
"""

from __future__ import annotations

from typing import Dict, List, Set, Tuple

FRAGMENT_SIZE = 200  # reference fragmenter/simple default

STYLES = {
    "html": ("<mark>", "</mark>"),
    "ansi": ("\x1b[43m", "\x1b[0m"),
}


def _go_html_escape(s: str) -> str:
    """Go html.EscapeString: the five entities it emits (format/html
    html.go:59-70 escapes every non-markup segment)."""
    return (s.replace("&", "&amp;").replace("'", "&#39;")
            .replace("<", "&lt;").replace(">", "&gt;")
            .replace('"', "&#34;"))


class TermLocation:
    """search/highlight/term_locations.go:24-41 TermLocation: one term
    occurrence inside a field value, with the array-position path that
    identifies which array element it sits in."""

    __slots__ = ("term", "array_positions", "pos", "start", "end")

    def __init__(self, term="", array_positions=(), pos=0, start=0, end=0):
        self.term = term
        self.array_positions = tuple(array_positions or ())
        self.pos = pos
        self.start = start
        self.end = end

    def overlaps(self, other: "TermLocation") -> bool:
        # term_locations.go:32-40 — half-open interval overlap, only
        # within the SAME array element (DeepEqual on array positions)
        if self.array_positions != other.array_positions:
            return False
        return (self.start <= other.start < self.end) or (
            other.start <= self.start < other.end
        )

    def _key(self):
        return (self.term, self.array_positions, self.pos, self.start, self.end)

    def __eq__(self, other):
        return isinstance(other, TermLocation) and self._key() == other._key()

    def __repr__(self):  # pragma: no cover
        return f"TermLocation{self._key()!r}"


def merge_overlapping(locations: List) -> None:
    """term_locations.go:74-87 MergeOverlapping, in place: merge
    locations overlapping the FIRST non-None anchor into it (the anchor
    deliberately never advances, matching the reference exactly — later
    disjoint clusters are left unmerged), setting merged slots to None."""
    anchor = None
    for i, tl in enumerate(locations):
        if anchor is None and tl is not None:
            anchor = tl
        elif anchor is not None and tl is not None:
            if anchor.overlaps(tl):
                anchor.end = tl.end
                locations[i] = None


def order_term_locations(tlm: Dict[str, List[dict]]) -> List[TermLocation]:
    """term_locations.go:89-107 OrderTermLocations: flatten a
    term→locations map into TermLocations sorted by (array positions
    [elementwise, shorter-is-less], start)."""
    rv = [
        TermLocation(
            term=term,
            array_positions=loc.get("array_positions") or (),
            pos=int(loc.get("pos", 0)),
            start=int(loc.get("start", 0)),
            end=int(loc.get("end", 0)),
        )
        for term, locs in tlm.items()
        for loc in locs
    ]
    rv.sort(key=lambda t: (t.array_positions, t.start))
    return rv


def extract_query_terms(q: dict, analyzer_for, default_field: str) -> Dict[str, Set[str]]:
    """Walk a query dict, collecting analyzed terms per field (the
    highlight-relevant subset of the searcher tree's term searchers)."""
    out: Dict[str, Set[str]] = {}

    def add(field, terms):
        out.setdefault(field or default_field, set()).update(terms)

    def walk(d: dict):
        field = d.get("field", "")
        if "term" in d:
            add(field, [d["term"]])
        elif "match" in d:
            analyzer = analyzer_for(field or default_field, d.get("analyzer"))
            add(field, analyzer.terms(d["match"]))
        elif "match_phrase" in d:
            analyzer = analyzer_for(field or default_field, d.get("analyzer"))
            add(field, analyzer.terms(d["match_phrase"]))
        elif "prefix" in d or "regexp" in d or "wildcard" in d:
            pass  # expanded terms unknown here; callers may pass extra
        for key in ("conjuncts", "disjuncts", "must", "should", "must_not"):
            v = d.get(key)
            if isinstance(v, dict):
                walk(v)
            elif isinstance(v, list):
                for c in v:
                    walk(c)

    walk(q)
    return out


def _utf8_rune_len(b0: int) -> int:
    if b0 < 0x80:
        return 1
    if b0 >> 5 == 0b110:
        return 2
    if b0 >> 4 == 0b1110:
        return 3
    if b0 >> 3 == 0b11110:
        return 4
    return -1  # continuation/invalid lead byte (RuneError)


def _utf8_last_rune_len(buf: bytes, end: int) -> int:
    """Length of the rune ENDING at byte offset ``end`` (DecodeLastRune)."""
    for back in range(1, 5):
        if end - back < 0:
            return -1
        b = buf[end - back]
        if b < 0x80 or b >= 0xC0:  # lead byte
            return back if _utf8_rune_len(b) == back else -1
    return -1


def fragment_byte_spans(orig: bytes, term_locs, fragment_size: int):
    """fragmenter/simple simple.go:39-135 Fragment(): one fragment per
    term location — anchor at the term's byte start, extend forward by
    ``fragment_size`` runes, pull back toward the beginning without
    crossing the previous term's end (maxbegin), then center by half the
    smaller head/tail slack.  ``term_locs`` is [(start_byte, end_byte)]
    in position order; no locations -> one head fragment."""
    rv = []
    maxbegin = 0
    for idx, (tstart, tend) in enumerate(term_locs):
        start = end = tstart
        used = 0
        bail = False
        while end < len(orig) and used < fragment_size:
            size = _utf8_rune_len(orig[end])
            if size < 0:
                bail = True
                break
            end += size
            used += 1
        if bail:
            continue
        while start > 0 and used < fragment_size:
            if start > len(orig):
                bail = True
                break
            size = _utf8_last_rune_len(orig, start)
            if size < 0:
                bail = True
                break
            if start - size >= maxbegin:
                start -= size
                used += 1
            else:
                break
        if bail:
            continue
        # center the covered terms without changing the score
        minend = end
        for _, iend in term_locs[idx:]:
            if iend > end:
                break
            minend = iend
        room = len(orig[minend:end].decode("utf-8", "replace"))
        room_start = (
            len(orig[maxbegin:start].decode("utf-8", "replace"))
            if start >= maxbegin else 0
        )
        room = min(room, room_start)
        offset = room // 2
        while offset > 0:
            size = _utf8_last_rune_len(orig, start)
            if size < 0:
                bail = True
                break
            start -= size
            size = _utf8_last_rune_len(orig, end)
            if size < 0:
                bail = True
                break
            end -= size
            offset -= 1
        if bail:
            continue
        rv.append((start, end))
        maxbegin = tend
    if not term_locs:
        end = used = 0
        while end < len(orig) and used < fragment_size:
            size = _utf8_rune_len(orig[end])
            if size < 0:
                break
            end += size
            used += 1
        rv.append((0, end))
    return rv


def simple_fragmenter(text: str, spans, fragment_size: int):
    """fragmenter/simple over char-offset spans: maps to byte offsets,
    runs the reference's exact Fragment() algorithm, maps back."""
    byte_of = [0]
    for c in text:
        byte_of.append(byte_of[-1] + len(c.encode("utf-8")))
    char_of = {b: i for i, b in enumerate(byte_of)}
    orig = text.encode("utf-8")
    locs = [(byte_of[s], byte_of[e]) for s, e, _ in spans]
    return [
        (char_of[bs], char_of[be])
        for bs, be in fragment_byte_spans(orig, locs, fragment_size)
    ]


def score_fragment(spans, start: int, end: int) -> float:
    """fragment_scorer_simple.go:36-50: +1 per DISTINCT query term with at
    least one location inside the fragment (extra occurrences of the same
    term do not add)."""
    seen = set()
    for a, b, term in spans:
        if a >= start and b <= end:
            seen.add(term)
    return float(len(seen))


def highlight_value(
    value,
    terms: Set[str],
    analyzer,
    style: str = "html",
    max_fragments: int = 1,
    fragment_size: int = FRAGMENT_SIZE,
) -> List[str]:
    """highlight_text over a docvalue that may be MULTI-VALUED (array /
    nested-element field: one string per element, reader.docvalues_for
    dotted-path extraction): each element highlights independently and
    the per-element fragments merge up to max_fragments — the
    reference's per-array-position fragment behavior."""
    if isinstance(value, str):
        return highlight_text(
            value, terms, analyzer, style, max_fragments, fragment_size
        )
    strs = [v for v in (value or ()) if isinstance(v, str)]
    # elements whose tokens actually match come first: highlight_text
    # falls back to a plain head fragment when nothing matches, which
    # must not consume the budget ahead of a matching sibling element
    matching = [
        v
        for v in strs
        if any(t.term in terms for t in analyzer.analyze(v))
    ]
    out: List[str] = []
    for v in matching or strs[:1]:
        if len(out) >= max_fragments:
            break
        out.extend(
            highlight_text(
                v, terms, analyzer, style,
                max_fragments - len(out), fragment_size,
            )
        )
    return out


def highlight_text(
    text: str,
    terms: Set[str],
    analyzer,
    style: str = "html",
    max_fragments: int = 1,
    fragment_size: int = FRAGMENT_SIZE,
    fragmenter=None,
) -> List[str]:
    """-> up to max_fragments highlighted fragments of ``text``;
    ``fragmenter`` is a pluggable (text, spans, fragment_size) ->
    [(start, end)] callable (custom-fragmenter hook, like the reference's
    registry-resolved fragmenters)."""
    pre, post = STYLES.get(style, STYLES["html"])
    spans: List[Tuple[int, int, str]] = []
    # char-offset token spans via the exact tokenizer chain (lower only;
    # the stop filter never removes a query term match)
    for tok in analyzer.tokenizer.tokenize(text):
        lt = tok.term.lower()
        if lt in terms:
            spans.append((tok.start, tok.end, lt))
    esc = _go_html_escape if style == "html" else (lambda x: x)
    if not spans:
        frag = esc(text[:fragment_size])
        return [frag]
    # NOTE: tokenizer spans are byte offsets; for ascii they equal char
    # offsets.  For non-ascii text recompute via encode-prefix mapping.
    if not text.isascii():
        b = text.encode("utf-8")
        spans = [
            (
                len(b[:s].decode("utf-8", "ignore")),
                len(b[:e].decode("utf-8", "ignore")),
                t,
            )
            for s, e, t in spans
        ]
    make_frags = fragmenter or simple_fragmenter
    # score candidates: distinct matched terms per fragment, ties broken
    # by earlier start (highlighter_simple.go ordering)
    frags = [
        (score_fragment(spans, start, end), start, end)
        for start, end in make_frags(text, spans, fragment_size)
    ]
    frags.sort(key=lambda f: (-f[0], f[1]))
    chosen: List[Tuple[int, int]] = []
    for _, start, end in frags:
        if len(chosen) >= max_fragments:
            break
        if any(not (end <= cs or start >= ce) for cs, ce in chosen):
            continue
        chosen.append((start, end))
    out = []
    for start, end in sorted(chosen):
        in_frag = [(a, b_) for a, b_, _ in spans if a >= start and b_ <= end]
        # union-merge overlapping/duplicate spans (reference MergeOverlapping
        # before formatting, highlighter_simple.go) so no text duplicates
        merged_frag: List[Tuple[int, int]] = []
        for a, b_ in sorted(in_frag):
            if merged_frag and a < merged_frag[-1][1]:
                merged_frag[-1] = (
                    merged_frag[-1][0],
                    max(merged_frag[-1][1], b_),
                )
            else:
                merged_frag.append((a, b_))
        parts = []
        cur = start
        for a, b_ in merged_frag:
            parts.append(esc(text[cur:a]))
            parts.append(pre + esc(text[a:b_]) + post)
            cur = b_
        parts.append(esc(text[cur:end]))
        prefix = "…" if start > 0 else ""
        suffix = "…" if end < len(text) else ""
        out.append(prefix + "".join(parts) + suffix)
    return out
