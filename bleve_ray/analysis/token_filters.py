"""Token filters: TokenStream -> TokenStream, mirroring the semantics of the
reference's analysis/token/* packages.  All are pure functions over
``list[Token]``.  Filters that the fast batch path can vectorize also expose
a term-level form used by ``freq.analyze_batch``.

Key parity notes:

- ``stop``: removes tokens found in the stop set WITHOUT renumbering
  positions (reference analysis/token/stop/stop.go:43-54) -- position gaps
  remain and phrase matching relies on them.
- ``lowercase``: per-codepoint simple lowering like Go's unicode.ToLower
  (reference analysis/token/lowercase/lowercase.go:38-47).  We special-case
  U+0130 (which Python's str.lower expands to two codepoints but Go maps to
  a single 'i').
"""

from __future__ import annotations

import re
from typing import Iterable, List, Sequence, Set

import regex as uregex

from .tokenizers import ALPHANUMERIC, Token

_DOTTED_I = "İ"


def lower_term(term: str) -> str:
    """Simple per-codepoint lowercase, matching Go unicode.ToLower."""
    if _DOTTED_I in term:
        term = term.replace(_DOTTED_I, "i")
    return term.lower()


def lowercase_filter(tokens: List[Token]) -> List[Token]:
    for t in tokens:
        t.term = lower_term(t.term)
    return tokens


def make_stop_filter(stop_words: Set[str]):
    def stop_filter(tokens: List[Token]) -> List[Token]:
        # positions are NOT renumbered (stop.go:43-54)
        return [t for t in tokens if t.term not in stop_words]

    return stop_filter


def make_length_filter(min_len: int, max_len: int):
    """reference analysis/token/length: drop tokens outside [min,max]
    runes; a bound of -1 (or any negative) disables that side
    (length_test.go TestLengthFilterNoMax/NoMin)."""

    def length_filter(tokens: List[Token]) -> List[Token]:
        return [
            t
            for t in tokens
            if (min_len < 0 or len(t.term) >= min_len)
            and (max_len < 0 or len(t.term) <= max_len)
        ]

    return length_filter


def apostrophe_filter(tokens: List[Token]) -> List[Token]:
    """Strip everything from the first apostrophe on
    (reference analysis/token/apostrophe)."""
    for t in tokens:
        for ch in ("'", "’", "＇"):
            i = t.term.find(ch)
            if i >= 0:
                t.term = t.term[:i]
                break
    return tokens


_CAMEL_RE = re.compile(
    r"[A-Z]+(?![a-z])|[A-Z][a-z0-9]*|[a-z0-9]+|[^A-Za-z0-9]+"
)


def camelcase_filter(tokens: List[Token]) -> List[Token]:
    """Split identifiers into case-class runs (reference
    analysis/token/camelcase/camelcase.go:26-70): 'camelCaseABCDef' ->
    'camel','Case','ABC','Def'.  Positions: each split token keeps the parent
    position semantics of the reference (parent replaced by parts, positions
    renumbered sequentially by the reference's filter building new tokens with
    same position? -- the reference emits parts as separate tokens each at the
    parent's position index; we renumber sequentially like its output order)."""
    out: List[Token] = []
    pos = 1
    for t in tokens:
        parts = _CAMEL_RE.findall(t.term)
        off = t.start
        for p in parts:
            blen = len(p.encode("utf-8"))
            out.append(Token(p, pos, off, off + blen, t.type))
            off += blen
            pos += 1
    return out


def unique_filter(tokens: List[Token]) -> List[Token]:
    """Keep only the first occurrence of each term (reference
    analysis/token/unique)."""
    seen = set()
    out = []
    for t in tokens:
        if t.term not in seen:
            seen.add(t.term)
            out.append(t)
    return out


def reverse_filter(tokens: List[Token]) -> List[Token]:
    for t in tokens:
        t.term = t.term[::-1]
    return tokens


def make_truncate_filter(length: int):
    def truncate_filter(tokens: List[Token]) -> List[Token]:
        for t in tokens:
            if len(t.term) > length:
                t.term = t.term[:length]
        return tokens

    return truncate_filter


def make_ngram_filter(min_n: int, max_n: int):
    """reference analysis/token/ngram: all n-grams of each token."""

    def ngram_filter(tokens: List[Token]) -> List[Token]:
        # emission order matches ngram.go: by start rune, then size
        out: List[Token] = []
        for t in tokens:
            term = t.term
            for i in range(len(term)):
                for n in range(min_n, max_n + 1):
                    if i + n <= len(term):
                        out.append(
                            Token(term[i:i + n], t.position, t.start,
                                  t.end, t.type)
                        )
        return out

    return ngram_filter


def make_edge_ngram_filter(min_n: int, max_n: int, back: bool = False):
    """reference analysis/token/edgengram."""

    def edge_ngram_filter(tokens: List[Token]) -> List[Token]:
        out: List[Token] = []
        for t in tokens:
            term = t.term
            for n in range(min_n, min(max_n, len(term)) + 1):
                gram = term[-n:] if back else term[:n]
                out.append(Token(gram, t.position, t.start, t.end, t.type))
        return out

    return edge_ngram_filter


def make_shingle_filter(min_n: int, max_n: int, sep: str = " ",
                        output_original: bool = False, filler: str = "_"):
    """Token n-grams (reference analysis/token/shingle shingle.go:45-135):
    streaming ring buffer — as each token arrives, emit every shingle of
    size min..max ENDING at it; position gaps insert filler tokens that
    shingle like ordinary tokens (the stop-word hole behavior);
    output_original interleaves the input tokens.  Shingle position /
    start / end come from the first window member that carries one
    (fillers have position 0, start/end -1)."""

    def _emit(ring: List[Token], out: List[Token]) -> None:
        for n in range(min_n, max_n + 1):
            if len(ring) < n:
                continue
            window = ring[-n:]
            pos, start, end = 0, -1, 0
            parts = []
            for w in window:
                if pos == 0 and w.position != 0:
                    pos = w.position
                if start == -1 and w.start != -1:
                    start = w.start
                if w.end != -1:
                    end = w.end
                parts.append(w.term)
            out.append(Token(sep.join(parts), pos, start, end, "Shingle"))

    def shingle_filter(tokens: List[Token]) -> List[Token]:
        out: List[Token] = []
        ring: List[Token] = []
        current_position = 0
        for token in tokens:
            if output_original:
                out.append(token)
            offset = token.position - current_position
            while offset > 1:
                ring.append(Token(filler, 0, -1, -1, ALPHANUMERIC))
                del ring[:-max_n]
                _emit(ring, out)
                offset -= 1
            current_position = token.position
            ring.append(token)
            del ring[:-max_n]
            _emit(ring, out)
        return out

    return shingle_filter


_NORM_FORMS = {"nfc", "nfd", "nfkc", "nfkd"}


def make_unicodenorm_filter(form: str):
    import unicodedata

    form_u = form.upper()
    assert form.lower() in _NORM_FORMS

    def unicodenorm_filter(tokens: List[Token]) -> List[Token]:
        for t in tokens:
            t.term = unicodedata.normalize(form_u, t.term)
        return tokens

    return unicodenorm_filter


def make_elision_filter(articles: Set[str] = frozenset(
    "l m t qu n s j d c jusqu quoiqu lorsqu puisqu".split()
)):
    """Strip elided articles before an apostrophe (reference
    analysis/token/elision, default French article set): l'avion -> avion."""

    def elision_filter(tokens: List[Token]) -> List[Token]:
        for t in tokens:
            for ch in ("'", "’"):
                i = t.term.find(ch)
                if i >= 0 and t.term[:i].lower() in articles:
                    t.term = t.term[i + 1 :]
                    break
        return tokens

    return elision_filter


def make_hierarchy_filter(separator: str = "/", max_levels: int = 10,
                          split_input: bool = True):
    """Path-hierarchy tokens (reference analysis/token/hierarchy
    hierarchy.go:28-67): ALL input tokens accumulate into ONE hierarchy —
    'a/b/c' (or pre-split 'a','b','c') -> 'a', 'a/b', 'a/b/c'; emission
    stops at max_levels; split_input=False treats each token as one whole
    level.  Output tokens are Shingle-typed at position 1 with start 0 /
    end = built byte length, like the reference."""

    def hierarchy_filter(tokens: List[Token]) -> List[Token]:
        out: List[Token] = []
        so_far: List[str] = []
        for t in tokens:
            parts = t.term.split(separator) if split_input else [t.term]
            for part in parts:
                so_far.append(part)
                term = separator.join(so_far)
                out.append(
                    Token(term, 1, 0, len(term.encode("utf-8")), "Shingle")
                )
                if len(so_far) >= max_levels:
                    return out
        return out

    return hierarchy_filter


def make_keyword_marker_filter(keywords: Set[str]):
    """Mark tokens as keywords so later stemmers skip them (reference
    analysis/token/keyword)."""

    def keyword_marker(tokens: List[Token]) -> List[Token]:
        for t in tokens:
            if t.term in keywords:
                t.type = "KeyWord"
        return tokens

    return keyword_marker


def make_compound_filter(
    dictionary: Set[str], min_subword: int = 3, max_subword: int = 15,
    only_longest: bool = False,
):
    """Dictionary decompounder (reference analysis/token/compound): emit
    dictionary subwords found inside each token, keeping the original token
    too: 'notebook' with {note, book} -> notebook, note, book."""

    def compound_filter(tokens: List[Token]) -> List[Token]:
        out: List[Token] = []
        for t in tokens:
            out.append(t)
            term = t.term.lower()
            n = len(term)
            # rune index -> byte offset within the ORIGINAL term, so each
            # subword carries its own Start/End (dict_test.go expects
            # soft@15-19 / ball@19-23 inside softball@15-23)
            boff = [0]
            for ch in t.term:
                boff.append(boff[-1] + len(ch.encode("utf-8")))
            found: List[tuple] = []
            for i in range(n):
                longest = None
                for j in range(i + min_subword, min(i + max_subword, n) + 1):
                    if term[i:j] in dictionary:
                        longest = (term[i:j], i, j)
                        if not only_longest:
                            found.append((term[i:j], i, j))
                if only_longest and longest:
                    found.append(longest)
            for sub, i, j in found:
                out.append(
                    Token(
                        sub,
                        t.position,
                        t.start + boff[i],
                        t.start + boff[min(j, len(boff) - 1)],
                        t.type,
                    )
                )
        return out

    return compound_filter


# --- CJK (analysis/lang/cjk) -------------------------------------------------

DOUBLE = "Double"

# Halfwidth Katakana U+FF65..U+FF9F -> fullwidth equivalents (the public
# Unicode halfwidth/fullwidth compatibility mapping; reference
# cjk_width.go kanaNorm role).  The last two entries are the combining
# voiced (U+3099) / semi-voiced (U+309A) sound marks.
_KANA_NORM = (
    "・ヲァィゥェォャュ"
    "ョッーアイウエオカ"
    "キクケコサシスセソ"
    "タチツテトナニヌネ"
    "ノハヒフヘホマミム"
    "メモヤユヨラリルレ"
    "ロワン゙゚"
)

# Voiced/semi-voiced combination deltas indexed by (kana - U+30A6): adding
# the dakuten U+FF9E (voiced) or handakuten U+FF9F (semi-voiced) to the
# preceding fullwidth kana composes it (ウ+゛-> ヴ is +78; カ+゛-> ガ is
# +1; ハ+゜-> パ is +2).  Same public composition data as cjk_width.go.
_KANA_VOICED = [
    78, 0, 0, 0, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1,
    0, 1, 0, 1, 0, 0, 1, 0, 1, 0, 1, 0, 0, 0, 0, 0, 0, 1, 0, 0, 1, 0, 0, 1,
    0, 0, 1, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 8, 8, 8, 8, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1,
]
_KANA_SEMI_VOICED = [0] * 88
for _i in (41, 44, 47, 50, 53):  # ハヒフヘホ + handakuten -> パピプペポ
    _KANA_SEMI_VOICED[_i] = 2


def cjk_width_term(term: str) -> str:
    """Fold fullwidth ASCII variants to ASCII and halfwidth Katakana to
    fullwidth, composing halfwidth voiced marks (cjk_width.go role)."""
    out: List[str] = []
    for ch in term:
        cp = ord(ch)
        if 0xFF01 <= cp <= 0xFF5E:
            out.append(chr(cp - 0xFEE0))
        elif 0xFF65 <= cp <= 0xFF9F:
            if cp in (0xFF9E, 0xFF9F) and out:
                prev = ord(out[-1])
                if 0x30A6 <= prev <= 0x30FD:
                    delta = (
                        _KANA_SEMI_VOICED[prev - 0x30A6]
                        if cp == 0xFF9F
                        else _KANA_VOICED[prev - 0x30A6]
                    )
                    if delta:
                        out[-1] = chr(prev + delta)
                        continue
            out.append(_KANA_NORM[cp - 0xFF65])
        else:
            out.append(ch)
    return "".join(out)


def cjk_width_filter(tokens: List[Token]) -> List[Token]:
    for t in tokens:
        t.term = cjk_width_term(t.term)
    return tokens


def make_cjk_bigram_filter(output_unigram: bool = False):
    """CJK bigram shingles over adjacent Ideographic runes
    (cjk_bigram.go semantics): Ideographic tokens explode to runes;
    byte-adjacent rune pairs emit Double bigrams; an isolated rune (or
    every rune, with output_unigram) emits a Single unigram; other token
    types flush the buffer and pass through."""
    from .tokenizers import IDEOGRAPHIC, SINGLE

    def bigram_filter(tokens: List[Token]) -> List[Token]:
        out: List[Token] = []
        buf: List[Token] = []  # at most the 2 most recent runes
        outpos = 1

        def unigram(src: Token, pos: int) -> Token:
            return Token(src.term, pos, src.start, src.end, SINGLE)

        def flush(pos: int):
            rv = unigram(buf[0], pos) if len(buf) == 1 else None
            buf.clear()
            return rv

        for tok in tokens:
            if tok.type == IDEOGRAPHIC:
                sofar = 0
                for ch in tok.term:
                    blen = len(ch.encode("utf-8"))
                    sub = Token(
                        ch, 0, tok.start + sofar, tok.start + sofar + blen,
                        IDEOGRAPHIC,
                    )
                    sofar += blen
                    if buf and sub.start != buf[-1].end:
                        ft = flush(outpos)  # gap: not byte-adjacent
                        if ft is not None:
                            outpos += 1
                            out.append(ft)
                    buf.append(sub)
                    if len(buf) > 2:
                        buf.pop(0)
                    built_unigram = False
                    if len(buf) > 1 and output_unigram:
                        out.append(unigram(buf[0], outpos))
                        built_unigram = True
                    if len(buf) == 2:
                        out.append(
                            Token(
                                buf[0].term + buf[1].term, outpos,
                                buf[0].start, buf[1].end, DOUBLE,
                            )
                        )
                        outpos += 1
                    if built_unigram:
                        buf.pop(0)
            else:
                ft = flush(outpos)
                if ft is not None:
                    out.append(ft)
                    outpos += 1
                tok.position = outpos
                out.append(tok)
                outpos += 1
        # trailing rune: lone rune always; the final rune too when
        # emitting unigrams alongside bigrams
        if len(buf) == 1:
            out.append(unigram(buf[0], outpos))
        elif len(buf) == 2 and output_unigram:
            out.append(unigram(buf[1], outpos))
        return out

    return bigram_filter


# ---------------------------------------------------------------------------
# English plural-only stemmer (reference analysis/lang/en/plural_stemmer.go,
# itself the public OpenSearch EnglishPluralStemFilter algorithm by Mark
# Harwood): a minimal s-stemmer with ies->y, xes/oes/shes/sses/ches->e
# handling and small exception lists.  Registered as "stemmer_en_plural".
# ---------------------------------------------------------------------------

_OES_EXCEPTIONS = ("shoes", "canoes", "oboes")
_CHES_EXCEPTIONS = (
    "cliches",
    "avalanches",
    "mustaches",
    "moustaches",
    "quiches",
    "headaches",
    "heartaches",
    "porsches",
    "tranches",
    "caches",
)


def english_plural_stem(word: str) -> str:
    w = word.lower()
    if len(w) < 3 or not w.endswith("s"):
        return w
    c2 = w[-2]
    if c2 in ("u", "s"):
        return w
    if c2 == "e":
        # ies -> y only on length > 4 (spies->spy but pies->pie)
        if len(w) > 4 and w[-3] == "i":
            return w[:-3] + "y"
        if len(w) > 3:
            # xes (>1-char prefix: boxes->box but axes->axe)
            if len(w) > 4 and w[-3] == "x":
                return w[:-2]
            # oes, with keep-the-e exceptions
            if w[-3] == "o":
                if w.endswith(_OES_EXCEPTIONS):
                    return w[:-1]
                return w[:-2]
            if len(w) > 4:
                # shes / sses
                if w[-4] == "s" and w[-3] in ("h", "s"):
                    return w[:-2]
                # ches, with keep-the-e exceptions
                if w[-4] == "c" and w[-3] == "h":
                    if w.endswith(_CHES_EXCEPTIONS):
                        return w[:-1]
                    return w[:-2]
        # dangling e cases fall through to the plain s-strip
    return w[:-1]


def plural_stemmer_filter(tokens):
    for t in tokens:
        if t.type != "KeyWord":  # respects the keyword marker
            t.term = english_plural_stem(t.term)
    return tokens


# ---------------------------------------------------------------------------
# Token map loading (reference analysis/tokenmap.go): word lists -- stop
# words, keyword markers, compound dictionaries -- load from text where
# each line holds whitespace-separated tokens and `#` or `|` starts a
# comment (full-line or trailing).
# ---------------------------------------------------------------------------


def load_token_map(text: str) -> frozenset:
    """Parse a token-map text (tokenmap.go LoadBytes/LoadLine)."""
    tokens = set()
    for line in text.splitlines():
        for marker in ("#", "|"):
            cut = line.find(marker)
            if cut >= 0:
                line = line[:cut]
        tokens.update(line.split())
    return frozenset(tokens)


def load_token_map_file(path) -> frozenset:
    """tokenmap.go LoadFile: read a word file into a token map."""
    with open(path, "r", encoding="utf-8") as f:
        return load_token_map(f.read())


# ---------------------------------------------------------------------------
# Name -> factory registry for token filters (the reference's
# registry.RegisterTokenFilter surface, registry/tokenfilter.go).
# Config-bearing filters register a factory taking their config kwargs;
# constants register ready callables.  Names match the reference's
# registered Name constants.
# ---------------------------------------------------------------------------


def _token_filter_registry():
    from .porter2 import make_porter2_filter
    from .stemmers_extra import (
        make_french_minimal_filter,
        make_french_snowball_filter,
        make_german_snowball_filter,
        make_italian_snowball_filter,
        make_porter_filter,
        make_snowball_filter,
        make_spanish_snowball_filter,
    )

    return {
        "apostrophe": lambda: apostrophe_filter,
        "camelCase": lambda: camelcase_filter,
        "dict_compound": make_compound_filter,
        "edge_ngram": make_edge_ngram_filter,
        "elision": make_elision_filter,
        "hierarchy": make_hierarchy_filter,
        "keyword_marker": make_keyword_marker_filter,
        "length": make_length_filter,
        "to_lower": lambda: lowercase_filter,
        "ngram": make_ngram_filter,
        "reverse": lambda: reverse_filter,
        "shingle": make_shingle_filter,
        "stop_tokens": make_stop_filter,
        "truncate_token": make_truncate_filter,
        "normalize_unicode": make_unicodenorm_filter,
        "unique": lambda: unique_filter,
        "cjk_bigram": make_cjk_bigram_filter,
        "stemmer_porter": make_porter_filter,
        "stemmer_snowball": make_snowball_filter,
        "stemmer_en_snowball": make_porter2_filter,
        "stemmer_en_plural": lambda: plural_stemmer_filter,
        "stemmer_es_snowball": make_spanish_snowball_filter,
        "stemmer_fr_snowball": make_french_snowball_filter,
        "stemmer_fr_min": make_french_minimal_filter,
        "stemmer_de_snowball": make_german_snowball_filter,
        "stemmer_it_snowball": make_italian_snowball_filter,
    }


def registered_token_filters():
    """Sorted registered token-filter names (registry listing role)."""
    return sorted(_token_filter_registry())


def token_filter_named(name: str, *args, **kwargs):
    """Construct a registered token filter by name (+ config args)."""
    reg = _token_filter_registry()
    if name not in reg:
        raise KeyError(f"no token filter with name or type {name} registered")
    return reg[name](*args, **kwargs)
