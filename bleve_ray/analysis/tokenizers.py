"""Tokenizers.

Re-implements the semantics of the reference tokenizers
(``analysis/tokenizer/*`` in blevesearch/bleve) as plain Python callables.
The ``unicode`` tokenizer follows UAX#29 word segmentation like the
reference's ``analysis/tokenizer/unicode/unicode.go:33-100`` (which wraps
blevesearch/segment): it emits only word-ish segments (letters, numbers,
ideographs), assigns 1-based sequential positions, and byte offsets.

Two faces per tokenizer:

- ``tokenize(text) -> list[Token]`` -- exact, with byte offsets; used for
  golden tests, phrase fixtures and (later) highlighting.
- ``findall(text) -> list[str]`` -- terms only, in order; the fast path used
  by the batch analyzer in the index build (positions are implied by order).

Both must agree on the term sequence (tested).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Callable, List

import regex as uregex

# Token types, mirroring the reference analysis/type.go:28-38.
ALPHANUMERIC = "AlphaNumeric"
IDEOGRAPHIC = "Ideographic"
NUMERIC = "Numeric"
SINGLE = "Single"


@dataclass
class Token:
    """One analyzed token; mirrors reference analysis/type.go:42-56.

    start/end are BYTE offsets into the utf-8 encoding of the input (the
    reference operates on ``[]byte``); position is 1-based.
    """

    term: str
    position: int
    start: int
    end: int
    type: str = ALPHANUMERIC

    def astuple(self):
        return (self.term, self.position, self.start, self.end)


# ---------------------------------------------------------------------------
# UAX#29 word segmentation pattern (unicode tokenizer)
#
# Grammar over Word_Break property classes (simplified to the rules that
# produce word segments; regional-indicator/ZWJ-emoji and the Hebrew
# double-quote rules are not relevant to word *emission* here):
#   WB5   (AHLetter) x (AHLetter)
#   WB6/7 AHLetter x (MidLetter | MidNumLet | Single_Quote) x AHLetter
#   WB8   Numeric x Numeric
#   WB9   AHLetter x Numeric
#   WB10  Numeric x AHLetter
#   WB11/12 Numeric x (MidNum | MidNumLet | Single_Quote) x Numeric
#   WB13  Katakana x Katakana
#   WB13a/b ExtendNumLet joins with AHLetter/Numeric/Katakana/ExtendNumLet
#   WB4   Extend/Format/ZWJ are absorbed into the preceding char
#
# Ideographic & Hiragana characters have no keep-together rule -> each is its
# own single-character segment, emitted with type Ideographic (the reference
# segmenter classifies Han/Hiragana/Katakana segments as Ideo).
# Pure ExtendNumLet runs ("___") are NOT emitted (segment type None).
# ---------------------------------------------------------------------------

_E = r"[\p{wb=Extend}\p{wb=Format}\p{wb=ZWJ}]*"
_AHL = r"[\p{wb=ALetter}\p{wb=Hebrew_Letter}]"
_NU = r"\p{wb=Numeric}"
_KA = r"\p{wb=Katakana}"
_EX = r"\p{wb=ExtendNumLet}"
_MLQ = r"[\p{wb=MidLetter}\p{wb=MidNumLet}\p{wb=Single_Quote}]"
_MNQ = r"[\p{wb=MidNum}\p{wb=MidNumLet}\p{wb=Single_Quote}]"

_L = _AHL + _E
_N = _NU + _E
_K = _KA + _E
_X = _EX + _E

# letters joined by mid-letter chars; numbers joined by mid-num chars
_LPART = rf"(?:{_L})+(?:{_MLQ}{_E}(?:{_L})+)*"
_NPART = rf"(?:{_N})+(?:{_MNQ}{_E}(?:{_N})+)*"
_LNSEQ = rf"(?:{_LPART}|{_NPART})+"
_KSEQ = rf"(?:{_K})+"
_PART = rf"(?:{_LNSEQ}|{_KSEQ})"
_WORD = rf"(?:{_X})*{_PART}(?:(?:{_X})+{_PART})*(?:{_X})*"

_IDEO = r"[\p{Ideographic}\p{Hiragana}]"

UNICODE_WORD_RE = uregex.compile(rf"(?P<w>{_WORD})|(?P<i>{_IDEO}{_E})", uregex.V1)
# group-free variant: findall() returns the matched strings directly
UNICODE_WORD_RE_NOGROUP = uregex.compile(
    rf"(?:{_WORD})|(?:{_IDEO}{_E})", uregex.V1
)

# Fast ASCII-equivalent of the same grammar (stdlib re, much faster).  On
# pure-ASCII text the UAX#29 classes collapse to:
#   ALetter=[A-Za-z] Numeric=[0-9] ExtendNumLet=[_]
#   MidLetter=[:'] MidNumLet=[.'] Single_Quote=['] MidNum=[,;]
# (ASCII ' U+0027 is Single_Quote; '.' MidNumLet; ':' MidLetter; ','/';'
#  MidNum -- per WordBreakProperty.txt)
_A_LPART = r"[A-Za-z]+(?:[:'.][A-Za-z]+)*"
_A_NPART = r"[0-9]+(?:[,;.'][0-9]+)*"
_A_LNSEQ = rf"(?:{_A_LPART}|{_A_NPART})+"
_A_WORD = rf"_*{_A_LNSEQ}(?:_+{_A_LNSEQ})*_*"
ASCII_WORD_RE = re.compile(_A_WORD)
# anchored RE2-compatible form: the batch tokenizer (freq.py
# _arrow_batch_tokens) uses it to DETECT trimmed superset runs whose
# internal mid-chars still satisfy the word grammar (e.g. "don't",
# "1,000") vs the rare ones that must split (e.g. "a,b")
ASCII_WORD_ANCHORED = rf"^(?:{_A_WORD})$"

# NOTE on the ASCII mid-char collapse: ASCII "." is MidNumLet which joins
# letters too (WB6/7 allow MidNumLet between AHLetters) -> "e.g" is one
# token; that is faithful to UAX#29.

_NUM_RE = re.compile(r"[0-9]")
_ALPHA_ANY = uregex.compile(r"[\p{wb=ALetter}\p{wb=Hebrew_Letter}]")
# pure Katakana run (wb=Katakana covers halfwidth forms + prolonged sound
# mark): the reference segmenter types these segments Ideo, which is what
# lets the cjk analyzer bigram katakana words.
_KATAKANA_RUN = uregex.compile(
    r"^[\p{wb=Katakana}\p{wb=Extend}\p{wb=Format}\p{wb=ZWJ}]+$", uregex.V1
)


def _classify(term: str) -> str:
    if _ALPHA_ANY.search(term):
        return ALPHANUMERIC
    if _NUM_RE.search(term) or uregex.search(r"\p{wb=Numeric}", term):
        return NUMERIC
    if _KATAKANA_RUN.match(term):
        return IDEOGRAPHIC
    return ALPHANUMERIC


# fast-path pre-scan: a superset char-class run is ~3x cheaper than the
# grammar alternation; only tokens containing mid-chars need the precise
# grammar re-applied (measured ~12% of code-corpus tokens)
_ASCII_FAST_RE = re.compile(r"[A-Za-z0-9_'.:,;]+")
_ASCII_NEEDS_FIX_RE = re.compile(r"['.:,;]")


def _ascii_findall(text: str) -> List[str]:
    out: List[str] = []
    findall = ASCII_WORD_RE.findall
    needs_fix = _ASCII_NEEDS_FIX_RE.search
    for t in _ASCII_FAST_RE.findall(text):
        if needs_fix(t):
            out.extend(findall(t))
        elif t.strip("_"):
            # mid-char-free run is a word iff it has an alphanumeric;
            # pure ExtendNumLet runs ("_", "___") are not segments
            out.append(t)
    return out


class UnicodeTokenizer:
    """UAX#29 word tokenizer (reference: analysis/tokenizer/unicode/unicode.go)."""

    name = "unicode"

    def findall(self, text: str) -> List[str]:
        if text.isascii():
            return _ascii_findall(text)
        return UNICODE_WORD_RE_NOGROUP.findall(text)

    def tokenize(self, text: str) -> List[Token]:
        toks: List[Token] = []
        pos = 1
        is_ascii = text.isascii()
        if is_ascii:
            for m in ASCII_WORD_RE.finditer(text):
                term = m.group(0)
                toks.append(
                    Token(term, pos, m.start(), m.end(), _classify(term))
                )
                pos += 1
            return toks
        # byte offsets: build a char->byte offset map lazily
        boff = _byte_offsets(text)
        for m in UNICODE_WORD_RE.finditer(text):
            term = m.group(0)
            typ = IDEOGRAPHIC if m.group("i") is not None else _classify(term)
            toks.append(Token(term, pos, boff[m.start()], boff[m.end()], typ))
            pos += 1
        return toks


def _byte_offsets(text: str) -> List[int]:
    """offsets[i] = byte offset of char i in utf-8 encoding (len = len+1)."""
    offs = [0] * (len(text) + 1)
    o = 0
    for i, ch in enumerate(text):
        offs[i] = o
        o += len(ch.encode("utf-8"))
    offs[len(text)] = o
    return offs


class LetterTokenizer:
    """Runs of unicode letters (reference: analysis/tokenizer/letter/letter.go)."""

    name = "letter"
    _re = uregex.compile(r"\p{L}+")
    _re_ascii = re.compile(r"[A-Za-z]+")

    def findall(self, text: str) -> List[str]:
        if text.isascii():
            return self._re_ascii.findall(text)
        return self._re.findall(text)

    def tokenize(self, text: str) -> List[Token]:
        return _tokenize_by_re(
            self._re_ascii if text.isascii() else self._re, text
        )


class WhitespaceTokenizer:
    """Runs of non-whitespace (reference: analysis/tokenizer/whitespace)."""

    name = "whitespace"
    _re = re.compile(r"\S+")

    def findall(self, text: str) -> List[str]:
        return self._re.findall(text)

    def tokenize(self, text: str) -> List[Token]:
        return _tokenize_by_re(self._re, text)


class SingleTokenTokenizer:
    """Whole input = one token (reference: analysis/tokenizer/single)."""

    name = "single"

    def findall(self, text: str) -> List[str]:
        return [text]

    def tokenize(self, text: str) -> List[Token]:
        return [Token(text, 1, 0, len(text.encode("utf-8")), SINGLE)]


class RegexpTokenizer:
    """Matches of a configured regex (reference: analysis/tokenizer/regexp)."""

    name = "regexp"

    def __init__(self, pattern: str):
        self.pattern = pattern
        self._re = re.compile(pattern)

    def findall(self, text: str) -> List[str]:
        return self._re.findall(text)

    def tokenize(self, text: str) -> List[Token]:
        return _tokenize_by_re(self._re, text)


class CharacterTokenizer:
    """Runs of a character class (reference: analysis/tokenizer/character)."""

    name = "character"

    def __init__(self, char_class: str):
        self._re = uregex.compile(f"[{char_class}]+")

    def findall(self, text: str) -> List[str]:
        return self._re.findall(text)

    def tokenize(self, text: str) -> List[Token]:
        return _tokenize_by_re(self._re, text)


class ExceptionTokenizer:
    """Regex-protected spans pass through whole; the remainder is re-tokenized
    by a child tokenizer (reference: analysis/tokenizer/exception)."""

    name = "exception"

    def __init__(self, exception_patterns: List[str], child):
        self._re = uregex.compile("|".join(exception_patterns))
        self.child = child

    def findall(self, text: str) -> List[str]:
        return [t.term for t in self.tokenize(text)]

    def tokenize(self, text: str) -> List[Token]:
        toks: List[Token] = []
        last = 0
        pieces = []  # (text_piece, protected, char_start)
        for m in self._re.finditer(text):
            if m.start() > last:
                pieces.append((text[last : m.start()], False, last))
            pieces.append((m.group(0), True, m.start()))
            last = m.end()
        if last < len(text):
            pieces.append((text[last:], False, last))
        boff = _byte_offsets(text)
        pos = 1
        for piece, protected, cstart in pieces:
            if protected:
                toks.append(
                    Token(
                        piece,
                        pos,
                        boff[cstart],
                        boff[cstart + len(piece)],
                        ALPHANUMERIC,
                    )
                )
                pos += 1
            else:
                for t in self.child.tokenize(piece):
                    # child offsets are byte offsets within piece; rebase
                    base = boff[cstart]
                    toks.append(
                        Token(t.term, pos, base + t.start, base + t.end, t.type)
                    )
                    pos += 1
        return toks


def _tokenize_by_re(pat, text: str) -> List[Token]:
    ascii_ = text.isascii()
    boff = None if ascii_ else _byte_offsets(text)
    toks = []
    pos = 1
    for m in pat.finditer(text):
        term = m.group(0)
        if ascii_:
            s, e = m.start(), m.end()
        else:
            s, e = boff[m.start()], boff[m.end()]
        toks.append(Token(term, pos, s, e, _classify(term)))
        pos += 1
    return toks


# web tokenizer (reference analysis/tokenizer/web): emails, URLs and
# @mentions/#hashtags survive as single tokens; everything else falls back
# to UAX#29 words.  Implemented as an ExceptionTokenizer composition, the
# same way the reference builds it from exception + unicode.
WEB_EXCEPTIONS = [
    r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",  # email
    r"https?://[^\s]+",                                   # url
    r"@[A-Za-z0-9_]+",                                     # mention
    r"#[A-Za-z0-9_]+",                                     # hashtag
]


def make_web_tokenizer() -> "ExceptionTokenizer":
    return ExceptionTokenizer(WEB_EXCEPTIONS, UnicodeTokenizer())
