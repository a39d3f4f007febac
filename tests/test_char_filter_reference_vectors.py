"""Char-filter reference vector tables:

- analysis/char/asciifolding/asciifolding_test.go (umlauts, composite
  AE/AO runes, enclosed letters, swung/fullwidth tilde, fallthrough
  block boundaries, DZ digraph)
- analysis/char/regexp/regexp_test.go (tag strip, ZWNJ, capture-group
  replacement, quantified match, smart quotes)
"""

import pytest

from bleve_ray.analysis.char_filters import (
    ascii_folding_filter,
    make_regexp_char_filter,
)

ASCIIFOLD_VECTORS = [
    ("", ""),
    ("The quick brown fox jumps over the lazy dog",
     "The quick brown fox jumps over the lazy dog"),
    ("The quick bröwn fox jümps over the läzy dog",
     "The quick brown fox jumps over the lazy dog"),
    ("ÆꜴ", "AEAO"),  # composite runes fold to more than one ASCII rune
    ("Ápple Àpple Äpple Âpple Ãpple Åpple",
     "Apple Apple Apple Apple Apple Apple"),
    ("⒢", "(g)"),
    ("a⁓b", "a~b"),  # U+2053 SWUNG DASH
    ("c～d", "c~d"),  # U+FF5E FULLWIDTH TILDE
    ("e＿f", "e_f"),  # U+FF3F FULLWIDTH LOW LINE
    ("a⁓b✅c～d", "a~b✅c~d"),  # unfoldable rune passes through
    ("ÀBC", "ABC"),
    ("DEFẶ", "DEFA"),
    ("Æ", "AE"),
    ("ᴁ", "AE"),  # small capital AE
    ("Ǆebra", "DZebra"),
    ("àbc", "abc"),
    ("defａ", "defa"),
]


@pytest.mark.parametrize("inp,want", ASCIIFOLD_VECTORS)
def test_asciifolding_vectors(inp, want):
    assert ascii_folding_filter(inp) == want


REGEXP_CHAR_VECTORS = [
    (r"""</?[!\w]+((\s+\w+(\s*=\s*(?:".*?"|'.*?'|[^'">\s]+))?)+\s*|\s*)/?>""",
     " ", "<html>test</html>", " test "),
    ("‌", " ", "water‌under‌the‌bridge",
     "water under the bridge"),
    (r"([a-z])\s+(\d)", r"\1-\2", "temp 1", "temp-1"),
    (r"foo.?", "X", "seafood, fool", "seaX, X"),
    (r"def", "_", "abcdefghi", "abc_ghi"),
    (r"456", "000000", "123456789", "123000000789"),
    ("“|”", '"', "“hello”", '"hello"'),
]


@pytest.mark.parametrize("pattern,repl,inp,want", REGEXP_CHAR_VECTORS)
def test_regexp_char_filter_vectors(pattern, repl, inp, want):
    f = make_regexp_char_filter(pattern, repl)
    assert f(inp) == want
