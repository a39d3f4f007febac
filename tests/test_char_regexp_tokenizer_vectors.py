"""Character / regexp tokenizer vectors:

- analysis/tokenizer/character/character_test.go (IsLetter runs; byte
  offsets in the email case)
- analysis/tokenizer/regexp/regexp_test.go TestBoundary (the Han/
  Hangul/Hiragana/Katakana|\\w+ pattern over English + Japanese, empty
  input)
"""

import pytest

from bleve_ray.analysis.tokenizers import (
    CharacterTokenizer,
    RegexpTokenizer,
)


def test_character_tokenizer_letters():
    tok = CharacterTokenizer(r"\p{L}")
    got = [
        (t.term, t.position, t.start, t.end)
        for t in tok.tokenize("Hello World.")
    ]
    assert got == [("Hello", 1, 0, 5), ("World", 2, 6, 11)]


def test_character_tokenizer_email():
    tok = CharacterTokenizer(r"\p{L}")
    got = [
        (t.term, t.position, t.start, t.end)
        for t in tok.tokenize("dominique@mcdiabetes.com")
    ]
    assert got == [
        ("dominique", 1, 0, 9),
        ("mcdiabetes", 2, 10, 20),
        ("com", 3, 21, 24),
    ]


BOUNDARY_PATTERN = r"[一-鿿]|[가-힯]|[぀-ゟ]|[゠-ヿ]|\w+"


def test_regexp_tokenizer_english():
    tok = RegexpTokenizer(BOUNDARY_PATTERN)
    got = [
        (t.term, t.position, t.start, t.end)
        for t in tok.tokenize("Hello World.")
    ]
    assert got == [("Hello", 1, 0, 5), ("World", 2, 6, 11)]


def test_regexp_tokenizer_japanese_per_rune():
    tok = RegexpTokenizer(BOUNDARY_PATTERN)
    got = [
        (t.term, t.position, t.start, t.end)
        for t in tok.tokenize("こんにちは世界")
    ]
    # each kana/han rune is its own token with utf-8 byte offsets
    assert got == [
        ("こ", 1, 0, 3),
        ("ん", 2, 3, 6),
        ("に", 3, 6, 9),
        ("ち", 4, 9, 12),
        ("は", 5, 12, 15),
        ("世", 6, 15, 18),
        ("界", 7, 18, 21),
    ]


def test_regexp_tokenizer_empty():
    tok = RegexpTokenizer(BOUNDARY_PATTERN)
    assert tok.tokenize("") == []
