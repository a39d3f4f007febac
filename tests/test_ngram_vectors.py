"""analysis/token/{ngram,edgengram}/*_test.go conformance: n-gram
emission order (by start, then size) and front/back edge n-grams."""

import pytest

from bleve_ray.analysis.token_filters import (
    make_edge_ngram_filter,
    make_ngram_filter,
)
from bleve_ray.analysis.tokenizers import Token


def toks(*terms):
    return [Token(t, 1, 0, len(t), "AlphaNumeric") for t in terms]


def terms(result):
    return [t.term for t in result]


NGRAM_CASES = [
    (1, 1, "abcde", ["a", "b", "c", "d", "e"]),
    (2, 2, "abcde", ["ab", "bc", "cd", "de"]),
    (1, 3, "abcde",
     ["a", "ab", "abc", "b", "bc", "bcd", "c", "cd", "cde",
      "d", "de", "e"]),
]


@pytest.mark.parametrize("mn,mx,inp,want", NGRAM_CASES)
def test_ngram_filter(mn, mx, inp, want):
    assert terms(make_ngram_filter(mn, mx)(toks(inp))) == want


EDGE_CASES = [
    (1, 1, False, "abcde", ["a"]),
    (1, 1, True, "abcde", ["e"]),
    (1, 3, False, "abcde", ["a", "ab", "abc"]),
    (1, 3, True, "abcde", ["e", "de", "cde"]),
    # min longer than the term -> nothing
    (3, 5, False, "ab", []),
]


@pytest.mark.parametrize("mn,mx,back,inp,want", EDGE_CASES)
def test_edge_ngram_filter(mn, mx, back, inp, want):
    assert terms(make_edge_ngram_filter(mn, mx, back)(toks(inp))) == want
