"""Compound decompounder + per-language elision vectors:

- analysis/token/compound/dict_test.go TestStopWordsFilter /
  TestStopWordsFilterLongestMatch: subword emission with byte offsets
  relative to the parent token; only_longest_match keeps the longest
  subword at each position.
- analysis/lang/ca/elision_ca_test.go (l'Institut d'Estudis)
- analysis/lang/ga/elision_ga_test.go (b'fhearr)
"""

from bleve_ray.analysis.token_filters import (
    make_compound_filter,
    make_elision_filter,
)
from bleve_ray.analysis.tokenizers import Token


def _tok(term, pos=1, start=0):
    return Token(
        term=term, position=pos, start=start, end=start + len(term)
    )


def test_compound_dict_vectors():
    f = make_compound_filter({"factor", "soft", "ball", "team"})
    toks = [
        _tok("i", 1, 0),
        _tok("like", 2, 2),
        _tok("to", 3, 7),
        _tok("play", 4, 10),
        _tok("softball", 5, 15),
    ]
    out = f(toks)
    got = [(t.term, t.position, t.start, t.end) for t in out]
    assert got == [
        ("i", 1, 0, 1),
        ("like", 2, 2, 6),
        ("to", 3, 7, 9),
        ("play", 4, 10, 14),
        ("softball", 5, 15, 23),
        ("soft", 5, 15, 19),
        ("ball", 5, 19, 23),
    ]


def test_compound_dict_longest_match():
    f = make_compound_filter(
        {"soft", "softest", "ball"}, only_longest=True
    )
    out = f([_tok("softestball", 1, 0)])
    got = [(t.term, t.position, t.start, t.end) for t in out]
    assert got == [
        ("softestball", 1, 0, 11),
        ("softest", 1, 0, 7),
        ("ball", 1, 7, 11),
    ]


# reference articles_ca.go / articles_ga.go elision sets
CATALAN_ARTICLES = frozenset(["d", "l", "m", "n", "s", "t"])
IRISH_ARTICLES = frozenset(["d", "m", "b"])


def test_catalan_elision():
    f = make_elision_filter(CATALAN_ARTICLES)
    out = f([_tok("l'Institut"), _tok("d'Estudis", 2)])
    assert [t.term for t in out] == ["Institut", "Estudis"]


def test_irish_elision():
    f = make_elision_filter(IRISH_ARTICLES)
    out = f([_tok("b'fhearr")])
    assert [t.term for t in out] == ["fhearr"]
