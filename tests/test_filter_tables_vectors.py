"""Remaining reference token-filter tables, ported verbatim:

- analysis/token/length/length_test.go (min+max, no-max, no-min)
- analysis/token/keyword/keyword_test.go (keyword marker)
- analysis/token/unique/unique_test.go (case-sensitive dedup keeps the
  first occurrence with its position/offsets)
- analysis/token/elision/elision_test.go (ASCII apostrophe and U+2019)
- analysis/token/unicodenorm/unicodenorm_test.go (NFC/NFD/NFKC/NFKD)
- analysis/token/lowercase/lowercase_test.go (via possessive-free
  unicode lowering examples from the table)
- analysis/token/stop/stop_test.go (position gaps preserved)
"""

import pytest

from bleve_ray.analysis.token_filters import (
    lowercase_filter,
    make_elision_filter,
    make_keyword_marker_filter,
    make_length_filter,
    make_stop_filter,
    make_unicodenorm_filter,
    unique_filter,
)
from bleve_ray.analysis.tokenizers import Token


def _stream(*terms):
    toks, idx = [], 0
    for i, t in enumerate(terms):
        toks.append(
            Token(term=t, position=i + 1, start=idx, end=idx + len(t))
        )
        idx += len(t)
    return toks


# --- length -------------------------------------------------------------


def test_length_filter():
    out = make_length_filter(3, 4)(_stream("1", "two", "three"))
    assert [t.term for t in out] == ["two"]


def test_length_filter_no_max():
    out = make_length_filter(3, -1)(_stream("1", "two", "three"))
    assert [t.term for t in out] == ["two", "three"]


def test_length_filter_no_min():
    out = make_length_filter(-1, 4)(_stream("1", "two", "three"))
    assert [t.term for t in out] == ["1", "two"]


# --- keyword marker -------------------------------------------------------


def test_keyword_marker():
    f = make_keyword_marker_filter({"walk", "park"})
    out = f(_stream("a", "walk", "in", "the", "park"))
    assert [(t.term, t.type == "KeyWord") for t in out] == [
        ("a", False), ("walk", True), ("in", False),
        ("the", False), ("park", True),
    ]


# --- unique ---------------------------------------------------------------

UNIQUE_VECTORS = [
    ((), []),
    (("a",), [0]),
    (("each", "term", "in", "this", "sentence", "is", "unique"),
     [0, 1, 2, 3, 4, 5, 6]),
    (("Lui", "è", "alto", "e", "lei", "è", "bassa"), [0, 1, 2, 3, 4, 6]),
    (("a", "a", "A", "a", "a", "A"), [0, 2]),
]


@pytest.mark.parametrize("terms,keep_idx", UNIQUE_VECTORS)
def test_unique_vectors(terms, keep_idx):
    inp = _stream(*terms)
    want = [
        (inp[i].term, inp[i].position, inp[i].start, inp[i].end)
        for i in keep_idx
    ]
    out = unique_filter(_stream(*terms))
    assert [(t.term, t.position, t.start, t.end) for t in out] == want


# --- elision (apostrophe variants) -----------------------------------------


@pytest.mark.parametrize(
    "inp,want",
    [
        ("ar'word", "word"),          # ASCII apostrophe U+0027
        ("ar’word", "word"),     # right single quotation mark
    ],
)
def test_elision_apostrophe_variants(inp, want):
    f = make_elision_filter(frozenset(["ar"]))
    out = f(_stream(inp))
    assert [t.term for t in out] == [want]


# --- unicodenorm -------------------------------------------------------------

UNICODENORM_VECTORS = [
    ("nfkd", "Ｔｅｓｔ", "Test"),
    ("nfkd", "１２３４", "1234"),
    ("nfkd", "ｶﾀｶﾅ", "カタカナ"),
    ("nfkc", "ﾊﾟﾅｿﾆｯｸ", "パナソニック"),
    ("nfd", "Å", "Å"),
    ("nfc", "Å", "Å"),
    ("nfkd", "ﬁ", "fi"),
    ("nfkc", "ﬁ", "fi"),
]


@pytest.mark.parametrize("form,inp,want", UNICODENORM_VECTORS)
def test_unicodenorm_vectors(form, inp, want):
    f = make_unicodenorm_filter(form)
    out = f(_stream(inp))
    assert [t.term for t in out] == [want]


# --- lowercase + stop ---------------------------------------------------------


def test_lowercase_preserves_structure():
    out = lowercase_filter(_stream("ONE", "two", "ThReE", "steven's"))
    assert [t.term for t in out] == ["one", "two", "three", "steven's"]


def test_stop_filter_position_gaps():
    # stop removal keeps original positions (gaps) — stop_test.go
    f = make_stop_filter(frozenset(["a", "in", "the"]))
    out = f(_stream("a", "walk", "in", "the", "park"))
    assert [(t.term, t.position) for t in out] == [
        ("walk", 2), ("park", 5),
    ]


# --- possessive_filter_en_test.go full table ---------------------------------


@pytest.mark.parametrize(
    "inp,want",
    [
        ("marty's", "marty"),
        ("MARTY'S", "MARTY"),
        ("marty’s", "marty"),
        ("MARTY’S", "MARTY"),
        ("marty＇s", "marty"),
        ("MARTY＇S", "MARTY"),
        ("m", "m"),
        ("s", "s"),
        ("'s", ""),  # the whole term is the possessive marker
    ],
)
def test_possessive_filter_vectors(inp, want):
    from bleve_ray.analysis.analyzers import _possessive_filter

    out = _possessive_filter(_stream(inp))
    assert [t.term for t in out] == [want]
