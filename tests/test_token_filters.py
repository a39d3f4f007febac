"""Unit tests for the remaining token filters (reference analysis/token/*)."""

from bleve_ray.analysis.token_filters import (
    apostrophe_filter,
    lower_term,
    make_edge_ngram_filter,
    make_length_filter,
    make_ngram_filter,
    make_shingle_filter,
    make_truncate_filter,
    make_unicodenorm_filter,
    reverse_filter,
    unique_filter,
)
from bleve_ray.analysis.tokenizers import Token, WhitespaceTokenizer


def toks(*terms):
    return [Token(t, i + 1, 0, len(t)) for i, t in enumerate(terms)]


def terms(ts):
    return [t.term for t in ts]


def test_apostrophe():
    assert terms(apostrophe_filter(toks("don't", "o'clock", "plain"))) == [
        "don",
        "o",
        "plain",
    ]


def test_length():
    f = make_length_filter(2, 4)
    assert terms(f(toks("a", "ab", "abcd", "abcde"))) == ["ab", "abcd"]


def test_ngram():
    f = make_ngram_filter(2, 3)
    # ngram.go order: by start rune, then size
    assert terms(f(toks("abcd"))) == ["ab", "abc", "bc", "bcd", "cd"]


def test_edge_ngram():
    assert terms(make_edge_ngram_filter(1, 3)(toks("abcd"))) == [
        "a",
        "ab",
        "abc",
    ]
    assert terms(make_edge_ngram_filter(1, 2, back=True)(toks("abcd"))) == [
        "d",
        "cd",
    ]


def test_shingle():
    f = make_shingle_filter(2, 2)
    assert terms(f(toks("a", "b", "c"))) == ["a b", "b c"]


def test_truncate_reverse_unique():
    assert terms(make_truncate_filter(3)(toks("abcdef", "ab"))) == ["abc", "ab"]
    assert terms(reverse_filter(toks("abc"))) == ["cba"]
    assert terms(unique_filter(toks("a", "b", "a", "c", "b"))) == [
        "a",
        "b",
        "c",
    ]


def test_unicodenorm():
    import unicodedata

    f = make_unicodenorm_filter("nfc")
    decomposed = unicodedata.normalize("NFD", "é")
    assert terms(f(toks(decomposed))) == ["é"]


def test_lower_term_dotted_i():
    # Go unicode.ToLower maps U+0130 to a single 'i'
    assert lower_term("İstanbul") == "istanbul"
    assert lower_term("ABC") == "abc"


def test_elision():
    from bleve_ray.analysis.token_filters import make_elision_filter

    f = make_elision_filter()
    assert terms(f(toks("l'avion", "d'une", "plain"))) == [
        "avion",
        "une",
        "plain",
    ]


def test_hierarchy():
    from bleve_ray.analysis.token_filters import make_hierarchy_filter

    f = make_hierarchy_filter("/")
    assert terms(f(toks("a/b/c"))) == ["a", "a/b", "a/b/c"]


def test_keyword_marker_blocks_stemming():
    from bleve_ray.analysis.porter2 import make_porter2_filter
    from bleve_ray.analysis.token_filters import make_keyword_marker_filter

    marker = make_keyword_marker_filter({"running"})
    stemmer = make_porter2_filter()
    ts = stemmer(marker(toks("running", "jumping")))
    assert terms(ts) == ["running", "jump"]


def test_compound_decompounder():
    from bleve_ray.analysis.token_filters import make_compound_filter

    f = make_compound_filter({"note", "book", "case"})
    assert terms(f(toks("notebook"))) == ["notebook", "note", "book"]
    assert terms(f(toks("bookcase"))) == ["bookcase", "book", "case"]
    assert terms(f(toks("plain"))) == ["plain"]
