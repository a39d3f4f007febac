"""Analysis-layer tests: tokenizer goldens, the 511-term invariant
(reference analysis/benchmark_test.go:26-42), stop-filter position gaps,
fast-path == exact-path parity."""

import pathlib

import numpy as np
import pytest

from bleve_ray.analysis import analyzer_named
from bleve_ray.analysis.freq import analyze_batch, invert_batch
from bleve_ray.analysis.token_filters import camelcase_filter
from bleve_ray.analysis.tokenizers import (
    LetterTokenizer,
    UnicodeTokenizer,
    WhitespaceTokenizer,
)

WIKI = pathlib.Path(__file__).parent / "data" / "wiki_article.txt"


def test_unicode_tokenizer_basic():
    tok = UnicodeTokenizer()
    cases = {
        "Hello World.": ["Hello", "World"],
        "can't stop won't stop": ["can't", "stop", "won't", "stop"],
        "3.14 1,000 a:b a.b": ["3.14", "1,000", "a:b", "a.b"],
        # '.' (MidNumLet) joins letters per WB6/7: identifiers stay together
        "fmt.Errorf(x)": ["fmt.Errorf", "x"],
        # WB6 needs a letter after MidNumLet; '_' is ExtendNumLet -> break
        "__init__ self._x": ["__init__", "self", "_x"],
        "a1b2 42 x9": ["a1b2", "42", "x9"],
        "": [],
        "   \n\t ": [],
        "...!!!": [],
    }
    for text, want in cases.items():
        assert tok.findall(text) == want, text
        assert [t.term for t in tok.tokenize(text)] == want, text


def test_unicode_tokenizer_nonascii():
    tok = UnicodeTokenizer()
    assert tok.findall("héllo wörld") == ["héllo", "wörld"]
    # ideographs: one token per char; katakana: runs
    assert tok.findall("日本語") == ["日", "本", "語"]
    assert tok.findall("カタカナ dog") == ["カタカナ", "dog"]
    # positions are sequential 1-based
    toks = tok.tokenize("日本 abc")
    assert [(t.term, t.position) for t in toks] == [
        ("日", 1),
        ("本", 2),
        ("abc", 3),
    ]


def test_unicode_tokenizer_byte_offsets():
    tok = UnicodeTokenizer()
    toks = tok.tokenize("héllo wörld")
    # é is 2 bytes in utf-8
    assert (toks[0].start, toks[0].end) == (0, 6)
    assert (toks[1].start, toks[1].end) == (7, 13)


def test_standard_analyzer_511_terms():
    """The reference's golden invariant: standard analyzer over the BLEVE
    wiki article yields exactly 511 distinct terms
    (analysis/benchmark_test.go:26-42)."""
    text = WIKI.read_text()
    a = analyzer_named("standard")
    toks = a.analyze(text)
    assert len({t.term for t in toks}) == 511


def test_stop_filter_preserves_positions():
    a = analyzer_named("standard")
    toks = a.analyze("jump over the lazy dog")
    # "over" and "the" are stop words; gap at positions 2-3 must remain
    assert [(t.term, t.position) for t in toks] == [
        ("jump", 1),
        ("lazy", 4),
        ("dog", 5),
    ]


def test_fast_path_matches_exact_path():
    a = analyzer_named("standard")
    texts = [
        WIKI.read_text(),
        "The quick brown Fox JUMPED over 42 lazy dogs' tails",
        "héllo Wörld 日本語のテスト can't won't",
        "",
        "func main() { fmt.Println(\"hi\") }",
    ]
    terms, doc_idx, positions, field_len = analyze_batch(texts, a)
    terms = terms.to_pylist()
    for i, text in enumerate(texts):
        exact = a.analyze(text)
        mask = doc_idx == i
        got_terms = [t for t, m in zip(terms, mask) if m]
        got_pos = positions[mask].tolist()
        assert got_terms == [t.term for t in exact], f"doc {i}"
        assert got_pos == [t.position for t in exact], f"doc {i}"
        assert field_len[i] == len(exact)


def test_invert_batch():
    a = analyzer_named("standard")
    # NB: single letters like "a" are English stop words; use digraphs
    texts = ["bb aa bb cc bb", "aa cc cc"]
    terms, doc_idx, positions, field_len = analyze_batch(texts, a)
    tbl = invert_batch(
        terms, doc_idx, positions, np.array([10, 20]), field_len
    ).to_pandas().set_index("term").sort_index()  # chunk rows come in
    # first-appearance (dictionary) order; segment build sorts later
    assert list(tbl.index) == ["aa", "bb", "cc"]
    assert list(tbl.loc["bb", "docnums"]) == [10]
    assert list(tbl.loc["bb", "tfs"]) == [3]
    assert [list(p) for p in tbl.loc["bb", "positions"]] == [[1, 3, 5]]
    assert list(tbl.loc["cc", "docnums"]) == [10, 20]
    assert list(tbl.loc["cc", "tfs"]) == [1, 2]
    # norms = float32(1/sqrt(field_len))
    assert tbl.loc["aa", "norms"][0] == np.float32(1.0 / np.sqrt(5.0))


def test_camelcase_filter():
    tok = UnicodeTokenizer()
    toks = camelcase_filter(tok.tokenize("camelCaseABCDef"))
    assert [t.term for t in toks] == ["camel", "Case", "ABC", "Def"]


def test_letter_whitespace_tokenizers():
    assert LetterTokenizer().findall("ab3cd ef") == ["ab", "cd", "ef"]
    assert WhitespaceTokenizer().findall(" a b3! c ") == ["a", "b3!", "c"]


def test_ascii_alnum_analyzer():
    a = analyzer_named("ascii_alnum_lower")
    assert a.terms("Foo_bar 3.14 Baz-qux") == ["foo", "bar", "3", "14", "baz", "qux"]


def test_datetime_parsers():
    from bleve_ray.analysis.datetime_parsers import (
        datetime_parser_named,
        registered_datetime_parsers,
    )

    iso = datetime_parser_named("iso")
    assert iso("2024-01-10T00:00:00Z") == 1704844800 * 10**9
    assert iso("2024-01-10T00:00:00+00:00") == iso("2024-01-10T00:00:00")
    assert iso("not a date") is None
    flex = datetime_parser_named("flexible")
    assert flex("2024/01/10") == iso("2024-01-10T00:00:00")
    assert datetime_parser_named("unix_sec")(1704844800) == 1704844800 * 10**9
    assert datetime_parser_named("unix_milli")(1704844800000) == 1704844800 * 10**9
    assert "iso" in registered_datetime_parsers()


def test_tokenizer_spans_reconstruct_terms_property():
    """Property: every token's (start, end) byte span slices the source
    back to exactly the emitted term (the invariant hit-location offsets
    rely on), over generated mixed-script inputs."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from bleve_ray.analysis.tokenizers import UnicodeTokenizer

    tok = UnicodeTokenizer()

    @settings(max_examples=150, deadline=None)
    @given(
        st.text(
            alphabet=st.characters(
                codec="utf-8",
                exclude_categories=("Cs",),
            ),
            max_size=60,
        )
    )
    def check(s):
        raw = s.encode("utf-8")
        for t in tok.tokenize(s):
            assert raw[t.start : t.end].decode("utf-8") == t.term, (
                s, t.astuple(),
            )

    check()
