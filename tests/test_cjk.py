"""CJK analyzer conformance: width folding + bigram shingles.

Vectors from reference analysis/lang/cjk/{analyzer_cjk,cjk_width,
cjk_bigram}_test.go (expected outputs reproduced, implementation original).
"""

import pytest

from bleve_ray.analysis.analyzers import analyzer_named
from bleve_ray.analysis.token_filters import (
    Token,
    cjk_width_term,
    make_cjk_bigram_filter,
)


def _terms(text):
    return [
        (t.term, t.type, t.position, t.start, t.end)
        for t in analyzer_named("cjk").analyze(text)
    ]


# (input, [(term, type, position, start, end)]) — analyzer_cjk_test.go
ANALYZER_VECTORS = [
    (
        "こんにちは世界",
        [
            ("こん", "Double", 1, 0, 6),
            ("んに", "Double", 2, 3, 9),
            ("にち", "Double", 3, 6, 12),
            ("ちは", "Double", 4, 9, 15),
            ("は世", "Double", 5, 12, 18),
            ("世界", "Double", 6, 15, 21),
        ],
    ),
    (
        "一 二三四 五六七八九 十",
        [
            ("一", "Single", 1, 0, 3),
            ("二三", "Double", 2, 4, 10),
            ("三四", "Double", 3, 7, 13),
            ("五六", "Double", 4, 14, 20),
            ("六七", "Double", 5, 17, 23),
            ("七八", "Double", 6, 20, 26),
            ("八九", "Double", 7, 23, 29),
            ("十", "Single", 8, 30, 33),
        ],
    ),
    (
        "あいtest",
        [
            ("あい", "Double", 1, 0, 6),
            ("test", "AlphaNumeric", 2, 6, 10),
        ],
    ),
    (
        "testあい    ",
        [
            ("test", "AlphaNumeric", 1, 0, 4),
            ("あい", "Double", 2, 4, 10),
        ],
    ),
    (
        "あいうえおabcかきくけこ",
        [
            ("あい", "Double", 1, 0, 6),
            ("いう", "Double", 2, 3, 9),
            ("うえ", "Double", 3, 6, 12),
            ("えお", "Double", 4, 9, 15),
            ("abc", "AlphaNumeric", 5, 15, 18),
            ("かき", "Double", 6, 18, 24),
            ("きく", "Double", 7, 21, 27),
            ("くけ", "Double", 8, 24, 30),
            ("けこ", "Double", 9, 27, 33),
        ],
    ),
    (
        "𩬅艱鍟䇹愯瀛",
        [
            ("𩬅艱", "Double", 1, 0, 7),
            ("艱鍟", "Double", 2, 4, 10),
            ("鍟䇹", "Double", 3, 7, 13),
            ("䇹愯", "Double", 4, 10, 16),
            ("愯瀛", "Double", 5, 13, 19),
        ],
    ),
    ("一", [("一", "Single", 1, 0, 3)]),
    (
        "一丁丂",
        [("一丁", "Double", 1, 0, 6), ("丁丂", "Double", 2, 3, 9)],
    ),
]


@pytest.mark.parametrize("text,expected", ANALYZER_VECTORS, ids=lambda v: str(v)[:20])
def test_cjk_analyzer(text, expected):
    assert _terms(text) == expected


# cjk_width_test.go vectors
WIDTH_VECTORS = [
    ("Ｔｅｓｔ", "Test"),
    ("１２３４", "1234"),
    ("ｶﾀｶﾅ", "カタカナ"),
    ("ｳﾞｨｯﾂ", "ヴィッツ"),
    ("ﾊﾟﾅｿﾆｯｸ", "パナソニック"),
]


@pytest.mark.parametrize("inp,out", WIDTH_VECTORS)
def test_cjk_width(inp, out):
    assert cjk_width_term(inp) == out


def test_katakana_bigrammed():
    # wb=Katakana runs (incl. halfwidth + prolonged sound mark) type as
    # Ideographic and get bigrammed like the reference segmenter's Ideo.
    assert [t for t, *_ in _terms("カタカナ")] == ["カタ", "タカ", "カナ"]
    assert [t for t, *_ in _terms("ｶﾀｶﾅ")] == ["カタ", "タカ", "カナ"]
    assert [t for t, *_ in _terms("コンピューター")] == [
        "コン", "ンピ", "ピュ", "ュー", "ータ", "ター",
    ]


def test_bigram_output_unigram():
    # outputUnigram=true emits Single unigrams alongside Double bigrams
    # (cjk_bigram.go unigram+bigram mode)
    f = make_cjk_bigram_filter(output_unigram=True)
    toks = [
        Token("一", 1, 0, 3, "Ideographic"),
        Token("丁", 2, 3, 6, "Ideographic"),
        Token("丂", 3, 6, 9, "Ideographic"),
    ]
    out = [(t.term, t.type) for t in f(toks)]
    assert ("一丁", "Double") in out and ("丁丂", "Double") in out
    singles = [t for t, typ in out if typ == "Single"]
    assert singles == ["一", "丁", "丂"]


def test_bigram_flush_on_punct_gap():
    # non-adjacent runes (byte gap) do not bigram across the gap
    f = make_cjk_bigram_filter()
    toks = [
        Token("一", 1, 0, 3, "Ideographic"),
        Token("二", 2, 10, 13, "Ideographic"),
    ]
    out = [(t.term, t.type) for t in f(toks)]
    assert out == [("一", "Single"), ("二", "Single")]
