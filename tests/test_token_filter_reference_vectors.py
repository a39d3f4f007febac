"""Reference token-filter vector tables, ported verbatim:

- analysis/token/apostrophe/apostrophe_test.go (Turkish examples)
- analysis/token/reverse/reverse_test.go (combining marks, symbols)
- analysis/token/truncate/truncate_test.go (rune-truncation: CJK, Thai)
"""

import pytest

from bleve_ray.analysis.token_filters import (
    apostrophe_filter,
    make_truncate_filter,
    reverse_filter,
)
from bleve_ray.analysis.tokenizers import Token


def _toks(*terms):
    return [
        Token(term=t, position=i + 1, start=0, end=len(t))
        for i, t in enumerate(terms)
    ]


APOSTROPHE_VECTORS = [
    ("Türkiye'de", "Türkiye"),
    ("2003'te", "2003"),
    ("Van", "Van"),
    ("Gölü'nü", "Gölü"),
    ("gördüm", "gördüm"),
]


@pytest.mark.parametrize("inp,want", APOSTROPHE_VECTORS)
def test_apostrophe_vectors(inp, want):
    out = apostrophe_filter(_toks(inp))
    assert [t.term for t in out] == [want]


REVERSE_VECTORS = [
    ("", ""),
    ("one", "eno"),
    ("TWo", "oWT"),
    ("thRee", "eeRht"),
    ("four's", "s'ruof"),
    ("what's this in reverse", "esrever ni siht s'tahw"),
    ("œ∑´®†", "†®´∑œ"),
    ("İȺȾCAT÷≥≤µ123", "321µ≤≥÷TACȾȺİ"),
    ("!@#$%^&*()", ")(*&^%$#@!"),
    ("cafés", "séfac"),
    ("¿Dónde estás?", "?sátse ednóD¿"),
    ("Me gustaría una cerveza.", ".azevrec anu aíratsug eM"),
]


def test_reverse_vectors():
    out = reverse_filter(_toks(*[v[0] for v in REVERSE_VECTORS]))
    assert [t.term for t in out] == [v[1] for v in REVERSE_VECTORS]


TRUNCATE_VECTORS = [
    (5, "abcdefgh", "abcde"),
    (3, "こんにちは世界", "こんに"),
    (10, "แยกคำภาษาไทยก็ทำได้นะจ้ะ", "แยกคำภาษาไ"),
]


@pytest.mark.parametrize("length,inp,want", TRUNCATE_VECTORS)
def test_truncate_vectors(length, inp, want):
    f = make_truncate_filter(length)
    out = f(_toks(inp))
    assert [t.term for t in out] == [want]


# --- registry surface (registry/tokenfilter.go role) -------------------------


def test_token_filter_registry():
    from bleve_ray.analysis.token_filters import (
        registered_token_filters,
        token_filter_named,
    )
    from bleve_ray.analysis.tokenizers import Token

    names = registered_token_filters()
    # every reference-registered stemmer name resolves
    for want in [
        "stemmer_porter", "stemmer_snowball", "stemmer_en_snowball",
        "stemmer_en_plural", "stemmer_es_snowball", "stemmer_fr_snowball",
        "stemmer_fr_min", "stemmer_de_snowball", "stemmer_it_snowball",
        "to_lower", "stop_tokens", "dict_compound", "cjk_bigram",
    ]:
        assert want in names, want
    f = token_filter_named("stemmer_porter")
    out = f([Token(term="walking", position=1, start=0, end=7)])
    assert out[0].term == "walk"
    import pytest as _pytest

    with _pytest.raises(KeyError):
        token_filter_named("nope")
