from bleve_ray.analysis.analyzers import make_custom_analyzer
from bleve_ray.analysis.char_filters import (
    ascii_folding_filter,
    html_char_filter,
    make_regexp_char_filter,
    zero_width_non_joiner_filter,
)
from bleve_ray.analysis.token_filters import lowercase_filter
from bleve_ray.analysis.tokenizers import UnicodeTokenizer


def test_html_char_filter():
    assert html_char_filter("<p>Hello <b>World</b>&amp;</p>").split() == [
        "Hello",
        "World",
    ]
    # offsets preserved: replacement is space-padded to the same length
    s = "<i>x</i>"
    assert len(html_char_filter(s)) == len(s)


def test_ascii_folding():
    assert ascii_folding_filter("Café Zürich naïve œuvre ß") == (
        "Cafe Zurich naive oeuvre ss"
    )
    assert ascii_folding_filter("plain ascii") == "plain ascii"


def test_regexp_char_filter():
    f = make_regexp_char_filter(r"[0-9]+", "#")
    assert f("abc123def") == "abc#def"


def test_zwnj():
    assert zero_width_non_joiner_filter("a‌b") == "a b"


def test_custom_analyzer_with_char_filters():
    a = make_custom_analyzer(
        "html_lower",
        UnicodeTokenizer(),
        token_filters=[lowercase_filter],
        char_filters=[html_char_filter, ascii_folding_filter],
        register=False,
    )
    assert a.terms("<div>Héllo <span>WORLD</span></div>") == ["hello", "world"]
