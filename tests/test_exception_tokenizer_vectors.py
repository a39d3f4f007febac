"""Exception tokenizer vectors
(analysis/tokenizer/exception/exception_test.go): regex-protected spans
pass through whole; the remainder re-tokenizes with the child unicode
tokenizer; positions stay sequential and offsets byte-exact."""

import pytest

from bleve_ray.analysis.tokenizers import (
    ExceptionTokenizer,
    UnicodeTokenizer,
)

URL_PATTERNS = [
    r"[hH][tT][tT][pP][sS]?://(\S)*",
    r"[fF][iI][lL][eE]://(\S)*",
    r"[fF][tT][pP]://(\S)*",
]

VECTORS = [
    (
        "test http://blevesearch.com/ words",
        URL_PATTERNS,
        [
            ("test", 1, 0, 4),
            ("http://blevesearch.com/", 2, 5, 28),
            ("words", 3, 29, 34),
        ],
    ),
    (
        "what ftp://blevesearch.com/ songs",
        URL_PATTERNS,
        [
            ("what", 1, 0, 4),
            ("ftp://blevesearch.com/", 2, 5, 27),
            ("songs", 3, 28, 33),
        ],
    ),
    (
        "please email marty@couchbase.com the URL https://blevesearch.com/",
        URL_PATTERNS + [r"\S+@\S+"],
        [
            ("please", 1, 0, 6),
            ("email", 2, 7, 12),
            ("marty@couchbase.com", 3, 13, 32),
            ("the", 4, 33, 36),
            ("URL", 5, 37, 40),
            ("https://blevesearch.com/", 6, 41, 65),
        ],
    ),
]


@pytest.mark.parametrize("inp,patterns,want", VECTORS)
def test_exception_tokenizer_vectors(inp, patterns, want):
    tok = ExceptionTokenizer(patterns, UnicodeTokenizer())
    got = [(t.term, t.position, t.start, t.end) for t in tok.tokenize(inp)]
    assert got == want
