"""Two more reference vector tables:

- TestLiteralPrefix (index/scorch/regexp_test.go:22-57): the literal
  prefix used to bound the dictionary scan for regexp queries.  Two
  departures, both SOUND improvements documented inline: the repo
  descends into a leading literal group (``(hello)world`` prunes with
  "hello" where the reference's automaton walk gives up) and treats the
  group-vs-empty cases through _regex_literal_prefixes.
- TestWeb (analysis/tokenizer/web/web_test.go): emails, URLs, mentions
  and hashtags survive as single tokens with exact byte offsets.
"""

import pytest

from bleve_ray.analysis.tokenizers import make_web_tokenizer
from bleve_ray.search.query import (
    _regex_literal_prefix,
    _regex_literal_prefixes,
)

LITERAL_PREFIX_VECTORS = [
    ("", ""),
    ("hello", "hello"),
    ("hello.?", "hello"),
    ("hello$", "hello"),
    (r"[h][e][l][l][o].*world", "hello"),
    (r"[h-h][e-e][l-l][l-l][o-o].*world", "hello"),
    (".*", ""),
    ("h.*", "h"),
    ("h.?", "h"),
    ("h[a-z]", "h"),
    (r"h\s", "h"),
    (r"日本語", "日本語"),
    (r"日本語\w", "日本語"),
    (r"^hello", ""),
    (r"^", ""),
    (r"$", ""),
    (r"(?i)mArTy", ""),
]


@pytest.mark.parametrize("pattern,want", LITERAL_PREFIX_VECTORS)
def test_literal_prefix_vectors(pattern, want):
    assert _regex_literal_prefix(pattern) == want


def test_literal_prefix_group_departure():
    # the reference automaton walk yields "" for a leading group; the
    # repo prunes with the group's literal branches — sound and tighter
    assert _regex_literal_prefixes("(hello)world") == ["hello"]
    assert sorted(_regex_literal_prefixes("(foo|bar)rest")) == [
        "bar", "foo",
    ]


WEB_VECTORS = [
    (
        "Hello info@blevesearch.com",
        [("Hello", 1, 0, 5), ("info@blevesearch.com", 2, 6, 26)],
    ),
    (
        "That http://blevesearch.com",
        [("That", 1, 0, 4), ("http://blevesearch.com", 2, 5, 27)],
    ),
    (
        "Hey @blevesearch",
        [("Hey", 1, 0, 3), ("@blevesearch", 2, 4, 16)],
    ),
    (
        "This #bleve",
        [("This", 1, 0, 4), ("#bleve", 2, 5, 11)],
    ),
    (
        "What about @blevesearch?",
        [("What", 1, 0, 4), ("about", 2, 5, 10),
         ("@blevesearch", 3, 11, 23)],
    ),
]


@pytest.mark.parametrize("inp,want", WEB_VECTORS)
def test_web_tokenizer_vectors(inp, want):
    tok = make_web_tokenizer()
    got = [(t.term, t.position, t.start, t.end) for t in tok.tokenize(inp)]
    assert got == want
