"""analysis/token/hierarchy/hierarchy_test.go conformance (10-229)."""

import pytest

from bleve_ray.analysis.token_filters import make_hierarchy_filter
from bleve_ray.analysis.tokenizers import Token


def toks(*terms):
    return [Token(t, 0, -1, -1, "AlphaNumeric") for t in terms]


CASES = [
    # (input tokens, delimiter, max, split_input, expected terms)
    (["a/b/c"], "/", 10, True, ["a", "a/b", "a/b/c"]),
    (["a", "b", "c"], "/", 10, True, ["a", "a/b", "a/b/c"]),
    (["a/b/c"], "/", 2, True, ["a", "a/b"]),
    (["a", "b", "c"], "/", 2, True, ["a", "a/b"]),
    (["a/b/c"], "/", 10, False, ["a/b/c"]),
    (["a", "b", "c"], "/", 10, False, ["a", "a/b", "a/b/c"]),
]


@pytest.mark.parametrize("inp,delim,mx,split,want", CASES,
                         ids=[f"{i}" for i in range(len(CASES))])
def test_hierarchy_filter(inp, delim, mx, split, want):
    f = make_hierarchy_filter(delim, mx, split)
    out = f(toks(*inp))
    assert [t.term for t in out] == want
    for t in out:
        assert t.type == "Shingle"
        assert t.position == 1
        assert t.start == 0
        assert t.end == len(t.term.encode("utf-8"))
