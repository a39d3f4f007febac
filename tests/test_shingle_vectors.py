"""analysis/token/shingle/shingle_test.go conformance (24-416):
streaming emission order, position-gap fillers, output_original
interleaving, min=1 fillers, and the Bug431 statelessness check."""

from bleve_ray.analysis.token_filters import make_shingle_filter
from bleve_ray.analysis.tokenizers import Token


def toks(*specs):
    out = []
    for s in specs:
        if isinstance(s, str):
            out.append(Token(s, 0, -1, -1, "AlphaNumeric"))
        else:
            term, pos = s
            out.append(Token(term, pos, -1, -1, "AlphaNumeric"))
    return out


def terms(result):
    return [t.term for t in result]


def test_shingle_2_2():
    f = make_shingle_filter(2, 2)
    assert terms(f(toks("the", "quick", "brown", "fox"))) == \
        ["the quick", "quick brown", "brown fox"]


def test_shingle_3_3():
    f = make_shingle_filter(3, 3)
    assert terms(f(toks("the", "quick", "brown", "fox"))) == \
        ["the quick brown", "quick brown fox"]


def test_shingle_2_3_streaming_order():
    """Shingles stream per ENDING token, sizes ascending — not grouped by
    start offset (shingle.go ring emission)."""
    f = make_shingle_filter(2, 3)
    assert terms(f(toks("the", "quick", "brown", "fox"))) == \
        ["the quick", "quick brown", "the quick brown",
         "brown fox", "quick brown fox"]


def test_shingle_position_gap_fillers():
    """Tokens at positions 1,3,4 (stop-word hole at 2) shingle with the
    filler occupying the hole; shingle positions carry the first real
    token's position."""
    f = make_shingle_filter(3, 3)
    out = f(toks(("ugly", 1), ("quick", 3), ("brown", 4)))
    assert [(t.term, t.position) for t in out] == \
        [("ugly _ quick", 1), ("_ quick brown", 3)]


def test_shingle_1_5_with_fillers():
    f = make_shingle_filter(1, 5)
    out = f(toks(("test", 1), ("text", 2), ("see", 4), ("shingles", 5)))
    assert [(t.term, t.position) for t in out] == [
        ("test", 1),
        ("text", 2), ("test text", 1),
        ("_", 0), ("text _", 2), ("test text _", 1),
        ("see", 4), ("_ see", 4), ("text _ see", 2), ("test text _ see", 1),
        ("shingles", 5), ("see shingles", 4), ("_ see shingles", 4),
        ("text _ see shingles", 2), ("test text _ see shingles", 1),
    ]


def test_shingle_output_original():
    f = make_shingle_filter(2, 2, output_original=True)
    assert terms(f(toks("the", "quick", "brown", "fox"))) == \
        ["the", "quick", "the quick", "brown", "quick brown",
         "fox", "brown fox"]


def test_shingle_filter_is_stateless_bug431():
    f = make_shingle_filter(2, 2)
    assert terms(f(toks("the", "quick", "brown", "fox"))) == \
        ["the quick", "quick brown", "brown fox"]
    assert terms(f(toks("a", "sad", "dirty", "sock"))) == \
        ["a sad", "sad dirty", "dirty sock"]
