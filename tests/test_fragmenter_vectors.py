"""search/highlight/fragmenter/simple/simple_test.go conformance:
TestSimpleFragmenter (24-251) and TestSimpleFragmenterWithSize
(252-310), run against fragment_byte_spans (byte-exact) and the
char-offset simple_fragmenter wrapper."""

import pytest

from bleve_ray.search.highlight import fragment_byte_spans, simple_fragmenter

HINDI = ("[[पानी का स्वाद]] [[नीलेश रघुवंशी]] का कविता संग्रह हैं। इस कृति "
         "के लिए उन्हें २००४ में [[केदार सम्मान]] से सम्मानित किया गया "
         "है।{{केदार सम्मान से सम्मानित कृतियाँ}}")

D100 = b"0123456789" * 10
D101 = D100 + b"0"

CASES = [
    # (orig_bytes, [(term_start, term_end)], size, expected [(start, end)])
    (b"this is a test", [(10, 14)], 100, [(0, 14)]),
    (D100, [(0, 100)], 100, [(0, 100)]),
    (D101, [(i * 10, i * 10 + 10) for i in range(10)], 100,
     [(0, 100)] + [(i * 10, 101) for i in range(1, 10)]),
]


@pytest.mark.parametrize("orig,locs,size,want", CASES,
                         ids=["simple", "exact100", "eleven-fragments"])
def test_simple_fragmenter_bytes(orig, locs, size, want):
    assert fragment_byte_spans(orig, locs, size) == want


def test_fragmenter_hindi_multibyte():
    """simple_test.go:189-206 (Devanagari, size 200): the 165-rune string
    fits one fragment covering all 411 bytes."""
    orig = HINDI.encode("utf-8")
    assert fragment_byte_spans(orig, [(2, 14)], 200) == [(0, 411)]


def test_fragmenter_cjk_bigrams():
    """simple_test.go:207-236: overlapping CJK bigram locations yield one
    fragment per location, maxbegin keeping the second from backing up."""
    orig = "交换机".encode("utf-8")
    assert fragment_byte_spans(orig, [(0, 6), (3, 9)], 200) == \
        [(0, 9), (3, 9)]


WITH_SIZE_CASES = [
    (b"this is a test", [(0, 5), (10, 14)], 5, [(0, 5), (9, 14)]),
    ("避免出现 rune 越界问题".encode("utf-8"), [], 5, [(0, 13)]),
]


@pytest.mark.parametrize("orig,locs,size,want", WITH_SIZE_CASES,
                         ids=["two-frags", "cjk-head"])
def test_simple_fragmenter_with_size(orig, locs, size, want):
    assert fragment_byte_spans(orig, locs, size) == want


def test_char_offset_wrapper_matches_bytes():
    text = "避免出现 rune 越界问题"
    # char span for "rune" (chars 5..9)
    frags = simple_fragmenter(text, [(5, 9, "rune")], 8)
    assert len(frags) == 1
    s, e = frags[0]
    assert 0 <= s < e <= len(text)
    assert "rune" in text[s:e]
    assert len(text[s:e]) == 8  # window is 8 runes
