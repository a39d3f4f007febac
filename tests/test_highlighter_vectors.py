"""Highlighter formatter/scorer vectors:

- TestSimpleHighlighter
  (search/highlight/highlighter/simple/highlighter_simple_test.go:32-66):
  the exact ANSI fragment over "the quick brown fox jumps over the lazy
  dog" with matches on quick + fox.
- TestHTMLFragmentFormat[er] escaping vectors
  (search/highlight/format/html/html_test.go): non-markup segments
  Go-html-escaped around the highlight tags.
- TestSimpleFragmentScorer
  (search/highlight/highlighter/simple/fragment_scorer_simple_test.go):
  +1 per distinct matched term inside the fragment.
"""

from bleve_ray.analysis.analyzers import analyzer_named
from bleve_ray.search.highlight import (
    highlight_text,
    score_fragment,
)

ANSI_ON = "\x1b[43m"
ANSI_OFF = "\x1b[0m"


def test_simple_highlighter_ansi():
    an = analyzer_named("standard")
    frags = highlight_text(
        "the quick brown fox jumps over the lazy dog",
        {"quick", "fox"},
        an,
        style="ansi",
        fragment_size=100,
    )
    assert frags == [
        f"the {ANSI_ON}quick{ANSI_OFF} brown {ANSI_ON}fox{ANSI_OFF} "
        "jumps over the lazy dog"
    ]


def test_html_format_escaping():
    an = analyzer_named("standard")
    frags = highlight_text(
        "<the> quick brown & fox",
        {"quick"},
        an,
        style="html",
        fragment_size=100,
    )
    assert frags == ["&lt;the&gt; <mark>quick</mark> brown &amp; fox"]


def test_html_format_basic():
    an = analyzer_named("standard")
    frags = highlight_text(
        "the quick brown fox", {"quick"}, an, style="html",
        fragment_size=100,
    )
    assert frags == ["the <mark>quick</mark> brown fox"]


def test_fragment_scorer_distinct_terms():
    # spans are (start, end, term); the fragment [0, 14) over
    # "cat in the hat"
    assert score_fragment([(0, 3, "cat")], 0, 14) == 1
    assert score_fragment([(0, 3, "cat"), (11, 14, "hat")], 0, 14) == 2
    # the same term twice scores once (distinct terms, not occurrences)
    assert score_fragment([(0, 3, "cat"), (11, 14, "cat")], 0, 14) == 1
    # matches outside the fragment window don't score
    assert score_fragment([(0, 3, "cat"), (11, 14, "hat")], 0, 5) == 1
