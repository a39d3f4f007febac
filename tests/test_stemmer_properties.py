"""Property tests for the round-5 stemmers and numeric codec:

- stemmers never crash, never lengthen a word beyond input+3 (the only
  growth rules append a single marker like 'e'/marked vowels), and
  produce a prefix-stable result for pure-ASCII English (porter).
- prefix-coded int64 terms preserve sortable ORDER at shift 0 and
  round-trip exactly (the property the trie search relies on).
"""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from bleve_ray.analysis.stemmers_extra import (
    french_minimal_stem,
    french_snowball_stem,
    german_snowball_stem,
    italian_snowball_stem,
    porter1_stem,
    spanish_snowball_stem,
)
from bleve_ray.index.numeric import (
    decode_prefix_coded,
    prefix_coded_int64,
)

WORDS = st.text(
    alphabet=string.ascii_lowercase + "àèéìòùäöüßñç'",
    min_size=0,
    max_size=24,
)

STEMMERS = [
    porter1_stem,
    spanish_snowball_stem,
    french_snowball_stem,
    german_snowball_stem,
    italian_snowball_stem,
    french_minimal_stem,
]


@settings(max_examples=300, deadline=None)
@given(WORDS)
def test_stemmers_total_and_bounded(word):
    for stem in STEMMERS:
        out = stem(word)
        assert isinstance(out, str)
        # stemming may append at most a few marker chars (e.g. "e",
        # "iqU", umlaut-stripped forms) — never unbounded growth
        assert len(out) <= len(word) + 3


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(-(2**63), 2**63 - 1), min_size=2, max_size=8))
def test_prefix_coded_order_preserved(values):
    values = sorted(set(values))
    terms = [prefix_coded_int64(v, 0) for v in values]
    # lexicographic term order == numeric order (the dictionary-range
    # scan property numeric/date range searchers rely on)
    assert terms == sorted(terms)
    for v, t in zip(values, terms):
        back, shift = decode_prefix_coded(t)
        assert (back, shift) == (v, 0)
