"""Full analyzer-chain vectors for every reference language pack,
extracted verbatim from analysis/lang/*/analyzer_*_test.go
(tests/data/analyzer_chain_vectors.json): tokenizer positions + byte
offsets + stop/stem/normalize composition, end-to-end through the
registered analyzer of the same name.

Vectors whose reference output omits Position/Start/End compare terms
only (that is all the Go test asserts for them too, via a custom
comparator or term-only streams).
"""

import json
import pathlib

import pytest

from bleve_ray.analysis import analyzer_named

VECTORS = json.loads(
    (pathlib.Path(__file__).parent / "data" / "analyzer_chain_vectors.json")
    .read_text(encoding="utf-8")
)

CASES = [
    (lang, i, case)
    for lang, cases in sorted(VECTORS.items())
    for i, case in enumerate(cases)
]


@pytest.mark.parametrize(
    "lang,i,case",
    CASES,
    ids=[f"{lang}-{i}" for lang, i, _ in CASES],
)
def test_analyzer_chain_vector(lang, i, case):
    an = analyzer_named(lang)
    got = an.analyze(case["input"])
    want = case["tokens"]
    assert [t.term for t in got] == [w["term"] for w in want], case["input"]
    for g, w in zip(got, want):
        if w["position"] is not None:
            assert g.position == w["position"], case["input"]
            assert g.start == w["start"], case["input"]
            assert g.end == w["end"], case["input"]
