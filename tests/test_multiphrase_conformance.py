"""Searcher conformance over the reference's twoDocIndex fixture
(search/searcher/base_test.go:86-113):
- TestMultiPhraseSearch (search_phrase_test.go:113-163)
- TestFuzzyMultiPhraseSearch (search_phrase_test.go:165-239)
- TestConjunctionSearch (search_conjunction_test.go:28-232): exact
  tf-idf scores incl. nested conjunctions and per-clause boosts
- TestDisjunctionSearch (search_disjunction_test.go:26-147): exact
  scores incl. a nested disjunction's coord factors
- TestBooleanSearch (search_boolean_test.go:25-382): must/should/
  must_not compositions with exact scores (the searcher-level
  pure-must_not case is intentionally omitted: the public query
  surface wraps match_all per the reference's query layer)

Fuzzy slots expand against the field dictionary within the given edit
distance before positional verification (NewMultiPhraseSearcher with
fuzziness), matching the reference's candidate expansion."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bleve_ray.index import FieldConfig, IndexOptions, build_index
from bleve_ray.search import Index


@pytest.fixture(scope="module")
def two_doc_index(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("twodoc")
    src = str(tmp / "docs.parquet")
    pq.write_table(
        pa.table({
            "doc_id": ["1", "2", "3", "4", "5"],
            "name": ["marty", "steve", "dustin", "ravi", "bobert"],
            "desc": [
                "beer beer beer beer",
                "angst beer couch database",
                "apple beer column dank",
                " ".join(["beer"] * 65),
                "water",
            ],
            "title": [None, "mister", "mister", None, "mister"],
            "street": ["couchbase way", "couchbase way", None, None, None],
        }),
        src,
    )
    out = str(tmp / "idx")
    build_index(
        [src], out,
        IndexOptions(
            fields={
                "name": FieldConfig(analyzer="ascii_alnum_lower"),
                "desc": FieldConfig(analyzer="ascii_alnum_lower",
                                    positions=True),
                "title": FieldConfig(analyzer="ascii_alnum_lower"),
                "street": FieldConfig(analyzer="ascii_alnum_lower"),
            },
            doc_id_fields=["doc_id"], num_shards=1, bucket_bits=8,
            scoring_model="tfidf",
        ),
    )
    return Index.open(out)


def _ids(idx, terms, fuzziness=0):
    res = idx.search({"query": {
        "terms": terms, "field": "desc", "fuzziness": fuzziness,
    }, "size": 10})
    return sorted(h.id for h in res.hits)


def test_multi_phrase_search(two_doc_index):
    assert _ids(two_doc_index, [["angst", "what"], ["beer"]]) == ["2"]


FUZZY_CASES = [
    ([["pale", "anger"], ["best"], ["colon", "porch"]], 2, ["2", "3"]),
    ([["pale", "anger"], [], ["colon", "porch", "could"]], 1, []),
    ([["app"], ["best"], ["volume"]], 2, ["3"]),
    ([["anger", "pale", "bar"], ["beard"], [], []], 2,
     ["1", "2", "3", "4"]),
    ([["anger", "pale", "bar"], [], ["beard"], []], 2, ["1", "4"]),
]


@pytest.mark.parametrize("phrase,fuzz,want", FUZZY_CASES)
def test_fuzzy_multi_phrase_search(two_doc_index, phrase, fuzz, want):
    assert _ids(two_doc_index, phrase, fuzz) == want


# --- exact-score vectors over the same fixture --------------------------

def _score_hits(idx, query):
    res = idx.search({"query": query, "size": 10, "explain": True})
    return {h.id: h.score for h in res.hits}


def T(term, field, boost=None):
    q = {"term": term, "field": field}
    if boost is not None:
        q["boost"] = boost
    return q


CONJUNCTION_CASES = [
    ({"conjuncts": [T("beer", "desc"), T("marty", "name", 5.0)]},
     {"1": 2.0097428702814377}),
    ({"conjuncts": [T("angst", "desc"), T("beer", "desc")]},
     {"2": 1.0807601687084403}),
    ({"conjuncts": [T("beer", "desc"), T("jack", "name", 5.0)]}, {}),
    ({"conjuncts": [T("beer", "desc"), T("mister", "title", 5.0)]},
     {"2": 1.2877980334016337, "3": 1.2877980334016337}),
    ({"conjuncts": [T("couchbase", "street"), T("mister", "title", 5.0)]},
     {"2": 1.4436599157093672}),
    ({"conjuncts": [
        T("beer", "desc", 5.0),
        {"conjuncts": [T("couchbase", "street"),
                       T("mister", "title", 5.0)]},
    ]}, {"2": 1.441614953806971}),
]


@pytest.mark.parametrize("query,want", CONJUNCTION_CASES,
                         ids=[f"conj{i}" for i in range(len(CONJUNCTION_CASES))])
def test_conjunction_scores(two_doc_index, query, want):
    got = _score_hits(two_doc_index, query)
    assert set(got) == set(want)
    for doc, score in want.items():
        assert got[doc] == pytest.approx(score, abs=1e-3)


DISJUNCTION_CASES = [
    ({"disjuncts": [T("marty", "name"), T("dustin", "name")], "min": 0},
     {"1": 0.6775110856165737, "3": 0.6775110856165737}),
    # nested disjunction: ravi OR (marty OR dustin)
    ({"disjuncts": [
        T("ravi", "name"),
        {"disjuncts": [T("marty", "name"), T("dustin", "name")], "min": 0},
    ], "min": 0},
     {"1": 0.2765927424732821, "3": 0.2765927424732821,
      "4": 0.5531854849465642}),
]


@pytest.mark.parametrize("query,want", DISJUNCTION_CASES,
                         ids=[f"disj{i}" for i in range(len(DISJUNCTION_CASES))])
def test_disjunction_scores(two_doc_index, query, want):
    got = _score_hits(two_doc_index, query)
    assert set(got) == set(want)
    for doc, score in want.items():
        assert got[doc] == pytest.approx(score, abs=1e-3)


BOOLEAN_CASES = [
    # must beer, should marty|dustin, mustnot steve
    ({"must": [T("beer", "desc")],
      "should": [T("marty", "name"), T("dustin", "name")],
      "must_not": [T("steve", "name")]},
     {"1": 0.9818005051949021, "3": 0.808709699395535,
      "4": 0.34618161159873423}),
    # should-only with mustnot
    ({"should": [T("marty", "name"), T("dustin", "name")],
      "must_not": [T("steve", "name")]},
     {"1": 0.6775110856165737, "3": 0.6775110856165737}),
    # must beer, mustnot steve
    ({"must": [T("beer", "desc")], "must_not": [T("steve", "name")]},
     {"1": 1.0, "3": 0.5, "4": 1.0}),
    # must beer, mustnot steve|marty
    ({"must": [T("beer", "desc")],
      "must_not": [T("steve", "name"), T("marty", "name")]},
     {"3": 0.5, "4": 1.0}),
]


@pytest.mark.parametrize("query,want", BOOLEAN_CASES,
                         ids=[f"bool{i}" for i in range(len(BOOLEAN_CASES))])
def test_boolean_scores(two_doc_index, query, want):
    got = _score_hits(two_doc_index, query)
    assert set(got) == set(want)
    for doc, score in want.items():
        assert got[doc] == pytest.approx(score, abs=1e-3)


def test_conjunction_of_boolean_and_boosted_term(two_doc_index):
    """search_boolean_test.go test 7 (conjunctionSearcher8): boolean
    (must beer, should marty|dustin, mustnot steve) AND dustin^5."""
    got = _score_hits(two_doc_index, {"conjuncts": [
        {"must": [T("beer", "desc")],
         "should": [T("marty", "name"), T("dustin", "name")],
         "must_not": [T("steve", "name")]},
        T("dustin", "name", 5.0),
    ]})
    assert set(got) == {"3"}
    assert got["3"] == pytest.approx(2.0681575785068107, abs=1e-3)


def test_conjunction_of_boosted_term_and_mustonly_boolean(two_doc_index):
    """search_boolean_test.go test 6 (conjunctionSearcher7): marty^5 AND
    boolean(must beer)."""
    got = _score_hits(two_doc_index, {"conjuncts": [
        T("marty", "name", 5.0),
        {"must": [T("beer", "desc")]},
    ]})
    assert set(got) == {"1"}
    assert got["1"] == pytest.approx(2.0097428702814377, abs=1e-3)


# --- TestTermRangeSearch (search_term_range_test.go:40-200) --------------

TERM_RANGE_CASES = [
    # (min, max, inclusive_min, inclusive_max, want ids)
    ("marty", "marty", True, True, ["1"]),
    ("marty", "ravi", True, True, ["1", "4"]),
    ("marty", "ravi", True, False, ["1"]),
    ("martz", "ravi", True, False, []),
    ("marty", "ravi", False, True, ["4"]),
    ("marty", "rav", False, True, []),
    ("marty", None, True, True, ["1", "2", "4"]),
    (None, "ravi", True, True, ["1", "3", "4", "5"]),
    (None, None, True, True, ["1", "2", "3", "4", "5"]),
    (None, None, False, True, ["1", "2", "3", "4", "5"]),
    (None, None, True, False, ["1", "2", "3", "4", "5"]),
]


@pytest.mark.parametrize(
    "mn,mx,imin,imax,want", TERM_RANGE_CASES,
    ids=[f"tr{i}" for i in range(len(TERM_RANGE_CASES))],
)
def test_term_range_search(two_doc_index, mn, mx, imin, imax, want):
    q = {"field": "name", "inclusive_min": imin, "inclusive_max": imax}
    if mn is not None:
        q["min"] = mn
    if mx is not None:
        q["max"] = mx
    if mn is None and mx is None:
        # min and max both nil -> full dictionary scan via wildcard range
        q["min"] = ""
    r = two_doc_index.search({"query": q, "size": 10})
    assert sorted(h.id for h in r.hits) == want
