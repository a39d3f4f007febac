"""Constant scorer vectors (search/scorer/scorer_constant_test.go):
score math and the exact explanation tree shape, with and without a
query norm."""

from bleve_ray.search.scorer import ConstantScorer, constant_explanation


def test_constant_scorer_simple():
    s = ConstantScorer(1, 1)
    assert s.score_value() == 1.0
    e = constant_explanation(s, "one")
    assert e["value"] == 1.0
    assert e["message"] == "ConstantScore()"
    assert "children" not in e


def test_constant_scorer_with_query_norm():
    s = ConstantScorer(1, 1)
    s.set_query_norm(2.0)
    assert s.score_value() == 2.0
    e = constant_explanation(s, "one")
    assert e["value"] == 2.0
    assert e["message"] == "weight(^1.000000), product of:"
    kids = e["children"]
    assert kids[0]["value"] == 2.0
    assert kids[0]["message"] == "ConstantScore()^1.000000, product of:"
    assert [
        (c["value"], c["message"]) for c in kids[0]["children"]
    ] == [(1.0, "boost"), (2.0, "queryNorm")]
    assert kids[1] == {"value": 1.0, "message": "ConstantScore()"}
