"""TestSearchResultMerge + TestSearchResultFacetsMerge (search_test.go):
SearchResult.Merge sums totals/status, appends hits, maxes score and
merges facets by name."""

from bleve_ray.search.collector import Hit, SearchResult


def _sr(total, max_score, hits, status=None, facets=None):
    return SearchResult(total_hits=total, max_score=max_score, hits=hits,
                        took_ms=0.0, status=status, facets=facets)


def test_search_result_merge():
    l = _sr(1, 1.0, [Hit(id="a", score=1.0, docnum=0)],
            status={"total": 1, "successful": 1, "failed": 0, "errors": {}})
    r = _sr(1, 2.0, [Hit(id="b", score=2.0, docnum=1)],
            status={"total": 1, "successful": 1, "failed": 0, "errors": {}})
    l.merge(r)
    assert l.total_hits == 2
    assert l.max_score == 2.0
    assert [h.id for h in l.hits] == ["a", "b"]
    assert l.status == {"total": 2, "successful": 2, "failed": 0,
                        "errors": {}}


def test_search_result_facets_merge():
    fr = {
        "field": "birthday", "total": 100, "missing": 25, "other": 25,
        "date_ranges": [
            {"name": "low", "end": "2010-01-01", "count": 25},
            {"name": "med", "start": "2010-01-01", "end": "2011-01-01",
             "count": 24},
            {"name": "hi", "start": "2011-01-01", "end": "2012-01-01",
             "count": 1},
        ],
    }
    l = _sr(10, 1.0, [],
            status={"total": 10, "successful": 1, "failed": 0, "errors": {}})
    r = _sr(1, 2.0, [],
            status={"total": 1, "successful": 1, "failed": 0, "errors": {}},
            facets={"birthdays": fr})
    l.merge(r)
    assert l.total_hits == 11
    assert l.max_score == 2.0
    assert l.status["total"] == 11
    assert l.status["successful"] == 2
    assert l.facets == {"birthdays": fr}


def test_facets_merge_sums_counts():
    l = _sr(0, 0.0, [], facets={"tags": {
        "field": "tag", "total": 10, "missing": 1, "other": 2,
        "terms": [{"term": "a", "count": 4}, {"term": "b", "count": 3}],
    }})
    r = _sr(0, 0.0, [], facets={"tags": {
        "field": "tag", "total": 5, "missing": 0, "other": 1,
        "terms": [{"term": "b", "count": 2}, {"term": "c", "count": 2}],
    }})
    l.merge(r)
    f = l.facets["tags"]
    assert (f["total"], f["missing"], f["other"]) == (15, 1, 3)
    assert f["terms"] == [{"term": "b", "count": 5},
                          {"term": "a", "count": 4},
                          {"term": "c", "count": 2}]
