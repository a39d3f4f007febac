"""Reference facet Merge+Fixup golden vectors
(search/facets_builder_test.go: TestTermFacetResultsMerge,
TestNumericFacetResultsMerge, TestDateFacetResultsMerge) against the
alias-level merge (_merge_facet_results): totals/missing/other sum,
counts merge by term/range name, one sorted fixup moves dropped counts
into other."""

from bleve_ray.search.distributed import _merge_facet_results


def test_term_facet_results_merge_fixup():
    frs1 = {
        "types": {
            "field": "type", "total": 100, "missing": 25, "other": 25,
            "terms": [
                {"term": "blog", "count": 25},
                {"term": "comment", "count": 24},
                {"term": "feedback", "count": 1},
            ],
        },
        "categories": {
            "field": "category", "total": 97, "missing": 22, "other": 15,
            "terms": [
                {"term": "clothing", "count": 35},
                {"term": "electronics", "count": 25},
            ],
        },
    }
    frs2 = {
        "types": {
            "field": "type", "total": 100, "missing": 25, "other": 25,
            "terms": [
                {"term": "blog", "count": 25},
                {"term": "comment", "count": 22},
                {"term": "flag", "count": 3},
            ],
        }
    }
    requests = {
        "types": {"field": "type", "size": 3},
        "categories": {"field": "category", "size": 10},
    }
    got = _merge_facet_results(requests, [frs1, frs2])
    assert got["types"] == {
        "field": "type", "total": 200, "missing": 50, "other": 51,
        "terms": [
            {"term": "blog", "count": 50},
            {"term": "comment", "count": 46},
            {"term": "flag", "count": 3},
        ],
    }
    # single-member facet passes through unchanged
    assert got["categories"]["total"] == 97
    assert got["categories"]["terms"] == frs1["categories"]["terms"]


def test_term_facet_merge_nil_terms_side():
    # facets_builder_test.go case 2: first side has no terms at all
    frs1 = {
        "facetName": {
            "field": "docField", "total": 0, "missing": 0, "other": 0,
            "terms": [],
        }
    }
    frs2 = {
        "facetName": {
            "field": "docField", "total": 3, "missing": 0, "other": 0,
            "terms": [
                {"term": "firstTerm", "count": 1},
                {"term": "secondTerm", "count": 2},
            ],
        }
    }
    got = _merge_facet_results(
        {"facetName": {"field": "docField", "size": 1}}, [frs1, frs2]
    )
    assert got["facetName"] == {
        "field": "docField", "total": 3, "missing": 0, "other": 1,
        "terms": [{"term": "secondTerm", "count": 2}],
    }


def test_numeric_facet_results_merge_fixup():
    fr1 = {
        "ratings": {
            "field": "rating", "total": 100, "missing": 25, "other": 25,
            "numeric_ranges": [
                {"name": "low", "max": 3.0, "min": None, "count": 25},
                {"name": "med", "max": 3.0, "min": 6.0, "count": 24},
                {"name": "hi", "min": 6.0, "max": 9.0, "count": 1},
            ],
        }
    }
    fr2 = {
        "ratings": {
            "field": "rating", "total": 100, "missing": 25, "other": 25,
            "numeric_ranges": [
                {"name": "low", "max": 3.0, "min": None, "count": 25},
                {"name": "med", "max": 3.0, "min": 6.0, "count": 22},
                {"name": "highest", "min": 9.0, "max": None, "count": 3},
            ],
        }
    }
    got = _merge_facet_results(
        {"ratings": {"field": "rating", "size": 3}}, [fr1, fr2]
    )
    assert got["ratings"] == {
        "field": "rating", "total": 200, "missing": 50, "other": 51,
        "numeric_ranges": [
            {"name": "low", "max": 3.0, "min": None, "count": 50},
            {"name": "med", "max": 3.0, "min": 6.0, "count": 46},
            {"name": "highest", "min": 9.0, "max": None, "count": 3},
        ],
    }


def test_date_facet_results_merge_fixup():
    fr1 = {
        "dates": {
            "field": "when", "total": 100, "missing": 25, "other": 25,
            "date_ranges": [
                {"name": "low", "end": "2010-01-01", "start": None,
                 "count": 25},
                {"name": "med", "start": "2010-01-01",
                 "end": "2011-01-01", "count": 24},
                {"name": "hi", "start": "2011-01-01",
                 "end": "2012-01-01", "count": 1},
            ],
        }
    }
    fr2 = {
        "dates": {
            "field": "when", "total": 100, "missing": 25, "other": 25,
            "date_ranges": [
                {"name": "low", "end": "2010-01-01", "start": None,
                 "count": 25},
                {"name": "med", "start": "2010-01-01",
                 "end": "2011-01-01", "count": 22},
                {"name": "highest", "start": "2012-01-01", "end": None,
                 "count": 3},
            ],
        }
    }
    got = _merge_facet_results(
        {"dates": {"field": "when", "size": 3}}, [fr1, fr2]
    )
    assert got["dates"]["total"] == 200
    assert got["dates"]["missing"] == 50
    assert got["dates"]["other"] == 51
    assert [b["name"] for b in got["dates"]["date_ranges"]] == [
        "low", "med", "highest"
    ]
    assert [b["count"] for b in got["dates"]["date_ranges"]] == [50, 46, 3]
