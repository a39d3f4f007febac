"""Small reference golden-vector ports:
- TestIPRangeQuery (search_test.go:2244-2286)
- TestGeoShapePolygonContainsPoint (:2288-2452)
- TestDuplicateLocationsIssue1168 (:1559-1597)
- TestBooleanMustSingleMatchNone / MustNotSingleMatchNone (:1599-1745)
- TestSearchScoreNone (:1875-1922)
"""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bleve_ray.index import FieldConfig, IndexOptions, build_index
from bleve_ray.search import Index


def _mk(tmp, cols, fields, **opts):
    src = str(tmp / "d.parquet")
    pq.write_table(pa.table(cols), src)
    d = str(tmp / "idx")
    build_index(
        [src],
        d,
        IndexOptions(fields=fields, doc_id_fields=["doc_id"],
                     num_shards=1, bucket_bits=6, **opts),
    )
    return Index.open(d)


def test_ip_range_query(ray_session, tmp_path_factory):
    idx = _mk(
        tmp_path_factory.mktemp("ipq"),
        {"doc_id": pa.array(["doc"]),
         "ip_content": pa.array(["192.168.10.11"])},
        {"ip_content": FieldConfig(field_type="ip", positions=False)},
    )
    res = idx.search(
        {"query": {"cidr": "192.168.10.0/24", "field": "ip_content"},
         "size": 10}
    )
    assert [h.id for h in res.hits] == ["doc"]


POLY1 = {
    "type": "Polygon",
    "coordinates": [[
        [4.8089, 46.9307], [4.8223, 46.8915], [4.8149, 46.886],
        [4.8252, 46.8647], [4.8305, 46.8531], [4.8506, 46.8509],
        [4.8574, 46.8621], [4.8576, 46.8769], [4.8753, 46.8774],
        [4.8909, 46.8519], [4.8837, 46.8485], [4.9014, 46.8318],
        [4.9067, 46.8179], [4.8986, 46.8122], [4.9081, 46.7969],
        [4.9535, 46.8254], [4.9577, 46.8053], [5.0201, 46.821],
        [5.0357, 46.8207], [5.0656, 46.8434], [5.0955, 46.8411],
        [5.1149, 46.8435], [5.1259, 46.8395], [5.1433, 46.8463],
        [5.1415, 46.8589], [5.1533, 46.873], [5.138, 46.8843],
        [5.1525, 46.9012], [5.1485, 46.9165], [5.1582, 46.926],
        [5.1882, 46.9251], [5.2039, 46.9129], [5.2223, 46.9175],
        [5.2168, 46.926], [5.2338, 46.9316], [5.228, 46.9505],
        [5.2078, 46.9722], [5.2117, 46.98], [5.1961, 46.9783],
        [5.1663, 46.9638], [5.1213, 46.9634], [5.1086, 46.9596],
        [5.0729, 46.9604], [5.0731, 46.9668], [5.0493, 46.9817],
        [5.0034, 46.9722], [4.9852, 46.9585], [4.9479, 46.9664],
        [4.8943, 46.9663], [4.8937, 46.951], [4.8534, 46.9458],
        [4.8089, 46.9307],
    ]],
}
POLY2 = {
    "type": "Polygon",
    "coordinates": [[
        [2.2266, 48.7816], [2.2266, 48.7761], [2.2288, 48.7745],
        [2.2717, 48.7905], [2.2799, 48.8109], [2.3013, 48.8251],
        [2.2894, 48.8283], [2.2726, 48.8144], [2.2518, 48.8164],
        [2.255, 48.8101], [2.2348, 48.7954], [2.2266, 48.7816],
    ]],
}


def test_geoshape_polygon_contains_point(ray_session, tmp_path_factory):
    import json

    idx = _mk(
        tmp_path_factory.mktemp("shapecontains"),
        {"doc_id": pa.array(["doc1", "doc2"]),
         "geometry": pa.array([json.dumps(POLY1), json.dumps(POLY2)])},
        {"geometry": FieldConfig(field_type="geoshape", positions=False)},
    )
    for coords, expect in [
        ([5, 46.9], ["doc1"]),
        ([1.5, 48.2], []),
    ]:
        res = idx.search(
            {
                "query": {
                    "geometry": {
                        "shape": {"type": "Point", "coordinates": coords},
                        "relation": "contains",
                    },
                    "field": "geometry",
                },
                "size": 10,
                "score": "none",
            }
        )
        assert sorted(h.id for h in res.hits) == expect, coords


def test_duplicate_locations_issue_1168(ray_session, tmp_path_factory):
    idx = _mk(
        tmp_path_factory.mktemp("dup1168"),
        {"doc_id": pa.array(["x"]), "name": pa.array(["marty"])},
        {"name": FieldConfig(analyzer="keyword", positions=True)},
        store_fields=["name"],
    )
    res = idx.search(
        {
            "query": {"disjuncts": [
                {"term": "marty", "field": "name"},
                {"term": "marty", "field": "name"},
            ]},
            "size": 10,
            "includeLocations": True,
        }
    )
    assert len(res.hits) == 1
    locs = res.hits[0].locations["name"]["marty"]
    assert len(locs) == 1, locs


def test_boolean_must_single_match_none(ray_session, tmp_path_factory):
    """boolean with a must that matches nothing yields no hits even when
    should matches; must_not of match-none changes nothing."""
    idx = _mk(
        tmp_path_factory.mktemp("bmn"),
        {"doc_id": pa.array(["doc1"]),
         "field1": pa.array(["one two three"])},
        {"field1": FieldConfig(analyzer="standard", positions=True)},
    )
    res = idx.search(
        {
            "query": {
                "must": [{"term": "zzzabsent", "field": "field1"}],
                "should": [{"term": "one", "field": "field1"}],
            },
            "size": 10,
        }
    )
    assert res.total_hits == 0
    res = idx.search(
        {
            "query": {
                "must": [{"term": "one", "field": "field1"}],
                "must_not": [{"term": "zzzabsent", "field": "field1"}],
            },
            "size": 10,
        }
    )
    assert res.total_hits == 1


def test_search_score_none(ray_session, tmp_path_factory):
    """score:"none" returns hits with zero scores (search.go options
    Score=none skips scoring entirely)."""
    idx = _mk(
        tmp_path_factory.mktemp("scorenone"),
        {"doc_id": pa.array(["doc1", "doc2"]),
         "country": pa.array(["united states", "united kingdom"])},
        {"country": FieldConfig(analyzer="standard", positions=True)},
    )
    res = idx.search(
        {"query": {"term": "united", "field": "country"},
         "size": 10, "score": "none"}
    )
    assert res.total_hits == 2
    assert all(h.score == 0.0 for h in res.hits)
    scored = idx.search(
        {"query": {"term": "united", "field": "country"}, "size": 10}
    )
    assert all(h.score > 0 for h in scored.hits)


def test_sorted_faceted_query(ray_session, tmp_path_factory):
    """Port of TestSortedFacetedQuery (search_test.go:64-142): facet
    counts are computed over ALL matches even when the request also
    sorts by a field."""
    idx = _mk(
        tmp_path_factory.mktemp("sortfacet"),
        {"doc_id": pa.array(["1", "2", "3"]),
         "country": pa.array(["india"] * 3),
         "content": pa.array(["k", "l", "k"])},
        {"country": FieldConfig(analyzer="en", positions=True),
         "content": FieldConfig(analyzer="en", positions=True)},
        docvalue_fields=["content"],
    )
    res = idx.search(
        {
            "query": {"match_phrase": "india", "field": "country"},
            "size": 10,
            "sort": [{"by": "field", "field": "content"}],
            "facets": {"content_facet": {"field": "content", "size": 100}},
        }
    )
    terms = {t["term"]: t["count"]
             for t in res.facets["content_facet"]["terms"]}
    assert terms == {"k": 2, "l": 1}


def test_facet_request_validation(ray_session, tmp_path_factory):
    """Port of TestFacetNumericDateRangeRequests (search_test.go:387-528):
    range bounds required, unique names, and no mixing numeric with date
    ranges in one facet."""
    idx = _mk(
        tmp_path_factory.mktemp("facetval"),
        {"doc_id": pa.array(["1"]), "n": pa.array([5.0])},
        {"n": FieldConfig(field_type="numeric", positions=False)},
        docvalue_fields=["n"],
    )

    def run(facet):
        return idx.search(
            {"query": {"match_all": {}}, "size": 0,
             "facets": {"f": facet}}
        )

    # successes
    run({"field": "n", "size": 1,
         "numeric_ranges": [{"name": "t", "min": 5.0, "max": 6.0}]})
    run({"field": "n", "size": 1,
         "numeric_ranges": [{"name": "t", "min": 5.0}]})
    run({"field": "n", "size": 1,
         "numeric_ranges": [{"name": "t", "max": 5.0}]})
    # failures
    with pytest.raises(ValueError, match="must specify either min, max"):
        run({"field": "n", "size": 1,
             "numeric_ranges": [{"name": "testName"}]})
    with pytest.raises(ValueError,
                       match="numeric ranges contains duplicate name"):
        run({"field": "n", "size": 1,
             "numeric_ranges": [{"name": "t", "min": 1.0},
                                {"name": "t", "max": 2.0}]})
    with pytest.raises(ValueError,
                       match="date ranges contains duplicate name"):
        run({"field": "n", "size": 1,
             "date_ranges": [{"name": "t", "start": "2001-01-01"},
                             {"name": "t", "end": "2002-01-01"}]})
    with pytest.raises(ValueError,
                       match="numeric ranges or date ranges, not both"):
        run({"field": "n", "size": 1,
             "numeric_ranges": [{"name": "a", "min": 1.0}],
             "date_ranges": [{"name": "b", "start": "2001-01-01"}]})


def test_highlighting_with_regexp_char_filter(ray_session,
                                              tmp_path_factory):
    """Port of TestSearchHighlightingWithRegexpReplacement
    (search_test.go:1972-2035): a regexp char filter rewrites the text
    before tokenizing on BOTH the index and query sides, so the match
    still lands."""
    from bleve_ray.analysis.analyzers import make_custom_analyzer
    from bleve_ray.analysis.char_filters import make_regexp_char_filter
    from bleve_ray.analysis.tokenizers import UnicodeTokenizer

    make_custom_analyzer(
        "regexp_replace",
        UnicodeTokenizer(),
        char_filters=[make_regexp_char_filter(r"([a-z])\s+(\d)",
                                              r"ooooo\1-\2")],
    )
    idx = _mk(
        tmp_path_factory.mktemp("rxhl"),
        {"doc_id": pa.array(["doc"]), "status": pa.array(["fool 10"])},
        {"status": FieldConfig(analyzer="regexp_replace",
                               positions=True)},
        store_fields=["status"],
    )
    res = idx.search(
        {"query": {"match": "fool 10", "field": "status"},
         "size": 10, "highlight": {"style": "ansi"}, "fields": ["*"]}
    )
    assert res.total_hits == 1


def test_highlighting_with_html_char_filter(ray_session,
                                            tmp_path_factory):
    """Port of TestHightlightingWithHTMLCharacterFilter
    (search_test.go:2166-2242): match inside HTML markup; the location's
    byte offsets point into the ORIGINAL stored text."""
    from bleve_ray.analysis.analyzers import make_custom_analyzer
    from bleve_ray.analysis.char_filters import html_char_filter
    from bleve_ray.analysis.tokenizers import UnicodeTokenizer

    make_custom_analyzer(
        "custom-html", UnicodeTokenizer(),
        char_filters=[html_char_filter],
    )
    content = "<div> Welcome to blevesearch. </div>"
    idx = _mk(
        tmp_path_factory.mktemp("htmlhl"),
        {"doc_id": pa.array(["doc"]), "content": pa.array([content])},
        {"content": FieldConfig(analyzer="custom-html", positions=True)},
        store_fields=["content"],
    )
    res = idx.search(
        {"query": {"match": "blevesearch", "field": "content"},
         "size": 10, "includeLocations": True, "fields": ["*"]}
    )
    assert len(res.hits) == 1
    locs = res.hits[0].locations["content"]["blevesearch"]
    assert len(locs) == 1
    assert locs[0]["pos"] == 3
    assert locs[0]["start"] == content.index("blevesearch")
    assert locs[0]["end"] == (content.index("blevesearch")
                              + len("blevesearch"))


def test_multivalue_text_field(ray_session, tmp_path_factory):
    """Array text fields (TestDocumentFieldArrayPositions family,
    index_test.go:1547+): each element indexes as its own field value
    with positions restarting per element; term facets count each
    element."""
    idx = _mk(
        tmp_path_factory.mktemp("mvtext"),
        {"doc_id": pa.array(["1", "2"]),
         "tags": pa.array([["alpha beta", "gamma"], ["delta", "gamma"]],
                          type=pa.list_(pa.string()))},
        {"tags": FieldConfig(analyzer="standard", positions=True)},
        docvalue_fields=["tags"],
    )
    r = idx.search({"query": {"term": "gamma", "field": "tags"},
                    "size": 10})
    assert sorted(h.id for h in r.hits) == ["1", "2"]
    r = idx.search({"query": {"term": "beta", "field": "tags"},
                    "size": 10})
    assert [h.id for h in r.hits] == ["1"]
    # phrase within one element matches; positions restart per element
    r = idx.search(
        {"query": {"match_phrase": "alpha beta", "field": "tags"},
         "size": 10}
    )
    assert [h.id for h in r.hits] == ["1"]
    # facet counts each element
    r = idx.search(
        {"query": {"match_all": {}}, "size": 0,
         "facets": {"t": {"field": "tags", "size": 10}}}
    )
    terms = {t["term"]: t["count"] for t in r.facets["t"]["terms"]}
    assert terms == {"alpha beta": 1, "gamma": 2, "delta": 1}


def test_keyword_search_bug_207(ray_session, tmp_path_factory):
    """Port of TestKeywordSearchBug207 (index_test.go:1652-1744): keyword
    terms that are near-substrings of each other stay distinct, via term
    query AND query string."""
    idx = _mk(
        tmp_path_factory.mktemp("kw207"),
        {"doc_id": pa.array(["a", "b"]),
         "Body": pa.array(["a555c3bb06f7a127cda000005",
                           "555c3bb06f7a127cda000005"])},
        {"Body": FieldConfig(analyzer="keyword", positions=False)},
    )
    for term, expect in [("a555c3bb06f7a127cda000005", "a"),
                         ("555c3bb06f7a127cda000005", "b")]:
        r = idx.search({"query": {"term": term, "field": "Body"},
                        "size": 10})
        assert r.total_hits == 1 and r.hits[0].id == expect
        r = idx.search({"query": {"query": f"Body:{term}"}, "size": 10})
        assert r.total_hits == 1 and r.hits[0].id == expect, term


def test_search_over_empty_keyword(ray_session, tmp_path_factory):
    """Port of TestSearchScorchOverEmptyKeyword (search_test.go:865-926):
    empty keyword field values neither break the build nor the count;
    wildcard over the default field still finds everything."""
    idx = _mk(
        tmp_path_factory.mktemp("emptykw"),
        {"doc_id": pa.array([str(i) for i in range(10)]),
         "name": pa.array([f"test{i}" for i in range(10)]),
         "id": pa.array([""] * 10)},
        {"name": FieldConfig(analyzer="standard", positions=True),
         "id": FieldConfig(analyzer="keyword", positions=False)},
    )
    assert idx.doc_count() == 10
    res = idx.search({"query": {"wildcard": "test*", "field": "name"},
                      "size": 40})
    assert res.total_hits == 10


def test_multivalue_locations_array_positions(ray_session,
                                              tmp_path_factory):
    """Array-field locations carry array_positions and per-element byte
    offsets (TestTermVectorArrayPositions family, index_test.go:1746+)."""
    idx = _mk(
        tmp_path_factory.mktemp("mvloc"),
        {"doc_id": pa.array(["1"]),
         "tags": pa.array([["alpha beta", "gamma beta"]],
                          type=pa.list_(pa.string()))},
        {"tags": FieldConfig(analyzer="standard", positions=True)},
        docvalue_fields=["tags"],
    )
    r = idx.search({"query": {"term": "beta", "field": "tags"},
                    "size": 10, "includeLocations": True})
    locs = r.hits[0].locations["tags"]["beta"]
    assert len(locs) == 2
    assert locs[0]["array_positions"] == [0]
    assert locs[1]["array_positions"] == [1]
    assert (locs[0]["start"], locs[0]["end"]) == (
        "alpha beta".index("beta"), len("alpha beta"))
    assert (locs[1]["start"], locs[1]["end"]) == (
        "gamma beta".index("beta"), len("gamma beta"))


def test_stored_field_type_preserved(ray_session, tmp_path_factory):
    """Port of TestStoredFieldPreserved (index_test.go:1121-1170):
    stored text/bool/number field values come back with their original
    types and values."""
    idx = _mk(
        tmp_path_factory.mktemp("storedpreserve"),
        {"doc_id": pa.array(["a"]),
         "name": pa.array(["Marty"]),
         "desc": pa.array(["GopherCON India"]),
         "bool": pa.array([True]),
         "num": pa.array([1.0])},
        {"name": FieldConfig(analyzer="standard", positions=True),
         "desc": FieldConfig(analyzer="standard", positions=True),
         "bool": FieldConfig(field_type="boolean", positions=False),
         "num": FieldConfig(field_type="numeric", positions=False)},
        store_fields=["name", "desc", "bool", "num"],
    )
    res = idx.search(
        {"query": {"term": "marty", "field": "name"}, "size": 10,
         "fields": ["name", "desc", "bool", "num"]}
    )
    assert len(res.hits) == 1
    f = res.hits[0].fields
    assert f["name"] == "Marty"
    assert f["desc"] == "GopherCON India"
    assert f["num"] == 1.0
    assert f["bool"] is True


def test_index_empty_doc_id_rejected(ray_session, tmp_path_factory):
    """Port of TestIndexEmptyDocId (index_test.go:1876-1915): empty doc
    ids are rejected for index and delete."""
    idx = _mk(
        tmp_path_factory.mktemp("emptyid"),
        {"doc_id": pa.array(["a"]), "body": pa.array(["text"])},
        {"body": FieldConfig(analyzer="standard", positions=True)},
    )
    with pytest.raises(ValueError):
        idx.index("", {"body": "nodocid"})
    with pytest.raises(ValueError):
        idx.delete("")


def test_repeated_upsert_batches_bug_1096(ray_session, tmp_path_factory):
    """Port of TestBug1096 (index_test.go:2678-2748): re-upserting the
    same doc ids across batches must not leave stale duplicates; a
    wildcard over the ids finds each live doc exactly once."""
    idx = _mk(
        tmp_path_factory.mktemp("bug1096"),
        {"doc_id": pa.array([str(j) for j in range(91)]),
         "name": pa.array([str(j) for j in range(91)]),
         "batch": pa.array(["0"] * 91)},
        {"name": FieldConfig(analyzer="keyword", positions=False),
         "batch": FieldConfig(analyzer="keyword", positions=False)},
    )
    for i in range(1, 3):
        idx.batch(
            upserts=pa.table(
                {
                    "doc_id": pa.array([str(j) for j in range(91)]),
                    "name": pa.array([str(j) for j in range(91)]),
                    "batch": pa.array([str(i)] * 91),
                }
            )
        )
    res = idx.search({"query": {"wildcard": "9*", "field": "name"},
                      "size": 1000})
    assert res.total_hits == 2, res.total_hits
    assert sorted(h.id for h in res.hits) == ["9", "90"]
    # and the surviving docs reflect the LAST upsert
    res = idx.search({"query": {"term": "2", "field": "batch"},
                      "size": 1000})
    assert res.total_hits == 91


def test_conjunction_score_none_same_hits(ray_session, tmp_path_factory):
    """Port of TestOptimisedConjunctionSearchHits (index_test.go:
    2827-2925): a conjunction with a fuzzy clause returns the SAME hit
    count with score:"none" and with scoring on."""
    idx = _mk(
        tmp_path_factory.mktemp("optconj"),
        {"doc_id": pa.array(["a", "b", "c", "d"]),
         "country": pa.array(["united", "united", "india united",
                              "United Kingdom"]),
         "name": pa.array(["Mercure Hotel",
                           "Mercure Altrincham Bowdon Hotel",
                           "Sonoma Hotel", "Cresta Court Hotel"]),
         "directions": pa.array(
             ["B560 and B56 Follow signs to the M56",
              "A570 and A57 Follow signs to the M56 Manchester Airport",
              "Northwest", "junction of A560 and A56"])},
        {"country": FieldConfig(analyzer="standard", positions=True),
         "name": FieldConfig(analyzer="standard", positions=True),
         "directions": FieldConfig(analyzer="standard", positions=True)},
    )
    cq = {"conjuncts": [
        {"match": "united", "field": "country"},
        {"match": "hotel", "field": "name"},
        {"match": "56", "field": "directions", "fuzziness": 1},
    ]}
    without = idx.search({"query": cq, "size": 100, "score": "none"})
    scored = idx.search({"query": cq, "size": 100})
    assert without.total_hits == scored.total_hits > 0
    assert sorted(h.id for h in without.hits) == sorted(
        h.id for h in scored.hits
    )


def test_geohash_string_geo_points_issue_1301(ray_session,
                                              tmp_path_factory):
    """Port of TestGeoDistanceIssue1301 (search_test.go:1924-1970): geo
    points given as GEOHASH strings index and match a distance query."""
    idx = _mk(
        tmp_path_factory.mktemp("geohash1301"),
        {"doc_id": pa.array(["0", "1", "2"]),
         "GEO": pa.array(["wecpkbeddsmf", "wecpk8tne453",
                          "wecpkb80s09t"])},
        {"GEO": FieldConfig(field_type="geo", positions=False)},
    )
    res = idx.search(
        {"query": {"location": {"lon": 114.112603, "lat": 22.371154},
                   "distance": "1km", "field": "GEO"},
         "size": 10, "score": "none"}
    )
    assert res.total_hits == 3


def test_latlon_string_geo_points(ray_session, tmp_path_factory):
    """geo.go extractGeoPoint also accepts "lat,lon" strings."""
    idx = _mk(
        tmp_path_factory.mktemp("latlonstr"),
        {"doc_id": pa.array(["a", "b"]),
         "GEO": pa.array(["22.371154,114.112603", "0.0,0.0"])},
        {"GEO": FieldConfig(field_type="geo", positions=False)},
    )
    res = idx.search(
        {"query": {"location": {"lon": 114.112603, "lat": 22.371154},
                   "distance": "1km", "field": "GEO"},
         "size": 10, "score": "none"}
    )
    assert [h.id for h in res.hits] == ["a"]


def test_token_stream_to_phrase_vectors():
    """query/match_phrase_test.go TestTokenStreamToPhrase: position-
    indexed slots, stop-word gaps become empty slots, multiple tokens
    can share one position (synonym-style streams)."""
    from bleve_ray.analysis.tokenizers import Token
    from bleve_ray.search.query import token_stream_to_phrase

    def toks(*pairs):
        return [Token(term=t, position=p, start=0, end=0)
                for t, p in pairs]

    assert token_stream_to_phrase([]) == []
    assert token_stream_to_phrase(toks(("one", 1), ("two", 2))) == [
        ["one"], ["two"]
    ]
    # gap from stop-word removal
    assert token_stream_to_phrase(toks(("wag", 1), ("dog", 3))) == [
        ["wag"], [], ["dog"]
    ]
    # multiple tokens at the same position
    got = token_stream_to_phrase(toks(
        ("nia", 1), ("onia", 1), ("donia", 1),
        ("imo", 2), ("nimo", 2), ("ónimo", 2),
    ))
    assert got == [["nia", "onia", "donia"], ["imo", "nimo", "ónimo"]]


def test_query_validate_vectors():
    """query/query_test.go TestQueryValidate via the explicit
    validate_query surface (SearchRequest.Validate role; Search itself
    does not auto-validate, matching the reference)."""
    import pytest as _pytest

    from bleve_ray.search.query import (
        BooleanQuery,
        ConjunctionQuery,
        DisjunctionQuery,
        MatchQuery,
        MultiPhraseQuery,
        NumericRangeQuery,
        TermQuery,
        TermRangeQuery,
        validate_query,
    )

    ok = [
        TermQuery(term="water", field="desc"),
        MatchQuery(match="beer", field="desc"),
        NumericRangeQuery(min=5.1, max=7.1, field="desc"),
        NumericRangeQuery(min=5.1, field="desc"),
        TermRangeQuery(min="a", field="desc"),
        MultiPhraseQuery(terms=[["watered"], ["down"]], field="desc"),
        BooleanQuery(
            must=ConjunctionQuery(
                conjuncts=[MatchQuery(match="beer", field="desc")]
            ),
            must_not=DisjunctionQuery(
                disjuncts=[MatchQuery(match="devon", field="desc")]
            ),
        ),
        BooleanQuery(
            must_not=DisjunctionQuery(
                disjuncts=[MatchQuery(match="devon", field="desc")]
            )
        ),
    ]
    for q in ok:
        validate_query(q)  # must not raise

    bad = [
        (NumericRangeQuery(field="desc"), "numeric range"),
        (TermRangeQuery(field="desc"), "term range"),
        (MultiPhraseQuery(terms=[], field="f"), "phrase"),
        (BooleanQuery(), "boolean"),
        (
            BooleanQuery(
                must=ConjunctionQuery(
                    conjuncts=[MatchQuery(match="beer", field="desc")]
                ),
                should=DisjunctionQuery(
                    disjuncts=[MatchQuery(match="water", field="desc")],
                    min=2,
                ),
                must_not=DisjunctionQuery(
                    disjuncts=[MatchQuery(match="devon", field="desc")]
                ),
            ),
            "disjunction",
        ),
    ]
    for q, frag in bad:
        with _pytest.raises(ValueError, match=frag):
            validate_query(q)


def test_match_all_score_none(ray_session, tmp_path_factory):
    """search_test.go TestMatchAllScorer: match_all with score=none
    returns every doc with score 0.0."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from bleve_ray.index import FieldConfig, IndexOptions, build_index
    from bleve_ray.search import Index

    d = str(tmp_path_factory.mktemp("masrc"))
    pq.write_table(
        pa.table({
            "doc_id": pa.array(["1", "2", "3"]),
            "content": pa.array(["k", "l", "m"]),
        }),
        os.path.join(d, "docs.parquet"),
    )
    idxd = str(tmp_path_factory.mktemp("maidx"))
    build_index(
        [os.path.join(d, "docs.parquet")],
        idxd,
        IndexOptions(fields={"content": FieldConfig(analyzer="en")},
                     doc_id_fields=["doc_id"], num_shards=1,
                     bucket_bits=16),
    )
    idx = Index.open(idxd)
    res = idx.search({"query": {"match_all": {}}, "score": "none",
                      "size": 10})
    assert res.total_hits == 3
    assert all(h.score == 0.0 for h in res.hits)


def test_concurrent_searches_share_reader(ray_session, tmp_path_factory):
    """Race-test role (index_test.go TestBatchRace* family): many
    threads searching one Index concurrently -- posting/docmeta caches
    and the LRU must stay consistent, results identical to serial."""
    import os
    from concurrent.futures import ThreadPoolExecutor

    import pyarrow as pa
    import pyarrow.parquet as pq

    from bleve_ray.index import FieldConfig, IndexOptions, build_index
    from bleve_ray.search import Index

    d = str(tmp_path_factory.mktemp("racesrc"))
    words = ["alpha", "beta", "gamma", "delta", "epsilon"]
    pq.write_table(
        pa.table({
            "doc_id": pa.array([f"d{i}" for i in range(200)]),
            "content": pa.array(
                [f"{words[i % 5]} {words[(i + 1) % 5]}" for i in range(200)]
            ),
        }),
        os.path.join(d, "docs.parquet"),
    )
    idxd = str(tmp_path_factory.mktemp("raceidx"))
    build_index(
        [os.path.join(d, "docs.parquet")],
        idxd,
        IndexOptions(fields={"content": FieldConfig()},
                     doc_id_fields=["doc_id"], num_shards=2,
                     bucket_bits=16),
    )
    idx = Index.open(idxd)
    reqs = [{"query": {"term": w, "field": "content"}, "size": 5}
            for w in words] * 8
    serial = [idx.search(r).total_hits for r in reqs]
    with ThreadPoolExecutor(max_workers=8) as ex:
        parallel = list(ex.map(lambda r: idx.search(r).total_hits, reqs))
    assert parallel == serial
