"""Facets, sort-by-field (docvalues), stored fields and highlighting over
the documents table (sf0.001)."""

import duckdb
import pytest

from bleve_ray.index import FieldConfig, IndexOptions, build_index
from bleve_ray.search import Index

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def doc_index(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("docidx"))
    build_index(
        [f"{SF}/documents.parquet"],
        d,
        IndexOptions(
            fields={
                "text": FieldConfig(analyzer="ascii_alnum_lower", positions=True)
            },
            doc_id_fields=["doc_id"],
            num_shards=4,
            bucket_bits=16,
            docvalue_fields=["lang", "source", "n_chars"],
            store_fields=["text"],
        ),
    )
    return Index.open(d)


def test_terms_facet_matches_sql(doc_index):
    r = doc_index.search(
        {
            "query": {"match_all": {}},
            "size": 0,
            "facets": {"langs": {"field": "lang", "size": 3}},
        }
    )
    f = r.facets["langs"]
    con = duckdb.connect()
    want = con.sql(
        f"""SELECT lang, count(*) c FROM read_parquet('{SF}/documents.parquet')
            GROUP BY lang ORDER BY c DESC, lang LIMIT 3"""
    ).fetchall()
    assert [(t["term"], t["count"]) for t in f["terms"]] == want
    assert f["missing"] == 0
    assert f["total"] == 500
    assert f["other"] == 500 - sum(c for _, c in want)


def test_terms_facet_on_query_subset(doc_index):
    r = doc_index.search(
        {
            "query": {"term": "vector", "field": "text"},
            "size": 0,
            "facets": {"langs": {"field": "lang", "size": 10}},
        }
    )
    f = r.facets["langs"]
    con = duckdb.connect()
    want = con.sql(
        f"""WITH m AS (SELECT doc_id, lang FROM read_parquet('{SF}/documents.parquet')
                       WHERE regexp_matches(lower(text), '\\bvector\\b'))
            SELECT count(*) FROM m"""
    ).fetchone()[0]
    assert f["total"] == r.total_hits == want


def test_numeric_range_facet(doc_index):
    r = doc_index.search(
        {
            "query": {"match_all": {}},
            "size": 0,
            "facets": {
                "sizes": {
                    "field": "n_chars",
                    "numeric_ranges": [
                        {"name": "small", "max": 200},
                        {"name": "big", "min": 200},
                    ],
                }
            },
        }
    )
    f = r.facets["sizes"]
    by = {b["name"]: b["count"] for b in f["numeric_ranges"]}
    assert by["small"] + by["big"] == 500
    con = duckdb.connect()
    want_small = con.sql(
        f"SELECT count(*) FROM read_parquet('{SF}/documents.parquet') WHERE n_chars < 200"
    ).fetchone()[0]
    assert by["small"] == want_small


def test_sort_by_field(doc_index):
    r = doc_index.search(
        {
            "query": {"term": "vector", "field": "text"},
            "size": 5,
            "sort": ["lang", "-n_chars"],
            "fields": ["lang", "n_chars"],
        }
    )
    keys = [(h.fields["lang"], -h.fields["n_chars"]) for h in r.hits]
    assert keys == sorted(keys)


def test_stored_fields_and_highlight(doc_index):
    r = doc_index.search(
        {
            "query": {"match": "vector merge", "field": "text"},
            "size": 3,
            "fields": ["lang"],
            "highlight": {"fields": ["text"], "style": "html"},
        }
    )
    assert r.hits
    for h in r.hits:
        assert h.fields["lang"]
        frags = h.fragments["text"]
        assert frags and any(
            "<mark>vector</mark>" in f or "<mark>merge</mark>" in f
            for f in frags
        )


def test_distributed_facets_match_driver_path(doc_index, monkeypatch):
    """The Ray-stage facet path (partial counts per docvalue file ->
    FacetResults.Merge) must agree exactly with the driver path."""
    import bleve_ray.search.facets as F

    req = {
        "query": {"match_all": {}},
        "size": 0,
        "facets": {
            "langs": {"field": "lang", "size": 3},
            "sizes": {
                "field": "n_chars",
                "numeric_ranges": [
                    {"name": "small", "max": 250},
                    {"name": "big", "min": 250},
                ],
            },
        },
    }
    driver = doc_index.search(req).facets
    monkeypatch.setattr(F, "DISTRIBUTED_FACET_THRESHOLD", 1)
    dist = doc_index.search(req).facets
    assert dist == driver


def test_fragment_scoring_distinct_terms():
    """fragment_scorer_simple.go: +1 per distinct term present, repeats
    don't add; the best-scoring fragment wins."""
    from bleve_ray.analysis import analyzer_named
    from bleve_ray.search.highlight import highlight_text, score_fragment

    spans = [(0, 3, "foo"), (5, 8, "foo"), (10, 13, "bar")]
    assert score_fragment(spans, 0, 14) == 2.0  # foo+bar, repeat ignored
    assert score_fragment(spans, 0, 9) == 1.0
    # a two-term cluster beats an earlier single-term repeat cluster
    text = ("alpha " * 30) + "alpha beta " + ("filler " * 40)
    frags = highlight_text(
        text, {"alpha", "beta"}, analyzer_named("standard"),
        fragment_size=40,
    )
    assert len(frags) == 1
    assert "<mark>beta</mark>" in frags[0]


def test_custom_fragmenter_hook():
    from bleve_ray.analysis import analyzer_named
    from bleve_ray.search.highlight import highlight_text

    def whole_text(text, spans, fragment_size):
        return [(0, len(text))]

    text = "one two three match four"
    frags = highlight_text(
        text, {"match"}, analyzer_named("standard"),
        fragmenter=whole_text,
    )
    assert frags == ["one two three <mark>match</mark> four"]


def test_max_fragments_request_option(doc_index):
    r = doc_index.search(
        {
            "query": {"term": "vector", "field": "text"},
            "size": 1,
            "fields": ["text"],
            "highlight": {"fields": ["text"], "max_fragments": 2,
                          "fragment_size": 60},
        }
    )
    assert r.hits and r.hits[0].fragments
    frags = r.hits[0].fragments["text"]
    assert 1 <= len(frags) <= 2
    assert any("<mark>" in f for f in frags)


@pytest.fixture(scope="module")
def events_dt_index(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("evdtidx"))
    build_index(
        [f"{SF}/events.parquet"],
        d,
        IndexOptions(
            fields={
                "event_type": FieldConfig(analyzer="keyword", positions=False),
                "ts": FieldConfig(field_type="datetime", positions=False),
            },
            doc_id_fields=["event_id"],
            num_shards=2,
            bucket_bits=16,
            docvalue_fields=["ts", "event_type"],
        ),
    )
    return Index.open(d)


def test_datetime_range_facet(events_dt_index):
    """Reference facet_builder_datetime.go: [start, end) buckets parsed from
    date strings; counts over the matched set."""
    ranges = [
        {"name": "h1", "start": "2024-01-01T00:00:00",
         "end": "2024-01-16T00:00:00"},
        {"name": "h2", "start": "2024-01-16T00:00:00",
         "end": "2024-02-01T00:00:00"},
        {"name": "open_end", "start": "2024-01-16T00:00:00", "end": None},
    ]
    r = events_dt_index.search(
        {
            "query": {"match_all": {}},
            "size": 0,
            "facets": {"halves": {"field": "ts", "date_ranges": ranges}},
        }
    )
    f = r.facets["halves"]
    con = duckdb.connect()
    (h1, h2, tot) = con.sql(
        f"""SELECT
              count(*) FILTER (ts >= TIMESTAMP '2024-01-01'
                               AND ts < TIMESTAMP '2024-01-16'),
              count(*) FILTER (ts >= TIMESTAMP '2024-01-16'
                               AND ts < TIMESTAMP '2024-02-01'),
              count(*)
            FROM read_parquet('{SF}/events.parquet')"""
    ).fetchone()
    got = {b["name"]: b["count"] for b in f["date_ranges"]}
    assert got == {"h1": h1, "h2": h2, "open_end": h2}
    assert f["total"] == tot
    assert f["missing"] == 0
    b0 = f["date_ranges"][0]
    assert b0["start"] == "2024-01-01T00:00:00"
    assert b0["end"] == "2024-01-16T00:00:00"


def test_terms_facet_prefix_and_pattern_filters(doc_index):
    """FacetRequest.TermPrefix / TermPattern (search.go:174-190,
    facet_builder_terms.go UpdateVisitor): only matching terms counted;
    total still counts every visited value."""
    r = doc_index.search(
        {
            "query": {"match_all": {}},
            "size": 0,
            "facets": {
                "langs_e": {"field": "lang", "size": 10, "term_prefix": "e"},
                "langs_rx": {"field": "lang", "size": 10,
                             "term_pattern": "^(en|es)$"},
            },
        }
    )
    fe = r.facets["langs_e"]
    assert all(t["term"].startswith("e") for t in fe["terms"])
    assert fe["total"] == 500  # unfiltered visit count
    frx = r.facets["langs_rx"]
    assert {t["term"] for t in frx["terms"]} <= {"en", "es"}
    assert frx["other"] == frx["total"] - sum(
        t["count"] for t in frx["terms"]
    )


def test_include_locations(doc_index):
    """includeLocations: per-hit {field:{term:[{pos,start,end}]}}; byte
    offsets are recomputed from the stored text of the returned page
    (the index stores positions, not term vectors)."""
    r = doc_index.search(
        {
            "query": {"match": "vector window", "field": "text"},
            "size": 3,
            "includeLocations": True,
            "fields": ["text"],
        }
    )
    assert r.hits
    for h in r.hits:
        assert h.locations and "text" in h.locations
        terms = h.locations["text"]
        assert set(terms) <= {"vector", "window"}
        raw = h.fields["text"].encode("utf-8")
        for term, locs in terms.items():
            for loc in locs:
                assert loc["pos"] >= 1
                # offsets point at the surface form of the term
                assert loc["end"] > loc["start"]
                surface = raw[loc["start"] : loc["end"]].decode("utf-8")
                assert surface.lower() == term
    d = r.to_dict()
    assert "locations" in d["hits"][0]


def test_search_after_with_custom_sort(doc_index):
    """Cursor paging under a custom sort order (reference seeded
    collector with Sort/SearchAfter of matching arity): walking pages by
    [n_chars, _id] cursors reproduces the full sorted ranking; arity
    mismatch errors like SearchRequest.Validate."""
    full = doc_index.search(
        {
            "query": {"match_all": {}},
            "size": 500,
            "sort": ["n_chars", "_id"],
            "fields": ["n_chars"],
        }
    ).hits
    walked = []
    after = None
    while True:
        req = {
            "query": {"match_all": {}},
            "size": 50,
            "sort": ["n_chars", "_id"],
            "fields": ["n_chars"],
        }
        if after:
            req["search_after"] = after
        page = doc_index.search(req).hits
        if not page:
            break
        walked.extend(page)
        after = [page[-1].fields["n_chars"], page[-1].id]
    assert [h.id for h in walked] == [h.id for h in full]

    # search_before returns the page immediately preceding the cursor
    pivot = full[120]
    before = doc_index.search(
        {
            "query": {"match_all": {}},
            "size": 20,
            "sort": ["n_chars", "_id"],
            "search_before": [pivot.fields["n_chars"], pivot.id],
            "fields": ["n_chars"],
        }
    ).hits
    assert [h.id for h in before] == [h.id for h in full[100:120]]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="same size as sort order"):
        doc_index.search(
            {
                "query": {"match_all": {}},
                "sort": ["n_chars", "_id"],
                "search_after": [5],
            }
        )


def test_facets_unaffected_by_cursor_paging(doc_index):
    # reference collector accumulates facets over EVERY match; paging via
    # search_after/search_before must not shrink the facet counts
    base = doc_index.search(
        {
            "query": {"term": "vector", "field": "text"},
            "size": 5,
            "facets": {"langs": {"field": "lang", "size": 10}},
        }
    )
    cursor = [f"{base.hits[-1].score:.6f}", base.hits[-1].id]
    after = doc_index.search(
        {
            "query": {"term": "vector", "field": "text"},
            "size": 5,
            "search_after": cursor,
            "facets": {"langs": {"field": "lang", "size": 10}},
        }
    )
    assert after.total_hits == base.total_hits
    assert after.facets == base.facets
    before = doc_index.search(
        {
            "query": {"term": "vector", "field": "text"},
            "size": 5,
            "search_before": cursor,
            "facets": {"langs": {"field": "lang", "size": 10}},
        }
    )
    assert before.facets == base.facets
