"""Query-string parser, CLI commands, code analyzer, TF-IDF scoring mode."""

import json
import os
import subprocess
import sys

import pytest

from bleve_ray.search.query import (
    BooleanQuery,
    MatchPhraseQuery,
    MatchQuery,
    WildcardQuery,
)
from bleve_ray.search.query_string import parse_query_string


def test_query_string_shapes():
    q = parse_query_string("hello")
    assert isinstance(q, MatchQuery) and q.match == "hello"

    q = parse_query_string('+must_have -banned nice "exact phrase"')
    assert isinstance(q, BooleanQuery)
    assert len(q.must.conjuncts) == 1
    assert len(q.must_not.disjuncts) == 1
    assert len(q.should.disjuncts) == 2
    assert isinstance(q.should.disjuncts[1], MatchPhraseQuery)

    q = parse_query_string("content:func")
    assert isinstance(q, MatchQuery) and q.field == "content"

    q = parse_query_string("name:wild*rd")
    assert isinstance(q, WildcardQuery) and q.field == "name"

    q = parse_query_string("boosted^2")
    assert q.boost == 2.0

    # bare range clause applies the default field (query_string.y)
    from bleve_ray.search.query import NumericRangeQuery

    q = parse_query_string(">100")
    assert isinstance(q, NumericRangeQuery) and q.min == 100.0

    with pytest.raises(ValueError):
        parse_query_string(">abc")


def test_query_string_end_to_end(ray_session, tiny_corpus_dir, tmp_path_factory):
    from bleve_ray.index import IndexOptions, build_index
    from bleve_ray.oracle import OracleIndex
    from bleve_ray.search import Index

    import pyarrow.parquet as pq

    from bleve_ray.corpus import doc_id_array

    idx_dir = str(tmp_path_factory.mktemp("qs_idx"))
    files = sorted(
        os.path.join(tiny_corpus_dir, f) for f in os.listdir(tiny_corpus_dir)
    )
    build_index(files, idx_dir, IndexOptions(num_shards=3, bucket_bits=6))
    idx = Index.open(idx_dir)

    # equivalent explicit boolean query must give identical results
    r1 = idx.search({"query": {"query": "+func -goto lambda"}, "size": 10}).to_dict()
    r2 = idx.search(
        {
            "query": {
                "must": [{"match": "func", "field": "content"}],
                "should": [{"match": "lambda", "field": "content"}],
                "must_not": [{"match": "goto", "field": "content"}],
            },
            "size": 10,
        }
    ).to_dict()
    r1.pop("took_ms"), r2.pop("took_ms")
    assert r1 == r2


def test_code_analyzer():
    from bleve_ray.analysis import analyzer_named

    a = analyzer_named("code")
    assert a.terms("getHTTPResponseCode(x)") == [
        "get", "http", "response", "code", "x",
    ]


def test_tfidf_scoring_mode(ray_session, tiny_corpus_dir, tmp_path_factory):
    """scoring_model='tfidf' (the reference default): engine == oracle."""
    import pyarrow.parquet as pq

    from bleve_ray.corpus import doc_id_array
    from bleve_ray.index import FieldConfig, IndexOptions, build_index
    from bleve_ray.oracle import OracleIndex
    from bleve_ray.search import Index

    idx_dir = str(tmp_path_factory.mktemp("tfidf_idx"))
    files = sorted(
        os.path.join(tiny_corpus_dir, f) for f in os.listdir(tiny_corpus_dir)
    )
    build_index(
        files,
        idx_dir,
        IndexOptions(num_shards=2, bucket_bits=6, scoring_model="tfidf"),
    )
    idx = Index.open(idx_dir)

    oracle = OracleIndex(scoring_model="tfidf")
    for f in files:
        t = pq.read_table(f)
        ids = doc_id_array(t).to_pylist()
        for i, did in enumerate(ids):
            oracle.index_doc(
                did, {"content": t["content"][i].as_py()}, {"content": "standard"}
            )
    for req in (
        {"query": {"term": "func", "field": "content"}, "size": 10},
        {"query": {"match": "func return", "field": "content"}, "size": 10},
        {"query": {"match_phrase": "return nil", "field": "content"}, "size": 10},
    ):
        got = idx.search(req).to_dict()
        want = oracle.search(req)
        assert [h["id"] for h in got["hits"]] == [h["id"] for h in want["hits"]]
        for g, w in zip(got["hits"], want["hits"]):
            assert g["score"] == pytest.approx(w["score"], abs=1e-9)


def test_cli_smoke(ray_session, tiny_corpus_dir, tmp_path_factory):
    idx_dir = str(tmp_path_factory.mktemp("cli_idx"))
    files = sorted(
        os.path.join(tiny_corpus_dir, f) for f in os.listdir(tiny_corpus_dir)
    )
    env = dict(os.environ, PYTHONPATH="/root/repo")
    r = subprocess.run(
        [sys.executable, "-m", "bleve_ray", "build", idx_dir, *files],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["doc_count"] == 64

    for cmd, check in [
        (["count", idx_dir], lambda o: o.strip() == "64"),
        (["fields", idx_dir], lambda o: json.loads(o) == ["content"]),
        (["check", idx_dir], lambda o: json.loads(o)["ok"]),
        (
            ["search", idx_dir, "+func lambda", "--size", "3"],
            lambda o: json.loads(o)["total_hits"] > 0,
        ),
        (
            ["query", idx_dir, '{"term": "func", "field": "content"}'],
            lambda o: json.loads(o)["total_hits"] == 64,
        ),
        (["dictionary", idx_dir, "content", "--limit", "5"],
         lambda o: len(o.strip().splitlines()) == 5),
        (["dump", idx_dir, "--limit", "2"],
         lambda o: len(o.strip().splitlines()) == 2),
    ]:
        r = subprocess.run(
            [sys.executable, "-m", "bleve_ray", *cmd],
            capture_output=True, text=True, env=env, timeout=120,
        )
        assert r.returncode == 0, (cmd, r.stderr[-1000:])
        assert check(r.stdout), (cmd, r.stdout[:500])


def test_fuzzy_query_end_to_end(ray_session, tiny_corpus_dir, tmp_path_factory):
    from bleve_ray.index import IndexOptions, build_index
    from bleve_ray.search import Index

    idx_dir = str(tmp_path_factory.mktemp("fz_idx"))
    files = sorted(
        os.path.join(tiny_corpus_dir, f) for f in os.listdir(tiny_corpus_dir)
    )
    build_index(files, idx_dir, IndexOptions(num_shards=2, bucket_bits=6))
    idx = Index.open(idx_dir)
    exact = idx.search({"query": {"term": "lambda", "field": "content"}, "size": 100})
    fuzzy = idx.search(
        {"query": {"term": "lambada", "field": "content", "fuzziness": 2},
         "size": 100}
    )
    # 'lambada' is within edit distance 2 of 'lambda'
    assert fuzzy.total_hits >= exact.total_hits > 0
    # regexp and wildcard expansions
    rx = idx.search({"query": {"regexp": "lamb.*", "field": "content"}, "size": 5})
    wc = idx.search({"query": {"wildcard": "lamb*", "field": "content"}, "size": 5})
    assert rx.total_hits == wc.total_hits >= exact.total_hits


def test_forcemerge_and_topterms_cli(ray_session, tiny_corpus_dir, tmp_path_factory):
    idx_dir = str(tmp_path_factory.mktemp("fm_idx"))
    files = sorted(
        os.path.join(tiny_corpus_dir, f) for f in os.listdir(tiny_corpus_dir)
    )
    from bleve_ray.index import IndexOptions, build_index

    build_index(
        files, idx_dir,
        IndexOptions(num_shards=2, bucket_bits=4, target_segments_per_shard=8),
    )
    env = dict(os.environ, PYTHONPATH="/root/repo")
    r = subprocess.run(
        [sys.executable, "-m", "bleve_ray", "topterms", idx_dir, "content",
         "--limit", "3"],
        capture_output=True, text=True, env=env, timeout=120,
    )
    assert r.returncode == 0 and len(r.stdout.strip().splitlines()) == 3
    r = subprocess.run(
        [sys.executable, "-m", "bleve_ray", "forcemerge", idx_dir],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-800:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["segments"] == 2  # one per shard after ForceMerge


def test_reader_stats_surface(ray_session, tiny_corpus_dir, tmp_path):
    import os as _os

    from bleve_ray.index import IndexOptions, build_index
    from bleve_ray.search import Index

    d = str(tmp_path / "statsidx")
    files = sorted(
        _os.path.join(tiny_corpus_dir, f)
        for f in _os.listdir(tiny_corpus_dir)
    )
    build_index(files, d, IndexOptions(num_shards=2, bucket_bits=6))
    idx = Index.open(d)
    s0 = idx.reader.stats()
    assert s0["postings_decoded"] == 0 and s0["doc_count"] == 64
    idx.search({"query": {"term": "func", "field": "content"}, "size": 5})
    idx.search({"query": {"term": "func", "field": "content"}, "size": 5})
    s1 = idx.reader.stats()
    assert s1["term_searchers_started"] >= 2
    assert s1["posting_cache_hits"] >= 1
    assert s1["postings_decoded"] >= 1
    assert s1["segments_open"] >= 1


def test_fuzziness_auto_and_validation(ray_session, tiny_corpus_dir,
                                       tmp_path):
    """"auto" fuzziness follows GetAutoFuzziness length thresholds
    (search_fuzzy.go:115-123); out-of-range fuzziness errors like the
    reference query validation (query.go:725-730); match queries accept
    per-term fuzziness (match.go:150-170)."""
    import os as _os

    import pytest as _pytest

    from bleve_ray.index import IndexOptions, build_index
    from bleve_ray.search import Index
    from bleve_ray.search.query import resolve_fuzziness

    assert resolve_fuzziness("auto", "ab") == 0
    assert resolve_fuzziness("auto", "abc") == 1
    assert resolve_fuzziness("auto", "abcdef") == 2
    with _pytest.raises(ValueError, match="exceeds max"):
        resolve_fuzziness(3, "x")
    with _pytest.raises(ValueError, match="negative"):
        resolve_fuzziness(-1, "x")

    d = str(tmp_path / "fzidx")
    files = sorted(
        _os.path.join(tiny_corpus_dir, f)
        for f in _os.listdir(tiny_corpus_dir)
    )
    build_index(files, d, IndexOptions(num_shards=2, bucket_bits=6))
    idx = Index.open(d)
    exact = idx.search(
        {"query": {"term": "return", "field": "content"}, "size": 0}
    ).total_hits
    # auto on a 6-byte term = distance 2; superset of exact matches
    auto = idx.search(
        {
            "query": {
                "term": "return",
                "fuzziness": "auto",
                "field": "content",
            },
            "size": 0,
        }
    ).total_hits
    assert auto >= exact > 0
    # match query with fuzziness: typo still matches
    fz = idx.search(
        {
            "query": {
                "match": "retorn",
                "field": "content",
                "fuzziness": 1,
            },
            "size": 0,
        }
    ).total_hits
    assert fz >= exact


def test_query_string_ranges_phrases_boosts():
    """query_string.y productions now covered: numeric/date range
    clauses, field-prefixed phrases with boost, field-prefixed regex."""
    from bleve_ray.search.query import (
        DateRangeQuery,
        MatchPhraseQuery,
        NumericRangeQuery,
        RegexpQuery,
    )
    from bleve_ray.search.query_string import parse_query_string as p

    q = p("age:>5")
    assert isinstance(q, NumericRangeQuery)
    assert q.min == 5.0 and not q.inclusive_min and q.field == "age"
    q = p("age:>=5.5")
    assert q.min == 5.5 and q.inclusive_min
    q = p("n:<=10")
    assert q.max == 10.0 and q.inclusive_max
    q = p('ts:>"2024-01-01"')
    assert isinstance(q, DateRangeQuery)
    assert q.start == "2024-01-01" and not q.inclusive_start
    q = p('f:"x y"^2')
    assert isinstance(q, MatchPhraseQuery)
    assert q.field == "f" and q.boost == 2.0 and q.match_phrase == "x y"
    q = p('"a b"^3')
    assert q.boost == 3.0
    q = p("f:/re.*/")
    assert isinstance(q, RegexpQuery) and q.field == "f"


def test_query_string_invalid_inputs_rejected():
    """Port of TestQuerySyntaxParserInvalid
    (query_string_parser_test.go:892-930): modifier-only terms,
    operators after the field separator, unterminated phrases, stray
    escapes after boost/fuzz, and float64-overflowing numeric literals
    are parse errors."""
    import pytest as _pytest

    from bleve_ray.search.query_string import parse_query_string

    big = "9" * 372
    bad = ["^", "^5", "field:-text", "field:+text", "field:>text",
           "field:>=text", "field:<text", "field:<=text", "field:~text",
           "field:^text", "field::text", '"this is the time',
           "cat^3\\:", "cat^3\\0", "cat~3\\:", "cat~3\\0",
           big, f"field:{big}", f"field:>{big}", f"field:>={big}",
           f"field:<{big}", f"field:<={big}"]
    for s in bad:
        with _pytest.raises(ValueError):
            parse_query_string(s)


def test_query_string_numeric_terms():
    """query_string.y tNUMBER production: a numeric term parses to
    match-OR-exact-numeric-equality; negative numbers are valid right
    after the field separator (query_string_parser_test.go:291-532)."""
    from bleve_ray.search.query import (
        DisjunctionQuery,
        MatchQuery,
        NumericRangeQuery,
    )
    from bleve_ray.search.query_string import parse_query_string

    for s, field, num in [("33", "", 33.0), ("field:33", "field", 33.0),
                          ("field:-5", "field", -5.0)]:
        q = parse_query_string(s)
        assert isinstance(q, DisjunctionQuery), s
        mq, nq = q.disjuncts
        assert isinstance(mq, MatchQuery) and isinstance(
            nq, NumericRangeQuery
        )
        assert nq.min == nq.max == num
        assert nq.inclusive_min and nq.inclusive_max
        assert mq.field == nq.field == field


def test_query_string_parse_shapes():
    """query_string_parser_test.go TestQuerySyntaxParserValid
    (representative subset): modifier chars are legal MID-term, field
    scoping, phrase forms, boosts, numeric terms.  Our AST collapses
    the reference's single-should boolean wrapper to the inner query --
    search-identical, locked by the end-to-end conformance suites."""
    from bleve_ray.search.query import (
        BooleanQuery,
        DisjunctionQuery,
        MatchPhraseQuery,
        MatchQuery,
    )
    from bleve_ray.search.query_string import parse_query_string

    q = parse_query_string("field:t-est")
    assert isinstance(q, MatchQuery) and q.match == "t-est"
    for ch in "+<>=":
        q = parse_query_string(f"field:t{ch}est")
        assert isinstance(q, MatchQuery)
        assert q.match == f"t{ch}est" and q.field == "field"

    q = parse_query_string('"test phrase 1"')
    assert isinstance(q, MatchPhraseQuery)
    assert q.match_phrase == "test phrase 1"

    q = parse_query_string('field3:"test phrase 2"')
    assert isinstance(q, MatchPhraseQuery) and q.field == "field3"

    q = parse_query_string("+field1:test1")
    assert isinstance(q, BooleanQuery)
    assert q.must.conjuncts[0].match == "test1"
    assert q.must.conjuncts[0].field == "field1"

    q = parse_query_string("-field2:test2")
    assert isinstance(q, BooleanQuery)
    assert q.must_not.disjuncts[0].match == "test2"

    q = parse_query_string("+field6:test3 -field7:test4 field8:test5")
    assert isinstance(q, BooleanQuery)
    assert q.must.conjuncts[0].field == "field6"
    assert q.must_not.disjuncts[0].field == "field7"

    q = parse_query_string("test^3")
    assert isinstance(q, MatchQuery) and q.boost == 3.0

    q = parse_query_string("test^3 other^6")
    assert isinstance(q, DisjunctionQuery)
    assert [c.boost for c in q.disjuncts] == [3.0, 6.0]

    # numeric term: match OR exact-equality disjunction (round-3 parity)
    q = parse_query_string("field:33")
    assert isinstance(q, DisjunctionQuery)
