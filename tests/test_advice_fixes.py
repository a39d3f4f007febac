"""Regression tests for the round-1 ADVICE findings: banded-Levenshtein
out-of-band leak, open-ended term ranges, exact datetime nanos."""

import datetime
import os
import random

import pytest

from bleve_ray.index import IndexOptions, build_index
from bleve_ray.search import Index
from bleve_ray.search.levenshtein import within_distance
from bleve_ray.search.query import _parse_dt_nanos


def _lev(a, b):
    d = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
    for i in range(len(a) + 1):
        d[i][0] = i
    for j in range(len(b) + 1):
        d[0][j] = j
    for i in range(1, len(a) + 1):
        for j in range(1, len(b) + 1):
            d[i][j] = min(
                d[i - 1][j] + 1,
                d[i][j - 1] + 1,
                d[i - 1][j - 1] + (a[i - 1] != b[j - 1]),
            )
    return d[-1][-1]


def test_levenshtein_band_leak():
    # the round-1 bug: out-of-band 0 read via prev[j] when len gap == k
    assert not within_distance("ab", "xyz", 1)
    assert not within_distance("abc", "wxyz", 1)
    assert within_distance("ab", "xb", 1)
    assert within_distance("b", "", 1)
    assert not within_distance("ab", "", 1)


def test_levenshtein_matches_full_dp():
    rng = random.Random(7)
    al = "abcx"
    for _ in range(1500):
        a = "".join(rng.choices(al, k=rng.randint(0, 7)))
        b = "".join(rng.choices(al, k=rng.randint(0, 7)))
        for k in (0, 1, 2):
            assert within_distance(a, b, k, transpositions=False) == (
                _lev(a, b) <= k
            ), (a, b, k)


def _osa(a, b):
    """Full optimal-string-alignment DP (restricted Damerau)."""
    d = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
    for i in range(len(a) + 1):
        d[i][0] = i
    for j in range(len(b) + 1):
        d[0][j] = j
    for i in range(1, len(a) + 1):
        for j in range(1, len(b) + 1):
            cost = a[i - 1] != b[j - 1]
            d[i][j] = min(
                d[i - 1][j] + 1, d[i][j - 1] + 1, d[i - 1][j - 1] + cost
            )
            if (
                i > 1
                and j > 1
                and a[i - 1] == b[j - 2]
                and a[i - 2] == b[j - 1]
            ):
                d[i][j] = min(d[i][j], d[i - 2][j - 2] + 1)
    return d[-1][-1]


def test_transposition_distance_matches_osa_dp():
    """Default mode is the reference's (snapshot_index.go:58-62 builds
    Levenshtein automata with transpositions=true)."""
    assert within_distance("smrat", "smart", 1)
    assert not within_distance("smrat", "smart", 1, transpositions=False)
    rng = random.Random(11)
    al = "abcx"
    for _ in range(1500):
        a = "".join(rng.choices(al, k=rng.randint(0, 7)))
        b = "".join(rng.choices(al, k=rng.randint(0, 7)))
        for k in (0, 1, 2):
            assert within_distance(a, b, k) == (_osa(a, b) <= k), (a, b, k)


def test_parse_dt_nanos_exact():
    # float seconds lose precision near microsecond boundaries
    assert _parse_dt_nanos("2262-01-01T00:00:00.000001Z") == (
        9214646400 * 1_000_000_000 + 1_000
    )
    assert _parse_dt_nanos("1970-01-01T00:00:00Z") == 0
    assert _parse_dt_nanos("1969-12-31T23:59:59.999999Z") == -1_000
    d = datetime.datetime(
        2024, 5, 17, 12, 34, 56, 789123, tzinfo=datetime.timezone.utc
    )
    want = int(d.replace(microsecond=0).timestamp()) * 1_000_000_000
    want += 789123 * 1000
    assert _parse_dt_nanos("2024-05-17T12:34:56.789123Z") == want


@pytest.fixture(scope="module")
def idx(ray_session, tiny_corpus_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("advice_idx"))
    files = sorted(
        os.path.join(tiny_corpus_dir, f) for f in os.listdir(tiny_corpus_dir)
    )
    build_index(files, d, IndexOptions(num_shards=2, bucket_bits=6))
    return Index.open(d)


def test_term_range_open_ended(idx):
    # {"min": X} with no max must not raise (nil max bound,
    # search_term_range.go NewTermRangeSearcher)
    r = idx.search(
        {"query": {"min": "lambda", "field": "content"}, "size": 5}
    )
    assert r.total_hits > 0
    r2 = idx.search(
        {"query": {"max": "lambda", "field": "content"}, "size": 5}
    )
    assert r2.total_hits > 0
    # fully open range == every doc with any term in the field
    from bleve_ray.search.query import TermRangeQuery

    r3 = idx.search(
        {"query": TermRangeQuery(field="content"), "size": 5}
    )
    assert r3.total_hits >= max(r.total_hits, r2.total_hits)


def test_prefix_successor_bound():
    from bleve_ray.search.reader import _prefix_successor

    assert _prefix_successor("abc") == "abd"
    # terms continuing with U+10FFFF itself must stay inside the bound
    assert _prefix_successor("a") == "b"
    assert "a\U0010ffffzzz" < _prefix_successor("a")
    # trailing max codepoints roll over
    assert _prefix_successor("a\U0010ffff") == "b"
    assert _prefix_successor("\U0010ffff") is None
    # surrogate gap is skipped
    assert _prefix_successor("퟿") == ""


def test_terms_with_prefix_includes_max_codepoint_continuation(
    ray_session, tmp_path_factory
):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bleve_ray.index import FieldConfig
    from bleve_ray.search import Index

    d = tmp_path_factory.mktemp("pfxsucc")
    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], type=pa.int64()),
            "tag": pa.array(["pre\U0010ffffmore", "prefix", "other"]),
        }
    )
    src = str(d / "t.parquet")
    pq.write_table(tbl, src)
    idx_dir = str(d / "idx")
    build_index(
        [src],
        idx_dir,
        IndexOptions(
            fields={"tag": FieldConfig(analyzer="keyword", positions=False)},
            doc_id_fields=["doc_id"],
            num_shards=2,
            bucket_bits=6,
        ),
    )
    idx = Index.open(idx_dir)
    terms = idx.reader.terms_with_prefix("tag", "pre")
    assert terms == ["prefix", "pre\U0010ffffmore"]


# --- round-4 ADVICE fixes ---------------------------------------------------


def test_unix_parser_float_vs_string_consistent():
    """unix_sec(1.5) must equal unix_sec("1.5"): the exact-int path only
    applies to ints / int-strings, not truncated floats."""
    from bleve_ray.analysis.datetime_parsers import resolve_datetime_parser

    p = resolve_datetime_parser("unix_sec")
    assert p(1.5) == p("1.5") == 1_500_000_000
    assert p(1) == p("1") == 1_000_000_000
    # exact-int precision above 2^53 survives (nanosecond timestamps)
    big = 9_007_199_254_740_993  # 2^53 + 1
    pn = resolve_datetime_parser("unix_nano")
    assert pn(big) == big
    assert pn(str(big)) == big
    assert pn(None) is None
    assert pn(True) is None


def test_go_layout_month_names_case_insensitive():
    """Go time.Parse matches month/weekday names ASCII-case-insensitively."""
    from bleve_ray.analysis.go_layout import compile_go_layout

    p = compile_go_layout("02 Jan 2006")
    want = p("04 Jan 2021")
    assert want is not None
    assert p("04 JAN 2021") == want
    assert p("04 jan 2021") == want
    p2 = compile_go_layout("Monday 02 January 2006")
    want2 = p2("Monday 04 January 2021")
    assert want2 is not None
    assert p2("MONDAY 04 JANUARY 2021") == want2


def test_go_flexible_datetime_object_exact_micros():
    """datetime-object branch uses exact integer arithmetic, never float
    timestamp()."""
    from bleve_ray.analysis.go_layout import make_go_flexible_parser

    p = make_go_flexible_parser(["2006-01-02"])
    d = datetime.datetime(2262, 4, 11, 23, 47, 16, 854775)
    assert p(d) == (
        (d - datetime.datetime(1970, 1, 1)).days * 86_400_000_000_000
        + (d - datetime.datetime(1970, 1, 1)).seconds * 1_000_000_000
        + 854775 * 1000
    )


def test_terms_facet_empty_array_counts_missing():
    """A doc whose array field has zero elements is missing, like the
    reference facet builder."""
    from bleve_ray.search.facets import _partial_counts

    r = _partial_counts({}, ["a", None, [], ["b", "c"], ()])
    assert r["missing"] == 3
    assert r["terms"] == {"a": 1, "b": 1, "c": 1}


def test_to_nanos_exact_at_float_representation_boundary():
    """iso/rfc3339 datetime-object parses must use exact integer
    arithmetic: int(d.timestamp()*1e6) loses a microsecond at float
    representation boundaries (e.g. 2004-07-20T19:48:54.935922Z)."""
    from bleve_ray.analysis.datetime_parsers import parse_iso

    for s, want in [
        ("2004-07-20T19:48:54.935922+00:00", 1090352934935922000),
        ("2040-04-22T15:38:30.725249+00:00", 2218721910725249000),
        ("2038-05-24T00:18:57.973242+00:00", 2158273137973242000),
    ]:
        assert parse_iso(s) == want
        d = datetime.datetime.fromisoformat(s)
        assert parse_iso(d) == want
