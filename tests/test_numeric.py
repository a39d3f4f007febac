"""Numeric/datetime prefix-coded fields + range queries, _all field,
DocID query -- verified against DuckDB."""

import duckdb
import numpy as np
import pytest

from bleve_ray.index import FieldConfig, IndexOptions, build_index
from bleve_ray.index.numeric import (
    decode_prefix_coded,
    float64_to_int64,
    int64_to_float64,
    prefix_coded_int64,
    split_int64_range,
    terms_for_value,
)
from bleve_ray.search import Index

SF = "/root/testdata/sf0.001"


def test_prefix_coded_roundtrip():
    rng = np.random.default_rng(0)
    for v in [0, 1, -1, 2**62, -(2**62), 42]:
        for shift in (0, 4, 32, 60):
            t = prefix_coded_int64(v, shift)
            dv, ds = decode_prefix_coded(t)
            assert ds == shift
            assert dv == (v >> shift) << shift
    for f in [0.0, 1.5, -3.25, 1e300, -1e-300]:
        assert int64_to_float64(float64_to_int64(f)) == f
    # sortable: int64 order == float order
    fs = sorted(rng.standard_normal(100).tolist())
    ints = [float64_to_int64(f) for f in fs]
    assert ints == sorted(ints)
    # term bytes sort like values at same shift
    ts = [prefix_coded_int64(i, 0) for i in sorted(ints)]
    assert ts == sorted(ts)


def test_split_range_covers_exactly():
    """Every int in [lo, hi] is covered by exactly one (start,end) range
    at some shift, and nothing outside is."""
    rng = np.random.default_rng(1)
    for _ in range(20):
        lo = int(rng.integers(-1000, 1000))
        hi = lo + int(rng.integers(0, 2000))
        ranges = [
            (decode_prefix_coded(s), decode_prefix_coded(e))
            for s, e in split_int64_range(lo, hi)
        ]
        for v in range(lo - 3, hi + 4):
            n_cover = 0
            for (sv, sh), (ev, eh) in ranges:
                assert sh == eh
                if sv <= (v >> sh) << sh and v <= ev + ((1 << sh) - 1) and sv <= v <= ev + 0:
                    pass
            covered = sum(
                1
                for (sv, sh), (ev, _) in ranges
                if sv <= ((v >> sh) << sh) <= ev
            )
            if lo <= v <= hi:
                assert covered == 1, (lo, hi, v, ranges)
            else:
                assert covered == 0, (lo, hi, v)


@pytest.fixture(scope="module")
def num_index(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("numidx"))
    build_index(
        [f"{SF}/documents.parquet"],
        d,
        IndexOptions(
            fields={
                "text": FieldConfig(analyzer="ascii_alnum_lower"),
                "lang": FieldConfig(analyzer="keyword", positions=False),
                "n_chars": FieldConfig(field_type="numeric", positions=False),
            },
            doc_id_fields=["doc_id"],
            num_shards=4,
            bucket_bits=16,
            enable_all_field=True,
        ),
    )
    return Index.open(d)


@pytest.mark.parametrize(
    "lo,hi,inc_min,inc_max",
    [(100, 300, True, False), (0, 250, True, True), (199, 200, False, True)],
)
def test_numeric_range_counts(num_index, lo, hi, inc_min, inc_max):
    r = num_index.search(
        {
            "query": {
                "min": lo,
                "max": hi,
                "field": "n_chars",
                "inclusive_min": inc_min,
                "inclusive_max": inc_max,
            },
            "size": 1,
        }
    )
    op_lo = ">=" if inc_min else ">"
    op_hi = "<=" if inc_max else "<"
    want = duckdb.sql(
        f"""SELECT count(*) FROM read_parquet('{SF}/documents.parquet')
            WHERE n_chars {op_lo} {lo} AND n_chars {op_hi} {hi}"""
    ).fetchone()[0]
    assert r.total_hits == want


def test_keyword_field_term_query(num_index):
    r = num_index.search({"query": {"term": "de", "field": "lang"}, "size": 1})
    want = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF}/documents.parquet') WHERE lang='de'"
    ).fetchone()[0]
    assert r.total_hits == want


def test_all_field_match(num_index):
    # _all merges text and lang tokens: searching a lang value on _all hits
    r = num_index.search({"query": {"term": "de", "field": "_all"}, "size": 1})
    want = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF}/documents.parquet') WHERE lang='de'"
    ).fetchone()[0]
    assert r.total_hits == want
    # and a text token also hits via _all
    r2 = num_index.search({"query": {"term": "vector", "field": "_all"}, "size": 1})
    assert r2.total_hits > 0


def test_docid_query(num_index):
    r = num_index.search({"query": {"ids": ["3", "7", "999999"]}, "size": 10})
    assert r.total_hits == 2
    assert sorted(h.id for h in r.hits) == ["3", "7"]


def test_datetime_range(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("evidx"))
    build_index(
        [f"{SF}/events.parquet"],
        d,
        IndexOptions(
            fields={
                "event_type": FieldConfig(analyzer="keyword", positions=False),
                "ts": FieldConfig(field_type="datetime", positions=False),
            },
            doc_id_fields=["event_id"],
            num_shards=4,
            bucket_bits=16,
        ),
    )
    idx = Index.open(d)
    lo, hi = "2024-01-10T00:00:00", "2024-01-20T00:00:00"
    r = idx.search(
        {"query": {"start": lo, "end": hi, "field": "ts"}, "size": 1}
    )
    want = duckdb.sql(
        f"""SELECT count(*) FROM read_parquet('{SF}/events.parquet')
            WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
              AND ts < TIMESTAMP '2024-01-20 00:00:00'"""
    ).fetchone()[0]
    assert r.total_hits == want


def test_numeric_codec_properties():
    """Properties over generated values: float64<->sortable-int64 is an
    exact order-preserving bijection; prefix-coded terms decode back."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from bleve_ray.index.numeric import (
        decode_prefix_coded,
        float64_to_int64,
        int64_to_float64,
        prefix_coded_int64,
    )

    @settings(max_examples=300, deadline=None)
    @given(
        st.floats(allow_nan=False, allow_infinity=False),
        st.floats(allow_nan=False, allow_infinity=False),
    )
    def check(a, b):
        ia, ib = float64_to_int64(a), float64_to_int64(b)
        assert int64_to_float64(ia) == a
        assert int64_to_float64(ib) == b
        if a < b:
            assert ia < ib
        elif a == b:
            # reference numeric/float.go Float64ToInt64 maps -0.0 one
            # below +0.0 (sign bit set -> flip all bits -> -1 vs 0):
            # IEEE total order, not == semantics
            import math

            if a == 0.0 and math.copysign(1, a) != math.copysign(1, b):
                assert abs(ia - ib) == 1
            else:
                assert ia == ib
        v, s = decode_prefix_coded(prefix_coded_int64(ia, 0))
        assert s == 0 and v == ia

    check()


def test_string_datetime_field_with_percent_parser(
    ray_session, tmp_path_factory
):
    """A STRING column indexed as field_type="datetime" through a
    registered percentstyle parser (mapping date_format semantics,
    reference mapping/field.go DateFormat + analysis/datetime/percent):
    range queries must count exactly like the timestamp-typed twin."""
    import os

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    src = pq.read_table(f"{SF}/events.parquet", columns=["event_id", "ts"])
    # arrow's %S appends the unit's fractional digits; strip them
    ts_str = pc.replace_substring_regex(
        pc.strftime(src["ts"], format="%d/%m/%Y %H:%M:%S"),
        pattern=r"\.\d+$",
        replacement="",
    )
    d = str(tmp_path_factory.mktemp("pctsrc"))
    pq.write_table(
        pa.table({"event_id": src["event_id"], "ts_str": ts_str}),
        os.path.join(d, "ev.parquet"),
    )
    idxd = str(tmp_path_factory.mktemp("pctidx"))
    build_index(
        [os.path.join(d, "ev.parquet")],
        idxd,
        IndexOptions(
            fields={
                "ts_str": FieldConfig(
                    field_type="datetime",
                    positions=False,
                    datetime_parser="percent:%d/%m/%Y %H:%M:%S",
                )
            },
            doc_id_fields=["event_id"],
            num_shards=2,
            bucket_bits=16,
        ),
    )
    idx = Index.open(idxd)
    r = idx.search(
        {
            "query": {
                "start": "2024-01-10T00:00:00",
                "end": "2024-01-20T00:00:00",
                "field": "ts_str",
            },
            "size": 1,
        }
    )
    want = duckdb.sql(
        f"""SELECT count(*) FROM read_parquet('{SF}/events.parquet')
            WHERE date_trunc('second', ts) >= TIMESTAMP '2024-01-10 00:00:00'
              AND date_trunc('second', ts) < TIMESTAMP '2024-01-20 00:00:00'"""
    ).fetchone()[0]
    assert r.total_hits == want
    assert r.total_hits > 0
