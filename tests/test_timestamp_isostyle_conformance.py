"""Ports of TestDateRangeTimestampQueries (search_test.go:3128-3322) and
TestPercentAndIsoStyleDates (:3324-3470): datetime fields fed unix
timestamp STRINGS at second/milli/micro/nano resolution, and
percentstyle vs isostyle layout parsers resolving the same five date
shapes."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bleve_ray.index import FieldConfig, IndexOptions, build_index
from bleve_ray.search import Index

TS_DOCS = {
    "doc1": ("2001/08/20 03:00:10", "998276410", "998276410100",
             "998276410100300", "998276410100300400"),
    "doc2": ("2001/08/20 03:00:20", "998276420", "998276410200",
             "998276410100400", "998276410100300500"),
    "doc3": ("2001/08/20 03:00:30", "998276430", "998276410300",
             "998276410100500", "998276410100300600"),
    "doc4": ("2001/08/20 03:00:40", "998276440", "998276410400",
             "998276410100600", "998276410100300700"),
    "doc5": ("2001/08/20 03:00:50", "998276450", "998276410500",
             "998276410100700", "998276410100300800"),
}
TS_FIELDS = ["date", "seconds", "milliseconds", "microseconds",
             "nanoseconds"]
TS_PARSERS = ["golayout:2006/01/02 15:04:05", "unix_sec", "unix_milli",
              "unix_micro", "unix_nano"]


@pytest.fixture(scope="module")
def ts_index(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("tsidx")
    src = str(root / "d.parquet")
    ids = sorted(TS_DOCS)
    cols = {"doc_id": pa.array(ids, type=pa.string())}
    for fi, f in enumerate(TS_FIELDS):
        cols[f] = pa.array([TS_DOCS[i][fi] for i in ids])
    pq.write_table(pa.table(cols), src)
    d = str(root / "idx")
    build_index(
        [src],
        d,
        IndexOptions(
            fields={
                f: FieldConfig(field_type="datetime", positions=False,
                               datetime_parser=p)
                for f, p in zip(TS_FIELDS, TS_PARSERS)
            },
            doc_id_fields=["doc_id"],
            num_shards=1,
            bucket_bits=6,
        ),
    )
    return Index.open(d)


TS_CASES = [
    ("2001-08-20T03:00:05", "2001-08-20T03:00:25", "date",
     ["doc1", "doc2"]),
    ("2001-08-20T03:00:15", "2001-08-20T03:00:35", "seconds",
     ["doc2", "doc3"]),
    ("2001-08-20T03:00:10.150", "2001-08-20T03:00:10.450", "milliseconds",
     ["doc2", "doc3", "doc4"]),
    ("2001-08-20T03:00:10.100450", "2001-08-20T03:00:10.100650",
     "microseconds", ["doc3", "doc4"]),
    ("2001-08-20T03:00:10.100300550", "2001-08-20T03:00:10.100300850",
     "nanoseconds", ["doc3", "doc4", "doc5"]),
]


@pytest.mark.parametrize(
    "start,end,field,expect", TS_CASES, ids=[c[2] for c in TS_CASES]
)
def test_timestamp_range_queries(ts_index, start, end, field, expect):
    res = ts_index.search(
        {"query": {"start": start, "end": end, "field": field},
         "size": 10}
    )
    assert sorted(h.id for h in res.hits) == expect


PERCENT_LAYOUTS = [
    "%Y/%m/%d %l:%M%p",
    "%d/%m/%Y %H:%M:%S",
    "%Y-%m-%dT%H:%M:%S%z",
    "%d %B %y %l%p %Z",
    "%Y; %b %d (%a) %I:%M:%S.%N%P %z",
]
ISO_LAYOUTS = [
    "yyyy/MM/dd h:mma",
    "dd/MM/yyyy HH:mm:ss",
    "yyyy-MM-dd'T'HH:mm:ssXX",
    "dd MMMM yy ha z",
    "yyyy; MMM dd (EEE) hh:mm:ss.SSSSSaa xx",
]
DATE_VALUES = [
    "2001/08/20 6:00PM",
    "20/08/2001 18:05:00",
    "2001-08-20T18:10:00Z",
    "20 August 01 6PM UTC",
    "2001; Aug 20 (Mon) 06:15:15.23456pm +0000",
]


@pytest.fixture(scope="module")
def percent_iso_index(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("pctiso")
    src = str(root / "d.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(
                    [f"doc{i+1}" for i in range(5)], type=pa.string()
                ),
                "percentDate": pa.array(DATE_VALUES),
                "isoDate": pa.array(DATE_VALUES),
            }
        ),
        src,
    )
    d = str(root / "idx")
    build_index(
        [src],
        d,
        IndexOptions(
            fields={
                "percentDate": FieldConfig(
                    field_type="datetime", positions=False,
                    datetime_parser="percent:" + "|".join(PERCENT_LAYOUTS),
                ),
                "isoDate": FieldConfig(
                    field_type="datetime", positions=False,
                    datetime_parser="isostyle:" + "|".join(ISO_LAYOUTS),
                ),
            },
            doc_id_fields=["doc_id"],
            num_shards=1,
            bucket_bits=6,
        ),
    )
    return Index.open(d)


RANGE_STRINGS = [
    ("2001/08/20 6:00PM", "2001/08/20 6:20PM"),
    ("20/08/2001 18:00:00", "20/08/2001 18:20:00"),
    ("2001-08-20T18:00:00Z", "2001-08-20T18:20:00Z"),
    ("20 August 01 6PM UTC", "20 August 01 7PM UTC"),
    ("2001; Aug 20 (Mon) 06:00:00.00000pm +0000",
     "2001; Aug 20 (Mon) 06:20:20.00000pm +0000"),
]


@pytest.mark.parametrize("field,spec", [
    ("percentDate", "percent:" + "|".join(PERCENT_LAYOUTS)),
    ("isoDate", "isostyle:" + "|".join(ISO_LAYOUTS)),
])
def test_percent_and_iso_style_dates(percent_iso_index, field, spec):
    """All five docs parse under both parser styles, and every range
    expressed in each of the five layout shapes matches all five docs."""
    for start, end in RANGE_STRINGS:
        res = percent_iso_index.search(
            {
                "query": {"start": start, "end": end, "field": field,
                          "inclusive_end": True,
                          "datetime_parser": spec},
                "size": 10,
            }
        )
        assert len(res.hits) == 5, (field, start, end,
                                    [h.id for h in res.hits])
