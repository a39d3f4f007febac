"""Port of TestDateRangeStringQuery (search_test.go:2611-2900): a
date-range query's own start/end strings parse through a NAMED registry
parser (datetime_parser), independent of the field's index-time parser;
plus the reference's validation errors (missing bounds, unparseable
strings, dates beyond the int64-nano range)."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bleve_ray.analysis.datetime_parsers import register_sanitized_parser
from bleve_ray.index import FieldConfig, IndexOptions, build_index
from bleve_ray.search import Index

DOCS = {
    "doc1": "2001/08/20 6:00PM",
    "doc2": "20/08/2001 18:00:20",
    "doc3": "20/08/2001 18:10:00",
    "doc4": "2001/08/20 6:15PM",
    "doc5": "20/08/2001 18:20:00",
}


@pytest.fixture(scope="module")
def date_index(ray_session, tmp_path_factory):
    register_sanitized_parser(
        "customDT", ["02/01/2006 15:04:05", "2006/01/02 3:04PM"]
    )
    register_sanitized_parser("queryDT", ["02/01/2006 3:04PM"])
    root = tmp_path_factory.mktemp("daterange")
    src = str(root / "d.parquet")
    ids = sorted(DOCS)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, type=pa.string()),
                "date": pa.array([DOCS[i] for i in ids]),
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
                # spec form travels to Ray workers (driver-side
                # register_* never reaches worker processes)
                "date": FieldConfig(
                    field_type="datetime",
                    positions=False,
                    datetime_parser=(
                        "golayout:02/01/2006 15:04:05|2006/01/02 3:04PM"
                    ),
                )
            },
            doc_id_fields=["doc_id"],
            docvalue_fields=["date"],
            num_shards=1,
            bucket_bits=6,
        ),
    )
    return Index.open(d)


CASES = [
    # (start, end, parser, incl_start, incl_end, expected ids)
    ("2001-08-20T18:00:00", "2001-08-20T18:10:00", "", False, False,
     ["doc2"]),
    ("20/08/2001 18:00:00", "2001/08/20 6:10PM", "customDT", True, True,
     ["doc1", "doc2", "doc3"]),
    (None, "20/08/2001 18:15:00", "customDT", True, True,
     ["doc1", "doc2", "doc3", "doc4"]),
    ("2001/08/20 6:15PM", None, "customDT", True, True,
     ["doc4", "doc5"]),
    ("20/08/2001 6:15PM", None, "queryDT", True, True,
     ["doc4", "doc5"]),
]


@pytest.mark.parametrize(
    "start,end,parser,inc_s,inc_e,expect", CASES,
    ids=[f"c{i}" for i in range(len(CASES))],
)
def test_date_range_string_query(date_index, start, end, parser,
                                 inc_s, inc_e, expect):
    q = {"field": "date", "inclusive_start": inc_s,
         "inclusive_end": inc_e}
    if start is not None:
        q["start"] = start
    if end is not None:
        q["end"] = end
    if parser:
        q["datetime_parser"] = parser
    res = date_index.search(
        {"query": q, "size": 10, "fields": ["date"]}
    )
    got = sorted(h.id for h in res.hits)
    assert got == expect
    for h in res.hits:
        assert h.fields["date"] == DOCS[h.id]


@pytest.mark.parametrize(
    "q,msg",
    [
        ({"field": "date", "start": None, "end": None},
         "at least one of start/end"),
        ({"field": "date", "start": "2001-08-20T18:00:00",
          "end": "2001-08-20T18:10:00", "datetime_parser": "customDT"},
         "unable to parse datetime with any of the layouts"),
        ({"field": "date", "start": "3001-08-20T18:00:00",
          "end": "2001-08-20T18:10:00"},
         "invalid/unsupported date range, start: 3001-08-20T18:00:00"),
        ({"field": "date", "start": "2001/08/20 6:00PM",
          "end": "3001/08/20 6:30PM", "datetime_parser": "customDT"},
         "invalid/unsupported date range, end: 3001/08/20 6:30PM"),
    ],
    ids=["no-bounds", "bad-layout", "start-overflow", "end-overflow"],
)
def test_date_range_string_errors(date_index, q, msg):
    with pytest.raises(ValueError, match=msg.replace("/", "/").replace(
            "(", "\\(").replace(")", "\\)")):
        date_index.search({"query": q, "size": 10})


DATE_FACET_CASES = [
    # (start, end, parser, expected count)
    ("2001-08-20 18:00:00", "2001-08-20 18:10:00", "", 2),
    ("20/08/2001 6:00PM", "20/08/2001 6:10PM", "queryDT", 2),
    ("20/08/2001 15:00:00", "2001/08/20 6:10PM", "customDT", 2),
    (None, "2001/08/20 6:15PM", "customDT", 3),
    ("20/08/2001 6:15PM", None, "queryDT", 2),
]


@pytest.mark.parametrize(
    "start,end,parser,count", DATE_FACET_CASES,
    ids=[f"f{i}" for i in range(len(DATE_FACET_CASES))],
)
def test_date_facet_custom_parser(date_index, start, end, parser, count):
    """Port of TestDateRangeFacetQueriesWithCustomDateTimeParser
    (search_test.go:2903-3125): per-range datetime_parser override with
    the reference's dateTimeOptional default."""
    rng = {"name": "test"}
    if start is not None:
        rng["start"] = start
    if end is not None:
        rng["end"] = end
    if parser:
        rng["datetime_parser"] = parser
    res = date_index.search(
        {
            "query": {"match_all": {}},
            "size": 0,
            "facets": {
                "dateFacet": {"field": "date", "size": 100,
                              "date_ranges": [rng]}
            },
        }
    )
    terms = res.facets["dateFacet"]["date_ranges"]
    assert terms[0]["count"] == count, terms


@pytest.mark.parametrize(
    "rng,msg",
    [
        ({"name": "test", "datetime_parser": "queryDT"},
         "must specify either start, end or both"),
        ({"name": "test", "start": "20/08/2001 6:15PM"},
         "using date time parser named dateTimeOptional"),
    ],
    ids=["no-bounds", "default-parser-reject"],
)
def test_date_facet_errors(date_index, rng, msg):
    with pytest.raises(ValueError, match=msg):
        date_index.search(
            {
                "query": {"match_all": {}},
                "size": 0,
                "facets": {
                    "dateFacet": {"field": "date", "size": 100,
                                  "date_ranges": [rng]}
                },
            }
        )
