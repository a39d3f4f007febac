"""TestCustomDateTimeParserLayoutValidation (search_test.go): the
sanitizedgo parser factory must accept every Go reference-layout
(including exotic combinations and the standard time-package constants)
and reject layouts using literal times instead of the magic reference
moment; flexiblego accepts anything."""

import pytest

from bleve_ray.analysis.go_layout import (
    make_go_flexible_parser,
    make_sanitized_parser,
)

CORRECT = [
    "2006-01-02 15:04:05.0000",
    "2006\\01\\02T03:04:05PM",
    "2006/01/02",
    "2006-01-02T15:04:05.999Z0700PMMST",
    "15:04:05.0000Z07:00 Monday",
    # standard Go time constants
    "01/02 03:04:05PM '06 -0700",     # time.Layout
    "Mon Jan _2 15:04:05 2006",       # ANSIC
    "Mon Jan _2 15:04:05 MST 2006",   # UnixDate
    "Mon Jan 02 15:04:05 -0700 2006",  # RubyDate
    "02 Jan 06 15:04 MST",            # RFC822
    "02 Jan 06 15:04 -0700",          # RFC822Z
    "Monday, 02-Jan-06 15:04:05 MST",  # RFC850
    "Mon, 02 Jan 2006 15:04:05 MST",  # RFC1123
    "Mon, 02 Jan 2006 15:04:05 -0700",  # RFC1123Z
    "2006-01-02T15:04:05Z07:00",      # RFC3339
    "2006-01-02T15:04:05.999999999Z07:00",  # RFC3339Nano
    "3:04PM",                          # Kitchen
    "Jan _2 15:04:05",                 # Stamp
    "Jan _2 15:04:05.000",             # StampMilli
    "Jan _2 15:04:05.000000",          # StampMicro
    "Jan _2 15:04:05.000000000",       # StampNano
    "2006-01-02 15:04:05",             # DateTime
    "2006-01-02",                      # DateOnly
    "15:04:05",                        # TimeOnly
    # corrected versions of the incorrect table
    "2006-01-02 03:04:05 -0700",
    "2006-01-02 15:04:05 -0700",
    "2006-01-02 15:04:05.000 -0700 MST",
    "January 2 2006 3:04 PM",
]

INCORRECT = [
    "2000-03-31 01:33:51 +0300",
    "2006-01-02 15:04:51 +0300",
    "2000-03-31 01:33:05 +0300",
    "4:45PM",
    "2006-01-02 15:04:05.445 -0700 MST",
    "August 20 2001 8:55 AM",
    "28/Jul/23 12:48PM",
    "Tue 22 Aug 6:37:30 AM",
]


@pytest.mark.parametrize("layout", CORRECT)
def test_sanitized_accepts_reference_layouts(layout):
    make_sanitized_parser([layout])  # must not raise


@pytest.mark.parametrize("layout", INCORRECT)
def test_sanitized_rejects_literal_time_layouts(layout):
    with pytest.raises(ValueError):
        make_sanitized_parser([layout])


@pytest.mark.parametrize("layout", INCORRECT)
def test_flexible_accepts_anything(layout):
    make_go_flexible_parser([layout])  # flexiblego performs no validation


# --- TestSearchRequestValidatePagination ---------------------------------

import pyarrow as pa
import pyarrow.parquet as pq

from bleve_ray.index import FieldConfig, IndexOptions, build_index
from bleve_ray.search import Index


@pytest.fixture(scope="module")
def pag_index(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("pag")
    src = str(tmp / "d.parquet")
    pq.write_table(
        pa.table({"doc_id": ["a", "b"], "num": [1.0, 2.0],
                  "date": ["2020-01-01T00:00:00Z", "2021-01-01T00:00:00Z"],
                  "text": ["x", "y"]}),
        src,
    )
    out = str(tmp / "idx")
    build_index(
        [src], out,
        IndexOptions(
            fields={"text": FieldConfig(positions=False),
                    "num": FieldConfig(field_type="numeric", positions=False),
                    "date": FieldConfig(field_type="datetime",
                                        positions=False)},
            doc_id_fields=["doc_id"], num_shards=1, bucket_bits=6,
            docvalue_fields=["num", "date"],
        ),
    )
    return Index.open(out)


PAG_CASES = [
    ({"by": "field", "field": "num", "type": "number"}, "search_after",
     "not-a-number"),
    ({"by": "field", "field": "num", "type": "number"}, "search_before",
     "not-a-number"),
    ({"by": "field", "field": "date", "type": "date"}, "search_after",
     "1 March 2023"),
    ({"by": "field", "field": "date", "type": "date"}, "search_before",
     "1 March 2023"),
]


@pytest.mark.parametrize("so,key,val", PAG_CASES,
                         ids=[f"{c[0]['type']}-{c[1]}" for c in PAG_CASES])
def test_invalid_pagination_cursor_rejected(pag_index, so, key, val):
    with pytest.raises(ValueError, match="invalid search"):
        pag_index.search({"query": {"match_all": {}}, "size": 5,
                          "sort": [so], key: [val]})


def test_valid_pagination_cursor_accepted(pag_index):
    r = pag_index.search({
        "query": {"match_all": {}}, "size": 5,
        "sort": [{"by": "field", "field": "num", "type": "number"}],
        "search_after": ["1.5"],
    })
    assert [h.id for h in r.hits] == ["b"]
