"""TestValidateDatetimeRanges (search/query/date_range_test.go:53-140):
DateRangeQuery.Validate accepts endpoints only inside the RFC3339-
compatible window [1677-12-01T00:00:00Z, 2262-04-11T11:59:59Z]."""

import pytest

from bleve_ray.search.query import DateRangeQuery, validate_query

VECTORS = [
    ("2019-03-22T13:25:00Z", "2019-03-22T18:25:00Z", True),
    ("2019-03-22T13:25:00Z", "9999-03-22T13:25:00Z", False),
    ("2019-03-22T13:25:00Z", "2262-04-11T11:59:59Z", True),
    ("2019-03-22T13:25:00Z", "2262-04-12T00:00:00Z", False),
    ("1950-03-22T12:23:23Z", "1960-02-21T15:23:34Z", True),
    # both zero endpoints -> must specify start or end
    (None, None, False),
    (None, "2000-01-01T00:00:00Z", True),
    ("1677-11-30T11:59:59Z", "2262-04-11T11:59:59Z", False),
    ("2262-04-12T00:00:00Z", "2262-04-11T11:59:59Z", False),
    ("1677-12-01T00:00:00Z", "2262-04-12T00:00:00Z", False),
    ("1677-12-01T00:00:00Z", "1677-11-30T11:59:59Z", False),
    ("1677-12-01T00:00:00Z", "2262-04-11T11:59:59Z", True),
]


@pytest.mark.parametrize("start,end,ok", VECTORS)
def test_validate_datetime_ranges(start, end, ok):
    q = DateRangeQuery(start=start, end=end, field="when")
    if ok:
        validate_query(q)
    else:
        with pytest.raises(ValueError):
            validate_query(q)
