"""analysis/datetime/{iso,flexible} parser vector ports:
- TestConversionFromISOStyle (iso_test.go:22-182): java DateTimeFormatter
  layout -> Go reference layout, incl. quoted literals, doubled quotes,
  and every rejected specifier;
- TestFlexibleDateTimeParser (flexible_test.go:25+): first-matching-layout
  parse over the dateOptionalTime list, with exact instants."""

import pytest

from bleve_ray.analysis.go_layout import (
    iso_layout_to_go,
    make_go_flexible_parser,
)

ISO_OK = [
    ("yyyy-MM-dd", "2006-01-02"),
    ("uuu/M''''dd'T'HH:m:ss.SSS", "2006/1''02T15:4:05.000"),
    ("YYYY-MM-dd'T'H:mm:ss zzz", "2006-01-02T15:04:05 MST"),
    ("MMMM dd yyyy', 'HH:mm:ss.SSS", "January 02 2006, 15:04:05.000"),
    ("h 'o'''' clock' a, XXX", "3 o' clock PM, Z07:00"),
    ("YYYY-MM-dd'T'HH:mm:ss'Z'", "2006-01-02T15:04:05Z"),
    ("E MMM d H:mm:ss z Y", "Mon Jan 2 15:04:05 MST 2006"),
    ("yy", "06"),
    ("yyyyy", "02006"),
    ("h", "3"),
    ("hh", "03"),
    ("KK", "03"),
    ("E", "Mon"),
    ("EEE", "Mon"),
    ("EEEE", "Monday"),
    ("S", "0"),
    ("SSSSSSSSS", "000000000"),
    ("z", "MST"),
    ("zzz", "MST"),
    ("zzzz", "MST"),
]

ISO_BAD = [
    "E MMM DD H:m:s z Y",      # unknown DD
    "E MMM''''' H:m:s z Y",    # unbalanced literal quote
    "MMMMM dd yyyy', 'HH:mm:ss.SSS",
    "hhh",
    "EEEEE",
    "SSSSSSSSSS",
    "G",
    "W",
]


@pytest.mark.parametrize("inp,want", ISO_OK, ids=[c[0] for c in ISO_OK])
def test_iso_layout_conversion(inp, want):
    assert iso_layout_to_go(inp) == want


@pytest.mark.parametrize("inp", ISO_BAD)
def test_iso_layout_rejections(inp):
    with pytest.raises(ValueError):
        iso_layout_to_go(inp)


# --- flexible parser ----------------------------------------------------

_LAYOUTS = [
    "2006-01-02T15:04:05.999999999Z07:00",  # RFC3339Nano
    "2006-01-02T15:04:05Z07:00",            # RFC3339
    "2006-01-02T15:04:05",
    "2006-01-02 15:04:05",
    "2006-01-02",
]


def _nanos(y, mo, d, h=0, m=0, s=0, ns=0, tz_h=0):
    import datetime as dt

    t = dt.datetime(y, mo, d, h, m, s, tzinfo=dt.timezone(
        dt.timedelta(hours=tz_h)))
    epoch = dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc)
    delta = t - epoch
    return (delta.days * 86400 + delta.seconds) * 10**9 + ns


FLEX_CASES = [
    ("2014-08-03", _nanos(2014, 8, 3)),
    ("2014-08-03T15:59:30", _nanos(2014, 8, 3, 15, 59, 30)),
    ("2014-08-03 15:59:30", _nanos(2014, 8, 3, 15, 59, 30)),
    ("2014-08-03T15:59:30-08:00",
     _nanos(2014, 8, 3, 15, 59, 30, tz_h=-8)),
    ("2014-08-03T15:59:30.999999999-08:00",
     _nanos(2014, 8, 3, 15, 59, 30, ns=999999999, tz_h=-8)),
]


@pytest.mark.parametrize("inp,want", FLEX_CASES, ids=[c[0] for c in FLEX_CASES])
def test_flexible_parser(inp, want):
    parse = make_go_flexible_parser(_LAYOUTS)
    assert parse(inp) == want


def test_flexible_parser_rejects_garbage():
    parse = make_go_flexible_parser(_LAYOUTS)
    assert parse("not a date time") is None
