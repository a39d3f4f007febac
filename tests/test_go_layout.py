"""Go-layout datetime engine (reference analysis/datetime/{percent,
sanitized,optional}): percent-format translation vectors from
percent_test.go, layout validation from sanitized_test.go, parse
round-trips checked in unix nanoseconds."""

import datetime as dt

import pytest

from bleve_ray.analysis.datetime_parsers import (
    datetime_parser_named,
    register_percent_parser,
    register_sanitized_parser,
)
from bleve_ray.analysis.go_layout import (
    compile_go_layout,
    make_optional_parser,
    make_percent_parser,
    make_sanitized_parser,
    percent_to_go_layout,
    validate_go_layout,
)


def _nanos(*args, offset_hours=0, micros=0):
    tz = dt.timezone(dt.timedelta(hours=offset_hours))
    d = dt.datetime(*args, tzinfo=tz)
    return (int(d.timestamp()) * 1_000_000 + micros) * 1000


# --- percent.go parseFormatString vectors (percent_test.go) ---------------

PERCENT_VECTORS = [
    ("%Y-%m-%d", "2006-01-02"),
    ("%Y/%m%%%%%dT%H%M:%S", "2006/01%%02T1504:05"),
    ("%Y-%m-%dT%H:%M:%S %Z%z", "2006-01-02T15:04:05 MSTZ0700"),
    ("%B %e, %Y %l:%i %P %z:M", "January 2, 2006 3:4 pm Z07:00"),
    (
        "Hour %H Minute %Mseconds %S.%N Timezone:%Z:S, Weekday %a; "
        "Day %d Month %b, Year %y",
        "Hour 15 Minute 04seconds 05.999999999 Timezone:MST:S, "
        "Weekday Mon; Day 02 Month Jan, Year 06",
    ),
    ("%Y-%m-%dT%H:%M:%S.%N", "2006-01-02T15:04:05.999999999"),
    ("%H:%M:%S %Z %z", "15:04:05 MST Z0700"),
    ("%H:%M:%S %Z %z:", "15:04:05 MST Z0700:"),
    ("%H:%M:%S %Z %z:M", "15:04:05 MST Z07:00"),
    ("%H:%M:%S %Z %z:S", "15:04:05 MST Z07:00:00"),
    ("%H:%M:%S %Z %z:A", "15:04:05 MST Z0700:A"),
    ("%H:%M:%S %Z %zM", "15:04:05 MST Z0700M"),
    ("%H:%M:%S %Z %zH", "15:04:05 MST Z07"),
    ("%H:%M:%S %Z %zS", "15:04:05 MST Z070000"),
    (
        "%H:%M:%S %Z %z%Z %zS%z:%zH",
        "15:04:05 MST Z0700MST Z070000Z0700:Z07",
    ),
    ("%Y-%m-%d %z", "2006-01-02 Z0700"),
    ("%Y-%m-%d %z:", "2006-01-02 Z0700:"),
    ("%Y-%m-%d %zH", "2006-01-02 Z07"),
    ("%Y-%m-%d %zS", "2006-01-02 Z070000"),
    ("%Y-%m-%d %z:M", "2006-01-02 Z07:00"),
    ("%Y-%m-%d %z:S", "2006-01-02 Z07:00:00"),
    ("%Y-%m-%d %zX", "2006-01-02 Z0700X"),
    ("%Y-%m-%d %z:X", "2006-01-02 Z0700:X"),
    ("%%", "%"),
    ("literal %Y", "literal 2006"),
    ("%Y literal", "2006 literal"),
]


@pytest.mark.parametrize("fmt,layout", PERCENT_VECTORS)
def test_percent_to_go_layout(fmt, layout):
    assert percent_to_go_layout(fmt) == layout


@pytest.mark.parametrize(
    "bad", ["%Y-%m-%d%T%H:%M:%S %ZM", "%Y-%m-%dT%H:%M:%S %ZM%", "%", "%x"]
)
def test_percent_invalid(bad):
    with pytest.raises(ValueError):
        percent_to_go_layout(bad)


# --- sanitized.go validateLayout ------------------------------------------

VALID_LAYOUTS = [
    "2006-01-02",
    "2006-01-02T15:04:05",
    "2006-01-02T15:04:05.999999999Z07:00",
    "Jan _2 15:04:05",
    "01/02/2006 03:04PM",
    "Monday, 02 January 2006",
    "15:04:05.0000000",
]
INVALID_LAYOUTS = [
    "2006-13-02",        # 13 is not a magic token
    "yyyy-mm-dd",
    "2006-01-02 15h04",
    "%Y-%m-%d",
]


@pytest.mark.parametrize("layout", VALID_LAYOUTS)
def test_validate_layout_ok(layout):
    assert validate_go_layout(layout)


@pytest.mark.parametrize("layout", INVALID_LAYOUTS)
def test_validate_layout_bad(layout):
    assert not validate_go_layout(layout)


def test_sanitized_parser_rejects_bad_layout():
    with pytest.raises(ValueError):
        make_sanitized_parser(["yyyy-mm-dd"])


# --- parse semantics -------------------------------------------------------

def test_parse_basic_date():
    p = compile_go_layout("2006-01-02")
    assert p("2023-10-27") == _nanos(2023, 10, 27)
    assert p("not-a-date") is None
    assert p("2023-10-27T00:00:00") is None  # whole-string match only


def test_parse_us_style():
    p = compile_go_layout("01/02/2006")
    assert p("10/27/2023") == _nanos(2023, 10, 27)


def test_parse_time_only_defaults_epoch_date():
    p = compile_go_layout("15:04:05")
    assert p("14:30:00") == _nanos(1970, 1, 1, 14, 30, 0)


def test_parse_rfc3339_with_offset():
    p = compile_go_layout("2006-01-02T15:04:05Z07:00")
    assert p("2014-08-03T15:59:30Z") == _nanos(2014, 8, 3, 15, 59, 30)
    assert p("2014-08-03T15:59:30+08:00") == _nanos(
        2014, 8, 3, 15, 59, 30, offset_hours=8
    )


def test_parse_fractional_seconds():
    p = compile_go_layout("2006-01-02T15:04:05.999999999Z07:00")
    n = p("2014-08-03T15:59:30.123456789+08:00")
    assert n == _nanos(2014, 8, 3, 15, 59, 30, offset_hours=8) + 123456789
    # optional fraction may be absent
    assert p("2014-08-03T15:59:30Z") == _nanos(2014, 8, 3, 15, 59, 30)


def test_parse_required_fraction_width():
    p = compile_go_layout("15:04:05.000")
    assert p("10:11:12.345") == _nanos(1970, 1, 1, 10, 11, 12) + 345_000_000
    assert p("10:11:12") is None
    assert p("10:11:12.3456") is None


def test_parse_month_names_and_ampm():
    p = compile_go_layout("January 2, 2006 3:4 pm Z07:00")
    assert p("August 3, 2014 3:59 pm +08:00") == _nanos(
        2014, 8, 3, 15, 59, 0, offset_hours=8
    )
    assert p("August 3, 2014 12:05 am +00:00") == _nanos(2014, 8, 3, 0, 5, 0)


def test_parse_two_digit_year():
    p = compile_go_layout("01/02/06")
    assert p("10/27/23") == _nanos(2023, 10, 27)
    assert p("10/27/85") == _nanos(1985, 10, 27)


def test_parse_tzname():
    p = compile_go_layout("2006-01-02 15:04:05 MST")
    assert p("2014-08-03 15:59:30 UTC") == _nanos(2014, 8, 3, 15, 59, 30)
    # unknown zone abbreviations match but carry zero offset (Go without
    # a location database behaves the same)
    assert p("2014-08-03 15:59:30 PDT") == _nanos(2014, 8, 3, 15, 59, 30)


def test_percent_parser_end_to_end():
    p = make_percent_parser(["%Y-%m-%d %H:%M:%S", "%Y-%m-%d"])
    assert p("2022-03-05 10:20:30") == _nanos(2022, 3, 5, 10, 20, 30)
    assert p("2022-03-05") == _nanos(2022, 3, 5)
    assert p("05.03.2022") is None


def test_optional_parser_layout_sweep():
    p = make_optional_parser()
    want = _nanos(2014, 8, 3, 15, 59, 30)
    assert p("2014-08-03T15:59:30Z") == want
    assert p("2014-08-03T15:59:30") == want
    assert p("2014-08-03 15:59:30") == want
    assert p("2014-08-03 15:59:30 +0000") == want
    assert p("2014-08-03") == _nanos(2014, 8, 3)
    assert p("2014-08-03T15:59:30.999999999Z") == want + 999_999_999


def test_registry_integration():
    assert datetime_parser_named("dateTimeOptional")("2014-08-03") == _nanos(
        2014, 8, 3
    )
    register_percent_parser("mydates", ["%d/%m/%Y"])
    assert datetime_parser_named("mydates")("27/10/2023") == _nanos(
        2023, 10, 27
    )
    register_sanitized_parser("mygodates", ["2006-01-02 15:04"])
    assert datetime_parser_named("mygodates")("2023-10-27 08:30") == _nanos(
        2023, 10, 27, 8, 30
    )
    with pytest.raises(ValueError):
        register_sanitized_parser("bad", ["not a layout"])
