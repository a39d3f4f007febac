"""Go-style datetime layout engine.

The reference's datetime parsers are thin wrappers over Go's
``time.Parse`` reference-layout scheme ("2006-01-02 15:04:05""):

- percentstyle (analysis/datetime/percent/percent.go) converts a
  strftime-style %-format into a Go layout, then parses with it;
- sanitizedgo (analysis/datetime/sanitized/sanitized.go) validates a
  user-supplied Go layout against the known magic tokens, then parses;
- dateTimeOptional (analysis/datetime/optional/optional.go) is a fixed
  list of six RFC3339-ish Go layouts;
- flexiblego (analysis/datetime/flexible/flexible.go) is a caller
  supplied list of Go layouts.

This module reimplements the layout semantics natively: a Go layout is
compiled once into a regex with named setters, and parsing returns unix
nanoseconds.  Named zones (the "MST" token) resolve to a fixed offset
only for the unambiguous names (UTC/GMT); other abbreviations match but
carry zero offset, same as Go's time.Parse without a location database.
"""

from __future__ import annotations

import datetime as _dt
import re
from typing import Callable, Dict, List, Optional, Tuple

_MONTHS_FULL = [
    "January", "February", "March", "April", "May", "June", "July",
    "August", "September", "October", "November", "December",
]
_MONTHS_ABBR = [m[:3] for m in _MONTHS_FULL]
_WDAYS_FULL = [
    "Monday", "Tuesday", "Wednesday", "Thursday", "Friday", "Saturday",
    "Sunday",
]
_WDAYS_ABBR = [d[:3] for d in _WDAYS_FULL]

# (layout token, regex snippet, setter key) -- scanned longest-first.
# Two-digit numeric tokens require exactly two digits; one-digit tokens
# accept one or two (Go's fixed vs non-fixed getnum).
_TOKENS: List[Tuple[str, str, Optional[str]]] = [
    ("2006", r"(\d{4})", "year4"),
    # Go's time.Parse matches month/weekday names ASCII-case-insensitively
    # (lookup via match() cutoff compare), so "04 JAN 2021" must parse.
    ("January", "((?i:" + "|".join(_MONTHS_FULL) + "))", "month_name"),
    ("Monday", "((?i:" + "|".join(_WDAYS_FULL) + "))", None),
    ("Jan", "((?i:" + "|".join(_MONTHS_ABBR) + "))", "month_abbr"),
    ("Mon", "((?i:" + "|".join(_WDAYS_ABBR) + "))", None),
    # timezone forms, longest first
    ("Z07:00:00", r"(Z|[+-]\d{2}:\d{2}:\d{2})", "tz"),
    ("Z070000", r"(Z|[+-]\d{6})", "tz"),
    ("Z07:00", r"(Z|[+-]\d{2}:\d{2})", "tz"),
    ("Z0700", r"(Z|[+-]\d{4})", "tz"),
    ("Z07", r"(Z|[+-]\d{2})", "tz"),
    ("-07:00:00", r"([+-]\d{2}:\d{2}:\d{2})", "tz"),
    ("-070000", r"([+-]\d{6})", "tz"),
    ("-07:00", r"([+-]\d{2}:\d{2})", "tz"),
    ("-0700", r"([+-]\d{4})", "tz"),
    ("-07", r"([+-]\d{2})", "tz"),
    ("MST", r"([A-Z]{3,5})", "tzname"),
    ("002", r"(\d{3})", "yday"),
    ("__2", r"\s{0,2}(\d{1,3})", "yday"),
    ("_2", r"\s?(\d{1,2})", "day"),
    ("_1", r"\s?(\d{1,2})", "month"),
    ("15", r"(\d{1,2})", "hour24"),
    ("01", r"(\d{2})", "month"),
    ("02", r"(\d{2})", "day"),
    ("03", r"(\d{2})", "hour12"),
    ("04", r"(\d{2})", "minute"),
    ("05", r"(\d{2})", "second"),
    ("06", r"(\d{2})", "year2"),
    ("1", r"(\d{1,2})", "month"),
    ("2", r"(\d{1,2})", "day"),
    ("3", r"(\d{1,2})", "hour12"),
    ("4", r"(\d{1,2})", "minute"),
    ("5", r"(\d{1,2})", "second"),
    ("PM", r"(AM|PM)", "ampm"),
    ("pm", r"(am|pm)", "ampm"),
]

_TZNAME_OFFSETS = {"UTC": 0, "GMT": 0, "Z": 0}


def _compile(layout: str):
    """Go layout -> (compiled regex, [setter keys])."""
    pattern: List[str] = []
    keys: List[str] = []
    i = 0
    n = len(layout)
    while i < n:
        ch = layout[i]
        # fractional seconds: '.' or ',' followed by a run of 9s
        # (optional fraction) or 0s (required, exact width)
        if ch in ".," and i + 1 < n and layout[i + 1] in "90":
            j = i + 1
            digit = layout[i + 1]
            while j < n and layout[j] == digit:
                j += 1
            width = j - i - 1
            if digit == "9":
                pattern.append(r"(?:[.,](\d{1,9}))?")
            else:
                pattern.append(r"[.,](\d{%d})" % width)
            keys.append("frac")
            i = j
            continue
        for tok, rx, key in _TOKENS:
            if layout.startswith(tok, i):
                pattern.append(rx)
                if key is not None:
                    keys.append(key)
                elif rx.startswith("("):
                    keys.append("ignore")
                i += len(tok)
                break
        else:
            pattern.append(re.escape(ch))
            i += 1
    return re.compile("".join(pattern) + r"\Z"), keys


def _tz_to_offset_sec(s: str) -> int:
    if s == "Z":
        return 0
    sign = -1 if s[0] == "-" else 1
    digits = s[1:].replace(":", "")
    h = int(digits[0:2])
    m = int(digits[2:4]) if len(digits) >= 4 else 0
    sec = int(digits[4:6]) if len(digits) >= 6 else 0
    return sign * (h * 3600 + m * 60 + sec)


_EPOCH = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)


def compile_go_layout(layout: str) -> Callable[[str], Optional[int]]:
    """Compile a Go reference layout into parse(str) -> unix nanos
    (None on mismatch).  Missing date parts default to 1970-01-01
    (Go's zero year 0 predates the unix epoch the index stores)."""
    rx, keys = _compile(layout)

    def parse(s: str) -> Optional[int]:
        m = rx.match(s)
        if m is None:
            return None
        vals: Dict[str, object] = {}
        for key, g in zip(keys, m.groups()):
            if g is not None:
                vals[key] = g
        year, month, day = 1970, 1, 1
        if "year4" in vals:
            year = int(vals["year4"])
        elif "year2" in vals:
            y = int(vals["year2"])
            year = 1900 + y if y >= 69 else 2000 + y
        if "month" in vals:
            month = int(vals["month"])
        elif "month_name" in vals:
            month = (
                _MONTHS_FULL.index(str(vals["month_name"]).capitalize()) + 1
            )
        elif "month_abbr" in vals:
            month = (
                _MONTHS_ABBR.index(str(vals["month_abbr"]).capitalize()) + 1
            )
        if "day" in vals:
            day = int(vals["day"])
        hour = int(vals.get("hour24", 0) or 0)
        if "hour12" in vals:
            hour = int(vals["hour12"])
            ampm = str(vals.get("ampm", "")).upper()
            if ampm == "PM" and hour < 12:
                hour += 12
            elif ampm == "AM" and hour == 12:
                hour = 0
        minute = int(vals.get("minute", 0) or 0)
        second = int(vals.get("second", 0) or 0)
        nanos = 0
        if "frac" in vals:
            f = str(vals["frac"])
            nanos = int(f.ljust(9, "0")[:9])
        offset = 0
        if "tz" in vals:
            offset = _tz_to_offset_sec(str(vals["tz"]))
        elif "tzname" in vals:
            offset = _TZNAME_OFFSETS.get(str(vals["tzname"]), 0)
        try:
            d = _dt.datetime(
                year, month, day, hour, minute, second,
                tzinfo=_dt.timezone.utc,
            )
        except ValueError:
            return None
        if "yday" in vals and "day" not in vals:
            d = _dt.datetime(
                year, 1, 1, hour, minute, second, tzinfo=_dt.timezone.utc
            ) + _dt.timedelta(days=int(vals["yday"]) - 1)
        unix_sec = int((d - _EPOCH).total_seconds()) - offset
        return unix_sec * 1_000_000_000 + nanos

    return parse


# --- percentstyle: strftime-ish %-format -> Go layout ----------------------

# analysis/datetime/percent/percent.go formatSpecifierToLayout
_PERCENT_TO_GO: Dict[str, str] = {
    "%": "%",
    "a": "Mon",
    "A": "Monday",
    "d": "02",
    "e": "2",
    "b": "Jan",
    "B": "January",
    "m": "01",
    "y": "06",
    "Y": "2006",
    "H": "15",
    "I": "03",
    "l": "3",
    "p": "PM",
    "P": "pm",
    "M": "04",
    "S": "05",
    "f": "999999",
    "Z": "MST",
    "o": "1",
    "i": "4",
    "s": "5",
    "N": "999999999",
}

_TZ_OPTIONS = {
    "z": "Z0700",
    "z:M": "Z07:00",
    "z:S": "Z07:00:00",
    "zH": "Z07",
    "zS": "Z070000",
}


def percent_to_go_layout(format_string: str) -> str:
    """percent.go parseFormatString: translate %-specifiers to Go layout
    tokens; raises ValueError on an unknown specifier (same contract)."""
    out: List[str] = []
    i = 0
    n = len(format_string)
    while i < n:
        if format_string[i] == "%":
            if i + 1 >= n:
                raise ValueError(
                    "invalid format string, expected character after %"
                )
            spec = format_string[i + 1]
            if spec in _PERCENT_TO_GO:
                out.append(_PERCENT_TO_GO[spec])
                i += 2
            elif spec == "z":
                # checkTZOptions: %z / %z:M / %z:S / %zH / %zS
                j = i + 2
                layout = _TZ_OPTIONS["z"]
                if j < n:
                    nxt = format_string[j]
                    if nxt == ":" and j + 1 < n and format_string[j + 1] in "MS":
                        layout = _TZ_OPTIONS["z:" + format_string[j + 1]]
                        j += 2
                    elif nxt in "HS":
                        layout = _TZ_OPTIONS["z" + nxt]
                        j += 1
                out.append(layout)
                i = j
            else:
                raise ValueError(
                    "invalid format string, unknown format specifier: "
                    + spec
                )
        else:
            out.append(format_string[i])
            i += 1
    return "".join(out)


# --- sanitizedgo validation -------------------------------------------------

# sanitized.go validMagicNumbers / layoutSplitRegex / layoutStripRegex
_VALID_MAGIC = {
    "2006", "06", "01", "1", "_1", "January", "Jan", "02", "2", "_2",
    "__2", "002", "Monday", "Mon", "15", "3", "03", "4", "04", "5",
    "05", "0700", "070000", "07", "00", "",
}
_LAYOUT_SPLIT = re.compile(
    r"[\+\-= :T,Z\.<>;\?!`~@#$%\^&\*|'\"\(\){}\[\]/\\]"
)
_LAYOUT_STRIP = re.compile(r"PM|pm|\.9+|\.0+|MST")


def validate_go_layout(layout: str) -> bool:
    """sanitized.go validateLayout: strip PM/pm/fractions/MST, split on
    separators, require every piece to be a known magic token."""
    stripped = _LAYOUT_STRIP.sub("", layout)
    return all(p in _VALID_MAGIC for p in _LAYOUT_SPLIT.split(stripped))


def make_go_flexible_parser(layouts: List[str]):
    """flexible.go: try each Go layout in order; None if none match."""
    parsers = [compile_go_layout(la) for la in layouts]

    def parse(v) -> Optional[int]:
        if v is None:
            return None
        if isinstance(v, _dt.datetime):
            d = v if v.tzinfo else v.replace(tzinfo=_dt.timezone.utc)
            # exact integer arithmetic: float timestamp() can lose a
            # microsecond at representation boundaries
            delta = d - _EPOCH
            micros = (
                delta.days * 86_400_000_000
                + delta.seconds * 1_000_000
                + delta.microseconds
            )
            return micros * 1000
        s = str(v)
        for p in parsers:
            n = p(s)
            if n is not None:
                return n
        return None

    return parse


def make_percent_parser(format_strings: List[str]):
    """percentstyle: each %-format converts to a Go layout up front."""
    return make_go_flexible_parser(
        [percent_to_go_layout(f) for f in format_strings]
    )


# --- isostyle: java-DateTimeFormatter-ish layouts -> Go layout -------------
# (reference analysis/datetime/iso/iso.go:43-226)

_ISO_ELEMENTS: Dict[str, Dict[int, str]] = {
    "M": {4: "January", 3: "Jan", 2: "01", 1: "1"},
    "d": {2: "02", 1: "2"},
    "a": {2: "pm", 1: "PM"},
    "H": {2: "15", 1: "15"},
    "m": {2: "04", 1: "4"},
    "s": {2: "05", 1: "5"},
    "X": {5: "Z07:00:00", 4: "Z070000", 3: "Z07:00", 2: "Z0700", 1: "Z07"},
    "x": {5: "-07:00:00", 4: "-070000", 3: "-07:00", 2: "-0700", 1: "-07"},
}


def iso_layout_to_go(layout: str) -> str:
    """ISO-style layout string -> Go layout (iso.go:124-226
    parseISOString): quoted sections are literals, letter runs map per
    the element table, unknown specifiers raise."""
    out: List[str] = []
    i, n = 0, len(layout)
    while i < n:
        ch = layout[i]
        if ch == "'":
            if i + 1 < n and layout[i + 1] == "'":
                out.append("'")
                i += 2
                continue
            j = i + 1
            while j < n and layout[j] != "'":
                out.append(layout[j])
                j += 1
            if j == n:
                raise ValueError(
                    "invalid format string, expected text literal "
                    "delimiter: '"
                )
            i = j + 1
            continue
        if ch.isalpha() and ch.isascii():
            count = 1
            while i + count < n and layout[i + count] == ch:
                count += 1
            mapped = _ISO_ELEMENTS.get(ch, {}).get(count)
            if mapped is not None:
                out.append(mapped)
            elif ch in ("y", "u", "Y"):
                out.append("06" if count == 2 else "2006".rjust(count, "0"))
            elif ch in ("h", "K"):
                if count == 2:
                    out.append("03")
                elif count == 1:
                    out.append("3")
                else:
                    raise ValueError(
                        "invalid format string, unknown format "
                        f"specifier: {ch * count}"
                    )
            elif ch == "E":
                if count == 4:
                    out.append("Monday")
                elif count <= 3:
                    out.append("Mon")
                else:
                    raise ValueError(
                        "invalid format string, unknown format "
                        f"specifier: {ch * count}"
                    )
            elif ch == "S":
                if count > 9:
                    raise ValueError(
                        "invalid format string, unknown format "
                        f"specifier: {ch * count}"
                    )
                out.append("0" * count)
            elif ch == "z":
                if count < 5:
                    out.append("MST")
                else:
                    raise ValueError(
                        "invalid format string, unknown format "
                        f"specifier: {ch * count}"
                    )
            else:
                raise ValueError(
                    "invalid format string, unknown format "
                    f"specifier: {ch * count}"
                )
            i += count
            continue
        out.append(ch)
        i += 1
    return "".join(out)


def make_isostyle_parser(layouts: List[str]):
    """isostyle (iso.go Name='isostyle'): each ISO layout converts to a
    Go layout up front."""
    return make_go_flexible_parser(
        [iso_layout_to_go(la) for la in layouts]
    )


def make_sanitized_parser(layouts: List[str]):
    """sanitizedgo: layouts validated against the magic-token set."""
    for la in layouts:
        if not validate_go_layout(la):
            raise ValueError(
                f"invalid datetime parser layout: {la}, please use Go "
                "time package reference-layout constants"
            )
    return make_go_flexible_parser(layouts)


# optional.go's fixed layout list
OPTIONAL_LAYOUTS = [
    "2006-01-02T15:04:05.999999999Z07:00",  # RFC3339Nano
    "2006-01-02T15:04:05Z07:00",  # RFC3339
    "2006-01-02T15:04:05",
    "2006-01-02 15:04:05",
    "2006-01-02 15:04:05 -0700",
    "2006-01-02",
]


def make_optional_parser():
    return make_go_flexible_parser(OPTIONAL_LAYOUTS)
