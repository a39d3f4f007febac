"""Datetime parsers (reference analysis/datetime/*): name -> callable that
parses a value to unix NANOSECONDS (the int64 the datetime field type
indexes, document/field_datetime.go).

Registered like the reference's registry: iso, rfc3339, flexible (layout
list), unix seconds/millis/micros/nanos.
"""

from __future__ import annotations

import datetime as _dt
from typing import Callable, Dict, List, Optional

_REGISTRY: Dict[str, Callable[[object], Optional[int]]] = {}


def register_datetime_parser(name: str, fn) -> None:
    _REGISTRY[name] = fn


def datetime_parser_named(name: str):
    return _REGISTRY[name]


def registered_datetime_parsers() -> List[str]:
    return sorted(_REGISTRY)


_EPOCH = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)


def _to_nanos(d: _dt.datetime) -> int:
    """Exact-integer datetime→nanos: float ``timestamp()`` can lose a
    microsecond at representation boundaries (the same hazard fixed in
    go_layout's parse path, which shares this helper)."""
    if d.tzinfo is None:
        d = d.replace(tzinfo=_dt.timezone.utc)
    delta = d - _EPOCH
    micros = (
        delta.days * 86_400_000_000
        + delta.seconds * 1_000_000
        + delta.microseconds
    )
    return micros * 1000


def parse_iso(v) -> Optional[int]:
    """ISO-8601 / RFC3339 (reference analysis/datetime/iso)."""
    if v is None:
        return None
    if isinstance(v, _dt.datetime):
        return _to_nanos(v)
    s = str(v).replace("Z", "+00:00")
    try:
        return _to_nanos(_dt.datetime.fromisoformat(s))
    except ValueError:
        return None


def make_flexible_parser(layouts: List[str]):
    """Layout-list parser (reference analysis/datetime/flexible): try each
    strptime layout in order."""

    def parse(v) -> Optional[int]:
        if v is None:
            return None
        s = str(v)
        for layout in layouts:
            try:
                return _to_nanos(_dt.datetime.strptime(s, layout))
            except ValueError:
                continue
        return None

    return parse


def _make_unix(scale: int):
    def parse(v) -> Optional[int]:
        if v is None or isinstance(v, bool):
            return None
        # exact integer path ONLY for ints / int-strings: float would lose
        # precision above 2^53 (nanosecond timestamps are ~10^18).  A real
        # float (or float-string) keeps its fractional part: unix_sec(1.5)
        # must equal unix_sec("1.5").
        if isinstance(v, int):
            return v * scale
        if not isinstance(v, float):
            try:
                return int(v) * scale
            except (TypeError, ValueError):
                pass
        try:
            return int(float(v) * scale)
        except (TypeError, ValueError):
            return None

    return parse


register_datetime_parser("iso", parse_iso)
register_datetime_parser("rfc3339", parse_iso)
register_datetime_parser(
    "flexible",
    make_flexible_parser(
        ["%Y-%m-%dT%H:%M:%S", "%Y-%m-%d %H:%M:%S", "%Y-%m-%d", "%Y/%m/%d"]
    ),
)
register_datetime_parser("unix_sec", _make_unix(1_000_000_000))
register_datetime_parser("unix_milli", _make_unix(1_000_000))
register_datetime_parser("unix_micro", _make_unix(1_000))
register_datetime_parser("unix_nano", _make_unix(1))

# Go-layout family (reference analysis/datetime/{percent,sanitized,
# optional,flexible}): percentstyle/sanitizedgo are parser FACTORIES --
# register concrete instances via make_percent_parser /
# make_sanitized_parser with your formats, like the reference's
# DateTimeParserConstructor config.  dateTimeOptional ships ready-made.
from .go_layout import (  # noqa: E402
    make_go_flexible_parser,
    make_isostyle_parser,
    make_optional_parser,
    make_percent_parser,
    make_sanitized_parser,
)

register_datetime_parser("dateTimeOptional", make_optional_parser())
register_datetime_parser(
    "flexiblego",
    make_go_flexible_parser(
        ["2006-01-02T15:04:05Z07:00", "2006-01-02 15:04:05", "2006-01-02"]
    ),
)


def register_percent_parser(name: str, formats: List[str]) -> None:
    """Register a percentstyle instance (percent.go Name='percentstyle'
    + layouts config)."""
    register_datetime_parser(name, make_percent_parser(formats))


def register_sanitized_parser(name: str, layouts: List[str]) -> None:
    """Register a sanitizedgo instance (sanitized.go Name='sanitizedgo'
    + validated Go layouts config)."""
    register_datetime_parser(name, make_sanitized_parser(layouts))


def register_isostyle_parser(name: str, layouts: List[str]) -> None:
    """Register an isostyle instance (iso.go Name='isostyle' +
    ISO/java-DateTimeFormatter layouts config)."""
    register_datetime_parser(name, make_isostyle_parser(layouts))


def resolve_datetime_parser(spec: str):
    """Resolve a parser SPEC that travels inside serialized options to Ray
    workers (a driver-side register_* call never reaches worker
    processes).  Forms:

    - a registered name ("iso", "flexible", "dateTimeOptional", ...)
    - "percent:FMT[|FMT...]"   -> percentstyle instance
    - "golayout:LAYOUT[|...]"  -> sanitizedgo instance (validated)
    - "isostyle:LAYOUT[|...]"  -> isostyle instance (java-ish layouts)
    - "strptime:LAYOUT[|...]"  -> flexible strptime instance
    """
    if ":" in spec:
        kind, _, rest = spec.partition(":")
        formats = rest.split("|")
        if kind == "percent":
            return make_percent_parser(formats)
        if kind == "golayout":
            return make_sanitized_parser(formats)
        if kind == "isostyle":
            return make_isostyle_parser(formats)
        if kind == "strptime":
            return make_flexible_parser(formats)
        raise KeyError(f"unknown datetime parser spec kind: {kind}")
    return datetime_parser_named(spec)
