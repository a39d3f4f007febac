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


def _to_nanos(d: _dt.datetime) -> int:
    if d.tzinfo is None:
        d = d.replace(tzinfo=_dt.timezone.utc)
    return int(d.timestamp() * 1_000_000) * 1000


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
        if v is None:
            return None
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
