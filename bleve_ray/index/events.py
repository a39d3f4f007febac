"""Build/merge event callbacks (index/scorch/event.go role).

RegisterEventCallback(name, fn) + per-index selection mirrors scorch's
RegistryEventCallbacks: apps observe index lifecycle progress without
touching engine code.  Fired DRIVER-SIDE at phase boundaries (partition
analyzed, segments built, merge round done, batch introduced, deletes
applied) -- the Ray-idiomatic equivalent of scorch's goroutine events,
since per-task callbacks would have to serialize app closures into every
worker.

Event fields mirror scorch's Event struct: kind, plus duration and a
detail payload.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional

# EventKind names (event.go:39-80 equivalents + build-specific ones)
EVENT_INDEX_START = "index_start"
EVENT_PARTITION_ANALYZED = "partition_analyzed"
EVENT_SEGMENTS_BUILT = "segments_built"
EVENT_MERGER_PROGRESS = "merger_progress"
EVENT_BATCH_INTRODUCTION_START = "batch_introduction_start"
EVENT_BATCH_INTRODUCTION = "batch_introduction"
EVENT_DELETES_APPLIED = "deletes_applied"
EVENT_INDEX_CLOSE = "index_close"


@dataclass
class Event:
    kind: str
    duration_ms: float = 0.0
    detail: Dict = field(default_factory=dict)


_REGISTRY: Dict[str, Callable[[Event], None]] = {}
_ACTIVE: List[str] = []


def register_event_callback(name: str, fn: Callable[[Event], None]) -> None:
    """RegisterEventCallback equivalent: named, process-wide."""
    _REGISTRY[name] = fn


def activate_event_callback(name: str) -> None:
    """Select a registered callback to receive events (the config-keyed
    lookup scorch does at index open)."""
    if name not in _REGISTRY:
        raise KeyError(f"no event callback registered under {name!r}")
    if name not in _ACTIVE:
        _ACTIVE.append(name)


def deactivate_event_callback(name: str) -> None:
    if name in _ACTIVE:
        _ACTIVE.remove(name)


def fire(kind: str, duration_ms: float = 0.0,
         detail: Optional[Dict] = None) -> None:
    if not _ACTIVE:
        return
    ev = Event(kind=kind, duration_ms=duration_ms, detail=detail or {})
    for name in list(_ACTIVE):
        try:
            _REGISTRY[name](ev)
        except Exception:
            # observer errors never break the build (scorch ignores
            # callback panics the same way: observers are best-effort)
            pass


class timed_fire:
    """Context manager: fire(kind, measured duration) on exit."""

    def __init__(self, kind: str, **detail):
        self.kind = kind
        self.detail = detail

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        fire(
            self.kind,
            duration_ms=(time.perf_counter() - self.t0) * 1e3,
            detail=self.detail,
        )
        return False
