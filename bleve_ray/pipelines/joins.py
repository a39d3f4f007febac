"""Temporal joins Ray Data lacks natively (graft brief: as-of join,
range join), built from the documented composition pattern:
groupby(key).map_groups with fully vectorized in-group logic.

Partitioning assumption (documented per the brief): both operators
co-locate rows by the join key via ONE hash shuffle
(ds.groupby("user_id")); within a key group everything is numpy
searchsorted over the sorted right side, so group cost is
O(n log n) in the group size and no group ever needs another group's
data.  Skewed keys bound the largest task; salting is unnecessary here
because a single user's event history fits a task by construction.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def asof_join_events_ds(
    sf_dir: str, left_type: str = "purchase", right_type: str = "click"
):
    """AS-OF join: for each left event, the latest right event timestamp
    of the SAME user with right.ts <= left.ts (DuckDB `ASOF LEFT JOIN`
    semantics; unmatched lefts keep a null right_ts).

    One groupby(user_id) shuffle; in-group: sort both sides once,
    np.searchsorted(right_ts, left_ts, side="right") - 1.
    """

    import ray.data

    def per_user(group: pa.Table) -> pa.Table:
        et = np.asarray(group["event_type"], dtype=object)
        ts = group["ts"].to_numpy()
        eid = np.asarray(group["event_id"], dtype=np.int64)
        lmask = et == left_type
        rmask = et == right_type
        lts, lid = ts[lmask], eid[lmask]
        rts = np.sort(ts[rmask])
        j = np.searchsorted(rts, lts, side="right") - 1
        right_ts = np.full(len(lts), np.datetime64("NaT", "us"))
        ok = j >= 0
        right_ts[ok] = rts[j[ok]]
        uid = group["user_id"][0].as_py()
        return pa.table(
            {
                "event_id": pa.array(lid),
                "user_id": pa.array([uid] * len(lid), type=pa.int64()),
                "ts": pa.array(lts),
                "right_ts": pa.array(right_ts),
            }
        )

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    return ds.groupby("user_id").map_groups(per_user, batch_format="pyarrow")


def range_join_events_ds(
    sf_dir: str,
    left_type: str = "error",
    right_type: str = "purchase",
    window_minutes: int = 60,
):
    """Interval (range) join: for each left event, COUNT the same user's
    right events in (left.ts, left.ts + window].  Equivalent SQL is an
    inequality-predicate join; here it is one groupby(user_id) shuffle
    plus two vectorized searchsorteds per group (no pairwise expansion,
    so a hot key costs O(n log n), not O(n^2))."""

    import ray.data

    win_us = np.timedelta64(window_minutes * 60 * 1_000_000, "us")

    def per_user(group: pa.Table) -> pa.Table:
        et = np.asarray(group["event_type"], dtype=object)
        ts = group["ts"].to_numpy()
        eid = np.asarray(group["event_id"], dtype=np.int64)
        lmask = et == left_type
        lts, lid = ts[lmask], eid[lmask]
        rts = np.sort(ts[et == right_type])
        lo = np.searchsorted(rts, lts, side="right")
        hi = np.searchsorted(rts, lts + win_us, side="right")
        uid = group["user_id"][0].as_py()
        return pa.table(
            {
                "event_id": pa.array(lid),
                "user_id": pa.array([uid] * len(lid), type=pa.int64()),
                "ts": pa.array(lts),
                "n_following": pa.array((hi - lo).astype(np.int64)),
            }
        )

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    return ds.groupby("user_id").map_groups(per_user, batch_format="pyarrow")
