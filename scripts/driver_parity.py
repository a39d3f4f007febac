"""Driver-parity harness: run every ``__ray_entry__.queries()`` entry and
its ``oracle_sql()`` twin over the same parquet tables and compare
row-count / schema / values, the way the round driver does (columns
sorted by name, rows canonicalised, values hashed).

Usage:
    python scripts/driver_parity.py [--sf-dir /root/testdata/sf0.01]
                                    [--only name1,name2] [--json out.json]

Exit code 0 iff every checked entry matches.  This is the in-repo twin
of the driver's CORRECTNESS_r{N}.json gate so regressions surface before
a round boundary instead of at one.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import math
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _to_pandas(x):
    import pandas as pd
    import pyarrow as pa

    if isinstance(x, pd.DataFrame):
        return x
    if isinstance(x, pa.Table):
        return x.to_pandas()
    # ray.data.Dataset
    return x.to_pandas()


def _canon_cell(v):
    """Canonical, hashable form of one cell (drives both the value hash
    and the row sort)."""
    import numpy as np

    if v is None:
        return "\x00null"
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return "\x00nan"
        # round so engine/oracle float64 paths that differ only in the
        # last ulp (summation order) still agree
        return f"f:{f:.9g}"
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return f"i:{int(v)}"
    if isinstance(v, (bytes, bytearray)):
        return "b:" + bytes(v).hex()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_canon_cell(e) for e in v) + "]"
    if isinstance(v, dict):
        return (
            "{"
            + ",".join(
                f"{k}={_canon_cell(v[k])}" for k in sorted(v)
            )
            + "}"
        )
    if hasattr(v, "isoformat"):
        return "t:" + v.isoformat()
    return "s:" + str(v)


def canonicalize(df):
    """-> (sorted column names, sorted list of canonical row tuples)."""
    cols = sorted(df.columns)
    rows = [
        tuple(_canon_cell(df.iloc[i][c]) for c in cols)
        for i in range(len(df))
    ]
    rows.sort()
    return cols, rows


def value_hash(cols, rows) -> str:
    h = hashlib.sha256()
    h.update("|".join(cols).encode())
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()[:16]


def run_oracle(sql: str, sf_dir: str):
    import duckdb

    con = duckdb.connect()
    try:
        for t in TABLES:
            p = os.path.join(sf_dir, f"{t}.parquet")
            if os.path.exists(p):
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
                )
        return con.execute(sql).fetch_df()
    finally:
        con.close()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
            include_dashboard=False,
            ignore_reinit_error=True,
        )

    import __ray_entry__ as E

    qs = E.queries()
    oracles = E.oracle_sql()
    only = set(args.only.split(",")) if args.only else None

    results = {}
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        rec = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "err": None,
        }
        t0 = time.time()
        try:
            mine = _to_pandas(fn(args.sf_dir))
            mc, mr = canonicalize(mine)
            if name in oracles:
                odf = run_oracle(oracles[name], args.sf_dir)
                oc, orows = canonicalize(odf)
                rec["rows_match"] = len(mr) == len(orows)
                rec["schema_match"] = mc == oc
                rec["hash_match"] = value_hash(mc, mr) == value_hash(
                    oc, orows
                )
                rec["engine_rows"] = len(mr)
                rec["oracle_rows"] = len(orows)
                if not rec["hash_match"]:
                    # first differing row, for debugging
                    for a, b in zip(mr, orows):
                        if a != b:
                            rec["first_diff"] = {
                                "engine": list(a)[:8],
                                "oracle": list(b)[:8],
                            }
                            break
            else:
                rec["engine_rows"] = len(mr)
                rec["rows_match"] = rec["schema_match"] = rec[
                    "hash_match"
                ] = True  # rows-only entries have no oracle twin
        except Exception:
            rec["err"] = traceback.format_exc(limit=4)
        rec["sec"] = round(time.time() - t0, 3)
        ok = rec["err"] is None and all(
            rec[k] for k in ("rows_match", "schema_match", "hash_match")
        )
        if not ok:
            n_fail += 1
        results[name] = rec
        print(
            f"{'PASS' if ok else 'FAIL'} {name:28s} "
            f"rows={rec.get('engine_rows')} {rec['sec']}s",
            flush=True,
        )
        if rec["err"]:
            print(rec["err"], flush=True)

    print(f"\n{len(results) - n_fail}/{len(results)} entries match")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
