"""Deterministic synthetic source-code corpus (FIXTURES.md F1).

Matches the BASELINE.json input_hint schema exactly:
``(repo:string, path:string, commit:string, lang:string, content:string)``.
Keyword frequencies are Zipf-distributed so hot-term handling (salted /
docnum-range-bucketed shuffle keys) is exercised even at small scale.

Everything is seeded -- same (n_docs, n_files, seed) always produces
byte-identical parquet files, so lineage sha256 checks are reproducible.
"""

from __future__ import annotations

import hashlib
import os
from typing import List

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

LANGS = ["go", "py", "js", "rs", "java"]
EXT = {"go": "go", "py": "py", "js": "js", "rs": "rs", "java": "java"}

# Zipf-ish keyword pool (rank-ordered; sampled with p ~ 1/rank)
KEYWORDS = (
    "func return if err for range nil string int var const type struct "
    "import package map len append error make interface switch case break "
    "continue defer go chan select fallthrough goto else new delete print "
    "while class def self lambda yield assert raise except finally with "
    "pass global nonlocal async await let function export default "
).split()

IDENT_PARTS = (
    "get set handle parse build read write open close init new update "
    "delete create find merge split index search query token term doc "
    "batch stream buffer cache config client server request response "
    "value result count total state node tree list hash key file path "
).split()

STRINGS = (
    "unexpected end of input invalid argument not found permission denied "
    "timeout exceeded connection refused parse error bad request internal "
).split()


def _gen_content(
    rng: np.random.Generator, lang: str,
    min_lines: int = 20, max_lines: int = 120,
) -> str:
    n_lines = int(rng.integers(min_lines, max_lines))
    ranks = rng.zipf(1.3, size=n_lines * 6) - 1
    ranks = np.clip(ranks, 0, len(KEYWORDS) - 1)
    kw = [KEYWORDS[r] for r in ranks]
    idents = rng.integers(0, len(IDENT_PARTS), size=n_lines * 4)
    strs = rng.integers(0, len(STRINGS), size=n_lines)
    lines: List[str] = []
    ki = ii = si = 0
    for ln in range(n_lines):
        a = IDENT_PARTS[idents[ii]]
        b = IDENT_PARTS[idents[ii + 1]]
        c = IDENT_PARTS[idents[ii + 2]]
        ii += 3
        camel = a + b.capitalize()
        kind = ln % 5
        if kind == 0:
            lines.append(f"{kw[ki]} {camel}({c} {kw[ki+1]}) {{")
            ki += 2
        elif kind == 1:
            lines.append(f"    {kw[ki]} {camel}.{b}_{c} != {kw[ki+1]} {{")
            ki += 2
        elif kind == 2:
            lines.append(
                f'        {kw[ki]} "{STRINGS[strs[si]]} {STRINGS[strs[(si+1)%len(STRINGS)]]}"'
            )
            ki += 1
            si += 1
        elif kind == 3:
            lines.append(
                f"    {camel} := {kw[ki]}({b}, {int(rng.integers(0, 1000))})"
            )
            ki += 1
        else:
            lines.append("}")
    return "\n".join(lines) + "\n"


def make_corpus_table(
    n_docs: int, seed: int = 42, start_doc: int = 0,
    min_lines: int = 20, max_lines: int = 120,
) -> pa.Table:
    rows = {k: [] for k in ("repo", "path", "commit", "lang", "content")}
    for i in range(start_doc, start_doc + n_docs):
        rng = np.random.default_rng(seed * 1_000_003 + i)
        lang = LANGS[i % len(LANGS)]
        rows["repo"].append(f"org{i % 7}/repo{i % 23}")
        rows["path"].append(f"pkg{i % 11}/file_{i}.{EXT[lang]}")
        rows["commit"].append(
            hashlib.sha1(f"{seed}:{i}".encode()).hexdigest()[:12]
        )
        rows["lang"].append(lang)
        rows["content"].append(_gen_content(rng, lang, min_lines, max_lines))
    return pa.table(
        {k: pa.array(v, type=pa.string()) for k, v in rows.items()}
    )


def write_corpus(
    out_dir: str, n_docs: int, n_files: int = 8, seed: int = 42,
    min_lines: int = 20, max_lines: int = 120,
) -> List[str]:
    """Write the corpus as n_files parquet files; returns file paths."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    per = (n_docs + n_files - 1) // n_files
    start = 0
    for f in range(n_files):
        cnt = min(per, n_docs - start)
        if cnt <= 0:
            break
        tbl = make_corpus_table(
            cnt, seed=seed, start_doc=start,
            min_lines=min_lines, max_lines=max_lines,
        )
        p = os.path.join(out_dir, f"corpus_{f:05d}.parquet")
        pq.write_table(tbl, p, compression="snappy")
        paths.append(p)
        start += cnt
    return paths


def write_corpus_parallel(
    out_dir: str, n_docs: int, n_files: int = 8, seed: int = 42,
    min_lines: int = 20, max_lines: int = 120,
) -> List[str]:
    """Ray-parallel corpus writer (same bytes as write_corpus: each file's
    content depends only on (seed, start_doc, count))."""
    import ray

    os.makedirs(out_dir, exist_ok=True)

    @ray.remote
    def _write_one(f: int, start: int, cnt: int) -> str:
        tbl = make_corpus_table(
            cnt, seed=seed, start_doc=start,
            min_lines=min_lines, max_lines=max_lines,
        )
        p = os.path.join(out_dir, f"corpus_{f:05d}.parquet")
        pq.write_table(tbl, p, compression="snappy")
        return p

    per = (n_docs + n_files - 1) // n_files
    refs = []
    start = 0
    for f in range(n_files):
        cnt = min(per, n_docs - start)
        if cnt <= 0:
            break
        refs.append(_write_one.remote(f, start, cnt))
        start += cnt
    return sorted(ray.get(refs))


def doc_id_array(batch: pa.Table) -> pa.Array:
    """External docID = repo + "/" + path + "@" + commit (stable string).

    Mirrors the role of bleve's external doc ID (_id); the choice of
    separator is ours, recorded here once."""
    import pyarrow.compute as pc

    repo_path = pc.binary_join_element_wise(batch["repo"], batch["path"], "/")
    return pc.binary_join_element_wise(repo_path, batch["commit"], "@")
