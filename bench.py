#!/usr/bin/env python
"""Benchmark harness (driver contract).

Default: runs the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) with ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS or 32) and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...,
   "num_cpus": N, ...}

Headline pipelines:
  build      index build over the synthetic code corpus (input_hint schema),
             docs/s + MB/s
  query      BM25 query set (term / match-and / match-or / phrase) over the
             built index, p50/p99 latency
  pipelines  minhash dedup pairs + ANN cosine top-k over the driver tables

--scaling: runs the build twice in fresh subprocesses (num_cpus=8 vs 32,
i.e. N vs 4N) on the same input and reports both throughputs + scaling
efficiency (the sandbox substitute for the two-cluster-size criterion).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

DEFAULT_SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")


def sf_of(sf_dir: str) -> float:
    base = os.path.basename(os.path.normpath(sf_dir))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def corpus_for(sf: float, tmp_root: str = "/tmp/bleve_ray_bench",
               scale_mult: int = 1, doc_lines: str = "20,120") -> tuple:
    """Deterministic synthetic code corpus sized to the scale factor.

    doc_lines "lo,hi" controls file sizes; the scaling run uses realistic
    source-file sizes (60-360 lines, ~3KB) rather than the default small
    docs."""
    from bleve_ray.corpus import write_corpus

    lo, hi = (int(x) for x in doc_lines.split(","))
    n_docs = max(512, int(200_000 * sf)) * scale_mult
    n_files = max(8, n_docs // 1000)
    d = os.path.join(tmp_root, f"corpus_{n_docs}_l{lo}_{hi}")
    marker = os.path.join(d, "DONE")
    if not os.path.exists(marker):
        import ray

        from bleve_ray.corpus import write_corpus_parallel

        shutil.rmtree(d, ignore_errors=True)
        if ray.is_initialized():
            write_corpus_parallel(d, n_docs=n_docs, n_files=n_files, seed=42,
                                  min_lines=lo, max_lines=hi)
        else:
            write_corpus(d, n_docs=n_docs, n_files=n_files, seed=42,
                         min_lines=lo, max_lines=hi)
        open(marker, "w").write("ok")
    files = sorted(
        os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
    )
    total_bytes = sum(os.path.getsize(f) for f in files)
    return files, n_docs, total_bytes


def bench_build(files, index_dir: str, num_cpus: int,
                warmup: bool = False) -> dict:
    from bleve_ray.index import IndexOptions, build_index

    import math

    shutil.rmtree(index_dir, ignore_errors=True)
    # size buckets so each shard gets ~8 initial segments -> one merge round
    n_files = len(files)
    fgroup_bits = max(0, math.ceil(math.log2(max(1, n_files / 8))))
    # num_shards fixed so both scaling levels build the IDENTICAL job
    opts = IndexOptions(
        num_shards=32,
        bucket_bits=32 + fgroup_bits,
        merge_concurrency=num_cpus,
        # steady-state tiered policy: <=10 segments per tier like the
        # reference merge policy (merge_plan.go:160-168); merging to a
        # single segment is ForceMerge, not part of a normal build
        target_segments_per_shard=10,
        # optional memory-backed chunk-exchange root (BASELINE.md A/B:
        # no measurable win on this VM -- the transient chunks are
        # deleted before writeback, so the page cache already makes the
        # on-disk exchange memory-backed; kept as an option for hosts
        # with slow durable storage)
        chunk_root=os.environ.get("BLEVE_RAY_CHUNK_DIR") or None,
    )
    if warmup:
        # untimed warm-up build: pre-faults worker heaps and page cache so
        # the timed run measures compute+shuffle, not this VM's (very slow)
        # first-touch page faults -- per the Ray guide's warm-first advice
        build_index(files, index_dir, opts)
        shutil.rmtree(index_dir, ignore_errors=True)
    # this sandbox VM's throughput swings +-30-40% run to run (shared-host
    # jitter); best-of-3 timed reps measures the engine, not the neighbor
    reps = 3
    wall = None
    for _ in range(reps):
        shutil.rmtree(index_dir, ignore_errors=True)
        t0 = time.perf_counter()
        man = build_index(files, index_dir, opts)
        w = time.perf_counter() - t0
        wall = w if wall is None else min(wall, w)
    return {
        "build_sec": round(wall, 3),
        "doc_count": man.stats["doc_count"],
        "docs_per_sec": round(man.stats["doc_count"] / wall, 1),
        "segments": len(man.segments),
        "timed_reps": reps,
    }


QUERY_TERMS = [
    "func", "return", "err", "string", "interface", "stream", "buffer",
    "cache", "config", "client", "server", "request", "response", "value",
    "result", "count", "total", "state", "node", "tree", "list", "hash",
    "key", "file", "path", "merge", "split", "index", "search", "query",
]


def bench_query(index_dir: str, rounds: int = 5) -> dict:
    from bleve_ray.search import Index

    idx = Index.open(index_dir)
    reqs = []
    for t in QUERY_TERMS:
        reqs.append(("term", {"query": {"term": t, "field": "content"}, "size": 10}))
    for i in range(0, len(QUERY_TERMS) - 1, 3):
        a, b = QUERY_TERMS[i], QUERY_TERMS[i + 1]
        reqs.append(
            ("and", {"query": {"match": f"{a} {b}", "field": "content",
                               "operator": "and"}, "size": 10})
        )
        reqs.append(
            ("or", {"query": {"match": f"{a} {b}", "field": "content"},
                     "size": 10})
        )
    for ph in ["return nil", "parse error", "if err", "bad request"]:
        reqs.append(
            ("phrase", {"query": {"match_phrase": ph, "field": "content"},
                        "size": 10})
        )
    # warmup: run every request once untimed (open segment readers,
    # row-group caches) so the timed rounds measure steady-state latency
    for _, r in reqs:
        idx.search(r)
    lat = []
    per_kind = {}
    for _ in range(rounds):
        for kind, r in reqs:
            t0 = time.perf_counter()
            idx.search(r)
            dt = (time.perf_counter() - t0) * 1e3
            lat.append(dt)
            per_kind.setdefault(kind, []).append(dt)
    lat.sort()
    return {
        "n_queries": len(lat),
        "p50_ms": round(statistics.median(lat), 3),
        "p99_ms": round(lat[int(len(lat) * 0.99) - 1], 3),
        "mean_ms": round(statistics.mean(lat), 3),
        "per_kind_p50_ms": {
            k: round(statistics.median(v), 3) for k, v in per_kind.items()
        },
    }


def bench_pipelines(sf_dir: str) -> dict:
    from bleve_ray.pipelines.ann import ann_cosine_topk_ds
    from bleve_ray.pipelines.dedup import minhash_pairs_ds

    t0 = time.perf_counter()
    n_pairs = minhash_pairs_ds(sf_dir).count()
    t_minhash = time.perf_counter() - t0
    t0 = time.perf_counter()
    ann_cosine_topk_ds(sf_dir)
    t_ann = time.perf_counter() - t0
    from bleve_ray.pipelines.dedup import simhash_ds
    from bleve_ray.pipelines.text_stats import quality_ds

    t0 = time.perf_counter()
    n_docs = simhash_ds(sf_dir).count()
    t_simhash = time.perf_counter() - t0
    t0 = time.perf_counter()
    quality_ds(sf_dir).count()
    t_quality = time.perf_counter() - t0
    from bleve_ray.pipelines.text_stats import (
        bpe_token_count_ds,
        sessionize_events_ds,
    )

    t0 = time.perf_counter()
    n_sessions = sessionize_events_ds(sf_dir).count()
    t_sessions = time.perf_counter() - t0
    t0 = time.perf_counter()
    bpe_token_count_ds(sf_dir).count()
    t_bpe = time.perf_counter() - t0
    # nested same-element scoped search (lineitem -> nested orders,
    # index cached after the first call; timed run = the scoped
    # conjunction + per-candidate element verification)
    import __ray_entry__ as _entry

    _entry._q_nested_scope_docs(sf_dir)  # warm: build/cache the index
    t0 = time.perf_counter()
    n_nested = len(_entry._q_nested_scope_docs(sf_dir))
    t_nested = time.perf_counter() - t0
    return {
        "minhash_pairs_sec": round(t_minhash, 3),
        "minhash_pairs": n_pairs,
        "ann_topk_sec": round(t_ann, 3),
        "simhash_sec": round(t_simhash, 3),
        "simhash_docs": n_docs,
        "quality_sec": round(t_quality, 3),
        "sessions_sec": round(t_sessions, 3),
        "sessions": n_sessions,
        "bpe_tokens_sec": round(t_bpe, 3),
        "nested_scope_sec": round(t_nested, 3),
        "nested_scope_rows": n_nested,
    }


def bench_knn_ivf(
    n_vec: int = 100_000,
    dim: int = 64,
    nlist: int = 64,
    nprobe: int = 8,
    n_queries: int = 20,
) -> dict:
    """knn-at-scale: the `knn` request path over a >=100k-vector index
    with the IVF sidecar.  Reports query p50 and the candidate-scan
    FRACTION (vectors actually read / corpus size) — the number that
    shows the sidecar prunes instead of brute-force scanning.  The
    corpus is deterministic clustered Gaussians (seeded), built once
    and cached under /tmp/bleve_ray_bench."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bleve_ray.index import FieldConfig, IndexOptions, build_index
    from bleve_ray.index.knn_ivf import build_knn_ivf, load_knn_ivf
    from bleve_ray.search import Index

    base = f"/tmp/bleve_ray_bench/knn_{n_vec}_{dim}_{nlist}"
    src = os.path.join(base, "vecs.parquet")
    idx_dir = os.path.join(base, "idx")
    rng = np.random.default_rng(7)
    centers = rng.standard_normal((nlist, dim)) * 4.0
    sidecar_meta = os.path.join(
        idx_dir, "knn_ivf", "embedding", "_ivf_meta.json"
    )
    if not os.path.exists(sidecar_meta):
        shutil.rmtree(base, ignore_errors=True)
        os.makedirs(base, exist_ok=True)
        cell = rng.integers(0, nlist, n_vec)
        X = (
            centers[cell] + rng.standard_normal((n_vec, dim))
        ).astype(np.float32)
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(
                        np.arange(n_vec, dtype=np.int64)
                    ),
                    "embedding": pa.ListArray.from_arrays(
                        pa.array(
                            np.arange(
                                0, (n_vec + 1) * dim, dim, dtype=np.int32
                            )
                        ),
                        pa.array(X.reshape(-1)),
                    ),
                }
            ),
            src,
        )
        build_index(
            [src],
            idx_dir,
            IndexOptions(
                fields={
                    "vec_id": FieldConfig(
                        field_type="numeric", positions=False
                    )
                },
                doc_id_fields=["vec_id"],
                num_shards=4,
                docvalue_fields=["embedding"],
            ),
        )
        build_knn_ivf(idx_dir, "embedding", nlist=nlist)
    idx = Index.open(idx_dir)
    ivf = load_knn_ivf(idx.reader, "embedding")
    qrng = np.random.default_rng(11)
    queries = (
        centers[qrng.integers(0, nlist, n_queries)]
        + qrng.standard_normal((n_queries, dim))
    )
    lats, fracs = [], []
    for q in queries:
        req = {
            "query": {"match_none": {}},
            "knn": [
                {
                    "field": "embedding",
                    "vector": q.tolist(),
                    "k": 10,
                    "nprobe": nprobe,
                }
            ],
            "size": 10,
        }
        t0 = time.perf_counter()
        idx.search(req)
        lats.append((time.perf_counter() - t0) * 1e3)
        nums, _ = ivf.candidates(q, nprobe)
        fracs.append(len(nums) / n_vec)
    lats.sort()
    return {
        "p50_ms": round(lats[len(lats) // 2], 3),
        "p99_ms": round(lats[-1], 3),
        "scan_frac": round(float(np.median(fracs)), 4),
        "n_vec": n_vec,
        "nprobe": nprobe,
        "nlist": nlist,
    }


def contention_probe() -> float:
    """4000x4000 float64 matmul wall time (this container's OpenBLAS is
    built MAX_THREADS=2), the host-noise probe documented in BASELINE.md
    (clean host ~1 s; the 2026-08-18 contention episode measured
    8.7-16.2 s).  Runs in a fresh subprocess.  Emitted in the bench JSON
    so a polluted measurement window is machine-detectable."""
    env = dict(os.environ)
    code = (
        "import numpy as np, time; "
        "rng = np.random.default_rng(0); "
        "a = rng.standard_normal((4000, 4000)); "
        "b = rng.standard_normal((4000, 4000)); "
        "t0 = time.perf_counter(); a @ b; "
        "print(time.perf_counter() - t0)"
    )
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=600)
    return round(float(r.stdout.strip()), 2)


def run_all(num_cpus: int, sf_dir: str, build_only: bool = False,
            scale_mult: int = 1, warmup: bool = False,
            doc_lines: str = "20,120") -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="error",
        log_to_driver=False,
    )
    sf = sf_of(sf_dir)
    files, n_docs, total_bytes = corpus_for(
        sf, scale_mult=scale_mult, doc_lines=doc_lines
    )
    index_dir = f"/tmp/bleve_ray_bench/index_{n_docs}_{num_cpus}"
    out = {"sf": sf, "num_cpus": num_cpus, "corpus_mb": round(total_bytes / 1e6, 1)}
    if not warmup:
        # small untimed warm-up (worker spin-up + page cache) so the timed
        # build measures the pipeline, not Ray cold start
        wfiles, _, _ = corpus_for(0.001, scale_mult=1, doc_lines=doc_lines)
        bench_build(wfiles, index_dir + "_warm", num_cpus)
        shutil.rmtree(index_dir + "_warm", ignore_errors=True)
    b = bench_build(files, index_dir, num_cpus, warmup=warmup)
    out.update({f"build.{k}": v for k, v in b.items()})
    out["mb_per_sec"] = round(total_bytes / 1e6 / b["build_sec"], 1)
    if not build_only:
        q = bench_query(index_dir)
        out.update({f"query.{k}": v for k, v in q.items()})
        p = bench_pipelines(sf_dir)
        out.update({f"pipe.{k}": v for k, v in p.items()})
        kn = bench_knn_ivf()
        out.update({f"knn_ivf.{k}": v for k, v in kn.items()})
    ray.shutdown()
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--build-only", action="store_true")
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    ap.add_argument("--scale-mult", type=int, default=1)
    ap.add_argument("--warmup", action="store_true")
    ap.add_argument("--doc-lines", default="20,120")
    ap.add_argument("--ceiling", action="store_true",
                    help="pure-compute scaling ceiling: analysis-only "
                         "map_batches, no shuffle/writes, 8 vs 32 cpus")
    ap.add_argument("--ceiling-once", action="store_true")
    args = ap.parse_args()

    num_cpus = args.cpus or int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    if args.ceiling_once:
        # one warm analysis-only pass at --cpus; prints docs/sec
        import ray

        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, logging_level="error",
                 log_to_driver=False)
        import ray.data

        from bleve_ray.analysis.analyzers import analyzer_named
        from bleve_ray.analysis.freq import analyze_batch

        files, n_docs, _ = corpus_for(
            sf_of(args.sf_dir), scale_mult=args.scale_mult,
            doc_lines=args.doc_lines,
        )

        def analyze_only(batch):
            import pyarrow as pa

            # feed the Arrow column directly (the build's own path);
            # the old to_pylist() conversion deflated the probe ~2x,
            # making "build above ceiling" reads too easy
            analyze_batch(batch["content"], analyzer_named("standard"))
            return pa.table({"n": pa.array([len(batch)])})

        def run_once():
            ray.data.read_parquet(files).map_batches(
                analyze_only, batch_format="pyarrow", batch_size=1024
            ).count()

        run_once()  # warm
        t0 = time.perf_counter()
        run_once()
        wall = time.perf_counter() - t0
        print(json.dumps({"docs_per_sec": round(n_docs / wall, 1),
                          "num_cpus": num_cpus}))
        ray.shutdown()
        return

    if args.ceiling:
        results = {}
        for c in (8, 32):
            r = subprocess.run(
                [sys.executable, __file__, "--ceiling-once", "--cpus",
                 str(c), "--sf-dir", args.sf_dir, "--scale-mult", "20",
                 "--doc-lines", "60,360"],
                capture_output=True, text=True, timeout=3600,
            )
            line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
            results[c] = json.loads(line)
        t8 = results[8]["docs_per_sec"]
        t32 = results[32]["docs_per_sec"]
        print(json.dumps({
            "metric": "pure-compute scaling ceiling (8 vs 32 cpus)",
            "value": round(t32 / (4 * t8), 3),
            "unit": "efficiency",
            "docs_per_sec_8cpu": t8,
            "docs_per_sec_32cpu": t32,
            "num_cpus": 32,
        }))
        return

    if args.scaling:
        # fresh process per parallelism level (the N vs 4N substitute)
        results = {}
        for c in (8, 32):
            r = subprocess.run(
                [sys.executable, __file__, "--build-only", "--cpus", str(c),
                 "--sf-dir", args.sf_dir, "--scale-mult", "20",
                 "--warmup"],
                capture_output=True, text=True, timeout=3600,
            )
            line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
            results[c] = json.loads(line)
        t8 = results[8]["detail"]["build.docs_per_sec"]
        t32 = results[32]["detail"]["build.docs_per_sec"]
        eff = t32 / (4 * t8)
        print(json.dumps({
            "metric": "index-build scaling efficiency (8 vs 32 cpus)",
            "value": round(eff, 3),
            "unit": "efficiency",
            "docs_per_sec_8cpu": t8,
            "docs_per_sec_32cpu": t32,
            "sf": results[32]["detail"]["sf"],
            "num_cpus": 32,
        }))
        return

    probe_before = contention_probe()
    out = run_all(num_cpus, args.sf_dir, build_only=args.build_only,
                  scale_mult=args.scale_mult, warmup=args.warmup,
                  doc_lines=args.doc_lines)
    out["contention_probe_sec"] = probe_before
    out["contention_probe_after_sec"] = contention_probe()
    total = out.get("build.build_sec", 0)
    queries = {
        "build": out.get("build.build_sec"),
        "query_p50_ms": out.get("query.p50_ms"),
        "query_p99_ms": out.get("query.p99_ms"),
        "minhash_pairs": out.get("pipe.minhash_pairs_sec"),
        "ann_topk": out.get("pipe.ann_topk_sec"),
        "knn_ivf_p50_ms": out.get("knn_ivf.p50_ms"),
        "knn_ivf_scan_frac": out.get("knn_ivf.scan_frac"),
    }
    print(json.dumps({
        "metric": "index-build+bm25-query wall time",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: v for k, v in queries.items() if v is not None},
        "sf": out["sf"],
        "num_cpus": out["num_cpus"],
        # host-noise probe (BASELINE.md): single-thread 4000^2 matmul,
        # clean host ~1 s -- >3 s means the window is polluted and the
        # walls above are depressed by the shared host, not the engine
        "contention_probe_sec": out["contention_probe_sec"],
        "contention_probe_after_sec": out["contention_probe_after_sec"],
        "detail": out,
    }))


if __name__ == "__main__":
    main()
