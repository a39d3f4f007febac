"""Per-index IVF sidecar for the `knn` request path.

The reference attaches a faiss IVF index per segment so a knn request
never brute-force-scans every vector (search_knn.go,
index/scorch/snapshot_vector_index.go, optimize_knn.go).  Here the same
role is a HIVE-PARTITIONED sidecar under the index directory:

    <index_dir>/knn_ivf/<field>/list_id=<cell>/*.parquet   (docnum, vec)
    <index_dir>/knn_ivf/<field>/_centroids.npy
    <index_dir>/knn_ivf/<field>/_ivf_meta.json             (epoch, nlist…)

A query assigns the query vector to its ``nprobe`` nearest centroids and
reads ONLY those partitions; candidates are re-ranked with the exact
cosine (the sidecar stores full vectors), so the only approximation is
the candidate set.  The sidecar records the manifest epoch it was built
at: if the index mutates afterwards the epoch mismatch makes
``load_knn_ivf`` return None and the searcher silently falls back to
the exact brute-force scan — stale sidecars can never surface wrong
docs.  Rebuild with ``build_knn_ivf`` (CLI: ``python -m bleve_ray
knn-ivf``) after mutations.

Scale shape: training samples a bounded set driver-side; assignment is
one streaming map_batches pass over the docvalue files; a query touches
nprobe/nlist of the corpus instead of all of it.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _sidecar_dir(index_dir: str, field: str) -> str:
    return os.path.join(index_dir, "knn_ivf", field)


def build_knn_ivf(
    index_dir: str,
    field: str,
    nlist: int = 16,
    train_sample: int = 50_000,
    seed: int = 0,
) -> dict:
    """Train coarse centroids on a bounded sample of the field's
    docvalue vectors, then stream-assign every vector to its nearest
    cell and write the hive-partitioned sidecar."""
    import ray
    import ray.data

    from ..pipelines.ann import _kmeans, _nearest_cells
    from ..search.reader import IndexReader

    reader = IndexReader(index_dir)
    files = [p for p, _, _ in reader._dv_files()]
    if not files:
        raise ValueError("index has no docvalue files")

    # bounded driver-side training sample: spread across files AND
    # across row groups within each file (a head slice trains biased
    # centroids on sorted/clustered corpora), reading ONLY the sampled
    # row groups of the vector column — never the full file
    sample_rows: list = []
    per_file = max(1, train_sample // len(files))
    for p in files:
        pf = pq.ParquetFile(p)
        m = pf.metadata.num_row_groups
        rgs = sorted(
            set(np.linspace(0, m - 1, min(m, 8)).astype(int).tolist())
        )
        per_rg = max(1, per_file // max(1, len(rgs)))
        for rg in rgs:
            t = pf.read_row_group(rg, columns=[field])
            n = len(t)
            if n > per_rg:
                idx = np.linspace(0, n - 1, per_rg).astype(np.int64)
                t = t.take(pa.array(idx))
            sample_rows.extend(
                v for v in t[field].to_pylist() if v is not None
            )
            if len(sample_rows) >= train_sample:
                break
        if len(sample_rows) >= train_sample:
            break
    if not sample_rows:
        raise ValueError(f"field {field!r} has no vectors")
    sample = np.asarray(sample_rows[:train_sample], dtype=np.float64)
    sample = sample / np.maximum(
        np.linalg.norm(sample, axis=1, keepdims=True), 1e-12
    )
    nlist = min(nlist, len(sample))
    C = _kmeans(sample, nlist, seed=seed)
    cref = ray.put(C)

    def assign(batch: pa.Table) -> pa.Table:
        Cb = ray.get(cref)
        vals = batch[field].to_pylist()
        keep = [i for i, v in enumerate(vals) if v is not None]
        if not keep:
            return pa.table(
                {
                    "docnum": pa.array([], type=pa.int64()),
                    "vec": pa.array([], type=pa.list_(pa.float32())),
                    "list_id": pa.array([], type=pa.int32()),
                }
            )
        m = np.asarray([vals[i] for i in keep], dtype=np.float64)
        mn = m / np.maximum(
            np.linalg.norm(m, axis=1, keepdims=True), 1e-12
        )
        cells = _nearest_cells(mn, Cb).astype(np.int32)
        nums = batch["docnum"].take(pa.array(keep))
        return pa.table(
            {
                "docnum": nums.combine_chunks()
                if isinstance(nums, pa.ChunkedArray)
                else nums,
                "vec": pa.array(
                    [vals[i] for i in keep], type=pa.list_(pa.float32())
                ),
                "list_id": pa.array(cells),
            }
        )

    # clear any prior sidecar first: write_parquet appends, and
    # candidates() globs every *.parquet per cell — a rebuild over a
    # stale sidecar would double-count docnums and serve old vectors
    # at the refreshed epoch.
    out = _sidecar_dir(index_dir, field)
    if os.path.isdir(out):
        import shutil

        shutil.rmtree(out)
    ds = ray.data.read_parquet(files, columns=["docnum", field])
    (
        ds.map_batches(assign, batch_format="pyarrow")
        # co-partition by cell so each cell writes ONE file (a
        # partitioned write without the groupby leaves one file per
        # (task, cell) — hundreds of tiny reads per query probe)
        .groupby("list_id")
        .map_groups(lambda g: g, batch_format="pyarrow")
        .write_parquet(out, partition_cols=["list_id"])
    )
    np.save(os.path.join(out, "_centroids.npy"), C)
    meta = {
        "field": field,
        "nlist": int(nlist),
        "dim": int(C.shape[1]),
        "seed": seed,
        "epoch": int(reader.manifest.epoch),
    }
    with open(os.path.join(out, "_ivf_meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


class KnnIvf:
    __slots__ = ("dir", "meta", "centroids", "_cells", "_cell_cap")

    def __init__(
        self,
        d: str,
        meta: dict,
        centroids: np.ndarray,
        cell_cache_cap: int = 256,
    ):
        self.dir = d
        self.meta = meta
        self.centroids = centroids
        # LRU of decoded cells: repeated probes of hot cells skip the
        # parquet read + float64 conversion entirely
        from collections import OrderedDict

        self._cells: "OrderedDict[int, tuple]" = OrderedDict()
        self._cell_cap = cell_cache_cap

    def _load_cell(self, c: int) -> Tuple[np.ndarray, np.ndarray]:
        cached = self._cells.get(c)
        if cached is not None:
            self._cells.move_to_end(c)
            return cached
        import glob

        nums_parts, vec_parts = [], []
        for f in sorted(
            glob.glob(
                os.path.join(self.dir, f"list_id={int(c)}", "*.parquet")
            )
        ):
            t = pq.read_table(f, columns=["docnum", "vec"])
            if len(t) == 0:
                continue
            nums_parts.append(np.asarray(t["docnum"], dtype=np.int64))
            vec_parts.append(
                np.asarray(
                    t["vec"].combine_chunks().flatten(),
                    dtype=np.float64,
                ).reshape(len(t), -1)
            )
        if nums_parts:
            cell = (
                np.concatenate(nums_parts),
                np.vstack(vec_parts),
            )
        else:
            cell = (
                np.empty(0, dtype=np.int64),
                np.empty((0, self.meta["dim"])),
            )
        self._cells[c] = cell
        if len(self._cells) > self._cell_cap:
            self._cells.popitem(last=False)
        return cell

    def candidates(
        self, query_vec: np.ndarray, nprobe: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        """(docnums, vectors) from the nprobe nearest cells only —
        explicit partition-directory selection (read_parquet row filters
        on hive partition columns break in the sampling stage)."""
        qn = np.asarray(query_vec, dtype=np.float64)
        qn = qn / (np.linalg.norm(qn) or 1.0)
        d2 = ((qn[None, :] - self.centroids) ** 2).sum(-1)
        probe = np.argsort(d2)[: max(1, nprobe)]
        cold = [int(c) for c in probe if int(c) not in self._cells]
        if len(cold) > 1:
            # parquet decode releases the GIL: load cold cells
            # concurrently (helps the cold-query tail; warm probes hit
            # the LRU and never get here)
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=min(8, len(cold))) as ex:
                list(ex.map(self._load_cell, cold))
        parts = [self._load_cell(int(c)) for c in probe]
        parts = [p for p in parts if len(p[0])]
        if not parts:
            return (
                np.empty(0, dtype=np.int64),
                np.empty((0, self.meta["dim"])),
            )
        return (
            np.concatenate([p[0] for p in parts]),
            np.vstack([p[1] for p in parts]),
        )


def load_knn_ivf(reader, field: str) -> Optional[KnnIvf]:
    """Open the field's sidecar if present AND built at the reader's
    current epoch (stale sidecars are ignored: exact fallback).

    Loaded sidecars memoize on the reader keyed by (field, epoch) so
    the per-cell LRU survives across queries of one reader; a missing
    sidecar is never cached (it may be built moments later without an
    epoch bump)."""
    base = getattr(reader, "index_dir", None)
    if base is None and hasattr(reader, "local"):
        base = reader.local.index_dir
    if base is None:
        return None
    epoch = int(reader.manifest.epoch)
    cache = getattr(reader, "_knn_ivf_cache", None)
    if cache is None:
        cache = {}
        try:
            setattr(reader, "_knn_ivf_cache", cache)
        except AttributeError:
            cache = None
    key = (field, epoch)
    if cache is not None and key in cache:
        return cache[key]
    d = _sidecar_dir(base, field)
    meta_path = os.path.join(d, "_ivf_meta.json")
    if not os.path.exists(meta_path):
        return None
    with open(meta_path) as f:
        meta = json.load(f)
    if int(meta.get("epoch", -1)) != epoch:
        return None
    C = np.load(os.path.join(d, "_centroids.npy"))
    ivf = KnnIvf(d, meta, C)
    if cache is not None:
        cache[key] = ivf
    return ivf
