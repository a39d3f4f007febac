"""Similarity search over an embedding column (list<float>).

- brute-force cosine top-k: numpy matmul per Arrow batch against a
  broadcast query matrix (ray.put once, zero-copy read in every task)
- LSH-bucketed variant (random hyperplane signs) as the scale path: the
  shuffle key is the signature prefix, so candidate generation touches only
  matching buckets.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _read_query_vec(path: str, query_vec_id: int) -> np.ndarray:
    """Row-filtered read of ONE embedding row.  ``filters=`` prunes at the
    row-group level, so the driver never materializes the embedding matrix
    just to extract the query vector (at 10^9 vectors a full read here
    would dwarf the distributed scan)."""
    t = pq.read_table(
        path,
        columns=["embedding"],
        filters=[("vec_id", "==", query_vec_id)],
    )
    if len(t) == 0:
        raise KeyError(f"vec_id {query_vec_id} not found in {path}")
    return np.asarray(t["embedding"][0].as_py(), dtype=np.float64)


def _head_sample(path: str, n: int) -> np.ndarray:
    """Physically bounded training-sample read: stream record batches and
    stop after ``n`` rows (the index/knn_ivf.py bounded-sampling pattern)
    rather than reading the whole file and slicing driver-side."""
    pf = pq.ParquetFile(path)
    rows: list = []
    got = 0
    for rb in pf.iter_batches(
        batch_size=min(n, 8192), columns=["embedding"]
    ):
        col = rb.column(0)
        m = np.asarray(col.flatten(), dtype=np.float64).reshape(
            len(rb), -1
        )
        rows.append(m)
        got += len(rb)
        if got >= n:
            break
    return np.concatenate(rows)[:n]


def _batch_cosine(batch: pa.Table, q: np.ndarray) -> pa.Table:
    emb = batch["embedding"]
    mat = np.asarray(emb.combine_chunks().flatten(), dtype=np.float64).reshape(
        len(batch), -1
    )
    qn = q / np.linalg.norm(q)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    sims = (mat @ qn) / norms
    return pa.table(
        {
            "vec_id": batch["vec_id"],
            "sim": pa.array(sims, type=pa.float64()),
        }
    )


def ann_cosine_topk_ds(sf_dir: str, query_vec_id: int = 0, k: int = 10):
    """Brute-force cosine top-k against the embedding of ``query_vec_id``.

    The query vector is the broadcast small side (ray.put once); per-batch
    compute is one matmul.  Result: (vec_id, sim '%.6f') ordered by
    (-sim, vec_id), excluding the query row itself."""
    import ray
    import ray.data

    q = _read_query_vec(f"{sf_dir}/embeddings.parquet", query_vec_id)
    q_ref = ray.put(q)

    def fn(batch: pa.Table) -> pa.Table:
        import ray as _ray

        qv = _ray.get(q_ref)
        return _batch_cosine(batch, qv)

    def local_topk(batch: pa.Table) -> pa.Table:
        import ray as _ray

        qv = _ray.get(q_ref)
        sims_t = _batch_cosine(batch, qv)
        vid = np.asarray(sims_t["vec_id"], dtype=np.int64)
        sim = np.asarray(sims_t["sim"], dtype=np.float64)
        keep = vid != query_vec_id
        vid, sim = vid[keep], sim[keep]
        if len(sim) > k:
            sel = np.argpartition(-sim, k - 1)[:k]
            vid, sim = vid[sel], sim[sel]
        return pa.table(
            {
                "vec_id": pa.array(vid, type=pa.int64()),
                "sim": pa.array(sim, type=pa.float64()),
            }
        )

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    # per-batch local top-k then a tiny driver merge of <= k*num_blocks
    # rows -- no global all-to-all sort
    cand = ds.map_batches(local_topk, batch_format="pyarrow").take_all()
    vid = np.array([r["vec_id"] for r in cand], dtype=np.int64)
    sim = np.array([r["sim"] for r in cand], dtype=np.float64)
    order = sorted(range(len(vid)), key=lambda i: (-sim[i], vid[i]))[:k]
    return pa.table(
        {
            "vec_id": pa.array(vid[order], type=pa.int64()),
            "sim": pa.array([f"{sim[i]:.6f}" for i in order]),
        }
    )


class HyperplaneLSH:
    """Random-hyperplane LSH for cosine similarity: 16-bit sign signature;
    bucket key = signature.  Stateful per-actor (planes generated once in
    __init__ from a fixed seed)."""

    def __init__(self, dim: int, n_planes: int = 16, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, n_planes))

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = np.asarray(
            batch["embedding"].combine_chunks().flatten(), dtype=np.float64
        ).reshape(len(batch), -1)
        signs = (mat @ self.planes) > 0
        sig = (signs * (1 << np.arange(signs.shape[1]))).sum(axis=1)
        return pa.table(
            {
                "vec_id": batch["vec_id"],
                "bucket": pa.array(sig.astype(np.int64)),
            }
        )


def ann_lsh_topk(
    sf_dir: str,
    query_vec_id: int = 0,
    k: int = 10,
    n_planes: int = 16,
    probe_hamming: int = 2,
    seed: int = 7,
):
    """LSH probe path: query signature + all buckets within
    ``probe_hamming`` bit flips are the candidate set; exact cosine
    re-ranks the candidates.  One streaming pass fuses signature
    assignment, bucket filtering and local top-k, so only candidate
    vectors ever get a full similarity computation.

    Partitioning assumption at scale: vectors pre-partitioned by bucket
    (the ann_lsh_buckets_ds output written as bucket-partitioned parquet)
    let the probe read only matching partitions; here the bucket filter
    runs in the same scan.  Returns (vec_id, sim '%.6f') like the
    brute-force path."""
    import ray
    import ray.data

    q = _read_query_vec(f"{sf_dir}/embeddings.parquet", query_vec_id)
    dim = len(q)

    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes))
    qsig = int(
        (((q @ planes) > 0) * (1 << np.arange(n_planes))).sum()
    )
    # multi-probe: all signatures within probe_hamming bit flips
    probes = {qsig}
    frontier = {qsig}
    for _ in range(probe_hamming):
        frontier = {
            s ^ (1 << b) for s in frontier for b in range(n_planes)
        }
        probes |= frontier
    probe_arr = np.array(sorted(probes), dtype=np.int64)
    q_ref = ray.put((q, planes, probe_arr))

    def probe_topk(batch: pa.Table) -> pa.Table:
        import ray as _ray

        qv, pl, pr = _ray.get(q_ref)
        mat = np.asarray(
            batch["embedding"].combine_chunks().flatten(), dtype=np.float64
        ).reshape(len(batch), -1)
        vid = np.asarray(batch["vec_id"], dtype=np.int64)
        signs = (mat @ pl) > 0
        sig = (signs * (1 << np.arange(signs.shape[1]))).sum(axis=1)
        j = np.searchsorted(pr, sig)
        cand = (j < len(pr)) & (pr[np.minimum(j, len(pr) - 1)] == sig)
        cand &= vid != query_vec_id
        if not cand.any():
            return pa.table(
                {
                    "vec_id": pa.array([], type=pa.int64()),
                    "sim": pa.array([], type=pa.float64()),
                }
            )
        mat, vid = mat[cand], vid[cand]
        qn = qv / (np.linalg.norm(qv) or 1.0)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        sims = (mat @ qn) / norms
        if len(sims) > k:
            sel = np.argpartition(-sims, k - 1)[:k]
            vid, sims = vid[sel], sims[sel]
        return pa.table(
            {
                "vec_id": pa.array(vid, type=pa.int64()),
                "sim": pa.array(sims, type=pa.float64()),
            }
        )

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    cand = ds.map_batches(probe_topk, batch_format="pyarrow").take_all()
    vid = np.array([r["vec_id"] for r in cand], dtype=np.int64)
    sim = np.array([r["sim"] for r in cand], dtype=np.float64)
    order = sorted(range(len(vid)), key=lambda i: (-sim[i], vid[i]))[:k]
    return pa.table(
        {
            "vec_id": pa.array(vid[order], type=pa.int64()),
            "sim": pa.array([f"{sim[i]:.6f}" for i in order]),
        }
    )


def _nearest_cells(A: np.ndarray, C: np.ndarray) -> np.ndarray:
    """argmin_j ||A_i - C_j||^2 per row via the ||b||^2 - 2ab matmul form:
    ||a||^2 is constant per row, so the (n, k, dim) broadcast intermediate
    (~25 GB at dim=768/nlist=4096/batch=1024) is never built — peak extra
    memory is the (n, k) score matrix."""
    return np.argmin((C * C).sum(1)[None, :] - 2.0 * (A @ C.T), axis=1)


def _kmeans(X: np.ndarray, k: int, iters: int = 10, seed: int = 0) -> np.ndarray:
    """Deterministic Lloyd's k-means (coarse quantizer training)."""
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), size=min(k, len(X)), replace=False)].copy()
    for _ in range(iters):
        a = _nearest_cells(X, C)
        for j in range(len(C)):
            members = a == j
            if members.any():
                C[j] = X[members].mean(0)
    return C


def ann_ivf_topk(
    sf_dir: str,
    query_vec_id: int = 0,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 14,
    train_sample: int = 20_000,
    seed: int = 0,
):
    """IVF probe path: k-means coarse centroids trained once on a sample
    (driver-side, bounded by ``train_sample``), broadcast with the query;
    one streaming pass assigns each vector to its nearest centroid, keeps
    only vectors whose cell is among the query's ``nprobe`` closest, and
    exact-cosine re-ranks candidates with per-batch local top-k.

    recall/scan trade by nprobe; on this synthetic near-random data the
    default nprobe=14/16 reaches exact top-10 at sf0.01 AND sf0.1 (the
    oracle-gate setting; nprobe=10 gives recall@10 >= 0.9 at ~60% scan),
    on clustered real embeddings far fewer probes suffice.  At scale
    the assignment pass is the bucketing step of a partitioned IVF layout
    (write per-cell parquet once, probe only matching partitions)."""
    import ray
    import ray.data

    path = f"{sf_dir}/embeddings.parquet"
    q = _read_query_vec(path, query_vec_id)
    # bounded head sample for the coarse quantizer: the centroids only
    # need a representative slice, never the full matrix driver-side
    sample = _head_sample(path, train_sample)
    sample = sample / np.maximum(
        np.linalg.norm(sample, axis=1, keepdims=True), 1e-12
    )
    C = _kmeans(sample, nlist, seed=seed)
    qn = q / (np.linalg.norm(q) or 1.0)
    qd = ((qn[None, :] - C) ** 2).sum(-1)
    probe = np.sort(np.argsort(qd)[:nprobe])
    ref = ray.put((qn, C, probe))

    def probe_topk(batch: pa.Table) -> pa.Table:
        import ray as _ray

        qv, cents, pr = _ray.get(ref)
        mat = np.asarray(
            batch["embedding"].combine_chunks().flatten(), dtype=np.float64
        ).reshape(len(batch), -1)
        vid = np.asarray(batch["vec_id"], dtype=np.int64)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        matn = mat / norms[:, None]
        cell = _nearest_cells(matn, cents)
        cand = np.isin(cell, pr) & (vid != query_vec_id)
        if not cand.any():
            return pa.table(
                {
                    "vec_id": pa.array([], type=pa.int64()),
                    "sim": pa.array([], type=pa.float64()),
                }
            )
        vid = vid[cand]
        sims = matn[cand] @ qv
        if len(sims) > k:
            sel = np.argpartition(-sims, k - 1)[:k]
            vid, sims = vid[sel], sims[sel]
        return pa.table(
            {
                "vec_id": pa.array(vid, type=pa.int64()),
                "sim": pa.array(sims, type=pa.float64()),
            }
        )

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    cand = ds.map_batches(probe_topk, batch_format="pyarrow").take_all()
    vid = np.array([r["vec_id"] for r in cand], dtype=np.int64)
    sim = np.array([r["sim"] for r in cand], dtype=np.float64)
    order = sorted(range(len(vid)), key=lambda i: (-sim[i], vid[i]))[:k]
    return pa.table(
        {
            "vec_id": pa.array(vid[order], type=pa.int64()),
            "sim": pa.array([f"{sim[i]:.6f}" for i in order]),
        }
    )


def ann_lsh_buckets_ds(sf_dir: str, n_planes: int = 16):
    """Bucketed variant: vec -> LSH bucket (the scale path: a query probes
    only its own bucket +/- hamming-1 neighbors instead of all vectors)."""
    import ray.data

    # dim from the first record batch only -- never a full-file read
    pf = pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
    first = next(pf.iter_batches(batch_size=1, columns=["embedding"]))
    dim = len(first.column(0)[0])
    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return ds.map_batches(
        HyperplaneLSH,
        fn_constructor_args=(dim, n_planes),
        batch_format="pyarrow",
        concurrency=2,
    )


def embedding_near_dup_pairs_ds(
    sf_dir: str, threshold: float = 0.45
) -> pa.Table:
    """Exact embedding-cosine near-duplicate pairs (graft brief:
    'embedding-cosine near-dup').

    Block-partitioned exact algorithm: each input block is L2-normalized
    once inside ``map_batches`` and stays in the object store as an Arrow
    ref; one Ray task per block pair (i <= j) computes the block cosine
    matrix (one float64 matmul) and emits (a, b) pairs with cos >=
    threshold.  Work is O(B^2/2) bounded-memory tasks with no driver-side
    matrix; the only driver traffic is the (tiny) surviving pair lists.
    At larger scale the candidate-generating paths (HyperplaneLSH buckets
    / IVF lists) replace the exact product — this is the exact baseline
    the brief asks for.  Raw Ray tasks are used for the pairwise step
    because the Dataset API has no self-cross-join.
    """
    import ray
    import ray.data

    def normalize(batch: pa.Table) -> pa.Table:
        mat = np.asarray(
            batch["embedding"].combine_chunks().flatten(), dtype=np.float64
        ).reshape(len(batch), -1)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        mat = mat / norms
        dim = mat.shape[1]
        return pa.table(
            {
                "vec_id": batch["vec_id"],
                "nvec": pa.FixedSizeListArray.from_arrays(
                    pa.array(mat.reshape(-1), type=pa.float64()), dim
                ),
            }
        )

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(normalize, batch_format="pyarrow", batch_size=4096)
    refs = ds.to_arrow_refs()  # blocks stay in the object store

    @ray.remote
    def block_pairs(ta: pa.Table, tb: pa.Table, same: bool, tau: float):
        Xa = np.asarray(ta["nvec"].combine_chunks().flatten()).reshape(
            len(ta), -1
        )
        Xb = np.asarray(tb["nvec"].combine_chunks().flatten()).reshape(
            len(tb), -1
        )
        ia = np.asarray(ta["vec_id"], dtype=np.int64)
        ib = np.asarray(tb["vec_id"], dtype=np.int64)
        S = Xa @ Xb.T
        hit = np.argwhere(S >= tau)
        out_a, out_b = [], []
        for r, c in hit:
            a, b = int(ia[r]), int(ib[c])
            if a == b:
                continue
            if same and a > b:
                continue  # lower triangle of a self-pair block
            out_a.append(str(min(a, b)))
            out_b.append(str(max(a, b)))
        return pa.table(
            {
                "a": pa.array(out_a, type=pa.string()),
                "b": pa.array(out_b, type=pa.string()),
            }
        )

    futures = []
    for i in range(len(refs)):
        for j in range(i, len(refs)):
            futures.append(
                block_pairs.remote(refs[i], refs[j], i == j, threshold)
            )
    tables = [t for t in ray.get(futures) if t.num_rows]
    if not tables:
        return pa.table(
            {"a": pa.array([], type=pa.string()),
             "b": pa.array([], type=pa.string())}
        )
    return pa.concat_tables(tables).sort_by([("a", "ascending"),
                                             ("b", "ascending")])


# ---------------------------------------------------------------------------
# Persisted IVF layout: train once, write the corpus PARTITIONED BY CELL,
# answer queries by reading only the probed partitions -- the
# prune-at-the-read scale path ann_ivf_topk's docstring describes.
# ---------------------------------------------------------------------------


def build_ivf_index(
    sf_dir: str,
    out_dir: str,
    nlist: int = 16,
    train_sample: int = 20_000,
    seed: int = 0,
) -> dict:
    """Train coarse centroids on a bounded sample (driver-side), then one
    streaming map_batches pass assigns every vector to its nearest cell
    and writes parquet PARTITIONED by list_id.  A query later reads only
    its nprobe partitions (partition-pruned read_parquet), so query cost
    scales with nprobe/nlist of the corpus instead of a full scan."""
    import json
    import os

    import ray
    import ray.data

    sample = _head_sample(f"{sf_dir}/embeddings.parquet", train_sample)
    sample = sample / np.maximum(
        np.linalg.norm(sample, axis=1, keepdims=True), 1e-12
    )
    C = _kmeans(sample, nlist, seed=seed)
    cref = ray.put(C)

    def assign(batch: pa.Table) -> pa.Table:
        Cb = ray.get(cref)
        m = np.asarray(
            batch["embedding"].combine_chunks().flatten(), dtype=np.float64
        ).reshape(len(batch), -1)
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return batch.append_column(
            "list_id", pa.array(_nearest_cells(mn, Cb).astype(np.int32))
        )

    # clear any prior layout: write_parquet appends, and ivf_query globs
    # every *.parquet per cell -- a rebuild over a stale dir would serve
    # duplicate/stale vectors (same hazard as index/knn_ivf.py)
    if os.path.isdir(out_dir):
        import shutil

        shutil.rmtree(out_dir)
    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["list_id"]
    )
    np.save(os.path.join(out_dir, "_centroids.npy"), C)
    meta = {"nlist": nlist, "dim": int(C.shape[1]), "seed": seed}
    with open(os.path.join(out_dir, "_ivf_meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


def ivf_query(
    out_dir: str, query_vec, k: int = 10, nprobe: int = 4
):
    """Top-k cosine over a persisted IVF index, reading ONLY the probed
    cell partitions (pruning = selecting the matching hive directories;
    unprobed cells never leave storage)."""
    import glob
    import os

    import ray.data

    C = np.load(os.path.join(out_dir, "_centroids.npy"))
    qn = np.asarray(query_vec, dtype=np.float64)
    qn = qn / (np.linalg.norm(qn) or 1.0)
    probe = np.argsort(((qn[None, :] - C) ** 2).sum(-1))[:nprobe]
    files = [
        f
        for p in probe
        for f in sorted(
            glob.glob(os.path.join(out_dir, f"list_id={int(p)}", "*.parquet"))
        )
    ]
    if not files:
        return []
    # explicit projection: the hive files carry only these two columns
    # today, but the pruned-read idiom must survive anyone adding payload
    # columns to the IVF layout later.
    ds = ray.data.read_parquet(files, columns=["vec_id", "embedding"])

    def local_topk(batch: pa.Table) -> pa.Table:
        m = np.asarray(
            batch["embedding"].combine_chunks().flatten(), dtype=np.float64
        ).reshape(len(batch), -1)
        norms = np.maximum(np.linalg.norm(m, axis=1), 1e-12)
        sims = (m @ qn) / norms
        keep = (
            np.argpartition(-sims, k - 1)[:k]
            if len(sims) > k
            else np.arange(len(sims))
        )
        return pa.table(
            {
                "vec_id": batch["vec_id"].take(pa.array(keep)),
                "cosine": pa.array(sims[keep]),
            }
        )

    cand = ds.map_batches(local_topk, batch_format="pyarrow").take_all()
    cand.sort(key=lambda r: (-r["cosine"], r["vec_id"]))
    return cand[:k]
