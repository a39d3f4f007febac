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

    qt = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    mask = np.asarray(qt["vec_id"]) == query_vec_id
    q = np.asarray(
        qt["embedding"].combine_chunks().flatten(), dtype=np.float64
    ).reshape(len(qt), -1)[mask][0]
    q_ref = ray.put(q)

    def fn(batch: pa.Table) -> pa.Table:
        import ray as _ray

        qv = _ray.get(q_ref)
        return _batch_cosine(batch, qv)

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    sims = ds.map_batches(fn, batch_format="pyarrow")
    top = (
        sims.filter(expr=f"vec_id != {query_vec_id}")
        .sort(["sim", "vec_id"], descending=[True, False])
        .limit(k)
    )
    df = top.to_pandas()
    return pa.table(
        {
            "vec_id": pa.array(df["vec_id"], type=pa.int64()),
            "sim": pa.array([f"{s:.6f}" for s in df["sim"]]),
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


def ann_lsh_buckets_ds(sf_dir: str, n_planes: int = 16):
    """Bucketed variant: vec -> LSH bucket (the scale path: a query probes
    only its own bucket +/- hamming-1 neighbors instead of all vectors)."""
    import ray.data

    dim = len(
        pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["embedding"])[
            "embedding"
        ][0]
    )
    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return ds.map_batches(
        HyperplaneLSH,
        fn_constructor_args=(dim, n_planes),
        batch_format="pyarrow",
        concurrency=2,
    )
