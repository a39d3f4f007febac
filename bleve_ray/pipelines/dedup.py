"""Deduplication pipelines (training-data operators).

- exact: hash-partition on content sha256, keep group stats / first doc
  (the classic hash-partition + per-group-first pattern; cheap exact dedup
  the reference only approximates via _id update semantics,
  SURVEY.md §2.15)
- minhash_lsh: word-shingle -> 64-perm MinHash -> banded LSH buckets ->
  candidate pairs (shuffle on (band, band_hash))
- simhash: 64-bit SimHash per doc (near-dup clustering by hamming radius)
- ngram_jaccard: exact Jaccard over token shingles for candidate pairs
  (verification stage after LSH)

All hashing is blake2b/sha based (stable across processes, no
PYTHONHASHSEED dependence).
"""

from __future__ import annotations

import hashlib
import re
from typing import List

import numpy as np
import pyarrow as pa

TOKEN_RE = re.compile(r"[A-Za-z0-9]+")

NUM_PERMS = 64
BANDS = 16  # 16 bands x 4 rows
ROWS_PER_BAND = NUM_PERMS // BANDS
SHINGLE_K = 3

# deterministic 64-bit universal-hash parameters for the minhash perms
_rng = np.random.RandomState(0xB1EE)
_MERSENNE = (1 << 61) - 1
_PERM_A = _rng.randint(1, _MERSENNE, size=NUM_PERMS).astype(np.uint64)
_PERM_B = _rng.randint(0, _MERSENNE, size=NUM_PERMS).astype(np.uint64)


def _tokens(text: str) -> List[str]:
    return [t.lower() for t in TOKEN_RE.findall(text or "")]


def _shingle_hashes(toks: List[str], k: int = SHINGLE_K) -> np.ndarray:
    if len(toks) < k:
        joined = [" ".join(toks)] if toks else []
    else:
        joined = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    return np.array(
        [
            int.from_bytes(
                hashlib.blake2b(s.encode(), digest_size=8).digest(), "little"
            )
            for s in joined
        ],
        dtype=np.uint64,
    )


def minhash_signature(toks: List[str]) -> np.ndarray:
    """64 minhash values (vectorized over shingles x perms)."""
    sh = _shingle_hashes(toks)
    if len(sh) == 0:
        return np.full(NUM_PERMS, np.iinfo(np.uint64).max, dtype=np.uint64)
    # (a*x + b) mod 2^64 via native uint64 wraparound -- fully vectorized;
    # quality-equivalent to mod-p universal hashing for LSH purposes
    with np.errstate(over="ignore"):
        vals = sh[:, None] * _PERM_A[None, :] + _PERM_B[None, :]
    return vals.min(axis=0)


def exact_dedup_batch(batch: pa.Table) -> pa.Table:
    texts = batch["text"].to_pylist()
    shas = [
        hashlib.sha256((t or "").encode("utf-8")).hexdigest() for t in texts
    ]
    return pa.table(
        {
            "text_sha": pa.array(shas),
            "doc_id": batch["doc_id"],
        }
    )


def exact_dedup_ds(sf_dir: str):
    """-> (text_sha, n_docs, first_doc_id): hash-partition groupby; the
    per-batch sha map is the partial stage, the groupby is the shuffle."""
    import ray.data
    from ray.data.aggregate import Count, Min

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    hashed = ds.map_batches(exact_dedup_batch, batch_format="pyarrow")
    agg = hashed.groupby("text_sha").aggregate(
        Count(alias_name="n_docs"), Min("doc_id", alias_name="first_doc_id")
    )
    return agg


def minhash_batch(batch: pa.Table) -> pa.Table:
    """doc -> BANDS rows of (band, band_hash, doc_id)."""
    texts = batch["text"].to_pylist()
    doc_ids = batch["doc_id"].to_pylist()
    out_band, out_hash, out_doc = [], [], []
    for doc_id, t in zip(doc_ids, texts):
        sig = minhash_signature(_tokens(t))
        for b in range(BANDS):
            seg = sig[b * ROWS_PER_BAND : (b + 1) * ROWS_PER_BAND]
            h = hashlib.blake2b(seg.tobytes(), digest_size=8).hexdigest()
            out_band.append(b)
            out_hash.append(h)
            out_doc.append(doc_id)
    return pa.table(
        {
            "band": pa.array(out_band, type=pa.int32()),
            "band_hash": pa.array(out_hash),
            "doc_id": pa.array(out_doc, type=pa.int64()),
        }
    )


def _bucket_pairs(group: pa.Table) -> pa.Table:
    docs = sorted(group["doc_id"].to_pylist())
    a, b = [], []
    if len(docs) > 1:
        for i in range(len(docs)):
            for j in range(i + 1, len(docs)):
                a.append(docs[i])
                b.append(docs[j])
    return pa.table(
        {
            "doc_a": pa.array(a, type=pa.int64()),
            "doc_b": pa.array(b, type=pa.int64()),
        }
    )


def minhash_pairs_ds(sf_dir: str):
    """Candidate near-duplicate pairs from banded MinHash LSH:
    shingle -> minhash -> band rows -> groupby(band, band_hash) -> pairs.
    Pairs are deduplicated across bands."""
    import ray.data

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    bands = ds.map_batches(minhash_batch, batch_format="pyarrow")
    pairs = bands.groupby(["band", "band_hash"]).map_groups(
        _bucket_pairs, batch_format="pyarrow"
    )
    # distinct pairs (a band collision can repeat across bands)
    return pairs.groupby(["doc_a", "doc_b"]).map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow"
    )


def simhash_batch(batch: pa.Table) -> pa.Table:
    texts = batch["text"].to_pylist()
    out = []
    for t in texts:
        toks = _tokens(t)
        if not toks:
            out.append("0" * 16)
            continue
        acc = np.zeros(64, dtype=np.int64)
        uniq, counts = np.unique(np.array(toks, dtype=object), return_counts=True)
        for term, cnt in zip(uniq, counts):
            h = np.uint64(
                int.from_bytes(
                    hashlib.blake2b(str(term).encode(), digest_size=8).digest(),
                    "little",
                )
            )
            bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            acc += np.where(bits == 1, cnt, -cnt)
        sim = 0
        for bit in range(64):
            if acc[bit] > 0:
                sim |= 1 << bit
        out.append(f"{sim:016x}")
    return pa.table({"doc_id": batch["doc_id"], "simhash": pa.array(out)})


def simhash_ds(sf_dir: str):
    import ray.data

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return ds.map_batches(simhash_batch, batch_format="pyarrow")


def jaccard_verify_pairs(sf_dir: str, pairs: List[tuple], k: int = SHINGLE_K):
    """Exact n-gram Jaccard for candidate pairs (small side: pairs list is
    broadcast; texts fetched per batch)."""
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    texts = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    out = []
    for a, b in pairs:
        sa = set(_shingle_hashes(_tokens(texts.get(a, ""))).tolist())
        sb = set(_shingle_hashes(_tokens(texts.get(b, ""))).tolist())
        union = len(sa | sb)
        j = len(sa & sb) / union if union else 0.0
        out.append({"doc_a": a, "doc_b": b, "jaccard": f"{j:.6f}"})
    return pa.Table.from_pylist(
        out
        or [{"doc_a": 0, "doc_b": 0, "jaccard": "0.000000"}][:0]
    )
