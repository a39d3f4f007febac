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
import pyarrow.compute as pc

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

# "portable" hash family: md5-prefix shingle hashes + mod-p 32-bit perms.
# Same LSH algorithm, but every step is exactly replicable in ANSI SQL
# (DuckDB md5() + UBIGINT arithmetic), so the full MinHash -> banding ->
# candidate-pair path can be audited end-to-end by the driver's oracle.
# a*h+b stays < 2^64 because a, h%p, b are all < 2^32 -- no overflow on
# either side.
PORTABLE_P = 4294967291  # largest 32-bit prime
_rng32 = np.random.RandomState(0x51AB)
_PERM_A32 = _rng32.randint(1, PORTABLE_P, size=NUM_PERMS).astype(np.uint64)
_PERM_B32 = _rng32.randint(0, PORTABLE_P, size=NUM_PERMS).astype(np.uint64)


def _tokens(text: str) -> List[str]:
    return [t.lower() for t in TOKEN_RE.findall(text or "")]


# ---- vectorized shingle hashing -------------------------------------------
# blake2b once per UNIQUE token (worker-cached); shingle hash = uint64
# polynomial (FNV-prime base) over the k token hashes, computed as one
# vectorized rolling window across a batch's whole token stream.  Stable
# across processes (hashlib-seeded), collision quality equivalent to
# hashing the joined shingle string.

_TOKEN_HASH_CACHE: dict = {}
_POLY_C = np.uint64(0x100000001B3)  # FNV-64 prime


def _pow_k(k: int) -> np.ndarray:
    out = np.empty(k, dtype=np.uint64)
    v = np.uint64(1)
    with np.errstate(over="ignore"):
        for j in range(k - 1, -1, -1):
            out[j] = v
            v = v * _POLY_C
    return out


def _token_hash(term: str) -> int:
    h = _TOKEN_HASH_CACHE.get(term)
    if h is None:
        h = int.from_bytes(
            hashlib.blake2b(term.encode(), digest_size=8).digest(), "little"
        )
        if len(_TOKEN_HASH_CACHE) < 1_000_000:
            _TOKEN_HASH_CACHE[term] = h
    return h


def _token_hashes_for(flat: "pa.Array") -> np.ndarray:
    """uint64 hash per token position; one blake2b per unique token."""
    if len(flat) == 0:
        return np.empty(0, dtype=np.uint64)
    denc = pc.dictionary_encode(flat)
    if isinstance(denc, pa.ChunkedArray):
        denc = denc.combine_chunks()
    dic = denc.dictionary.to_pylist()
    dvals = np.empty(len(dic), dtype=np.uint64)
    for i, term in enumerate(dic):
        dvals[i] = _token_hash(term)
    idx = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    return dvals[idx]


def portable_token_hashes(flat: "pa.Array") -> np.ndarray:
    """uint64 md5-prefix hash per token position (one md5 per unique
    token); value-identical to DuckDB
    ``('0x'||substr(md5(token),1,16))::UBIGINT``."""
    if len(flat) == 0:
        return np.empty(0, dtype=np.uint64)
    denc = pc.dictionary_encode(flat)
    if isinstance(denc, pa.ChunkedArray):
        denc = denc.combine_chunks()
    dic = denc.dictionary.to_pylist()
    dvals = np.empty(len(dic), dtype=np.uint64)
    for i, term in enumerate(dic):
        dvals[i] = _md5_u64(term, 16)
    idx = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    return dvals[idx]


def batch_shingle_hashes(
    flat, offs: np.ndarray, k: int = SHINGLE_K, combine_short: bool = True
):
    """Vectorized k-token rolling shingle hashes for a whole batch.

    flat/offs are from text_stats.flat_tokens_arrow.  Returns
    (sh_flat uint64, sh_offs int64 of len n_docs+1).  combine_short=True
    gives docs with 0 < len < k ONE shingle over all their tokens
    (minhash semantics); False gives them none (fingerprint semantics).
    """
    h = _token_hashes_for(flat)
    n = len(offs) - 1
    counts = offs[1:] - offs[:-1]
    long_mask = counts >= k
    short_mask = (
        (counts > 0) & (counts < k)
        if combine_short
        else np.zeros(n, dtype=bool)
    )
    sh_counts = np.where(
        long_mask, np.maximum(counts - k + 1, 0), short_mask.astype(np.int64)
    ).astype(np.int64)
    sh_offs = np.concatenate(([0], np.cumsum(sh_counts)))
    out = np.empty(int(sh_offs[-1]), dtype=np.uint64)
    if len(h) >= k and long_mask.any():
        powk = _pow_k(k)
        nroll = len(h) - k + 1
        with np.errstate(over="ignore"):
            roll = h[:nroll] * powk[0]
            for j in range(1, k):
                roll = roll + h[j : nroll + j] * powk[j]
        m = sh_counts[long_mask]
        src_starts = offs[:-1][long_mask]
        dst_starts = sh_offs[:-1][long_mask]
        within = np.arange(int(m.sum()), dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(m)))[:-1], m
        )
        out[np.repeat(dst_starts, m) + within] = roll[
            np.repeat(src_starts, m) + within
        ]
    for d in np.nonzero(short_mask)[0]:
        v = np.uint64(0)
        with np.errstate(over="ignore"):
            for x in h[offs[d] : offs[d + 1]]:
                v = v * _POLY_C + x
        out[sh_offs[d]] = v
    return out, sh_offs


def _md5_u64(s: str, hex_chars: int) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:hex_chars], 16)


def portable_shingle_hashes(
    flat,
    offs: np.ndarray,
    k: int = SHINGLE_K,
    combine_short: bool = True,
    hex_chars: int = 8,
):
    """SQL-replicable twin of batch_shingle_hashes: shingle = the k
    lowercase tokens space-joined, hash = the first ``hex_chars`` hex
    digits of md5(shingle) as an integer (DuckDB:
    ``('0x'||substr(md5(s),1,N))::UBIGINT``).  Shingle strings are built
    vectorized with one binary_join_element_wise over the batch's flat
    token stream; md5 runs once per unique shingle.  Returns
    (sh_flat uint64, sh_offs int64) with the same doc layout contract as
    batch_shingle_hashes."""
    n = len(offs) - 1
    counts = offs[1:] - offs[:-1]
    long_mask = counts >= k
    short_mask = (
        (counts > 0) & (counts < k)
        if combine_short
        else np.zeros(n, dtype=bool)
    )
    sh_counts = np.where(
        long_mask, np.maximum(counts - k + 1, 0), short_mask.astype(np.int64)
    ).astype(np.int64)
    sh_offs = np.concatenate(([0], np.cumsum(sh_counts)))
    total = int(sh_offs[-1])
    out_strs: List[str] = [""] * total
    nf = len(flat)
    if nf >= k and long_mask.any():
        joined = pc.binary_join_element_wise(
            *[flat.slice(j, nf - k + 1) for j in range(k)], " "
        )
        m = sh_counts[long_mask]
        src_starts = offs[:-1][long_mask]
        dst_starts = sh_offs[:-1][long_mask]
        within = np.arange(int(m.sum()), dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(m)))[:-1], m
        )
        src = np.repeat(src_starts, m) + within
        dst = np.repeat(dst_starts, m) + within
        vals = joined.take(pa.array(src)).to_pylist()
        for d, v in zip(dst, vals):
            out_strs[d] = v
    if short_mask.any():
        py_flat = flat.to_pylist()
        for d in np.nonzero(short_mask)[0]:
            out_strs[sh_offs[d]] = " ".join(py_flat[offs[d] : offs[d + 1]])
    if total == 0:
        return np.empty(0, dtype=np.uint64), sh_offs
    denc = pa.array(out_strs, type=pa.string()).dictionary_encode()
    dic = denc.dictionary.to_pylist()
    dvals = np.empty(len(dic), dtype=np.uint64)
    for i, s in enumerate(dic):
        dvals[i] = _md5_u64(s, hex_chars)
    idx = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    return dvals[idx], sh_offs


def _shingle_hashes(toks: List[str], k: int = SHINGLE_K) -> np.ndarray:
    """Per-doc shingle hashes (same scheme as batch_shingle_hashes; used by
    the distributed near-dup verify stage which works doc-at-a-time)."""
    if not toks:
        return np.empty(0, dtype=np.uint64)
    h = np.fromiter(
        (_token_hash(t) for t in toks), dtype=np.uint64, count=len(toks)
    )
    if len(h) < k:
        v = np.uint64(0)
        with np.errstate(over="ignore"):
            for x in h:
                v = v * _POLY_C + x
        return np.array([v], dtype=np.uint64)
    powk = _pow_k(k)
    nroll = len(h) - k + 1
    with np.errstate(over="ignore"):
        roll = h[:nroll] * powk[0]
        for j in range(1, k):
            roll = roll + h[j : nroll + j] * powk[j]
    return roll


def _portable_doc_shingles(
    toks: List[str], k: int = SHINGLE_K, hex_chars: int = 8
) -> np.ndarray:
    """Per-doc portable (md5-prefix) shingle hashes; same shingle layout
    as _shingle_hashes (one whole-doc shingle when 0 < len < k)."""
    if not toks:
        return np.empty(0, dtype=np.uint64)
    if len(toks) < k:
        return np.array(
            [_md5_u64(" ".join(toks), hex_chars)], dtype=np.uint64
        )
    return np.array(
        [
            _md5_u64(" ".join(toks[i : i + k]), hex_chars)
            for i in range(len(toks) - k + 1)
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


def minhash_batch(batch: pa.Table, scheme: str = "fnv") -> pa.Table:
    """doc -> BANDS rows of (band, band_hash, doc_id).  Fully vectorized:
    one Arrow tokenize pass, rolling shingle hashes over the batch token
    stream, minimum.reduceat per doc (perm-chunked to bound memory), and a
    vectorized uint64 mix for the band hash (groupby key only).

    scheme="fnv" (default): blake2b token hashes + rolling FNV polynomial
    shingles, 64-bit wraparound perms -- the fast path.
    scheme="portable": md5-prefix shingle hashes + mod-p 32-bit perms,
    every step exactly replicable in DuckDB SQL (see PORTABLE_P) so the
    driver's oracle can audit the candidate pairs end-to-end."""
    from bleve_ray.pipelines.text_stats import flat_tokens_arrow

    flat, offs = flat_tokens_arrow(batch["text"])
    if scheme == "portable":
        sh_flat, sh_offs = portable_shingle_hashes(flat, offs, hex_chars=8)
        sh_flat = sh_flat % np.uint64(PORTABLE_P)
        perm_a, perm_b = _PERM_A32, _PERM_B32
        mod_p = np.uint64(PORTABLE_P)
    else:
        sh_flat, sh_offs = batch_shingle_hashes(flat, offs)
        perm_a, perm_b = _PERM_A, _PERM_B
        mod_p = None
    n = len(offs) - 1
    sh_counts = sh_offs[1:] - sh_offs[:-1]
    sigs = np.full(
        (n, NUM_PERMS), np.iinfo(np.uint64).max, dtype=np.uint64
    )
    if sh_offs[-1] > 0:
        nz = sh_counts > 0
        starts = sh_offs[:-1][nz]
        CH = 8  # perms per chunk: bounds the (n_shingles x CH) temp
        for p0 in range(0, NUM_PERMS, CH):
            with np.errstate(over="ignore"):
                vals = (
                    sh_flat[:, None] * perm_a[None, p0 : p0 + CH]
                    + perm_b[None, p0 : p0 + CH]
                )
                if mod_p is not None:
                    vals = vals % mod_p
            sigs[nz, p0 : p0 + CH] = np.minimum.reduceat(vals, starts, axis=0)
    bands = sigs.reshape(n, BANDS, ROWS_PER_BAND)
    bh = np.zeros((n, BANDS), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for r in range(ROWS_PER_BAND):
            bh = (bh ^ bands[:, :, r]) * np.uint64(0x9E3779B97F4A7C15)
            bh ^= bh >> np.uint64(29)
    doc_ids = np.asarray(batch["doc_id"].to_numpy(zero_copy_only=False)).astype(
        np.int64
    )
    return pa.table(
        {
            "band": pa.array(
                np.tile(np.arange(BANDS, dtype=np.int32), n)
            ),
            "band_hash": pa.array(bh.reshape(-1).view(np.int64)),
            "doc_id": pa.array(np.repeat(doc_ids, BANDS)),
        }
    )


# LSH guard: a degenerate bucket (empty docs, boilerplate) would emit
# O(n^2) pairs; cap the bucket and log the drop so truncation is visible.
MAX_BUCKET_DOCS = 64


NUM_PAIR_BUCKETS = 256


def _bucket_pairs(group: pa.Table) -> pa.Table:
    """Pair emission for ONE coarse hash bucket holding MANY (band,
    band_hash) LSH buckets: sort rows by (band, band_hash, doc_id), then
    for each offset d emit the (row, row+d) pairs that share a run --
    fully vectorized, <= MAX_BUCKET_DOCS iterations total, no per-LSH-
    bucket Python work (round-2 verdict: map_groups over millions of
    near-singleton groups paid ~1 task-dispatch per 2-row group)."""
    band = group["band"].to_numpy(zero_copy_only=False).astype(np.int64)
    bh = group["band_hash"].to_numpy(zero_copy_only=False)
    did = group["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((did, bh, band))
    band_s, bh_s, did_s = band[order], bh[order], did[order]
    n = len(did_s)
    empty = pa.table(
        {
            "doc_a": pa.array([], type=pa.int64()),
            "doc_b": pa.array([], type=pa.int64()),
        }
    )
    if n < 2:
        return empty
    newrun = np.empty(n, dtype=bool)
    newrun[0] = True
    newrun[1:] = (band_s[1:] != band_s[:-1]) | (bh_s[1:] != bh_s[:-1])
    run_id = np.cumsum(newrun)
    starts = np.flatnonzero(newrun)
    lens = np.diff(np.concatenate((starts, [n])))
    over = lens > MAX_BUCKET_DOCS
    if over.any():
        import logging

        logging.getLogger("bleve_ray.dedup").warning(
            "%d LSH buckets exceed cap %d (max %d docs): dropping %d "
            "potential pairs",
            int(over.sum()),
            MAX_BUCKET_DOCS,
            int(lens.max()),
            int((lens[over] * (lens[over] - 1) // 2).sum()),
        )
        keep = np.repeat(~over, lens)
        run_id, did_s = run_id[keep], did_s[keep]
        n = len(did_s)
        if n < 2:
            return empty
        lens = lens[~over]
    a_parts, b_parts = [], []
    for d in range(1, int(lens.max())):
        m = run_id[: n - d] == run_id[d:]
        if m.any():
            a_parts.append(did_s[: n - d][m])
            b_parts.append(did_s[d:][m])
    if not a_parts:
        return empty
    return pa.table(
        {
            "doc_a": pa.array(np.concatenate(a_parts), type=pa.int64()),
            "doc_b": pa.array(np.concatenate(b_parts), type=pa.int64()),
        }
    )


def minhash_pairs_ds(sf_dir: str, scheme: str = "fnv"):
    """Candidate near-duplicate pairs from banded MinHash LSH:
    shingle -> minhash -> band rows -> groupby(band, band_hash) -> pairs.
    Pairs are deduplicated across bands with a hash-partitioned aggregate
    (not per-pair map_groups: millions of 2-row groups are slow)."""
    import functools

    import ray.data
    from ray.data.aggregate import Count

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    bands = ds.map_batches(
        functools.partial(minhash_batch, scheme=scheme),
        batch_format="pyarrow",
        batch_size=2048,
    )
    def add_pk(b: pa.Table) -> pa.Table:
        bh = b["band_hash"].to_numpy(zero_copy_only=False).view(np.uint64)
        bd = b["band"].to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            pk = (bh ^ (bd * np.uint64(0x9E3779B97F4A7C15))) % np.uint64(
                NUM_PAIR_BUCKETS
            )
        return b.append_column("pk", pa.array(pk.astype(np.int64)))

    # coarse-bucket shuffle (one small-int key) + vectorized in-group run
    # pairing instead of a groupby over millions of tiny LSH buckets
    pairs = (
        bands.map_batches(add_pk, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(_bucket_pairs, batch_format="pyarrow")
    )
    # distinct pairs (a band collision can repeat across bands)
    distinct = pairs.groupby(["doc_a", "doc_b"]).aggregate(
        Count(alias_name="_n")
    )
    return distinct.select_columns(["doc_a", "doc_b"])


# per-process term-hash cache: corpus vocabulary is far smaller than the
# token stream, so each distinct term is blake2b-hashed once per worker
_TERM_BITS_CACHE: dict = {}
_BIT_SHIFTS = np.arange(64, dtype=np.uint64)
_POW2 = (np.uint64(1) << _BIT_SHIFTS).astype(np.uint64)


def _term_bits(term: str) -> np.ndarray:
    bits = _TERM_BITS_CACHE.get(term)
    if bits is None:
        # md5-prefix term hash: same value as DuckDB
        # ('0x'||substr(md5(term),1,16))::UBIGINT, so the whole simhash is
        # auditable by the driver's SQL oracle
        h = np.uint64(_md5_u64(term, 16))
        # +1/-1 per bit, ready to scale by tf
        bits = np.where(
            ((h >> _BIT_SHIFTS) & np.uint64(1)) == 1, 1, -1
        ).astype(np.int64)
        if len(_TERM_BITS_CACHE) < 1_000_000:
            _TERM_BITS_CACHE[term] = bits
    return bits


def simhash_batch(batch: pa.Table) -> pa.Table:
    """Batch-vectorized, value-identical to the per-doc formulation:
    per-unique-term ±1 bit rows (worker-cached blake2b), gathered per
    occurrence and segment-summed per doc with one add.reduceat."""
    from bleve_ray.pipelines.text_stats import flat_tokens_arrow

    flat, offs = flat_tokens_arrow(batch["text"])
    n = len(offs) - 1
    counts = (offs[1:] - offs[:-1]).astype(np.int64)
    sims = np.zeros(n, dtype=np.uint64)
    if len(flat) > 0:
        h = portable_token_hashes(flat)
        # bit-sliced: per bit j, per-doc hit count via cumsum-diff; the
        # signed accumulator acc_j = 2*hits_j - ntok, so bit set <=> acc>0
        hits = np.empty((n, 64), dtype=np.int64)
        for j in range(64):
            b = ((h >> np.uint64(j)) & np.uint64(1)).astype(np.int64)
            cs = np.concatenate(([0], np.cumsum(b)))
            hits[:, j] = cs[offs[1:]] - cs[offs[:-1]]
        pos = (2 * hits) > counts[:, None]
        sims = (pos * _POW2[None, :]).sum(axis=1, dtype=np.uint64)
    out = [f"{int(s):016x}" for s in sims]
    return pa.table({"doc_id": batch["doc_id"], "simhash": pa.array(out)})


def simhash_ds(sf_dir: str):
    import ray.data

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return ds.map_batches(
        simhash_batch, batch_format="pyarrow", batch_size=2048
    )


_PAIR_BUCKETS = 256  # keyed buckets keep shuffle group counts low


class _MemberShingles:
    """Actor-pool stage: broadcast pair membership once per actor
    (ray.get in __init__), stream the corpus, emit one
    (pair_id, side, doc_a, doc_b, shingles) row per (member doc, pair).
    No driver-side corpus read: only candidate-pair members produce
    output, everything else streams through and is dropped."""

    def __init__(self, member_ref, k: int, scheme: str = "fnv"):
        import ray

        self.member = ray.get(member_ref)  # doc_id -> [(pair_id, a, b, side)]
        self.k = k
        self.scheme = scheme

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        pair_ids, sides, das, dbs, sh_list = [], [], [], [], []
        for d, t in zip(ids, texts):
            lst = self.member.get(d)
            if not lst:
                continue
            toks = _tokens(t)
            if self.scheme == "portable":
                sh = np.unique(_portable_doc_shingles(toks, self.k))
            else:
                sh = np.unique(_shingle_hashes(toks, self.k))
            for pid, a, b, side in lst:
                pair_ids.append(pid)
                sides.append(side)
                das.append(a)
                dbs.append(b)
                sh_list.append(sh)
        return pa.table(
            {
                "pair_bucket": pa.array(
                    [p % _PAIR_BUCKETS for p in pair_ids], type=pa.int32()
                ),
                "pair_id": pa.array(pair_ids, type=pa.int64()),
                "side": pa.array(sides, type=pa.int8()),
                "doc_a": pa.array(das, type=pa.int64()),
                "doc_b": pa.array(dbs, type=pa.int64()),
                "shingles": pa.array(
                    [s.tolist() for s in sh_list], type=pa.list_(pa.uint64())
                ),
            }
        )


def _bucket_jaccard(group: pa.Table) -> pa.Table:
    """Per pair_id within a bucket: |A ∩ B| / |A ∪ B| over the two
    (already-deduplicated, sorted) shingle arrays via np.intersect1d."""
    pair_ids = group["pair_id"].to_numpy(zero_copy_only=False)
    sides = group["side"].to_numpy(zero_copy_only=False)
    das = group["doc_a"].to_numpy(zero_copy_only=False)
    dbs = group["doc_b"].to_numpy(zero_copy_only=False)
    shingles = group["shingles"].to_pylist()
    by_pair = {}
    for i, pid in enumerate(pair_ids):
        e = by_pair.setdefault(int(pid), [None, None, int(das[i]), int(dbs[i])])
        e[int(sides[i])] = np.asarray(shingles[i], dtype=np.uint64)
    out = []
    empty = np.array([], dtype=np.uint64)
    for pid in sorted(by_pair):
        sa, sb, a, b = by_pair[pid]
        sa = sa if sa is not None else empty
        sb = sb if sb is not None else empty
        inter = len(np.intersect1d(sa, sb, assume_unique=True))
        union = len(sa) + len(sb) - inter
        j = inter / union if union else 0.0
        out.append({"doc_a": a, "doc_b": b, "jaccard": f"{j:.6f}"})
    if not out:
        return pa.table(
            {
                "doc_a": pa.array([], type=pa.int64()),
                "doc_b": pa.array([], type=pa.int64()),
                "jaccard": pa.array([], type=pa.string()),
            }
        )
    t = pa.Table.from_pylist(out)
    return t.set_column(0, "doc_a", t["doc_a"].cast(pa.int64())).set_column(
        1, "doc_b", t["doc_b"].cast(pa.int64())
    )


def jaccard_verify_ds(sf_dir: str, pairs, k: int = SHINGLE_K, scheme: str = "fnv"):
    """Exact n-gram Jaccard for candidate pairs as a Ray pipeline:
    broadcast the (small) pair list via ray.put, stream the corpus through
    an actor pool emitting member shingle sets, co-locate the two sides of
    each pair with one keyed-bucket groupby, score vectorized.

    `pairs`: pa.Table with doc_a/doc_b columns, or list of (a, b) tuples.
    Partitioning assumption: the pair list (LSH candidate output) fits in
    the object store -- it is bounded by the MAX_BUCKET_DOCS cap, not by
    corpus size."""
    import ray
    import ray.data

    if isinstance(pairs, pa.Table):
        pair_list = list(
            zip(pairs["doc_a"].to_pylist(), pairs["doc_b"].to_pylist())
        )
    else:
        pair_list = [tuple(p) for p in pairs]
    member: dict = {}
    for pid, (a, b) in enumerate(pair_list):
        member.setdefault(a, []).append((pid, a, b, 0))
        member.setdefault(b, []).append((pid, a, b, 1))
    member_ref = ray.put(member)

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    rows = ds.map_batches(
        _MemberShingles,
        fn_constructor_args=(member_ref, k, scheme),
        batch_format="pyarrow",
        concurrency=(1, 8),
    )
    return rows.groupby("pair_bucket").map_groups(
        _bucket_jaccard, batch_format="pyarrow"
    )


def dedup_corpus_ds(sf_dir: str):
    """Materialized exact dedup: the corpus with one representative doc
    (min doc_id) per distinct text.  Scale shape: the sha-keyed groupby
    moves each doc's row exactly once (hash partition), keep-first is a
    vectorized argmin inside the group -- no broadcast of the (corpus-
    sized) winner set, so this works when the distinct count is huge."""
    import ray.data

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def add_sha(batch: pa.Table) -> pa.Table:
        shas = [
            hashlib.sha256((t or "").encode("utf-8")).hexdigest()
            for t in batch["text"].to_pylist()
        ]
        return batch.append_column("text_sha", pa.array(shas))

    def keep_first(group: pa.Table) -> pa.Table:
        i = int(np.argmin(np.asarray(group["doc_id"], dtype=np.int64)))
        return group.select(["doc_id", "text"]).slice(i, 1)

    return (
        ds.map_batches(add_sha, batch_format="pyarrow")
        .groupby("text_sha")
        .map_groups(keep_first, batch_format="pyarrow")
    )
