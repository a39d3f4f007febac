"""Term -> shard routing hashes.

The build's storage-exchange shuffle groups posting rows by
``shard = hash(field, term) mod num_shards``; query readers route term
lookups with the SAME function, so the hash is part of the on-disk index
format.  The manifest records which router built an index
(``options["shard_hash"]``) and readers dispatch on it, so sha1-routed
indexes from earlier builds stay readable forever.

``poly64`` (the default for new builds): a per-field-seeded polynomial
over the raw term bytes with the FNV-64 prime as base, finished with the
splitmix64 mixer.  The batch form runs entirely in numpy over the Arrow
string buffers -- zero per-term Python work -- which matters because
stage 1 emits one chunk row per distinct (term, bucket) and the previous
sha1 router's per-row Python loop measured ~19% of stage-1 compute.
(The Go reference needs no cross-node router -- scorch segments are
node-local, index/scorch/persister.go; this routing layer is the
Ray-cluster equivalent of its per-segment term dictionary placement.)
"""

from __future__ import annotations

import hashlib
from typing import Dict

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_MASK = (1 << 64) - 1
_POLY_P = 0x100000001B3  # FNV-64 prime (odd -> full-period mod 2^64)
_P64 = np.uint64(_POLY_P)

# splitmix64 finalizer constants
_MIX1 = 0xBF58476D1CE4E5B9
_MIX2 = 0x94D049BB133111EB

_FIELD_SEEDS: Dict[str, int] = {}

# powers of the base mod 2^64, grown on demand (max term length bound)
_POW = np.ones(1, dtype=np.uint64)


def _field_seed(field: str) -> int:
    s = _FIELD_SEEDS.get(field)
    if s is None:
        h = hashlib.sha1(field.encode()).digest()
        s = int.from_bytes(h[:8], "little")
        _FIELD_SEEDS[field] = s
    return s


def _powers(n: int) -> np.ndarray:
    """_POW grown to at least n entries: _POW[i] == P**i mod 2**64."""
    global _POW
    if len(_POW) < n:
        k = max(n, 2 * len(_POW), 64)
        out = np.empty(k, dtype=np.uint64)
        out[0] = 1
        np.multiply.accumulate(
            np.full(k - 1, _P64, dtype=np.uint64), out=out[1:]
        )
        _POW = out
    return _POW


def _mix64_np(h: np.ndarray) -> np.ndarray:
    h = (h ^ (h >> np.uint64(30))) * np.uint64(_MIX1)
    h = (h ^ (h >> np.uint64(27))) * np.uint64(_MIX2)
    return h ^ (h >> np.uint64(31))


def _mix64_int(h: int) -> int:
    h = ((h ^ (h >> 30)) * _MIX1) & _MASK
    h = ((h ^ (h >> 27)) * _MIX2) & _MASK
    return h ^ (h >> 31)


def poly_shard(field: str, term: str, num_shards: int) -> int:
    """Scalar twin of poly_shards -- query-side term routing."""
    h = _field_seed(field)
    for b in term.encode("utf-8", "surrogatepass"):
        h = (h * _POLY_P + b) & _MASK
    return _mix64_int(h) % num_shards


def sha1_shard(field: str, term: str, num_shards: int) -> int:
    """Legacy router (indexes whose manifest lacks/says shard_hash=sha1)."""
    h = hashlib.sha1(f"{field}\x1f{term}".encode()).digest()
    return int.from_bytes(h[:4], "little") % num_shards


def shard_of_term(
    field: str, term: str, num_shards: int, method: str = "poly64"
) -> int:
    if method == "sha1":
        return sha1_shard(field, term, num_shards)
    return poly_shard(field, term, num_shards)


def poly_shards(field: str, terms, num_shards: int) -> np.ndarray:
    """Vectorized poly64 shard ids for one field's term column.

    Operates directly on the Arrow string/binary buffers:
    ``h = seed * P**len + sum(byte[i] * P**(len-1-i))  (mod 2**64)``
    == Horner's ``h = seed; h = h*P + byte`` -- identical to poly_shard.
    Per-term sums come from a cumsum-diff over the flat byte buffer
    (np.add.reduceat is the known slow path here; see analysis/freq.py).
    """
    if isinstance(terms, pa.ChunkedArray):
        terms = terms.combine_chunks()
    n = len(terms)
    if n == 0:
        return np.empty(0, dtype=np.int32)
    t = terms.type
    if pa.types.is_dictionary(t):
        terms = terms.dictionary_decode()
        t = terms.type
    if not (
        pa.types.is_string(t)
        or pa.types.is_binary(t)
        or pa.types.is_large_string(t)
        or pa.types.is_large_binary(t)
    ):
        terms = pc.cast(terms, pa.string())
        t = terms.type
    if terms.null_count:
        terms = terms.fill_null("")
    odt = (
        np.int64
        if pa.types.is_large_string(t) or pa.types.is_large_binary(t)
        else np.int32
    )
    bufs = terms.buffers()
    off = np.frombuffer(bufs[1], dtype=odt)[
        terms.offset : terms.offset + n + 1
    ].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8)[off[0] : off[-1]]
    off = off - off[0]
    lengths = off[1:] - off[:-1]
    total = int(off[-1])
    pow_tab = _powers(int(lengths.max()) + 1 if n else 1)
    if total:
        ends_rep = np.repeat(off[1:], lengths)
        exps = ends_rep - 1 - np.arange(total, dtype=np.int64)
        contrib = data.astype(np.uint64) * pow_tab[exps]
        cs = np.empty(total + 1, dtype=np.uint64)
        cs[0] = 0
        np.cumsum(contrib, out=cs[1:])
        sums = cs[off[1:]] - cs[off[:-1]]
    else:
        sums = np.zeros(n, dtype=np.uint64)
    h = np.uint64(_field_seed(field)) * pow_tab[lengths] + sums
    h = _mix64_np(h)
    return (h % np.uint64(num_shards)).astype(np.int32)
