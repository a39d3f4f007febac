"""Posting-list codecs: vectorized LEB128 varint + delta encoding.

The segment format stores docnums as delta-varint (ascending within a
posting list), term frequencies as varint, norms as raw little-endian
float32, and positions as per-doc delta-varint -- the same information the
reference's zap segments keep per posting (freq/norm/location chunks,
index/scorch/README.md:60-83), re-expressed columnar.

All encode/decode paths are numpy-vectorized; no per-value Python loops.
"""

from __future__ import annotations

import numpy as np

_THRESHOLDS = [np.uint64(1) << np.uint64(7 * j) for j in range(1, 10)]


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode an array of non-negative ints (vectorized)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(v)
    if n == 0:
        return b""
    if v.max() < np.uint64(128):
        # fast path: every value fits one byte
        return v.astype(np.uint8).tobytes()
    nbytes = varint_nbytes(v)
    total = int(nbytes.sum())
    offsets = np.zeros(n, dtype=np.int64)
    np.cumsum(nbytes[:-1], out=offsets[1:])
    buf = np.zeros(total, dtype=np.uint8)
    _scatter_varints(buf, v, nbytes, offsets)
    return buf.tobytes()


def varint_decode(buf: bytes) -> np.ndarray:
    """Decode LEB128 buffer -> uint64 array (vectorized, constant number of
    full-array passes via reduceat -- ~5x faster than per-byte-position
    masking on mixed-length values)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    nb = len(b)
    if nb == 0:
        return np.empty(0, dtype=np.uint64)
    is_end = (b & 0x80) == 0
    if bool(is_end.all()):
        # all single-byte values
        return b.astype(np.uint64)
    ends = np.flatnonzero(is_end)
    n = len(ends)
    starts = np.empty(n, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    out = (b[starts] & np.uint8(0x7F)).astype(np.uint64)
    # continue only for the (typically rare) multi-byte values
    lengths = ends - starts + 1
    multi = np.flatnonzero(lengths > 1)
    if len(multi):
        mlen = lengths[multi]
        mstart = starts[multi]
        for j in range(1, int(mlen.max())):
            sel = mlen > j
            idx = multi[sel]
            out[idx] |= (b[mstart[sel] + j] & np.uint8(0x7F)).astype(
                np.uint64
            ) << np.uint64(7 * j)
    return out


def varint_nbytes(v: np.ndarray) -> np.ndarray:
    """LEB128 encoded length per value (vectorized).  Values >= 128 are
    rare in posting streams (small deltas/tfs), so only one full-width
    compare runs; the tail thresholds scan just the multi-byte subset."""
    v = np.ascontiguousarray(v, dtype=np.uint64)
    nbytes = np.ones(len(v), dtype=np.int64)
    big = np.flatnonzero(v >= _THRESHOLDS[0])
    if len(big):
        vb = v[big]
        add = np.ones(len(big), dtype=np.int64)
        for t in _THRESHOLDS[1:]:
            sel = vb >= t
            if not sel.any():
                break
            add += sel
        nbytes[big] += add
    return nbytes


def _scatter_varints(
    buf: np.ndarray, u: np.ndarray, nbytes: np.ndarray, starts: np.ndarray
) -> None:
    """Write LEB128 bytes of u (per-value lengths nbytes, start offsets
    starts) into buf.  First byte writes full-width; continuation bytes
    only touch the (rare) multi-byte subset."""
    cont = nbytes > 1
    buf[starts] = (u & np.uint64(0x7F)).astype(np.uint8) | (
        cont.astype(np.uint8) << 7
    )
    multi = np.flatnonzero(cont)
    if not len(multi):
        return
    um = u[multi]
    nbm = nbytes[multi]
    stm = starts[multi]
    jmax = int(nbm.max())
    for j in range(1, jmax):
        sel = nbm > j
        um = um[sel]
        nbm = nbm[sel]
        stm = stm[sel]
        byte = (um >> np.uint64(7 * j)) & np.uint64(0x7F)
        more = (nbm - 1) > j
        buf[stm + j] = byte.astype(np.uint8) | (
            more.astype(np.uint8) << 7
        )


def encode_with_restarts(
    values: np.ndarray, restart_starts: np.ndarray
) -> tuple:
    """Delta-varint encode ``values`` with the delta chain restarting (value
    stored absolute) at each index in ``restart_starts`` (must include 0).

    Returns ``(buf: bytes, byte_offsets: np.ndarray)`` where byte_offsets
    has len(values)+1 entries -- callers slice per-segment blobs out of buf
    with zero per-segment encode cost.  This is the batch-level fast path:
    one vectorized encode for ALL terms of a batch instead of one small
    encode per term."""
    v = np.ascontiguousarray(values, dtype=np.int64)
    n = len(v)
    if n == 0:
        return b"", np.zeros(1, dtype=np.int64)
    deltas = np.empty(n, dtype=np.int64)
    deltas[0] = v[0]
    np.subtract(v[1:], v[:-1], out=deltas[1:])
    deltas[restart_starts] = v[restart_starts]
    u = deltas.astype(np.uint64)
    nbytes = varint_nbytes(u)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(nbytes, out=offsets[1:])
    buf = np.zeros(int(offsets[-1]), dtype=np.uint8)
    if int(u.max()) < 128:
        buf[:] = u.astype(np.uint8)
        return buf.tobytes(), offsets
    _scatter_varints(buf, u, nbytes, offsets[:-1])
    return buf.tobytes(), offsets


def plain_varint_with_offsets(values: np.ndarray) -> tuple:
    """Varint encode (no deltas) returning (buf, per-value byte offsets)."""
    u = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(u)
    if n == 0:
        return b"", np.zeros(1, dtype=np.int64)
    nbytes = varint_nbytes(u)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(nbytes, out=offsets[1:])
    buf = np.zeros(int(offsets[-1]), dtype=np.uint8)
    if int(u.max()) < 128:
        buf[:] = u.astype(np.uint8)
        return buf.tobytes(), offsets
    _scatter_varints(buf, u, nbytes, offsets[:-1])
    return buf.tobytes(), offsets


def delta_varint_encode(values: np.ndarray) -> bytes:
    """Delta + varint encode a non-decreasing int array (docnums)."""
    v = np.ascontiguousarray(values, dtype=np.int64)
    if len(v) == 0:
        return b""
    deltas = np.empty(len(v), dtype=np.int64)
    deltas[0] = v[0]
    np.subtract(v[1:], v[:-1], out=deltas[1:])
    return varint_encode(deltas.astype(np.uint64))


def delta_varint_decode(buf: bytes) -> np.ndarray:
    deltas = varint_decode(buf).astype(np.int64)
    return np.cumsum(deltas)


def segmented_cumsum(deltas: np.ndarray, seg_starts: np.ndarray) -> np.ndarray:
    """Cumulative sum that restarts at each seg_start (values there are
    absolute).  Requires non-negative deltas (ascending sequences)."""
    deltas = np.ascontiguousarray(deltas, dtype=np.int64)
    if len(deltas) == 0:
        return deltas
    csum = np.cumsum(deltas)
    carry = np.zeros(len(deltas), dtype=np.int64)
    ss = seg_starts[seg_starts > 0]
    carry[ss] = csum[ss - 1]
    np.maximum.accumulate(carry, out=carry)
    return csum - carry


def norms_encode(norms: np.ndarray) -> bytes:
    return np.ascontiguousarray(norms, dtype="<f4").tobytes()


def norms_decode(buf: bytes) -> np.ndarray:
    return np.frombuffer(buf, dtype="<f4")


def positions_encode(
    pos_flat: np.ndarray, tfs: np.ndarray
) -> bytes:
    """Encode concatenated per-doc position lists.

    ``pos_flat`` is the concatenation of each doc's ascending positions;
    ``tfs`` gives the per-doc counts.  Deltas restart at each doc boundary
    (first position of each doc is stored absolute)."""
    p = np.ascontiguousarray(pos_flat, dtype=np.int64)
    if len(p) == 0:
        return b""
    deltas = np.empty(len(p), dtype=np.int64)
    deltas[0] = p[0]
    np.subtract(p[1:], p[:-1], out=deltas[1:])
    starts = np.zeros(len(tfs), dtype=np.int64)
    np.cumsum(np.asarray(tfs, dtype=np.int64)[:-1], out=starts[1:])
    deltas[starts] = p[starts]
    return varint_encode(deltas.astype(np.uint64))


def positions_decode(buf: bytes, tfs: np.ndarray) -> np.ndarray:
    """Decode to the flat concatenated positions array."""
    deltas = varint_decode(buf).astype(np.int64)
    if len(deltas) == 0:
        return deltas
    tfs = np.asarray(tfs, dtype=np.int64)
    starts = np.zeros(len(tfs), dtype=np.int64)
    np.cumsum(tfs[:-1], out=starts[1:])
    # segmented cumsum: subtract the running sum carried across boundaries
    csum = np.cumsum(deltas)
    carry = np.zeros(len(deltas), dtype=np.int64)
    carry[starts[1:]] = csum[starts[1:] - 1]
    np.maximum.accumulate(carry, out=carry)
    return csum - carry
