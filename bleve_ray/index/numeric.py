"""Prefix-coded numeric terms (Lucene-style trie encoding).

Replicates the reference's numeric package exactly:
- Float64ToInt64 sortable mapping (numeric/float.go)
- NewPrefixCodedInt64 (numeric/prefix_coded.go:9-43): term byte 0 =
  0x20+shift, then ceil((64-shift)/7) bytes of 7 bits each -- every byte
  <= 0x7f, so terms are valid UTF-8 strings and sort bytewise.
- splitInt64Range with precisionStep 4 (search_numeric_range.go:194-260,
  field_numeric.go:36) producing covering term ranges per shift.

A numeric field value is indexed as 16 terms (shifts 0,4,...,60); a range
query expands to dictionary terms inside the covering ranges and runs as a
MultiTermSearcher -- identical semantics to the reference.
"""

from __future__ import annotations

import struct
from typing import List, Optional, Tuple

SHIFT_START = 0x20
PRECISION_STEP = 4  # document/field_numeric.go:36

_MASK64 = (1 << 64) - 1


def float64_to_int64(f: float) -> int:
    """Sortable-int64 mapping of a float64 (numeric/float.go)."""
    bits = struct.unpack("<q", struct.pack("<d", float(f)))[0]
    if bits < 0:
        bits ^= 0x7FFFFFFFFFFFFFFF
    return bits


def int64_to_float64(v: int) -> float:
    if v < 0:
        v ^= 0x7FFFFFFFFFFFFFFF
    return struct.unpack("<d", struct.pack("<q", v))[0]


def prefix_coded_int64(v: int, shift: int) -> str:
    """numeric/prefix_coded.go:14-43; returns the term as a str (all bytes
    are <= 0x7f)."""
    if not 0 <= shift <= 63:
        raise ValueError(f"shift {shift} out of range")
    n_chars = ((63 - shift) // 7) + 1
    buf = bytearray(n_chars + 1)
    buf[0] = SHIFT_START + shift
    sortable = ((v & _MASK64) ^ 0x8000000000000000) >> shift
    i = n_chars
    while i > 0:
        buf[i] = sortable & 0x7F
        sortable >>= 7
        i -= 1
    return buf.decode("ascii")


def decode_prefix_coded(term: str) -> Tuple[int, int]:
    """-> (int64 value, shift)."""
    b = term.encode("ascii")
    shift = b[0] - SHIFT_START
    sortable = 0
    for byte in b[1:]:
        sortable = (sortable << 7) | byte
    v = ((sortable << shift) & _MASK64) ^ 0x8000000000000000
    if v >= 1 << 63:
        v -= 1 << 64
    return v, shift


def terms_for_value(v: int) -> List[str]:
    """All trie terms for one int64 value (shifts 0..60 step 4, like
    document/field_numeric.go indexing at each precision level)."""
    return [
        prefix_coded_int64(v, shift) for shift in range(0, 64, PRECISION_STEP)
    ]


def _i64(x: int) -> int:
    x &= _MASK64
    return x - (1 << 64) if x >= 1 << 63 else x


def split_int64_range(
    min_bound: int, max_bound: int, precision_step: int = PRECISION_STEP
) -> List[Tuple[str, str]]:
    """search_numeric_range.go:194-247 splitInt64Range: covering
    (start_term, end_term) pairs; end term's low bits filled
    (newRange:250-255 maxBound |= (1<<shift)-1)."""
    rv: List[Tuple[str, str]] = []
    if min_bound > max_bound:
        return rv
    shift = 0
    while True:
        diff = _i64(1 << (shift + precision_step))
        mask = _i64(((1 << precision_step) - 1) << shift)
        has_lower = (min_bound & mask) != 0
        has_upper = (max_bound & mask) != mask

        if has_lower:
            next_min = _i64((min_bound + diff) & ~mask)
        else:
            next_min = _i64(min_bound & ~mask)
        if has_upper:
            next_max = _i64((max_bound - diff) & ~mask)
        else:
            next_max = _i64(max_bound & ~mask)

        lower_wrapped = next_min < min_bound
        upper_wrapped = next_max > max_bound

        if (
            shift + precision_step >= 64
            or next_min > next_max
            or lower_wrapped
            or upper_wrapped
        ):
            rv.append(_new_range(min_bound, max_bound, shift))
            break
        if has_lower:
            rv.append(_new_range(min_bound, _i64(min_bound | mask), shift))
        if has_upper:
            rv.append(_new_range(_i64(max_bound & ~mask), max_bound, shift))
        min_bound = next_min
        max_bound = next_max
        shift += precision_step
    return rv


def _new_range(min_bound: int, max_bound: int, shift: int) -> Tuple[str, str]:
    max_bound = _i64(max_bound | ((1 << shift) - 1))
    return (
        prefix_coded_int64(min_bound, shift),
        prefix_coded_int64(max_bound, shift),
    )


def range_bounds_from_floats(
    fmin: Optional[float],
    fmax: Optional[float],
    inclusive_min: bool,
    inclusive_max: bool,
) -> Tuple[int, int]:
    """search_numeric_range.go:28-60 bound handling."""
    min_i = float64_to_int64(fmin) if fmin is not None else -(1 << 63)
    max_i = float64_to_int64(fmax) if fmax is not None else (1 << 63) - 1
    if fmin is not None and not inclusive_min and min_i < (1 << 63) - 1:
        min_i += 1
    if fmax is not None and not inclusive_max and max_i > -(1 << 63):
        max_i -= 1
    return min_i, max_i
