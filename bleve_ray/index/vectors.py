"""Vector-value processing for ingestion and knn requests.

Re-expression of the reference's mapping/mapping_vectors.go helpers:

- process_vector   (processVector:85-130 + processFlatVector:60-83):
  validate/coerce an untyped JSON-decoded value into a float32 vector
  of exactly ``dims`` elements; a nested list-of-lists (multi-vector)
  flattens to ``dims * n`` when every sub-vector is exactly ``dims``
  long.  Non-numeric elements (strings, None, bools, objects), wrong
  arity and non-sequence inputs are invalid.
- normalize_vector (NormalizeVector:324-330, faiss renorm_L2 role):
  unit-normalize a copy in float32; the zero vector is returned
  unchanged.
- normalize_multi_vector (NormalizeMultiVector:336-351): normalize
  each ``dims``-sized chunk independently; inputs whose length is not
  a positive multiple of ``dims`` are returned as-is.
"""

import numbers
from typing import List, Optional, Tuple

import numpy as np


def _numeric_f32(v) -> Optional[np.float32]:
    if isinstance(v, bool) or v is None:
        return None
    if isinstance(v, numbers.Real):
        return np.float32(v)
    return None


def _is_sequence(v) -> bool:
    return (
        not isinstance(v, (str, bytes, dict))
        and hasattr(v, "__len__")
        and hasattr(v, "__getitem__")
    )


def _flat(vec, dims: int) -> Tuple[Optional[List[float]], bool]:
    if len(vec) != dims:
        return None, False
    out = np.empty(dims, dtype=np.float32)
    for i, e in enumerate(vec):
        f = _numeric_f32(e)
        if f is None:
            return None, False
        out[i] = f
    return out.tolist(), True


def process_vector(value, dims: int) -> Tuple[Optional[List[float]], bool]:
    """-> (flattened float32 vector as Python floats, valid)."""
    if not _is_sequence(value) or len(value) == 0:
        return None, False
    head = value[0]
    if not _is_sequence(head):  # flat vector
        return _flat(value, dims)
    out: List[float] = []
    for sub in value:
        if not _is_sequence(sub):
            return None, False
        part, ok = _flat(sub, dims)
        if not ok:
            return None, False
        out.extend(part)
    return out, True


def normalize_vector(vec) -> np.ndarray:
    """Unit-normalize (L2) a copy of ``vec`` in float32; zero norm
    passes through untouched (faiss fvec_renorm_L2 behavior)."""
    out = np.asarray(vec, dtype=np.float32).copy()
    norm = np.float32(np.sqrt(np.float32((out.astype(np.float64) ** 2).sum())))
    if norm > 0:
        out /= norm
    return out


def normalize_multi_vector(vec, dims: int) -> np.ndarray:
    arr = np.asarray(vec, dtype=np.float32)
    if arr.size == 0 or dims <= 0 or arr.size % dims != 0:
        return arr.copy()
    out = arr.reshape(-1, dims).copy()
    for i in range(out.shape[0]):
        out[i] = normalize_vector(out[i])
    return out.reshape(-1)
