"""Hybrid-search score fusion (reference fusion/rrf.go, fusion/rsf.go,
rescorer.go) and the KNN top-k searcher over docvalue vector columns
(search_knn.go role; vectors here live in the columnar docvalues).

Scores fuse over (docnum, fts_score, [knn_score_i]) triples:

- RRF (rrf.go:34-120): per source, hits ranked desc; contribution =
  weight / (rank_constant + rank); fts hits beyond the window (or with
  score 0) contribute 0.
- RSF (rsf.go:35-140): per source, min/max-normalize the top-window
  scores to [0,1], contribution = weight * norm (norm=1 when max==min).
- default merge (search_knn.go mergeKNNResults): fts score + sum of
  boost-weighted knn scores for docs present in either set.

DEFAULT_RANK_CONSTANT = 60 (rescorer.go DefaultScoreRankConstant).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

DEFAULT_RANK_CONSTANT = 60

# above this many docvalue files, KNN scanning fans out as Ray tasks
KNN_DISTRIBUTED_FILE_THRESHOLD = 64


def _ranked(ids: List[int], scores: np.ndarray) -> List[int]:
    """Indices sorted by (-score, id) -- the reference sorts by score with
    stable doc order."""
    return sorted(range(len(ids)), key=lambda i: (-scores[i], ids[i]))


def reciprocal_rank_fusion(
    sources: List[Tuple[List[int], np.ndarray]],
    weights: List[float],
    rank_constant: int,
    window_size: int,
) -> Dict[int, float]:
    """sources[0] is the FTS ranking, sources[1:] the KNN rankings; each is
    (docnums, scores).  Returns docnum -> fused score."""
    fused: Dict[int, float] = {}
    for si, ((ids, scores), w) in enumerate(zip(sources, weights)):
        order = _ranked(ids, scores)
        for rank_pos, i in enumerate(order):
            if rank_pos >= window_size:
                break
            if si == 0 and scores[i] == 0.0:
                break  # rrf.go:69-71: fts hits with score 0 stop counting
            contrib = w / (rank_constant + rank_pos + 1)
            d = ids[i]
            fused[d] = fused.get(d, 0.0) + contrib
    return fused


def relative_score_fusion(
    sources: List[Tuple[List[int], np.ndarray]],
    weights: List[float],
    window_size: int,
) -> Dict[int, float]:
    fused: Dict[int, float] = {}
    for si, ((ids, scores), w) in enumerate(zip(sources, weights)):
        order = _ranked(ids, scores)
        limit = min(len(order), window_size)
        if si == 0:
            # fts: hits with score 0 are not counted (rsf.go:56-62)
            while limit > 0 and scores[order[limit - 1]] == 0.0:
                limit -= 1
        if limit == 0:
            continue
        mx = float(scores[order[0]])
        mn = float(scores[order[limit - 1]])
        denom = mx - mn
        for rank_pos in range(limit):
            i = order[rank_pos]
            norm = (scores[i] - mn) / denom if denom > 0 else 1.0
            d = ids[i]
            fused[d] = fused.get(d, 0.0) + w * norm
    return fused


def default_knn_merge(
    sources: List[Tuple[List[int], np.ndarray]],
    weights: List[float],
) -> Dict[int, float]:
    """search_knn.go mergeKNNResults: additive merge, knn contributions
    scaled by their boost."""
    fused: Dict[int, float] = {}
    for si, ((ids, scores), w) in enumerate(zip(sources, weights)):
        for i, d in enumerate(ids):
            fused[d] = fused.get(d, 0.0) + (
                scores[i] if si == 0 else w * scores[i]
            )
    return fused


_MAX_KNN_SCORE = 3.4028234663852886e38  # scorer_knn.go:75 maxKNNScore


def _metric_sims(mat: np.ndarray, qv: np.ndarray, metric: str) -> np.ndarray:
    """Similarity per row under the vector-field similarity model
    (index.SimilarityModels; scorer_knn.go:65-75): cosine (default),
    dot_product (raw inner product), l2_norm (euclidean distance
    inverted -- 1/d, exact match scores maxKNNScore)."""
    if metric == "dot_product":
        return mat @ qv
    if metric == "l2_norm":
        d = np.linalg.norm(mat - qv, axis=1)
        return np.where(d == 0.0, _MAX_KNN_SCORE, 1.0 / np.where(d == 0.0, 1.0, d))
    qn = qv / (np.linalg.norm(qv) or 1.0)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    return (mat @ qn) / norms


def _file_topk(
    nums: np.ndarray, col: np.ndarray, qv: np.ndarray, k: int,
    metric: str = "cosine",
) -> Tuple[np.ndarray, np.ndarray]:
    """Local top-k for one docvalue file's vector column under the
    clause's similarity model.

    Multi-vector docs (a list of vectors per value; search_knn_test.go
    TestMultiVector / TestNestedVectors) score as the BEST sub-vector
    similarity."""
    # layout is decided PER VALUE, not from the column's first element:
    # a column mixing flat vectors and multi-vector lists (or files whose
    # first doc differs in shape) must route each value correctly.
    flat, fdoc = [], []
    for i, v in enumerate(col):
        if v is None or len(v) == 0:
            continue
        if isinstance(v[0], (list, tuple, np.ndarray)):
            for sub in v:  # multi-vector doc: one row per sub-vector
                flat.append(np.asarray(sub, dtype=np.float64))
                fdoc.append(i)
        else:
            flat.append(np.asarray(v, dtype=np.float64))
            fdoc.append(i)
    if not flat:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    mat = np.stack(flat)
    fdoc_a = np.asarray(fdoc, dtype=np.int64)
    sub_sims = _metric_sims(mat, qv, metric)
    # per-doc max over the doc's sub-vectors (fdoc is nondecreasing;
    # single-vector docs are their own 1-row group)
    starts = np.concatenate(([0], np.flatnonzero(np.diff(fdoc_a)) + 1))
    idx = fdoc_a[starts]
    sims = np.maximum.reduceat(sub_sims, starts)
    if len(sims) > k:
        keep = np.argpartition(-sims, k - 1)[:k]
    else:
        keep = np.arange(len(sims))
    return nums[idx[keep]], sims[keep]


def _extract_vecs(value, elems, out=None):
    """Vectors at dotted path ``elems`` under an arbitrarily nested
    struct/list value (nested vector fields like items.embedding_vector,
    search_knn_test.go TestHierarchicalNestedVectorSearch).  Returns a
    flat list of vectors (element order preserved)."""
    if out is None:
        out = []
    if value is None:
        return out
    if not elems:
        if isinstance(value, (list, tuple, np.ndarray)) and len(value):
            if isinstance(value[0], (list, tuple, np.ndarray)):
                out.extend(value)  # multi-vector element
            else:
                out.append(value)
        return out
    if isinstance(value, dict):
        _extract_vecs(value.get(elems[0]), elems[1:], out)
    elif isinstance(value, (list, tuple, np.ndarray)):
        for x in value:
            _extract_vecs(x, elems, out)
    return out


def _dotted_vec_col(cols: dict, field: str):
    """Derive a per-doc multi-vector column for a DOTTED field from its
    root docvalue column; None when the root column is absent."""
    root = field.split(".", 1)[0]
    base = cols.get(root)
    if base is None:
        return None
    elems = field.split(".")[1:]
    out = np.empty(len(base), dtype=object)
    for i, v in enumerate(base):
        vecs = _extract_vecs(v, elems)
        out[i] = vecs if vecs else None
    return out


def _allowed_mask(nums: np.ndarray, allowed: np.ndarray) -> np.ndarray:
    """Membership mask of nums in the SORTED allowed docnum array."""
    if len(allowed) == 0:
        return np.zeros(len(nums), dtype=bool)
    j = np.clip(np.searchsorted(allowed, nums), 0, len(allowed) - 1)
    return allowed[j] == nums


def knn_topk(
    reader,
    field: str,
    vector,
    k: int,
    allowed: Optional[np.ndarray] = None,
    method: str = "auto",
    nprobe: Optional[int] = None,
    stats: Optional[dict] = None,
    metric: str = "cosine",
) -> Tuple[np.ndarray, np.ndarray]:
    """Cosine top-k over a docvalue vector column.

    ``method="auto"`` uses the per-index IVF sidecar when one exists at
    the current epoch (reference role: per-segment faiss IVF,
    search_knn.go / snapshot_vector_index.go): probe the ``nprobe``
    nearest cells, exact-cosine re-rank ONLY those candidates.
    ``method="exact"`` (or a missing/stale sidecar) brute-force-scans:
    per-file local top-k (np.argpartition) then a tiny merge -- never a
    global sort; fans out as Ray tasks when the index has many docvalue
    files.

    ``allowed``: optional SORTED docnum set for kNN pre-filtering
    (search_knn.go KNNRequest.FilterQuery): only these docs are eligible
    candidates.  ``stats`` (optional dict) is filled with
    {"path": "ivf"|"brute", "scanned": candidates_scored}."""
    if metric not in ("cosine", "l2_norm", "dot_product"):
        raise ValueError(
            "similarity must be cosine, l2_norm or dot_product"
        )
    qv = np.asarray(vector, dtype=np.float64)
    if metric != "cosine" and method == "ivf":
        raise ValueError("the IVF sidecar supports cosine only")
    if metric == "cosine" and method in ("auto", "ivf"):
        from ..index.knn_ivf import load_knn_ivf

        ivf = load_knn_ivf(reader, field)
        if ivf is not None:
            np_probe = nprobe if nprobe else max(1, ivf.meta["nlist"] // 2)
            nums, mat = ivf.candidates(qv, np_probe)
            if allowed is not None and len(nums):
                ok = _allowed_mask(nums, allowed)
                nums, mat = nums[ok], mat[ok]
            if stats is not None:
                stats["path"] = "ivf"
                stats["scanned"] = int(len(nums))
            if len(nums) == 0:
                return (
                    np.empty(0, dtype=np.int64),
                    np.empty(0, dtype=np.float64),
                )
            qn = qv / (np.linalg.norm(qv) or 1.0)
            norms = np.linalg.norm(mat, axis=1)
            norms[norms == 0] = 1.0
            sims = (mat @ qn) / norms
            order = sorted(
                range(len(nums)), key=lambda i: (-sims[i], nums[i])
            )[:k]
            return nums[order], sims[order]
        if method == "ivf":
            raise ValueError(
                f"no current-epoch IVF sidecar for field {field!r}; "
                "build one with build_knn_ivf / `bleve_ray knn-ivf`"
            )
    files = reader._dv_files()
    parts: List[Tuple[np.ndarray, np.ndarray]] = []
    scanned = 0
    if len(files) >= KNN_DISTRIBUTED_FILE_THRESHOLD:
        import ray

        allowed_ref = ray.put(allowed)  # broadcast once, not per task

        @ray.remote
        def _task(path: str, allowed_b):
            import pyarrow.parquet as _pq

            root = field.split(".", 1)[0]
            schema_names = _pq.ParquetFile(path).schema_arrow.names
            want = field if field in schema_names else root
            if want not in schema_names:
                return (
                    np.empty(0, dtype=np.int64),
                    np.empty(0, dtype=np.float64),
                )
            t = _pq.read_table(path, columns=["docnum", want]).sort_by(
                "docnum"
            )
            nums = np.asarray(t["docnum"], dtype=np.int64)
            if want == field:
                col = np.asarray(t[field].to_pylist(), dtype=object)
            else:
                col = _dotted_vec_col(
                    {root: t[root].to_pylist()}, field
                )
                if col is None:
                    return (
                        np.empty(0, dtype=np.int64),
                        np.empty(0, dtype=np.float64),
                    )
            if allowed_b is not None:
                ok = _allowed_mask(nums, allowed_b)
                if not ok.any():
                    return (
                        np.empty(0, dtype=np.int64),
                        np.empty(0, dtype=np.float64),
                    )
                nums, col = nums[ok], col[ok]
            return _file_topk(nums, col, qv, k, metric)

        parts = ray.get([_task.remote(p, allowed_ref) for p, _, _ in files])
        scanned = -1  # not tracked across tasks
    else:
        for p, _, _ in files:
            nums, cols = reader._load_dv(p)
            col = cols.get(field)
            if col is None and "." in field:
                col = _dotted_vec_col(cols, field)
            if col is None:
                continue
            if allowed is not None:
                ok = _allowed_mask(nums, allowed)
                if not ok.any():
                    continue
                nums, col = nums[ok], col[ok]
            scanned += len(nums)
            parts.append(_file_topk(nums, col, qv, k, metric))
    if stats is not None:
        stats["path"] = "brute"
        stats["scanned"] = scanned
    if not parts:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    all_nums = np.concatenate([p[0] for p in parts])
    all_sims = np.concatenate([p[1] for p in parts])
    order = sorted(
        range(len(all_nums)), key=lambda i: (-all_sims[i], all_nums[i])
    )[:k]
    return all_nums[order], all_sims[order]
