"""Text-analysis pipelines over a generic documents table
(training-data-pipeline operators; graft brief requirement).

All are stateless `map_batches` stages over zero-copy Arrow batches with
vectorized per-batch compute.  Deterministic so the DuckDB oracles in
__ray_entry__.oracle_sql() can mirror the SQL-expressible ones.
"""

from __future__ import annotations

import hashlib
import re
from typing import Dict, List

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_RE = re.compile(r"[A-Za-z0-9]+")

# short embedded stop list (mirrored literally in the SQL oracle)
QUALITY_STOPWORDS = (
    "the of and to in is for on with as by at from that this it be are was".split()
)

# tiny per-language function-word lists for the n-gram/stopword language
# heuristic (public knowledge lists)
LANG_MARKERS: Dict[str, List[str]] = {
    "en": "the and of to in is that it for was with as his on be at by had".split(),
    "de": "der die und das ist nicht ein eine mit auf für von zu den im".split(),
    "fr": "le la les et des une est dans pour que qui sur avec pas au du".split(),
    "es": "el la los las y de que en un una es por con para del se no".split(),
    "it": "il la le di che e un una per con del non sono alla più nel".split(),
}


def _tokens(text: str) -> List[str]:
    return [t.lower() for t in TOKEN_RE.findall(text or "")]


def token_count_batch(batch: pa.Table) -> pa.Table:
    texts = batch["text"].to_pylist()
    counts = np.fromiter(
        (len(TOKEN_RE.findall(t or "")) for t in texts),
        dtype=np.int64,
        count=len(texts),
    )
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "token_count": pa.array(counts),
        }
    )


def quality_batch(batch: pa.Table) -> pa.Table:
    """Per-doc quality stats: token count, alpha char ratio, stop-word
    ratio, mean token length.  All ratios rounded via %.6f formatting for
    oracle comparability."""
    texts = batch["text"].to_pylist()
    stop = set(QUALITY_STOPWORDS)
    n = len(texts)
    tok_counts = np.zeros(n, dtype=np.int64)
    stop_ratio = np.zeros(n, dtype=np.float64)
    mean_len = np.zeros(n, dtype=np.float64)
    alpha_ratio = np.zeros(n, dtype=np.float64)
    for i, t in enumerate(texts):
        t = t or ""
        toks = _tokens(t)
        tok_counts[i] = len(toks)
        if toks:
            stop_ratio[i] = sum(1 for x in toks if x in stop) / len(toks)
            mean_len[i] = sum(len(x) for x in toks) / len(toks)
        if t:
            alpha = sum(1 for ch in t if ch.isalpha() and ch.isascii())
            alpha_ratio[i] = alpha / len(t)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "token_count": pa.array(tok_counts),
            "stop_ratio": pa.array([f"{x:.6f}" for x in stop_ratio]),
            "mean_token_len": pa.array([f"{x:.6f}" for x in mean_len]),
            "alpha_ratio": pa.array([f"{x:.6f}" for x in alpha_ratio]),
        }
    )


def langid_batch(batch: pa.Table) -> pa.Table:
    """Heuristic language ID: argmax of per-language function-word hit
    rates; 'und' (undetermined) when nothing matches."""
    texts = batch["text"].to_pylist()
    markers = {k: set(v) for k, v in LANG_MARKERS.items()}
    preds = []
    scores = []
    for t in texts:
        toks = _tokens(t)
        best, best_score = "und", 0.0
        if toks:
            tokset = toks
            for lang, mk in markers.items():
                s = sum(1 for x in tokset if x in mk) / len(toks)
                if s > best_score:
                    best, best_score = lang, s
        preds.append(best)
        scores.append(f"{best_score:.6f}")
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "lang_pred": pa.array(preds),
            "lang_score": pa.array(scores),
        }
    )


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Document fingerprint: winnowing over a rolling (Rabin-Karp-style)
    hash of token 4-grams -- the standard document-fingerprinting scheme
    (Schleimer et al., 'Winnowing: Local Algorithms for Document
    Fingerprinting').  Deterministic via blake2b token hashes."""
    K = 4  # shingle size (tokens)
    W = 5  # winnowing window
    texts = batch["text"].to_pylist()
    fps = []
    for t in texts:
        toks = _tokens(t)
        if len(toks) < K:
            fps.append("")
            continue
        hashes = np.array(
            [
                int.from_bytes(
                    hashlib.blake2b(
                        " ".join(toks[i : i + K]).encode(), digest_size=8
                    ).digest(),
                    "little",
                )
                for i in range(len(toks) - K + 1)
            ],
            dtype=np.uint64,
        )
        if len(hashes) <= W:
            sel = {int(hashes.min())}
        else:
            view = np.lib.stride_tricks.sliding_window_view(hashes, W)
            sel = set(view.min(axis=1).tolist())
        digest = hashlib.blake2b(
            np.sort(np.fromiter(sel, dtype=np.uint64)).tobytes(),
            digest_size=16,
        ).hexdigest()
        fps.append(digest)
    return pa.table(
        {"doc_id": batch["doc_id"], "fingerprint": pa.array(fps)}
    )


def token_count_ds(sf_dir: str):
    import ray.data

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return ds.map_batches(token_count_batch, batch_format="pyarrow")


def quality_ds(sf_dir: str):
    import ray.data

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return ds.map_batches(quality_batch, batch_format="pyarrow")


def langid_ds(sf_dir: str):
    import ray.data

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return ds.map_batches(langid_batch, batch_format="pyarrow")


def fingerprint_ds(sf_dir: str):
    import ray.data

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return ds.map_batches(fingerprint_batch, batch_format="pyarrow")


def windowed_events_ds(sf_dir: str, window: str = "day"):
    """Tumbling-window aggregate over the events stream table: count +
    min/max value per (event_type, window).  The window key is computed
    vectorized per batch; the groupby is the only shuffle."""
    import pyarrow.compute as pc
    import ray.data
    from ray.data.aggregate import Count, Max, Min

    def add_window(batch: pa.Table) -> pa.Table:
        w = pc.floor_temporal(batch["ts"], unit=window)
        return batch.append_column("window", pc.cast(w, pa.timestamp("us")))

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    )
    return (
        ds.map_batches(add_window, batch_format="pyarrow")
        .groupby(["event_type", "window"])
        .aggregate(
            Count(alias_name="n_events"),
            Min("value", alias_name="min_value"),
            Max("value", alias_name="max_value"),
        )
    )
