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
# heuristic (public knowledge lists).  Latin-script languages only: the
# [A-Za-z0-9] tokenizer drops other scripts before scoring.
LANG_MARKERS: Dict[str, List[str]] = {
    "en": "the and of to in is that it for was with as his on be at by had".split(),
    "de": "der die und das ist nicht ein eine mit auf für von zu den im".split(),
    "fr": "le la les et des une est dans pour que qui sur avec pas au du".split(),
    "es": "el la los las y de que en un una es por con para del se no".split(),
    "it": "il la le di che e un una per con del non sono alla più nel".split(),
    "pt": "o os um uma do da dos das em não com por para mais como mas".split(),
    "nl": "de het een van en dat is niet op te zijn voor met aan er".split(),
    "sv": "och att det som en på är av för med den till inte om har".split(),
    "da": "og at det som en på er af for med den til ikke om har".split(),
    "no": "og at det som en på er av for med den til ikke om har en".split(),
    "pl": "się nie na jest do tego jak po przez przy tym jego ale czy".split(),
    "tr": "bir bu ve için ile gibi daha çok ama olarak en ki mi da de".split(),
    "id": "yang dan di ini itu dengan untuk tidak dari dalam akan pada".split(),
}


def _tokens(text: str) -> List[str]:
    return [t.lower() for t in TOKEN_RE.findall(text or "")]


def flat_tokens_arrow(col):
    """Vectorized batch tokenization: (lowered flat token array, per-doc
    offsets into it).  Semantics identical to per-doc
    `[t.lower() for t in TOKEN_RE.findall(text)]` (tokens are ASCII
    alphanumeric runs, so ascii_lower == str.lower).  Returns
    (flat: pa.Array of strings, offsets: np.ndarray int64 of len n+1)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.fill_null(col, "")
    splits = pc.split_pattern_regex(col, pattern="[^A-Za-z0-9]+")
    if isinstance(splits, pa.ChunkedArray):
        splits = splits.combine_chunks()
    flat = pc.list_flatten(splits)
    loffs = np.asarray(splits.offsets).astype(np.int64)
    ne = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    cs = np.concatenate(([0], np.cumsum(ne)))
    doc_offs = cs[loffs]  # offsets into the empty-filtered flat array
    flat_ne = flat.filter(pa.array(ne))
    return pc.ascii_lower(flat_ne), doc_offs


def _segment_sums(values: np.ndarray, offs: np.ndarray) -> np.ndarray:
    """Per-document sums of a flat per-token array (cumsum-diff; robust to
    empty segments, unlike np.add.reduceat)."""
    cs = np.concatenate((np.zeros(1, dtype=np.float64), np.cumsum(values)))
    return cs[offs[1:]] - cs[offs[:-1]]


def _fmt6(arr: np.ndarray) -> pa.Array:
    return pa.array(np.char.mod("%.6f", arr.astype(np.float64)))


def token_count_batch(batch: pa.Table) -> pa.Table:
    counts = pc.count_substring_regex(
        pc.fill_null(batch["text"], ""), pattern="[A-Za-z0-9]+"
    )
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "token_count": pc.cast(counts, pa.int64()),
        }
    )


# BPE-style pre-tokenizer pattern (GPT-2 pre-tokenization shape, public
# knowledge; lookahead-free so Python re, Arrow RE2 and DuckDB RE2 agree
# on leftmost-first matching): contractions, space-prefixed letter runs,
# digit runs, punctuation runs, whitespace runs.
BPE_TOKEN_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"
)


def bpe_token_count_batch(batch: pa.Table) -> pa.Table:
    """BPE-ish token counting (the LLM-pipeline estimator: how many
    subword-ish units a tokenizer would see).  One vectorized RE2 count
    per batch; the DuckDB oracle runs the identical pattern."""
    counts = pc.count_substring_regex(
        pc.fill_null(batch["text"], ""), pattern=BPE_TOKEN_PATTERN
    )
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "bpe_tokens": pc.cast(counts, pa.int64()),
        }
    )


def bpe_token_count_ds(sf_dir: str):
    import ray.data

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return ds.map_batches(bpe_token_count_batch, batch_format="pyarrow")


def quality_batch(batch: pa.Table) -> pa.Table:
    """Per-doc quality stats: token count, alpha char ratio, stop-word
    ratio, mean token length.  All ratios rounded via %.6f formatting for
    oracle comparability.  Fully vectorized (Arrow split/flatten +
    cumsum-diff segment sums)."""
    text = pc.fill_null(batch["text"], "")
    flat, offs = flat_tokens_arrow(text)
    tok_counts = (offs[1:] - offs[:-1]).astype(np.int64)
    safe = np.maximum(tok_counts, 1).astype(np.float64)
    is_stop = pc.is_in(
        flat, value_set=pa.array(QUALITY_STOPWORDS)
    ).to_numpy(zero_copy_only=False)
    stop_ratio = _segment_sums(is_stop, offs) / safe
    tok_lens = pc.utf8_length(flat).to_numpy()
    mean_len = _segment_sums(tok_lens, offs) / safe
    n_alpha = pc.count_substring_regex(text, pattern="[A-Za-z]").to_numpy(
        zero_copy_only=False
    )
    text_len = pc.utf8_length(text).to_numpy(zero_copy_only=False)
    alpha_ratio = n_alpha / np.maximum(text_len, 1)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "token_count": pa.array(tok_counts),
            "stop_ratio": _fmt6(stop_ratio),
            "mean_token_len": _fmt6(mean_len),
            "alpha_ratio": _fmt6(alpha_ratio),
        }
    )


# stable iteration order for the argmax tie rule (first lang wins ties)
_LANG_ORDER = list(LANG_MARKERS.keys())


def langid_batch(batch: pa.Table) -> pa.Table:
    """Heuristic language ID: argmax of per-language function-word hit
    rates; 'und' (undetermined) when nothing matches.  One vectorized
    is_in + segment-sum per language; ties keep the earlier language."""
    flat, offs = flat_tokens_arrow(batch["text"])
    tok_counts = (offs[1:] - offs[:-1]).astype(np.float64)
    safe = np.maximum(tok_counts, 1.0)
    scores = np.zeros((len(tok_counts), len(_LANG_ORDER)))
    for j, lang in enumerate(_LANG_ORDER):
        hits = pc.is_in(
            flat, value_set=pa.array(LANG_MARKERS[lang])
        ).to_numpy(zero_copy_only=False)
        scores[:, j] = _segment_sums(hits, offs) / safe
    best_j = np.argmax(scores, axis=1)  # first max wins, like the loop
    best = scores[np.arange(len(best_j)), best_j]
    preds = np.where(
        best > 0, np.array(_LANG_ORDER, dtype=object)[best_j], "und"
    )
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "lang_pred": pa.array(preds.tolist()),
            "lang_score": _fmt6(np.where(best > 0, best, 0.0)),
        }
    )


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Document fingerprint: winnowing over token 4-gram hashes -- the
    standard document-fingerprinting scheme (Schleimer et al.,
    'Winnowing: Local Algorithms for Document Fingerprinting').

    Every step is SQL-replicable so the driver's DuckDB oracle can check
    it exactly: shingle hash = md5-prefix of the space-joined 4 lowercase
    tokens (one md5 per unique shingle, vectorized string construction);
    winnowed set = distinct minima of each 5-wide sliding window; the
    fingerprint is md5 over the comma-joined sorted decimal hash values
    (DuckDB: ``md5(string_agg(v, ',' ORDER BY v))``)."""
    from bleve_ray.pipelines.dedup import portable_shingle_hashes

    K = 4  # shingle size (tokens)
    W = 5  # winnowing window
    flat, offs = flat_tokens_arrow(batch["text"])
    # combine=False: docs with < K tokens fingerprint as "" (no shingle)
    sh_flat, sh_offs = portable_shingle_hashes(
        flat, offs, k=K, combine_short=False, hex_chars=16
    )
    fps = []
    for d in range(len(sh_offs) - 1):
        hashes = sh_flat[sh_offs[d] : sh_offs[d + 1]]
        if len(hashes) == 0:
            fps.append("")
            continue
        if len(hashes) <= W:
            sel = np.array([hashes.min()], dtype=np.uint64)
        else:
            view = np.lib.stride_tricks.sliding_window_view(hashes, W)
            sel = np.unique(view.min(axis=1))
        joined = ",".join(str(int(v)) for v in np.sort(sel))
        fps.append(hashlib.md5(joined.encode()).hexdigest())
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
    return ds.map_batches(
        fingerprint_batch, batch_format="pyarrow", batch_size=2048
    )


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


def sessionize_events_ds(sf_dir: str, gap_minutes: int = 30):
    """Session windows over the event stream: per user, events sorted by
    (ts, event_id) split into sessions wherever the gap exceeds
    ``gap_minutes``.  One groupby(user_id) shuffle; inside each group the
    split is fully vectorized (diff > gap -> cumsum session ids ->
    cumsum-diff per-session aggregates).  Session keys/aggregates match
    the DuckDB lag()/window oracle exactly."""
    import ray.data

    gap_us = np.int64(gap_minutes * 60 * 1_000_000)

    def sessions(group: pa.Table) -> pa.Table:
        ts = group["ts"].to_numpy()  # datetime64[us]
        eid = np.asarray(group["event_id"], dtype=np.int64)
        order = np.lexsort((eid, ts))
        ts, eid = ts[order], eid[order]
        val = np.asarray(group["value"], dtype=np.float64)[order]
        gaps = np.diff(ts).astype("timedelta64[us]").astype(np.int64)
        new_s = np.concatenate(([0], (gaps > gap_us).astype(np.int64)))
        sid = np.cumsum(new_s)
        starts = np.concatenate(([0], np.flatnonzero(np.diff(sid)) + 1))
        ends = np.concatenate((starts[1:], [len(sid)]))
        cs = np.concatenate(([0.0], np.cumsum(val)))
        uid = group["user_id"][0].as_py()
        return pa.table(
            {
                "user_id": pa.array(
                    [uid] * len(starts), type=pa.int64()
                ),
                "sid": pa.array(sid[starts], type=pa.int64()),
                "session_start": pa.array(ts[starts]),
                "session_end": pa.array(ts[ends - 1]),
                "n_events": pa.array(
                    (ends - starts).astype(np.int64)
                ),
                "sum_value": pa.array(
                    np.char.mod("%.4f", cs[ends] - cs[starts])
                ),
            }
        )

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "value"],
    )
    return ds.groupby("user_id").map_groups(
        sessions, batch_format="pyarrow"
    )


def hopping_windows_events_ds(
    sf_dir: str, size_minutes: int = 60, hop_minutes: int = 15
):
    """Hopping (sliding) windows over the event stream: each event lands
    in size/hop overlapping windows.  The window expansion is a fully
    vectorized repeat inside map_batches (no per-row loop, no driver
    work); the single groupby(window_start, event_type) is the only
    shuffle.  All window arithmetic is integer microseconds so the
    DuckDB generate_series oracle matches exactly."""
    import ray.data
    from ray.data.aggregate import Count, Sum

    size_us = np.int64(size_minutes * 60 * 1_000_000)
    hop_us = np.int64(hop_minutes * 60 * 1_000_000)

    def expand(batch: pa.Table) -> pa.Table:
        t = batch["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        kmin = (t - size_us) // hop_us + 1
        kmax = t // hop_us
        counts = (kmax - kmin + 1).astype(np.int64)
        reps = np.repeat(np.arange(len(t)), counts)
        base = np.repeat(np.concatenate(([0], np.cumsum(counts[:-1]))), counts)
        ks = np.arange(int(counts.sum())) - base + np.repeat(kmin, counts)
        starts = (ks * hop_us).astype("datetime64[us]")
        ev = np.asarray(batch["event_type"], dtype=object)
        val = np.asarray(batch["value"], dtype=np.float64)
        return pa.table(
            {
                "window_start": pa.array(starts),
                "event_type": pa.array(ev[reps].tolist()),
                "value": pa.array(val[reps]),
            }
        )

    def fmt(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "window_start": batch["window_start"],
                "event_type": batch["event_type"],
                "n_events": batch["n_events"],
                "sum_value": pa.array(
                    np.char.mod(
                        "%.4f", np.asarray(batch["sum_value"], dtype=np.float64)
                    )
                ),
            }
        )

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    )
    return (
        ds.map_batches(expand, batch_format="pyarrow")
        .groupby(["window_start", "event_type"])
        .aggregate(
            Count(alias_name="n_events"),
            Sum("value", alias_name="sum_value"),
        )
        .map_batches(fmt, batch_format="pyarrow")
    )


def quality_filter_ds(
    sf_dir: str,
    min_tokens: int = 50,
    max_stop_ratio: float = 0.5,
    min_alpha_ratio: float = 0.5,
):
    """The classic quality-filter stage of a training-data pipeline:
    keep documents passing token-count / stop-word / alpha-ratio
    thresholds.  Pure streaming map_batches (compute stats -> boolean
    mask -> filter); no shuffle, no materialization."""
    import ray.data

    def keep(batch: pa.Table) -> pa.Table:
        q = quality_batch(batch)
        tok = np.asarray(q["token_count"], dtype=np.int64)
        stop = np.asarray(q["stop_ratio"], dtype=object).astype(np.float64)
        alpha = np.asarray(q["alpha_ratio"], dtype=object).astype(np.float64)
        mask = (
            (tok >= min_tokens)
            & (stop <= max_stop_ratio)
            & (alpha >= min_alpha_ratio)
        )
        return batch.filter(pa.array(mask))

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return ds.map_batches(keep, batch_format="pyarrow")
