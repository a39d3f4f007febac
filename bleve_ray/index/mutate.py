"""Online mutations: delete-by-id tombstones.

The slice of scorch's introducer/obsoleted-bitmap machinery
(index/scorch/introducer.go:108-260, README.md:111-137) that an
index-once builder needs: `delete_ids` resolves external ids to docnums,
unions them with the current tombstone set, writes the set as a parquet
sidecar and commits a new manifest epoch.  Readers consult the set at
search time (every query kind excludes tombstoned docs; doc_count
reflects them); `rollback` to a prior epoch restores the prior set.
Physical removal happens at forcemerge, like scorch merges dropping
obsoleted docs.

Scoring note (Lucene/scorch parity): df/avgdl statistics still include
tombstoned docs until a merge rewrites the segments; only result sets
and doc_count exclude them immediately.
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from . import manifest as manifest_mod


def load_deleted(index_dir: str, man) -> np.ndarray:
    if not getattr(man, "deleted_path", None):
        return np.empty(0, dtype=np.int64)
    t = pq.read_table(
        os.path.join(index_dir, man.deleted_path), columns=["docnum"]
    )
    return np.asarray(t["docnum"], dtype=np.int64)


def delete_ids(index_dir: str, doc_ids: List[str]) -> "manifest_mod.Manifest":
    """Tombstone the given external ids (Index.Delete / Batch.Delete role,
    index.go:46-65).  Unknown ids are ignored, like the reference's
    delete of a non-indexed id.  Returns the committed manifest."""
    from ..search.reader import IndexReader

    man = manifest_mod.load(index_dir)
    if man is None:
        raise FileNotFoundError(f"no manifest in {index_dir}")
    reader = IndexReader(index_dir)
    new_dn = reader.docnums_for_ids(list(doc_ids))
    prev = load_deleted(index_dir, man)
    merged = np.union1d(prev, new_dn).astype(np.int64)
    if len(merged) == len(prev):
        return man  # nothing new to delete
    deldir = os.path.join(index_dir, "deleted")
    os.makedirs(deldir, exist_ok=True)
    rel = os.path.join("deleted", f"del_{man.epoch + 1:06d}.parquet")
    tmp = os.path.join(index_dir, rel) + f".tmp{os.getpid()}"
    pq.write_table(
        pa.table({"docnum": pa.array(merged, type=pa.int64())}),
        tmp,
        compression="zstd",
    )
    os.replace(tmp, os.path.join(index_dir, rel))
    man.deleted_path = rel
    man.deleted_count = int(len(merged))
    return manifest_mod.commit(index_dir, man)


def add_files(index_dir: str, files: List[str], merge: bool = True):
    """Incrementally index new parquet files into an existing index as a
    fresh build partition (the additive half of Index.Batch,
    index.go:46-65 / scorch introducer segment introduction): new docs
    get docnums in a brand-new file range, segments append under a new
    manifest epoch, and the tiered merge planner folds them in."""
    from .build import (
        IndexOptions,
        _build_partition,
        finalize_stats,
        run_merge_phase,
    )

    man = manifest_mod.load(index_dir)
    if man is None:
        raise FileNotFoundError(f"no manifest in {index_dir}")
    opts = IndexOptions.from_dict(man.options)
    next_pid = max((p.partition_id for p in man.partitions), default=-1) + 1
    next_fi = (
        max(
            (fi for p in man.partitions for fi in p.file_indexes),
            default=-1,
        )
        + 1
    )
    files = sorted(files)
    seg_entries, part_entry = _build_partition(
        next_pid,
        files,
        list(range(next_fi, next_fi + len(files))),
        index_dir,
        opts,
    )
    man.segments.extend(seg_entries)
    man.partitions.append(part_entry)
    man.merge_done = False
    manifest_mod.commit(index_dir, man)
    if merge:
        man = run_merge_phase(index_dir, man, opts)
    man = finalize_stats(index_dir, man, opts)
    return manifest_mod.commit(index_dir, man)


def apply_batch(
    index_dir: str,
    upserts=None,
    deletes: Optional[List[str]] = None,
):
    """Index.Batch equivalent: deletes tombstone immediately; upserts
    tombstone any existing doc with the same external id, then index as a
    new partition (scorch's obsoleted-old/introduced-new semantics,
    index/scorch/introducer.go:108-260).

    ``upserts``: a pyarrow Table shaped like the original input files."""
    import pyarrow as pa

    from .build import IndexOptions, compute_doc_ids

    from . import events

    events.fire(events.EVENT_BATCH_INTRODUCTION_START)
    _t0 = __import__("time").perf_counter()
    man = manifest_mod.load(index_dir)
    if man is None:
        raise FileNotFoundError(f"no manifest in {index_dir}")
    opts = IndexOptions.from_dict(man.options)
    to_delete = list(deletes or [])
    if upserts is not None and len(upserts):
        ids = compute_doc_ids(upserts, opts).to_pylist()
        to_delete.extend(ids)
    if to_delete:
        man = delete_ids(index_dir, to_delete)
    if upserts is not None and len(upserts):
        bdir = os.path.join(index_dir, "batches")
        os.makedirs(bdir, exist_ok=True)
        path = os.path.join(bdir, f"batch_{man.epoch + 1:06d}.parquet")
        pq.write_table(upserts, path)
        man = add_files(index_dir, [path])
    events.fire(
        events.EVENT_BATCH_INTRODUCTION,
        duration_ms=(__import__("time").perf_counter() - _t0) * 1e3,
        detail={"deletes": len(to_delete)},
    )
    return man
