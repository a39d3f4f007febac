"""Index manifest: the root-snapshot equivalent.

Plays the role of scorch's bolt root snapshot store
(index/scorch/persister.go:630-790 prepareBoltSnapshot / :877-954
loadFromBolt): a transactional, epoch-versioned record of which segment
files, docmeta files and build partitions make up the index, plus global
stats and per-partition lineage.  Written atomically (tmp+rename); the last
N epochs are kept as rollback points (rollback.go:35-120 equivalent).

Resumability: a build partition whose entry is present and committed is
skipped on re-run; merge outputs are keyed by their input segment ids so a
re-run of an interrupted merge phase is idempotent.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
from dataclasses import asdict, dataclass, field
from typing import Any, Dict, List, Optional

MANIFEST_NAME = "manifest.json"
KEEP_EPOCHS = 5


@dataclass
class SegmentEntry:
    seg_id: str
    path: str  # relative to index dir
    shard: int
    min_docnum: int
    max_docnum: int
    term_count: int
    posting_count: int
    size_bytes: int
    tier: int = 0


@dataclass
class DocmetaEntry:
    path: str
    min_docnum: int
    max_docnum: int
    rows: int


@dataclass
class PartitionEntry:
    """Per-build-partition lineage + metrics (north rule requirement)."""

    partition_id: int
    input_files: List[str]
    file_indexes: List[int]
    row_count: int
    content_sha256_agg: str  # sha256 over per-row content sha256 hex concat
    metrics: Dict[str, Any] = field(default_factory=dict)


@dataclass
class Manifest:
    epoch: int = 0
    options: Dict[str, Any] = field(default_factory=dict)
    partitions: List[PartitionEntry] = field(default_factory=list)
    segments: List[SegmentEntry] = field(default_factory=list)
    docmeta: List[DocmetaEntry] = field(default_factory=list)
    stats: Dict[str, Any] = field(default_factory=dict)
    merge_done: bool = False
    # online-mutation slice (scorch obsoleted-bitmap role,
    # index/scorch/README.md:111-137): tombstoned docnums live in a
    # parquet sidecar; readers consult it, rollback restores the prior set
    deleted_path: Optional[str] = None
    deleted_count: int = 0
    # SetInternal/GetInternal KV (reference index.go SetInternal: app
    # metadata stored transactionally with the index)
    internal: Dict[str, str] = field(default_factory=dict)
    # index-time synonym thesaurus segments per source (IndexSynonym,
    # index_impl.go:336; segment semantics in index/thesaurus.py) and
    # tombstoned synonym doc ids per source
    thesaurus: Dict[str, List[dict]] = field(default_factory=dict)
    thesaurus_deleted: Dict[str, List[str]] = field(default_factory=dict)

    def to_json(self) -> str:
        d = {
            "epoch": self.epoch,
            "options": self.options,
            "partitions": [asdict(p) for p in self.partitions],
            "segments": [asdict(s) for s in self.segments],
            "docmeta": [asdict(d_) for d_ in self.docmeta],
            "stats": self.stats,
            "merge_done": self.merge_done,
            "deleted_path": self.deleted_path,
            "deleted_count": self.deleted_count,
            "internal": self.internal,
            "thesaurus": self.thesaurus,
            "thesaurus_deleted": self.thesaurus_deleted,
        }
        return json.dumps(d, indent=1, sort_keys=True)

    @staticmethod
    def from_json(s: str) -> "Manifest":
        d = json.loads(s)
        return Manifest(
            epoch=d["epoch"],
            options=d["options"],
            partitions=[PartitionEntry(**p) for p in d["partitions"]],
            segments=[SegmentEntry(**s_) for s_ in d["segments"]],
            docmeta=[DocmetaEntry(**d_) for d_ in d["docmeta"]],
            stats=d["stats"],
            merge_done=d.get("merge_done", False),
            deleted_path=d.get("deleted_path"),
            deleted_count=d.get("deleted_count", 0),
            internal=d.get("internal", {}),
            thesaurus=d.get("thesaurus", {}),
            thesaurus_deleted=d.get("thesaurus_deleted", {}),
        )

    def completed_partition_ids(self) -> set:
        return {p.partition_id for p in self.partitions}


def commit(index_dir: str, manifest: Manifest) -> Manifest:
    """Bump epoch and write atomically; prune old epochs beyond KEEP_EPOCHS."""
    manifest.epoch += 1
    payload = manifest.to_json()
    epoch_path = os.path.join(index_dir, f"manifest_epoch_{manifest.epoch:06d}.json")
    tmp = epoch_path + ".tmp"
    with open(tmp, "w") as f:
        f.write(payload)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, epoch_path)
    cur = os.path.join(index_dir, MANIFEST_NAME)
    tmp2 = cur + ".tmp"
    with open(tmp2, "w") as f:
        f.write(payload)
    os.replace(tmp2, cur)
    # prune rollback points
    epochs = sorted(glob.glob(os.path.join(index_dir, "manifest_epoch_*.json")))
    for old in epochs[:-KEEP_EPOCHS]:
        os.remove(old)
    return manifest


def load(index_dir: str) -> Optional[Manifest]:
    p = os.path.join(index_dir, MANIFEST_NAME)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return Manifest.from_json(f.read())


def rollback_points(index_dir: str) -> List[int]:
    return sorted(
        int(os.path.basename(p)[len("manifest_epoch_") : -len(".json")])
        for p in glob.glob(os.path.join(index_dir, "manifest_epoch_*.json"))
    )


def rollback(index_dir: str, epoch: int) -> Manifest:
    """Restore manifest.json to a previous epoch (scorch Rollback equivalent)."""
    p = os.path.join(index_dir, f"manifest_epoch_{epoch:06d}.json")
    with open(p) as f:
        payload = f.read()
    cur = os.path.join(index_dir, MANIFEST_NAME)
    tmp = cur + ".tmp"
    with open(tmp, "w") as f:
        f.write(payload)
    os.replace(tmp, cur)
    return Manifest.from_json(payload)


def sha_agg(row_hashes: List[str]) -> str:
    h = hashlib.sha256()
    h.update("".join(row_hashes).encode())
    return h.hexdigest()


def copy_to(index_dir: str, dest_dir: str) -> "Manifest":
    """Index backup/copy (reference index.go:350-358 CopyTo): copy the
    current epoch's segment/docmeta/docvalue files plus the manifest."""
    import shutil

    man = load(index_dir)
    if man is None:
        raise FileNotFoundError(f"no manifest in {index_dir}")
    os.makedirs(dest_dir, exist_ok=True)
    rels = [s.path for s in man.segments] + [d.path for d in man.docmeta]
    rels += [
        e["path"] for entries in man.thesaurus.values() for e in entries
    ]
    dv = os.path.join(index_dir, "docvalues")
    if os.path.isdir(dv):
        rels += [
            os.path.join("docvalues", f)
            for f in os.listdir(dv)
            if f.endswith(".parquet")
        ]
    for rel in rels:
        dst = os.path.join(dest_dir, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        shutil.copy2(os.path.join(index_dir, rel), dst)
    with open(os.path.join(dest_dir, MANIFEST_NAME), "w") as f:
        f.write(man.to_json())
    return load(dest_dir)
