"""Index-time synonym thesaurus segments.

Synonym definitions are INDEXED DOCUMENTS, not mapping configuration
(reference index_impl.go:336 IndexSynonym / mapping/index.go:388
MapSynonymDocument): each definition is analyzed once at index time
(document/field_synonym.go:79-99 Analyze), written into a thesaurus
SEGMENT, and merged across segments at read time exactly like posting
segments (index/scorch/snapshot_index_thes.go heap-merge; here segments
are sorted parquet so the merge is a concat + shadow filter).

Per-doc granularity: re-indexing a synonym doc id SHADOWS its rows in
older segments; deletes tombstone the id in the manifest.  Compaction
(the ForceMerge analogue) rewrites a source to a single segment with
shadowed/deleted rows dropped.

Layout: ``<index>/thesaurus/<source>/ts_<seq>.parquet`` with columns
(term, synonym, syn_doc_id), rows sorted by term.  Thesauri are the
small side of every query: a reader materializes one source into a
dict once per process and the query path does O(1) lookups -- the
broadcast-small-side pattern, never a shuffle.
"""

from __future__ import annotations

import os
import re
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import pyarrow as pa
import pyarrow.parquet as pq

from . import manifest as manifest_mod


def analyze_synonym_term(term: str, analyzer) -> Optional[str]:
    """field_synonym.go:143-149 analyzeSynonymTerm: a thesaurus entry is
    valid only when analysis yields EXACTLY one token."""
    if analyzer is None:
        return term or None
    toks = analyzer.terms(term)
    return toks[0] if len(toks) == 1 else None


def definition_pairs(
    definition: dict, analyzer=None
) -> List[Tuple[str, str]]:
    """field_synonym.go:119-141 processSynonymData as flat (term, synonym)
    pairs:

    - with "input": each input term maps to EVERY synonym (verbatim --
      the reference does not self-filter the unidirectional form)
    - without: bidirectional, each synonym maps to all the OTHERS
    """
    syns = [analyze_synonym_term(s, analyzer) for s in definition.get("synonyms", [])]
    syns = [s for s in syns if s]
    inputs = [analyze_synonym_term(s, analyzer) for s in definition.get("input", [])]
    inputs = [s for s in inputs if s]
    pairs: List[Tuple[str, str]] = []
    if inputs:
        for i in inputs:
            pairs.extend((i, s) for s in syns)
    else:
        for i, a in enumerate(syns):
            pairs.extend((a, b) for j, b in enumerate(syns) if i != j)
    return pairs


THESAURUS_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("synonym", pa.string()),
        ("syn_doc_id", pa.string()),
    ]
)


def _segment_table(
    docs: Sequence[Tuple[str, dict]], analyzer
) -> pa.Table:
    terms: List[str] = []
    synonyms: List[str] = []
    ids: List[str] = []
    for doc_id, definition in docs:
        for t, s in definition_pairs(definition, analyzer):
            terms.append(t)
            synonyms.append(s)
            ids.append(doc_id)
    tbl = pa.table(
        {
            "term": pa.array(terms, type=pa.string()),
            "synonym": pa.array(synonyms, type=pa.string()),
            "syn_doc_id": pa.array(ids, type=pa.string()),
        }
    )
    return tbl.sort_by([("term", "ascending"), ("synonym", "ascending")])


def _source_dir(index_dir: str, source: str) -> str:
    safe = re.sub(r"[^A-Za-z0-9_.-]", "_", source)
    return os.path.join(index_dir, "thesaurus", safe)


def add_synonym_documents(
    index_dir: str,
    source: str,
    docs: Sequence[Tuple[str, dict]],
    analyzer_name: str = "",
    man: Optional[manifest_mod.Manifest] = None,
) -> manifest_mod.Manifest:
    """Index synonym definition documents into a new thesaurus segment
    (IndexSynonym, index_impl.go:336-363).  Re-used doc ids shadow their
    older rows; the segment is committed as a manifest epoch."""
    analyzer = None
    if analyzer_name:
        from ..analysis.analyzers import analyzer_named

        analyzer = analyzer_named(analyzer_name)
    man = man or manifest_mod.load(index_dir)
    if man is None:
        raise FileNotFoundError(f"no index at {index_dir}")
    entries = man.thesaurus.setdefault(source, [])
    seq = 1 + max((e["seq"] for e in entries), default=0)
    tbl = _segment_table(docs, analyzer)
    d = _source_dir(index_dir, source)
    os.makedirs(d, exist_ok=True)
    name = f"ts_{seq:06d}.parquet"
    path = os.path.join(d, name)
    tmp = path + f".tmp{os.getpid()}"
    pq.write_table(tbl, tmp, compression="zstd")
    os.replace(tmp, path)
    doc_ids = sorted({doc_id for doc_id, _ in docs})
    entries.append(
        {
            "seq": seq,
            "path": os.path.relpath(path, index_dir),
            "rows": len(tbl),
            "min_term": tbl["term"][0].as_py() if len(tbl) else "",
            "max_term": tbl["term"][-1].as_py() if len(tbl) else "",
            "doc_ids": doc_ids,
            "analyzer": analyzer_name,
        }
    )
    # adding a doc revives a previously-deleted id
    dels = man.thesaurus_deleted.get(source)
    if dels:
        man.thesaurus_deleted[source] = [
            x for x in dels if x not in set(doc_ids)
        ]
    return manifest_mod.commit(index_dir, man)


def delete_synonym_document(
    index_dir: str,
    source: str,
    doc_id: str,
    man: Optional[manifest_mod.Manifest] = None,
) -> manifest_mod.Manifest:
    """Tombstone one synonym doc id (the delete path of IndexSynonym)."""
    man = man or manifest_mod.load(index_dir)
    dels = man.thesaurus_deleted.setdefault(source, [])
    if doc_id not in dels:
        dels.append(doc_id)
    return manifest_mod.commit(index_dir, man)


def compact_thesaurus(
    index_dir: str,
    source: str,
    man: Optional[manifest_mod.Manifest] = None,
) -> manifest_mod.Manifest:
    """Rewrite a source to one segment, dropping shadowed/deleted rows
    (the thesaurus ForceMerge)."""
    man = man or manifest_mod.load(index_dir)
    entries = man.thesaurus.get(source, [])
    if not entries:
        return man
    eff = _effective_table(index_dir, man, source)
    analyzer_name = entries[-1].get("analyzer", "")
    d = _source_dir(index_dir, source)
    seq = 1 + max(e["seq"] for e in entries)
    path = os.path.join(d, f"ts_{seq:06d}.parquet")
    tmp = path + f".tmp{os.getpid()}"
    pq.write_table(eff, tmp, compression="zstd")
    os.replace(tmp, path)
    old_paths = [os.path.join(index_dir, e["path"]) for e in entries]
    man.thesaurus[source] = [
        {
            "seq": seq,
            "path": os.path.relpath(path, index_dir),
            "rows": len(eff),
            "min_term": eff["term"][0].as_py() if len(eff) else "",
            "max_term": eff["term"][-1].as_py() if len(eff) else "",
            "doc_ids": sorted(set(eff["syn_doc_id"].to_pylist())),
            "analyzer": analyzer_name,
        }
    ]
    man.thesaurus_deleted.pop(source, None)
    man = manifest_mod.commit(index_dir, man)
    for p in old_paths:
        try:
            os.remove(p)
        except OSError:
            pass
    return man


def _effective_table(
    index_dir: str, man: manifest_mod.Manifest, source: str
) -> pa.Table:
    """Merged view of a source: later segments shadow earlier ones per
    syn_doc_id; manifest tombstones drop ids entirely (the parquet
    analogue of the snapshot_index_thes.go segment heap-merge)."""
    entries = sorted(
        man.thesaurus.get(source, []), key=lambda e: e["seq"]
    )
    deleted = set(man.thesaurus_deleted.get(source, []))
    owner: Dict[str, int] = {}
    for e in entries:
        for doc_id in e["doc_ids"]:
            owner[doc_id] = e["seq"]
    parts = []
    for e in entries:
        live = [
            d
            for d in e["doc_ids"]
            if d not in deleted and owner[d] == e["seq"]
        ]
        if not live:
            continue
        t = pq.read_table(os.path.join(index_dir, e["path"]))
        if len(live) != len(e["doc_ids"]):
            import pyarrow.compute as pc

            t = t.filter(
                pc.is_in(t["syn_doc_id"], value_set=pa.array(live))
            )
        parts.append(t)
    if not parts:
        return THESAURUS_SCHEMA.empty_table()
    return pa.concat_tables(parts).sort_by(
        [("term", "ascending"), ("synonym", "ascending")]
    )


class ThesaurusReader:
    """Query-side reader over one source's segments: ThesaurusTermReader /
    ThesaurusKeys{Prefix,Fuzzy,Regexp} (snapshot_index_thes.go, used by
    ExtractSynonyms in search/query/query.go:539-800).

    The effective (term -> synonyms) map is materialized once per process
    and cached -- a thesaurus is the broadcast-small side of a query.
    """

    def __init__(self, index_dir: str, man: manifest_mod.Manifest, source: str):
        self.index_dir = index_dir
        self.man = man
        self.source = source
        self._map: Optional[Dict[str, List[str]]] = None
        self._keys: Optional[List[str]] = None

    def _load(self) -> Dict[str, List[str]]:
        if self._map is None:
            tbl = _effective_table(self.index_dir, self.man, self.source)
            m: Dict[str, List[str]] = {}
            terms = tbl["term"].to_pylist()
            syns = tbl["synonym"].to_pylist()
            for t, s in zip(terms, syns):
                lst = m.setdefault(t, [])
                if not lst or lst[-1] != s:
                    lst.append(s)
            # rows arrive (term, synonym)-sorted; dedupe is the adjacent
            # check above
            self._map = m
            self._keys = sorted(m)
        return self._map

    # -- ThesaurusTermReader ------------------------------------------
    def synonyms_of(self, term: str) -> List[str]:
        return self._load().get(term, [])

    def __len__(self) -> int:
        return len(self._load())

    # -- ThesaurusKeys iterators --------------------------------------
    def keys(self) -> List[str]:
        self._load()
        return list(self._keys or [])

    def keys_prefix(self, prefix: str) -> List[str]:
        import bisect

        self._load()
        ks = self._keys or []
        lo = bisect.bisect_left(ks, prefix)
        out = []
        for i in range(lo, len(ks)):
            if not ks[i].startswith(prefix):
                break
            out.append(ks[i])
        return out

    def keys_fuzzy(
        self, term: str, fuzziness: int, prefix_len: int = 0
    ) -> List[str]:
        from ..search.levenshtein import within_distance

        pre = term[:prefix_len]
        cands = self.keys_prefix(pre) if pre else self.keys()
        return [
            k for k in cands if within_distance(term, k, fuzziness)
        ]

    def keys_regexp(self, pattern: str) -> List[str]:
        rx = re.compile(pattern)
        return [k for k in self.keys() if rx.fullmatch(k)]
