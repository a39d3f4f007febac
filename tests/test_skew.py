"""Hot-term skew: a term present in EVERY doc must still build with bounded
per-group sizes (docnum-range buckets are the salt) and produce a correct
global posting list across buckets (SURVEY.md §4 skew design)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from bleve_ray.index import FieldConfig, IndexOptions, build_index
from bleve_ray.search import Index


def test_hot_term_buckets(ray_session, tmp_path):
    n = 600
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), type=pa.int64()),
            "text": pa.array(
                [f"hotterm filler{i % 7} rare{i}" for i in range(n)]
            ),
        }
    )
    d = tmp_path / "docs"
    d.mkdir()
    # 6 files of 100 docs
    for f in range(6):
        pq.write_table(tbl.slice(f * 100, 100), str(d / f"part_{f:03d}.parquet"))
    idx_dir = str(tmp_path / "idx")
    man = build_index(
        sorted(str(p) for p in d.glob("*.parquet")),
        idx_dir,
        IndexOptions(
            fields={"text": FieldConfig(analyzer="ascii_alnum_lower")},
            doc_id_fields=["doc_id"],
            num_shards=3,
            bucket_bits=33,  # 2 files per bucket -> 3 buckets
            target_segments_per_shard=3,  # keep buckets separate
        ),
    )
    # the hot term's postings are split across bucket segments...
    hot_segs = 0
    for e in man.segments:
        from bleve_ray.index.segment import SegmentReader
        import os

        r = SegmentReader(os.path.join(idx_dir, e.path))
        p = r.lookup("text", "hotterm")
        if p is not None:
            hot_segs += 1
            assert p.df <= 200  # bounded by the bucket (2 files x 100 docs)
    assert hot_segs == 3
    # ...and the reader concatenation yields the full, correct list
    idx = Index.open(idx_dir)
    post = idx.reader.posting("text", "hotterm")
    assert post.df == n
    assert (np.diff(post.docnums) > 0).all()
    r = idx.search({"query": {"term": "rare42", "field": "text"}, "size": 5})
    assert r.total_hits == 1 and r.hits[0].id == "42"
