"""The reference's own black-box integration suites
(test/integration_test.go over test/tests/<dataset>/ : mapping.json +
data/*.json docs + searches.json expected results), run end-to-end
through the bleve-JSON-mapping loader and this engine's full query
path.  Doc IDs are the data file names sans extension, like the Go
runner (integration_test.go:232-235).

Covered datasets: basic, phrase, sort, fosdem, facet, employee, geo,
geoshapes, and the sharded `alias` dataset through IndexAlias."""

import glob
import json
import os

import pytest

from bleve_ray.index import IndexOptions, build_index
from bleve_ray.index.json_mapping import options_from_bleve_mapping
from bleve_ray.search import Index
from bleve_ray.search.distributed import IndexAlias

SUITES_DIR = "/root/reference/test/tests"
DATASETS = ["basic", "phrase", "sort", "fosdem", "facet", "employee",
            "geo", "geoshapes"]


def _load_docs(data_dir):
    docs = []
    for f in sorted(glob.glob(os.path.join(data_dir, "*.json"))):
        doc_id = os.path.splitext(os.path.basename(f))[0]
        docs.append((doc_id, json.load(open(f))))
    return docs


def _build_suite(dataset, tmp):
    sdir = os.path.join(SUITES_DIR, dataset)
    mapping = json.load(open(os.path.join(sdir, "mapping.json")))
    docs = _load_docs(os.path.join(sdir, "data"))
    tbl, opts = options_from_bleve_mapping(
        mapping, docs, num_shards=1, bucket_bits=6)
    import pyarrow.parquet as pq

    src = str(tmp / "docs.parquet")
    pq.write_table(tbl, src)
    out = str(tmp / "idx")
    build_index([src], out, opts)
    return Index.open(out)


_INDEX_CACHE = {}


@pytest.fixture()
def suite_index(request, ray_session, tmp_path_factory):
    dataset = request.param
    if dataset not in _INDEX_CACHE:
        tmp = tmp_path_factory.mktemp(f"suite_{dataset}")
        if dataset == "alias":
            sdir = os.path.join(SUITES_DIR, dataset)
            mapping = json.load(open(os.path.join(sdir, "mapping.json")))
            members = []
            for shard in sorted(os.listdir(os.path.join(sdir, "datasets"))):
                docs = _load_docs(os.path.join(sdir, "datasets", shard))
                tbl, opts = options_from_bleve_mapping(
                    mapping, docs, num_shards=1, bucket_bits=6)
                import pyarrow.parquet as pq

                src = str(tmp / f"{shard}.parquet")
                pq.write_table(tbl, src)
                out = str(tmp / f"idx_{shard}")
                build_index([src], out, opts)
                members.append(Index.open(out))
            _INDEX_CACHE[dataset] = IndexAlias(members)
        else:
            _INDEX_CACHE[dataset] = _build_suite(dataset, tmp)
    return _INDEX_CACHE[dataset]


def _cases():
    out = []
    for ds in DATASETS + ["alias"]:
        searches = json.load(
            open(os.path.join(SUITES_DIR, ds, "searches.json")))
        for i, case in enumerate(searches):
            label = case.get("comment") or f"search-{i}"
            out.append(pytest.param(
                ds, case, id=f"{ds}:{i}:{label[:45]}"))
    return out


@pytest.mark.parametrize("suite_index,case", _cases(), indirect=["suite_index"])
def test_reference_suite_search(suite_index, case):
    req = dict(case["search"])
    want = case["result"]
    res = suite_index.search(req)
    assert res.total_hits == want["total_hits"], (
        f"total_hits: got {res.total_hits}, want {want['total_hits']}")
    got_ids = [h.id for h in res.hits]
    want_hits = want.get("hits") or []
    assert got_ids == [h["id"] for h in want_hits]
    for got_hit, want_hit in zip(res.hits, want_hits):
        if "fields" in want_hit:
            for k, v in want_hit["fields"].items():
                assert got_hit.fields.get(k) == v, (k, got_hit.fields)
        if "fragments" in want_hit:
            for fld, frags in want_hit["fragments"].items():
                assert got_hit.fragments and fld in got_hit.fragments
        if "locations" in want_hit:
            for fld, terms in want_hit["locations"].items():
                assert got_hit.locations and fld in got_hit.locations
                for term, want_locs in terms.items():
                    got_locs = got_hit.locations[fld][term]
                    norm = lambda L: sorted(
                        (l.get("pos"), l.get("start"), l.get("end"),
                         tuple(l.get("array_positions") or ()))
                        for l in L
                    )
                    assert norm(got_locs) == norm(want_locs), (
                        term, got_locs, want_locs)
