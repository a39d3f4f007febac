"""Locked conformance corpus (F4, modeled on the reference's
test/tests/*/searches.json golden suites, test/integration.go:22-27):
the Ray-built index must reproduce the locked hits + scores exactly.

The goldens were generated ONCE from the independent oracle and are now
frozen -- any behavior drift in analyzer, scorer, collector or build
pipeline fails this suite.
"""

import json
import os
import pathlib

import pytest

GOLDEN = json.loads(
    (pathlib.Path(__file__).parent / "data" / "searches.json").read_text()
)


@pytest.fixture(scope="module")
def conf_index(ray_session, tmp_path_factory):
    from bleve_ray.corpus import write_corpus
    from bleve_ray.index import IndexOptions, build_index
    from bleve_ray.search import Index

    spec = GOLDEN["corpus"]
    cdir = str(tmp_path_factory.mktemp("conf_corpus"))
    files = write_corpus(
        cdir, n_docs=spec["n_docs"], n_files=spec["n_files"], seed=spec["seed"]
    )
    idx_dir = str(tmp_path_factory.mktemp("conf_idx"))
    build_index(files, idx_dir, IndexOptions(num_shards=5, bucket_bits=5))
    return Index.open(idx_dir)


@pytest.mark.parametrize(
    "case", GOLDEN["searches"], ids=lambda c: c["comment"]
)
def test_conformance(conf_index, case):
    got = conf_index.search(case["search"]).to_dict()
    want = case["result"]
    assert got["total_hits"] == want["total_hits"]
    assert [h["id"] for h in got["hits"]] == [h["id"] for h in want["hits"]]
    for g, w in zip(got["hits"], want["hits"]):
        assert g["score"] == pytest.approx(w["score"], abs=1e-9), g["id"]
