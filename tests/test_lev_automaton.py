"""Levenshtein automaton: accept-set identical to the banded DP, seek
intersection visits only matches, and fuzzy search prunes row groups."""

import itertools
import random

import pytest

from bleve_ray.search.lev_automaton import LevAutomaton, intersect_sorted_terms
from bleve_ray.search.levenshtein import within_distance

ALPHA = "abcx"
WORDS = [
    "".join(p)
    for L in range(0, 5)
    for p in itertools.product(ALPHA, repeat=L)
]


@pytest.mark.parametrize("term", ["", "a", "ab", "abc", "axbc", "banana"])
@pytest.mark.parametrize("k", [0, 1, 2])
def test_accepts_matches_dp(term, k):
    aut = LevAutomaton(term, k)
    for w in WORDS:
        assert aut.accepts(w) == within_distance(term, w, k), (term, k, w)


@pytest.mark.parametrize("term", ["ab", "abc", "banana"])
@pytest.mark.parametrize("k", [1, 2])
def test_intersect_sorted_terms_exact(term, k):
    sw = sorted(WORDS)
    want = [w for w in sw if within_distance(term, w, k)]
    got = [sw[i] for i in intersect_sorted_terms(LevAutomaton(term, k), sw)]
    assert got == want


@pytest.mark.parametrize("term,k", [("abc", 1), ("banana", 2)])
def test_next_valid_properties(term, k):
    rng = random.Random(7)
    aut = LevAutomaton(term, k)
    acc = sorted(w for w in WORDS if within_distance(term, w, k))
    for _ in range(300):
        s = "".join(
            rng.choice(ALPHA + "z") for _ in range(rng.randint(0, 5))
        )
        nv = aut.next_valid(s)
        if nv is not None:
            assert nv >= s
            assert within_distance(term, nv, k), (s, nv)
        # minimality vs the in-vocabulary accepted set
        brute = min((w for w in acc if w >= s), default=None)
        if brute is not None:
            assert nv is not None and nv <= brute


def test_prefix_restriction():
    aut = LevAutomaton("banana", 1, prefix="ba")
    assert aut.accepts("banana")
    assert aut.accepts("banan")
    assert aut.accepts("bananas")
    assert aut.accepts("bacana")
    assert not aut.accepts("canana")  # prefix violated (1 edit elsewhere ok)
    assert not aut.accepts("bxnxna")  # two edits past the prefix
    assert aut.next_valid("") == "ba" + LevAutomaton("nana", 1)._next_valid_body("")
    assert aut.next_valid("bz") is None or aut.next_valid("bz") >= "bz"
    assert aut.next_valid("c") is None


@pytest.fixture(scope="module")
def tiny_idx(ray_session, tiny_corpus_dir, tmp_path_factory):
    import os

    from bleve_ray.index import IndexOptions, build_index
    from bleve_ray.search import Index

    files = sorted(
        os.path.join(tiny_corpus_dir, f)
        for f in os.listdir(tiny_corpus_dir)
    )
    d = str(tmp_path_factory.mktemp("lev_idx"))
    build_index(files, d, IndexOptions(num_shards=2, bucket_bits=6))
    return Index.open(d)


def test_fuzzy_query_uses_automaton_and_matches_scan(tiny_idx):
    """Automaton expansion == DP-over-full-dictionary expansion on a real
    index, for several query terms and fuzziness levels."""
    r = tiny_idx.reader
    all_terms = [t for t, _ in r.dictionary("content")]
    for q in ["func", "retur", "lambda", "strng", "xyzzy"]:
        for k in (1, 2):
            aut = LevAutomaton(q, k)
            got = r.terms_matching_automaton("content", aut)
            want = sorted(
                t for t in all_terms if within_distance(q, t, k)
            )
            assert got == want, (q, k)


def test_automaton_skips_row_groups(ray_session, tmp_path_factory):
    """A selective fuzzy term must leave most row groups unread: the
    automaton's next_valid against row-group (field,term) statistics
    skips groups whose term interval holds no accepted string."""
    import os

    from bleve_ray.corpus import write_corpus
    from bleve_ray.index import IndexOptions, build_index
    from bleve_ray.search import Index

    cdir = str(tmp_path_factory.mktemp("lev_rg_corpus"))
    files = write_corpus(cdir, n_docs=400, n_files=2, seed=5)
    d = str(tmp_path_factory.mktemp("lev_rg_idx"))
    # one shard, one segment -> several row groups spanning the dictionary
    build_index(
        files, d,
        IndexOptions(num_shards=1, bucket_bits=33,
                     target_segments_per_shard=1),
    )
    r = Index.open(d).reader
    # with no required prefix an accepted string exists in (almost) every
    # term interval (substituting the first char reaches any alphabet
    # region), so interval pruning only bites when prefix_length > 0 --
    # the same selectivity split as the reference's FST walk
    aut = LevAutomaton("zzzzzzzz", 1, prefix="zz")
    assert r.terms_matching_automaton("content", aut) == []
    read = sum(sr.rg_read_count for sr in r._seg_readers.values())
    known = sum(
        sr._pf.metadata.num_row_groups for sr in r._seg_readers.values()
    )
    assert known >= 3, f"test needs a multi-row-group dictionary ({known})"
    assert read == 0, f"'zz*' overlaps no row group, read {read}/{known}"


def test_fuzzy_search_end_to_end(tiny_idx):
    res = tiny_idx.search(
        {"query": {"term": "funk", "field": "content", "fuzziness": 1},
         "size": 5}
    ).to_dict()
    assert res["total_hits"] > 0  # 'func' is one edit away
