"""Smoke the driver contract: entry(), queries() callables, oracle pairing."""

import sys

sys.path.insert(0, "/root/repo")


def test_entry_contract(ray_session):
    import __ray_entry__ as E

    df = E.entry()
    assert len(df) >= 0
    assert list(df.columns) == ["doc_id", "score"]

    qs = E.queries()
    oracles = E.oracle_sql()
    assert set(oracles).issubset(set(qs))
    # a few cheap callables at sf0.001
    t = qs["collection_stats"]("/root/testdata/sf0.001")
    assert t.num_rows == 1
    t = qs["term_search_bm25"]("/root/testdata/sf0.001")
    assert t.num_rows <= 10 and t.column_names == ["doc_id", "score"]
