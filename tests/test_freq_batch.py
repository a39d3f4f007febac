"""Differential lock between the batch Arrow tokenizer fast path
(freq._arrow_batch_tokens) and the exact per-doc UnicodeTokenizer chain:
both must produce identical (terms, doc_idx, positions, field_len) for
the standard analyzer, and the batch path must decline PER DOC (list the
doc in bad_docs with zero batch tokens) whenever that doc would tokenize
differently -- one exotic doc must not degrade the rest of the batch."""

import numpy as np
import pyarrow as pa

from bleve_ray.analysis.analyzers import analyzer_named
from bleve_ray.analysis.freq import _arrow_batch_tokens, analyze_batch
from bleve_ray.analysis.tokenizers import UnicodeTokenizer

DOCS = [
    "The quick brown Fox jumps over 2 lazy dogs!",
    "e.g. U.S.A costs 1,000.50 -- don't panic, it's O'Brien's",
    "",
    None,
    "foo_bar __init__ a_1_b 3.14159 v1.2.3",
    "trailing dots... and ((parens)) and 'quoted' words.",
    "ALL CAPS and MixedCase and lower",
    "semi;colons: between, words; here",
    "a b c d e f g h the of to in",
    "1;2 10,20,30 5:6",  # numeric mid-chars, grammar-valid joins
    "x" * 500,
    "word " * 100,
]

HARD_DOCS = [
    "a,b should split",  # comma between letters: not a valid join
    "1:2 colon between digits",
    "x'9 apostrophe letter-digit",
]

NON_ASCII = [
    "café résumé",
    "日本語 テスト",
]


def _exact(texts, analyzer):
    tok = analyzer.tokenizer
    flat, di, pos = [], [], []
    for i, t in enumerate(texts):
        if not t:
            continue
        toks = tok.findall(t)
        for j, term in enumerate(toks):
            flat.append(term.lower())
            di.append(i)
            pos.append(j + 1)
    # stop removal, positions keep gaps
    keep = [t not in analyzer.stop_set for t in flat]
    return (
        [t for t, k in zip(flat, keep) if k],
        [d for d, k in zip(di, keep) if k],
        [p for p, k in zip(pos, keep) if k],
    )


def test_batch_path_matches_exact_chain():
    an = analyzer_named("standard")
    terms, di, pos, fl = analyze_batch(DOCS, an)
    et, ed, ep = _exact(DOCS, an)
    assert terms.to_pylist() == et
    assert di.tolist() == ed
    assert pos.tolist() == ep
    assert fl.sum() == len(et)


def test_batch_path_used_for_clean_ascii():
    # docs whose mid-chars all satisfy the word grammar take the batch
    # path; ';' between letters or ':' between digits correctly decline
    clean = [
        d
        for d in DOCS
        if d
        not in (
            "semi;colons: between, words; here",
            "1;2 10,20,30 5:6",
        )
    ]
    col = pa.array([d or "" for d in clean])
    _, _, bad = _arrow_batch_tokens(col)
    assert len(bad) == 0


def test_batch_declines_hard_grammar_per_doc():
    for d in HARD_DOCS:
        terms, offs, bad = _arrow_batch_tokens(pa.array([d]))
        assert bad.tolist() == [0], d
        assert len(terms) == 0
    # and the full analyze_batch still gets them right via fallback
    an = analyzer_named("standard")
    terms, di, pos, fl = analyze_batch(HARD_DOCS, an)
    et, ed, ep = _exact(HARD_DOCS, an)
    assert terms.to_pylist() == et
    assert di.tolist() == ed
    assert pos.tolist() == ep


def test_batch_declines_non_ascii_per_doc():
    _, _, bad = _arrow_batch_tokens(pa.array(NON_ASCII))
    assert bad.tolist() == [0, 1]
    an = analyzer_named("standard")
    tok = UnicodeTokenizer()
    terms, di, pos, fl = analyze_batch(NON_ASCII, an)
    want = []
    for t in NON_ASCII:
        want.extend(x.lower() for x in tok.findall(t))
    want = [w for w in want if w not in an.stop_set]
    assert terms.to_pylist() == want


def test_mixed_batch_merges_declined_docs_in_order():
    """One hard doc + one non-ASCII doc inside a clean batch: the merged
    output must equal the pure per-doc chain exactly (same terms, same
    doc indexes, same positions)."""
    mixed = [
        "clean words here",
        "a,b hard split",     # hard grammar -> per-doc
        "café au lait",       # non-ASCII -> per-doc
        "more clean 1,000 don't",
        "",
        "tail doc",
    ]
    an = analyzer_named("standard")
    terms, di, pos, fl = analyze_batch(mixed, an)
    et, ed, ep = _exact(mixed, an)
    assert terms.to_pylist() == et
    assert di.tolist() == ed
    assert pos.tolist() == ep
    _, _, bad = _arrow_batch_tokens(pa.array(mixed))
    assert bad.tolist() == [1, 2]


def test_arrow_input_equals_list_input():
    an = analyzer_named("standard")
    la = analyze_batch(DOCS, an)
    aa = analyze_batch(
        pa.array([d for d in DOCS], type=pa.string()), an
    )
    assert la[0].to_pylist() == aa[0].to_pylist()
    assert la[1].tolist() == aa[1].tolist()
    assert la[2].tolist() == aa[2].tolist()
    assert la[3].tolist() == aa[3].tolist()


def test_random_punctuation_soup_parity():
    """Randomized differential sweep: whatever the batch path accepts
    must equal the per-doc tokenizer output."""
    rng = np.random.default_rng(42)
    alphabet = list("abcXY019_'.:,; -\t")
    tok = UnicodeTokenizer()
    for trial in range(200):
        n = int(rng.integers(1, 40))
        s = "".join(rng.choice(alphabet, size=n))
        terms, offs, bad = _arrow_batch_tokens(pa.array([s]))
        if len(bad):
            assert len(terms) == 0
            continue
        assert terms.to_pylist() == tok.findall(s), repr(s)
        assert offs.tolist() == [0, len(terms)]
