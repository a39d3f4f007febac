"""Full reference token-filter vector sweeps, mechanically extracted
from the Go analysis test tables into tests/data/lang_filter_vectors.json
(extractor noted in the round-5 log).  Sources:

- analysis/lang/fr/light_stemmer_fr_test.go      (78 vectors; the
  reference's commented-out known-failing entries are excluded)
- analysis/lang/pt/light_stemmer_pt_test.go      (15)
- analysis/lang/ar/stemmer_ar_test.go            (28)
- analysis/lang/ar/arabic_normalize_test.go      (15)
- analysis/lang/hi/hindi_stemmer_filter_test.go  (22)
- analysis/lang/hi/hindi_normalize_test.go       (17)
- analysis/lang/ckb/sorani_normalize_test.go     (23)
- analysis/lang/ckb/sorani_stemmer_filter_test.go (22; single tokenizer
  + normalize + stem chain, like the reference test harness)
- analysis/lang/de/german_normalize_test.go      (5)
- analysis/lang/es/spanish_normalize_test.go     (6)
- analysis/lang/fa/persian_normalize_test.go     (7)
- analysis/lang/in/indic_normalize_test.go       (8)

Earlier lang tests sampled a handful of these; this file runs every
extracted pair.  Tokens flagged KeyWord in the reference table pass
through stemmers unchanged (keyword-marker semantics).
"""

import json
import os

import pytest

from bleve_ray.analysis.lang_extra import (
    arabic_normalize,
    arabic_stem,
    hindi_normalize,
    hindi_stem,
    indic_normalize,
    persian_normalize,
    sorani_normalize,
    sorani_stem,
)
from bleve_ray.analysis.lang_light import (
    french_light_stem,
    german_normalize,
    portuguese_light_stem,
    spanish_normalize,
)

_VECS = json.load(
    open(os.path.join(os.path.dirname(__file__), "data",
                      "lang_filter_vectors.json"))
)

# key -> per-term function (applied only to non-keyword tokens for
# stemmers, matching the reference filters' KeyWord check)
_FUNCS = {
    "fr_light": french_light_stem,
    "pt_light": portuguese_light_stem,
    "ar_stem": arabic_stem,
    "ar_norm": arabic_normalize,
    "hi_stem": hindi_stem,
    "hi_norm": hindi_normalize,
    "ckb_norm": sorani_normalize,
    "ckb_stem": lambda t: sorani_stem(sorani_normalize(t)),
    "de_norm": german_normalize,
    "es_norm": spanish_normalize,
    "fa_norm": persian_normalize,
    "in_norm": indic_normalize,
}

# normalizers apply regardless of the keyword flag; stemmers skip
_NORMALIZERS = {"ar_norm", "hi_norm", "ckb_norm", "de_norm", "es_norm",
                "fa_norm", "in_norm"}

_CASES = [
    (key, i, vec)
    for key, vecs in _VECS.items()
    for i, vec in enumerate(vecs)
]


@pytest.mark.parametrize(
    "key,i,vec", _CASES,
    ids=[f"{k}-{i}-{v['input'][0]['term'][:20]}" for k, i, v in _CASES],
)
def test_lang_filter_vector(key, i, vec):
    fn = _FUNCS[key]
    got = []
    for tok in vec["input"]:
        if tok["keyword"] and key not in _NORMALIZERS:
            got.append(tok["term"])
        else:
            got.append(fn(tok["term"]))
    want = [t["term"] for t in vec["output"]]
    assert got == want
