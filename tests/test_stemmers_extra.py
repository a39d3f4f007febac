"""Standalone registered stemmers: classic Porter V1, generic Snowball
dispatch, Snowball Spanish/French, French minimal.

Vector sources:
- analysis/token/porter/porter_test.go (TestPorterStemmer)
- analysis/token/snowball/snowball_test.go (TestSnowballStemmer)
- analysis/lang/es/stemmer_es_snowball_test.go (TestSnowballSpanishStemmer)
- analysis/lang/fr/stemmer_fr_snowball_test.go (TestSnowballFrenchStemmer)
- analysis/lang/fr/minimal_stemmer_fr_test.go (TestFrenchMinimalStemmer)
plus end-to-end pairs from the published Porter 1980 paper
(GENERALIZATIONS -> GENER, OSCILLATORS -> OSCIL and the step examples).
"""

import pytest

from bleve_ray.analysis.stemmers_extra import (
    french_minimal_stem,
    french_snowball_stem,
    make_french_minimal_filter,
    make_porter_filter,
    make_snowball_filter,
    porter1_stem,
    spanish_snowball_stem,
)
from bleve_ray.analysis.tokenizers import Token


def _tok(term, type_="AlphaNumeric"):
    return Token(term=term, position=1, start=0, end=len(term), type=type_)


# --- porter_test.go TestPorterStemmer ---------------------------------------

PORTER_GO_VECTORS = [
    ("walking", "walk"),
    ("talked", "talk"),
    ("business", "busi"),
    ("cat", "cat"),
    ("done", "done"),
    # a term which does stem, but does not change length
    ("marty", "marti"),
]

# end-to-end pairs from the Porter 1980 paper / official voc.txt pairs
PORTER_PAPER_VECTORS = [
    ("generalizations", "gener"),
    ("oscillators", "oscil"),
    ("caresses", "caress"),
    ("ponies", "poni"),
    ("ties", "ti"),
    ("caress", "caress"),
    ("cats", "cat"),
    ("feed", "feed"),
    ("agreed", "agre"),
    ("plastered", "plaster"),
    ("bled", "bled"),
    ("motoring", "motor"),
    ("sing", "sing"),
    ("conflated", "conflat"),
    ("troubled", "troubl"),
    ("sized", "size"),
    ("hopping", "hop"),
    ("tanned", "tan"),
    ("falling", "fall"),
    ("hissing", "hiss"),
    ("fizzed", "fizz"),
    ("failing", "fail"),
    ("filing", "file"),
    ("happy", "happi"),
    ("sky", "sky"),
    ("relational", "relat"),
    ("controlling", "control"),
    ("roll", "roll"),
]


@pytest.mark.parametrize("word,expected", PORTER_GO_VECTORS + PORTER_PAPER_VECTORS)
def test_porter1_vectors(word, expected):
    assert porter1_stem(word) == expected


def test_porter_filter_respects_keyword_marker():
    # porter_test.go: the KeyWord-marked token "protected" passes through
    f = make_porter_filter()
    toks = [_tok("walking"), _tok("protected", type_="KeyWord"), _tok("cat")]
    out = f(toks)
    assert [t.term for t in out] == ["walk", "protected", "cat"]


# --- snowball_test.go TestSnowballStemmer (language=english) ----------------


def test_snowball_english_dispatch():
    f = make_snowball_filter("english")
    toks = [
        _tok("walking"), _tok("talked"), _tok("business"),
        _tok("protected", type_="KeyWord"), _tok("cat"), _tok("done"),
        _tok("marty"),
    ]
    out = f(toks)
    assert [t.term for t in out] == [
        "walk", "talk", "busi", "protected", "cat", "done", "marti",
    ]


def test_snowball_requires_language():
    # snowball.go:49-54: constructor errors without a language
    with pytest.raises(ValueError):
        make_snowball_filter("klingon")


@pytest.mark.parametrize(
    "language,word,expected",
    [
        ("russian", "хлеба", "хлеб"),
        ("swedish", "klubbarna", "klubb"),
        ("norwegian", "havnedistriktene", "havnedistrikt"),
        ("spanish", "agresivos", "agres"),
        ("french", "calculateur", "calcul"),
    ],
)
def test_snowball_other_languages_dispatch(language, word, expected):
    f = make_snowball_filter(language)
    out = f([_tok(word)])
    assert out[0].term == expected


# --- stemmer_es_snowball_test.go --------------------------------------------

ES_SNOWBALL_VECTORS = [
    ("agresivos", "agres"),
    ("agresivamente", "agres"),
    ("agresividad", "agres"),
    # traced through the published algorithm (snowballstem.org/spanish)
    ("comiendo", "com"),
    ("caminando", "camin"),
    ("torneo", "torne"),  # step 3 residual strips the final o
]


@pytest.mark.parametrize("word,expected", ES_SNOWBALL_VECTORS)
def test_spanish_snowball_vectors(word, expected):
    assert spanish_snowball_stem(word) == expected


# --- stemmer_fr_snowball_test.go --------------------------------------------

FR_SNOWBALL_VECTORS = [
    ("antagoniste", "antagon"),
    ("barbouillait", "barbouill"),
    ("calculateur", "calcul"),
    # traced through the published algorithm (snowballstem.org/french)
    ("chantera", "chant"),
    ("nationaux", "national"),
]


@pytest.mark.parametrize("word,expected", FR_SNOWBALL_VECTORS)
def test_french_snowball_vectors(word, expected):
    assert french_snowball_stem(word) == expected


# --- minimal_stemmer_fr_test.go ---------------------------------------------

FR_MINIMAL_VECTORS = [
    ("chevaux", "cheval"),
    ("hiboux", "hibou"),
    ("chantés", "chant"),
    ("chanter", "chant"),
    ("chante", "chant"),
    ("baronnes", "baron"),
    ("barons", "baron"),
    ("baron", "baron"),
]


@pytest.mark.parametrize("word,expected", FR_MINIMAL_VECTORS)
def test_french_minimal_vectors(word, expected):
    assert french_minimal_stem(word) == expected


def test_french_minimal_filter():
    f = make_french_minimal_filter()
    out = f([_tok("chevaux"), _tok("baron")])
    assert [t.term for t in out] == ["cheval", "baron"]


# --- stemmer_de_snowball_test.go (analysis/lang/de/stemmer_de_test.go) -------

DE_SNOWBALL_VECTORS = [
    ("abzuschrecken", "abzuschreck"),
    ("abzuwarten", "abzuwart"),
    ("zwirnfabrik", "zwirnfabr"),
    ("zyniker", "zynik"),
    # traced through the published algorithm (snowballstem.org/german)
    ("aufeinander", "aufeinand"),
    ("dürfen", "durf"),
]


@pytest.mark.parametrize("word,expected", DE_SNOWBALL_VECTORS)
def test_german_snowball_vectors(word, expected):
    from bleve_ray.analysis.stemmers_extra import german_snowball_stem

    assert german_snowball_stem(word) == expected


def test_snowball_german_dispatch():
    f = make_snowball_filter("german")
    out = f([_tok("zyniker"), _tok("geheimnis", type_="KeyWord")])
    assert [t.term for t in out] == ["zynik", "geheimnis"]


# --- stemmer_it_snowball_test.go ----------------------------------------------

IT_SNOWBALL_VECTORS = [
    ("aizzata", "aizz"),
    ("aizzargli", "aizz"),  # attached pronoun: ar+gli -> e, then step 2
    ("aizzasse", "aizz"),
    # traced through the published algorithm (snowballstem.org/italian)
    ("abbandonata", "abbandon"),
    ("pronto", "pront"),
    ("propaganda", "propagand"),
]


@pytest.mark.parametrize("word,expected", IT_SNOWBALL_VECTORS)
def test_italian_snowball_vectors(word, expected):
    from bleve_ray.analysis.stemmers_extra import italian_snowball_stem

    assert italian_snowball_stem(word) == expected


def test_snowball_italian_dispatch():
    f = make_snowball_filter("italian")
    out = f([_tok("aizzata")])
    assert out[0].term == "aizz"
