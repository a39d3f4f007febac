"""fi/hu/ro/tr (Snowball), pl (stempel) and hr full analyzer chains --
reference golden vectors from analysis/lang/{fi,hu,ro,tr,pl,hr}/
analyzer_*_test.go and stemmer_{tr,pl}_test.go."""

import pytest

from bleve_ray.analysis.analyzers import analyzer_named


def _terms(name, text):
    return [t.term for t in analyzer_named(name).analyze(text)]


# --- Finnish ---------------------------------------------------------------

def test_finnish_analyzer_reference_vectors():
    assert _terms("fi", "edeltäjiinsä") == ["edeltäj"]
    assert _terms("fi", "edeltäjistään") == ["edeltäj"]
    assert _terms("fi", "olla") == []  # stop word


def test_finnish_stemmer_spot_checks():
    from bleve_ray.analysis.snowball_more import finnish_stem

    # inflection families collapse to one stem
    assert finnish_stem("koira") == finnish_stem("koiran") == "koir"
    assert finnish_stem("taloja") == finnish_stem("talon") == "talo"


# --- Hungarian -------------------------------------------------------------

def test_hungarian_analyzer_reference_vectors():
    assert _terms("hu", "babakocsi") == ["babakocs"]
    assert _terms("hu", "babakocsijáért") == ["babakocs"]
    assert _terms("hu", "által") == []  # stop word


# --- Romanian --------------------------------------------------------------

def test_romanian_analyzer_reference_vectors():
    assert _terms("ro", "absenţa") == ["absenţ"]
    assert _terms("ro", "absenţi") == ["absenţ"]
    assert _terms("ro", "îl") == []  # stop word


# --- Turkish ---------------------------------------------------------------

TR_STEM_VECTORS = [
    # stemmer_tr_test.go
    ("kimsesizler", "kimsesiz"),
    ("kitaplar", "kitap"),
    ("arabanın", "araba"),
    ("bardaklar", "bardak"),
    ("kediye", "kedi"),
    ("yazdım", "yaz"),
]


@pytest.mark.parametrize("word,want", TR_STEM_VECTORS)
def test_turkish_stemmer_reference_vectors(word, want):
    from bleve_ray.analysis.snowball_more import turkish_stem

    assert turkish_stem(word) == want


def test_turkish_analyzer_reference_vectors():
    # analyzer_tr_test.go: apostrophe strip + lower + stop + stem
    assert _terms("tr", "ağacı") == ["ağaç"]
    assert _terms("tr", "ağaç") == ["ağaç"]
    assert _terms("tr", "Kıbrıs'ta") == ["kıbrıs"]
    assert _terms("tr", "Van Gölü'ne") == ["van", "göl"]


def test_turkish_single_syllable_untouched():
    from bleve_ray.analysis.snowball_more import turkish_stem

    assert turkish_stem("at") == "at"
    assert turkish_stem("ev") == "ev"


# --- Polish (stempel) ------------------------------------------------------

PL_STEM_VECTORS = [
    # stemmer_pl_test.go + analyzer_pl_test.go
    ("utrzymywana", "utrzymywać"),
    ("tajemnicy", "tajemnik"),
    ("śmiało", "śmieć"),
    ("przypadku", "przypadek"),
    ("badawczego", "badawczy"),
    ("opracowanie", "opracować"),
    ("kompendium", "kompendium"),
]


@pytest.mark.parametrize("word,want", PL_STEM_VECTORS)
def test_polish_stemmer_reference_vectors(word, want):
    from bleve_ray.analysis.stempel import polish_stem

    assert polish_stem(word) == want


def test_polish_analyzer_chain():
    assert _terms("pl", "śmiało") == ["śmieć"]
    assert _terms("pl", "text 1000") == ["text", "1000"]
    # stop word
    assert _terms("pl", "przez") == []


def test_stempel_trie_loads_once():
    from bleve_ray.analysis import stempel

    t1 = stempel.load_polish_trie()
    t2 = stempel.load_polish_trie()
    assert t1 is t2


# --- Croatian --------------------------------------------------------------

def test_croatian_analyzer_reference_vectors():
    assert _terms("hr", "Hrvatska") == ["hrvatsk"]
    assert _terms("hr", "Hrvatski") == ["hrvatsk"]
    assert _terms("hr", "KOMARAC") == ["komarc"]
    assert _terms("hr", "crvi") == ["crv"]
    assert _terms("hr", "zaključcima") == ["zaključk"]


def test_croatian_stop_words():
    assert _terms("hr", "jesam") == []
