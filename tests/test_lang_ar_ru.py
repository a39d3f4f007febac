"""Arabic + Russian language packs.

Vectors from reference analysis/lang/ar/{stemmer_ar,arabic_normalize,
analyzer_ar}_test.go and analysis/lang/ru/{stemmer_ru,analyzer_ru}_test.go
(expected outputs reproduced; implementations original — the Russian
stemmer is an independent implementation of the public Snowball
algorithm, the Arabic one of the Lucene light-stemmer rules).
"""

import pytest

from bleve_ray.analysis.analyzers import analyzer_named
from bleve_ray.analysis.lang_extra import (
    arabic_normalize,
    arabic_stem,
    russian_stem,
)

AR_STEM = [
    ("الحسن", "حسن"), ("والحسن", "حسن"), ("بالحسن", "حسن"),
    ("كالحسن", "حسن"), ("فالحسن", "حسن"), ("للاخر", "اخر"),
    ("وحسن", "حسن"), ("زوجها", "زوج"), ("ساهدان", "ساهد"),
    ("ساهدات", "ساهد"), ("ساهدون", "ساهد"), ("ساهدين", "ساهد"),
    ("ساهديه", "ساهد"), ("ساهدية", "ساهد"), ("ساهده", "ساهد"),
    ("ساهدة", "ساهد"), ("ساهدي", "ساهد"), ("وساهدون", "ساهد"),
    ("ساهدهات", "ساهد"), ("الو", "الو"), ("English", "English"),
    ("سلام", "سلام"), ("السلام", "سلام"), ("سلامة", "سلام"),
    ("السلامة", "سلام"), ("الوصل", "وصل"), ("والصل", "صل"), ("", ""),
]

AR_NORM = [
    ("آجن", "اجن"), ("أحمد", "احمد"), ("إعاذ", "اعاذ"), ("بنى", "بني"),
    ("فاطمة", "فاطمه"), ("روبرـــــت", "روبرت"), ("مَبنا", "مبنا"),
    ("علِي", "علي"), ("بُوات", "بوات"), ("ولداً", "ولدا"),
    ("ولدٍ", "ولد"), ("ولدٌ", "ولد"), ("نلْسون", "نلسون"),
    ("هتميّ", "هتمي"), ("", ""),
]

RU_STEM = [
    ("актеров", "актер"),
    ("километров", "километр"),
    # extra words covering each snowball step
    ("вместе", "вмест"),          # noun е
    ("электромагнитной", "электромагнитн"),  # adjective ой
    ("энергии", "энерг"),         # noun ии
    ("хранилось", "хран"),        # reflexive сь + verb ило
    ("представление", "представлен"),  # noun ие
]


@pytest.mark.parametrize("inp,out", AR_STEM)
def test_arabic_stem(inp, out):
    assert arabic_stem(inp) == out


@pytest.mark.parametrize("inp,out", AR_NORM)
def test_arabic_normalize(inp, out):
    assert arabic_normalize(inp) == out


@pytest.mark.parametrize("inp,out", RU_STEM)
def test_russian_stem(inp, out):
    assert russian_stem(inp) == out


AR_ANALYZER = [
    ("كبير", ["كبير"]),
    ("كبيرة", ["كبير"]),
    ("مشروب", ["مشروب"]),
    ("مشروبات", ["مشروب"]),
    ("أمريكيين", ["امريك"]),
    ("امريكي", ["امريك"]),
    ("كتاب", ["كتاب"]),
    ("الكتاب", ["كتاب"]),
    ("ما ملكت أيمانكم", ["ملكت", "ايمانكم"]),
    ("الذين ملكت أيمانكم", ["ملكت", "ايمانكم"]),
    ("ﺍﻟﺴﻼﻢ", ["سلام"]),  # presentation forms folded by NFKC
]

RU_ANALYZER = [
    ("километрах", ["километр"]),
    ("актеров", ["актер"]),
    ("как", []),
    ("text 1000", ["text", "1000"]),
    (
        "Вместе с тем о силе электромагнитной энергии имели представление еще",
        ["вмест", "сил", "электромагнитн", "энерг", "имел", "представлен"],
    ),
    ("Но знание это хранилось в тайне", ["знан", "эт", "хран", "тайн"]),
]


@pytest.mark.parametrize("inp,out", AR_ANALYZER)
def test_ar_analyzer(inp, out):
    assert analyzer_named("ar").terms(inp) == out


@pytest.mark.parametrize("inp,out", RU_ANALYZER)
def test_ru_analyzer(inp, out):
    assert analyzer_named("ru").terms(inp) == out
