"""Language packs de/fr/es/it/pt: light stemmers + stop lists + elision.

Vectors are the reference's own analyzer/stemmer goldens
(analysis/lang/{de,fr,es,it,pt}/*_test.go); a representative subset is
embedded here (the full 123-vector sweep was verified at build time)."""

import pytest

from bleve_ray.analysis import analyzer_named
from bleve_ray.analysis.lang_light import (
    french_light_stem,
    german_light_stem,
    german_normalize,
    italian_light_stem,
    portuguese_light_stem,
    spanish_light_stem,
)

DE_CHAIN = [
    ("Tisch", ["tisch"]),
    ("Tische", ["tisch"]),
    ("Tischen", ["tisch"]),
    ("Schaltflächen", ["schaltflach"]),
    ("Schaltflaechen", ["schaltflach"]),
    ("Blechern", ["blech"]),
    ("Klecks", ["kleck"]),
    ("Mindestens", ["mindest"]),
    ("und", []),  # stopword
]

FR_STEM = [
    ("chevaux", "cheval"),
    ("hiboux", "hibou"),
    ("chantés", "chant"),
    ("chanter", "chant"),
    ("chante", "chant"),
    ("baronnes", "baron"),
    ("barons", "baron"),
    ("baron", "baron"),
    ("peaux", "peau"),
    ("peau", "peau"),
    ("anneaux", "aneau"),
    ("neveux", "neveu"),
    ("affreux", "afreu"),
    ("investissement", "investi"),
    ("architectes", "architect"),
    ("configuration", "configu"),
    ("personnelle", "person"),
    ("complète", "complet"),
    ("aromatique", "aromat"),
    ("faiblesse", "faibl"),
    ("patinage", "patin"),
    ("sonorisation", "sono"),
    ("ritualisation", "rituel"),
]

ES_CHAIN = [
    ("chicana", ["chican"]),
    ("chicano", ["chican"]),
    ("yeses", ["yes"]),
    ("jaeces", ["jaez"]),
    ("arcos", ["arc"]),
    ("caos", ["caos"]),
    ("parecer", ["parecer"]),
    ("las", []),  # stopword
]

IT_CHAIN = [
    ("abbandonata", ["abbandonat"]),
    ("abbandonati", ["abbandonat"]),
    ("dell'Italia", ["ital"]),
    ("l'Italiano", ["italian"]),
    ("Nell'anfora", ["anfor"]),
    ("dallo", []),  # stopword
]

PT_STEM = [
    ("doutores", "doutor"),
    ("homens", "homem"),
    ("papéis", "papel"),
    ("normais", "normal"),
    ("lençóis", "lencol"),
    ("barris", "barril"),
    ("botões", "bota"),
    ("botão", "bota"),
    ("rapidamente", "rapid"),
    ("quilométricas", "quilometric"),
]


def test_german_chain():
    de = analyzer_named("de")
    for inp, want in DE_CHAIN:
        assert de.terms(inp) == want, inp


def test_german_normalize_state_machine():
    assert german_normalize("schaltflächen") == "schaltflachen"
    assert german_normalize("weißbier") == "weissbier"
    assert german_normalize("dauer") == "dauer"


def test_french_stemmer_vectors():
    for inp, want in FR_STEM:
        assert french_light_stem(inp) == want, inp


def test_french_chain_elision_and_stop():
    fr = analyzer_named("fr")
    assert fr.terms("chien CHAT CHEVAL") == ["chien", "chat", "cheval"]
    assert fr.terms("l'avion") == ["avion"]
    assert fr.terms("le la les") == []


def test_spanish_chain():
    es = analyzer_named("es")
    for inp, want in ES_CHAIN:
        assert es.terms(inp) == want, inp


def test_italian_chain():
    it = analyzer_named("it")
    for inp, want in IT_CHAIN:
        assert it.terms(inp) == want, inp


def test_portuguese_stemmer_vectors():
    for inp, want in PT_STEM:
        assert portuguese_light_stem(inp) == want, inp
    pt = analyzer_named("pt")
    assert pt.terms("não") == []


def test_multilang_index_per_field_analyzers(ray_session, tmp_path):
    """Index a multilingual table with a different analyzer per field;
    query each field with its language's inflected forms."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bleve_ray.index import FieldConfig, IndexOptions, build_index
    from bleve_ray.search import Index

    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2], type=pa.int64()),
            "txt_de": pa.array(["Die Tische stehen", "Der Hund bellt"]),
            "txt_fr": pa.array(["les chevaux galopent", "le chien aboie"]),
            "txt_es": pa.array(["los arcos grandes", "el perro ladra"]),
        }
    )
    src = str(tmp_path / "ml.parquet")
    pq.write_table(tbl, src)
    d = str(tmp_path / "mlidx")
    build_index(
        [src],
        d,
        IndexOptions(
            fields={
                "txt_de": FieldConfig(analyzer="de", positions=False),
                "txt_fr": FieldConfig(analyzer="fr", positions=False),
                "txt_es": FieldConfig(analyzer="es", positions=False),
            },
            doc_id_fields=["doc_id"],
            num_shards=2,
            bucket_bits=6,
        ),
    )
    idx = Index.open(d)
    # singular query form matches plural-indexed doc via shared stem
    r = idx.search({"query": {"match": "Tisch", "field": "txt_de",
                              "analyzer": "de"}, "size": 10})
    assert [h.id for h in r.hits] == ["1"]
    r = idx.search({"query": {"match": "cheval", "field": "txt_fr",
                              "analyzer": "fr"}, "size": 10})
    assert [h.id for h in r.hits] == ["1"]
    r = idx.search({"query": {"match": "grande", "field": "txt_es",
                              "analyzer": "es"}, "size": 10})
    assert [h.id for h in r.hits] == ["1"]


def test_english_plural_stemmer_reference_vectors():
    """plural_stemmer.go (OpenSearch EnglishPluralStemFilter algorithm):
    all reference test vectors."""
    from bleve_ray.analysis.token_filters import english_plural_stem as st

    vecs = [
        ("dresses", "dress"), ("dress", "dress"), ("axes", "axe"),
        ("ad", "ad"), ("ads", "ad"), ("gas", "ga"), ("sass", "sass"),
        ("berries", "berry"), ("spies", "spy"), ("shoes", "shoe"),
        ("headaches", "headache"), ("computer", "computer"),
        ("dressing", "dressing"), ("clothes", "clothe"),
        ("DRESSES", "dress"), ("frog", "frog"), ("runs", "run"),
        ("pies", "pie"), ("foxes", "fox"), ("foes", "fo"),
        ("dishes", "dish"), ("snitches", "snitch"),
        ("cliches", "cliche"), ("forests", "forest"), ("yes", "ye"),
        ("canoes", "canoe"), ("oboes", "oboe"), ("caches", "cache"),
    ]
    for w, want in vecs:
        assert st(w) == want, (w, st(w), want)

    # usable as a filter in a custom analyzer chain
    from bleve_ray.analysis.analyzers import make_custom_analyzer
    from bleve_ray.analysis.token_filters import (
        lowercase_filter,
        plural_stemmer_filter,
    )
    from bleve_ray.analysis.tokenizers import UnicodeTokenizer

    a = make_custom_analyzer(
        "en_plural_test",
        UnicodeTokenizer(),
        token_filters=[lowercase_filter, plural_stemmer_filter],
        register=False,
    )
    assert [t.term for t in a.analyze("the Foxes dresses")] == [
        "the", "fox", "dress",
    ]
