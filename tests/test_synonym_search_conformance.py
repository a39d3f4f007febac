"""Port of the reference's TestSynonymSearchQueries golden vectors
(search_test.go:3998-4390): 20 documents + 14 synonym-definition
documents indexed into one collection with the ENGLISH analyzer
(stemming applies to thesaurus entries too), then match / fuzzy-match /
prefix / match_phrase / fuzzy-match_phrase / wildcard queries whose hit
sets are locked to the reference's expectations.  Exercises index-time
thesaurus segments, analyzer-aware definition analysis, thesaurus-KEY
matching (prefix/fuzzy/regexp), and per-slot phrase synonym/fuzzy
expansion (search_phrase.go:95-200)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bleve_ray.index import FieldConfig, IndexOptions, build_index
from bleve_ray.index.thesaurus import add_synonym_documents
from bleve_ray.search import Index

DOCUMENTS = {
    "doc1": """The hardworking employee consistently strives to exceed expectations.
            His industrious nature makes him a valuable asset to any team.
            His conscientious attention to detail ensures that projects are completed efficiently and accurately.
            He remains persistent even in the face of challenges.""",
    "doc2": """The tranquil surroundings of the retreat provide a perfect escape from the hustle and bustle of city life.
            Guests enjoy the peaceful atmosphere, which is perfect for relaxation and rejuvenation.
            The calm environment offers the ideal place to meditate and connect with nature.
            Even the most stressed individuals find themselves feeling relaxed and at ease.""",
    "doc3": """The house was burned down, leaving only a charred shell behind.
            The intense heat of the flames caused the walls to warp and the roof to cave in.
            The seared remains of the furniture told the story of the blaze.
            The incinerated remains left little more than ashes to remember what once was.""",
    "doc4": """The faithful dog followed its owner everywhere, always loyal and steadfast.
            It was devoted to protecting its family, and its reliable nature meant it could always be trusted.
            In the face of danger, the dog remained calm, knowing its role was to stay vigilant.
            Its trustworthy companionship provided comfort and security.""",
    "doc5": """The lively market is bustling with activity from morning to night.
            The dynamic energy of the crowd fills the air as vendors sell their wares.
            Shoppers wander from stall to stall, captivated by the vibrant colors and energetic atmosphere.
            This place is alive with movement and life.""",
    "doc6": """In moments of crisis, bravery shines through.
            It takes valor to step forward when others are afraid to act.
            Heroes are defined by their guts and nerve, taking risks to protect others.
            Boldness in the face of danger is what sets them apart.""",
    "doc7": """Innovation is the driving force behind progress in every industry.
            The company fosters an environment of invention, encouraging creativity at every level.
            The focus on novelty and improvement means that ideas are always evolving.
            The development of new solutions is at the core of the company's mission.""",
    "doc8": """The blazing sunset cast a radiant glow over the horizon, painting the sky with hues of red and orange.
            The intense heat of the day gave way to a fiery display of color.
            As the sun set, the glowing light illuminated the landscape, creating a breathtaking scene.
            The fiery sky was a sight to behold.""",
    "doc9": """The fertile soil of the valley makes it perfect for farming.
            The productive land yields abundant crops year after year.
            Farmers rely on the rich, fruitful ground to sustain their livelihoods.
            The area is known for its plentiful harvests, supporting both local communities and export markets.""",
    "doc10": """The arid desert is a vast, dry expanse with little water or vegetation.
            The barren landscape stretches as far as the eye can see, offering little respite from the scorching sun.
            The desolate environment is unforgiving to those who venture too far without preparation.
            The parched earth cracks under the heat, creating a harsh, unyielding terrain.""",
    "doc11": """The fox is known for its cunning and intelligence.
            As a predator, it relies on its sharp instincts to outwit its prey.
            Its vulpine nature makes it both mysterious and fascinating.
            The fox's ability to hunt with precision and stealth is what makes it such a formidable hunter.""",
    "doc12": """The dog is often considered man's best friend due to its loyal nature.
            As a companion, the hound provides both protection and affection.
            The puppy quickly becomes a member of the family, always by your side.
            Its playful energy and unshakable loyalty make it a beloved pet.""",
    "doc13": """He worked tirelessly through the night, always persistent in his efforts.
            His industrious approach to problem-solving kept the project moving forward.
            No matter how difficult the task, he remained focused, always giving his best.
            His dedication paid off when the project was completed ahead of schedule.""",
    "doc14": """The river flowed calmly through the valley, its peaceful current offering a sense of tranquility.
            Fishermen relaxed by the banks, enjoying the calm waters that reflected the sky above.
            The tranquil nature of the river made it a perfect spot for meditation.
            As the day ended, the river's quiet flow brought a sense of peace.""",
    "doc15": """After the fire, all that was left was the charred remains of what once was.
            The seared walls of the house told a tragic story.
            The intensity of the blaze had burned everything in its path, leaving only the smoldering wreckage behind.
            The incinerated objects could not be salvaged, and the damage was beyond repair.""",
    "doc16": """The devoted employee always went above and beyond to complete his tasks.
            His steadfast commitment to the company made him a valuable team member.
            He was reliable, never failing to meet deadlines.
            His trustworthiness earned him the respect of his colleagues, and was considered an
            ingenious expert in his field.""",
    "doc17": """The city is vibrant, full of life and energy.
            The dynamic pace of the streets reflects the diverse culture of its inhabitants.
            People from all walks of life contribute to the energetic atmosphere.
            The city's lively spirit can be felt in every corner, from the bustling markets to the lively festivals.""",
    "doc18": """In a moment of uncertainty, he made a bold decision that would change his life forever.
            It took courage and nerve to take the leap, but his bravery paid off.
            The guts to face the unknown allowed him to achieve something remarkable.
            Being an bright scholar, the skill he demonstrated inspired those around him.""",
    "doc19": """Innovation is often born from necessity, and the lightbulb is a prime example.
            Thomas Edison's invention changed the world, offering a new way to see the night.
            The creativity involved in developing such a groundbreaking product sparked a wave of
            novelty in the scientific community. This improvement in technology continues to shape the modern world.
            He was a clever academic and a smart researcher.""",
    "doc20": """The fiery volcano erupted with a force that shook the earth. Its radiant lava flowed down the sides,
            illuminating the night sky. The intense heat from the eruption could be felt miles away, as the
            glowing lava burned everything in its path. The fiery display was both terrifying and mesmerizing.""",
}

SYNONYM_DOCUMENTS = {
    "synDoc1": {"synonyms": ["hardworking", "industrious", "conscientious", "persistent", "focused", "devoted"]},
    "synDoc2": {"synonyms": ["tranquil", "peaceful", "calm", "relaxed", "unruffled"]},
    "synDoc3": {"synonyms": ["burned", "charred", "seared", "incinerated", "singed"]},
    "synDoc4": {"synonyms": ["faithful", "steadfast", "devoted", "reliable", "trustworthy"]},
    "synDoc5": {"synonyms": ["lively", "dynamic", "energetic", "vivid", "vibrating"]},
    "synDoc6": {"synonyms": ["bravery", "valor", "guts", "nerve", "boldness"]},
    "synDoc7": {"input": ["innovation"], "synonyms": ["invention", "creativity", "novelty", "improvement", "development"]},
    "synDoc8": {"input": ["blazing"], "synonyms": ["intense", "radiant", "burning", "fiery", "glowing"]},
    "synDoc9": {"input": ["fertile"], "synonyms": ["productive", "fruitful", "rich", "abundant", "plentiful"]},
    "synDoc10": {"input": ["arid"], "synonyms": ["dry", "barren", "desolate", "parched", "unfertile"]},
    "synDoc11": {"input": ["fox"], "synonyms": ["vulpine", "canine", "predator", "hunter", "pursuer"]},
    "synDoc12": {"input": ["dog"], "synonyms": ["canine", "hound", "puppy", "pup", "companion"]},
    "synDoc13": {"synonyms": ["researcher", "scientist", "scholar", "academic", "expert"]},
    "synDoc14": {"synonyms": ["bright", "clever", "ingenious", "sharp", "astute", "smart"]},
}

# (query dict, expected hit ids) — verbatim from search_test.go:4281-4343
TEST_QUERIES = [
    (
        {"match": "hardworking employee", "field": "text"},
        ["doc1", "doc13", "doc16", "doc4", "doc7"],
    ),
    (
        {
            "match": "Hardwork and industrius efforts bring lovely and "
                     "tranqual moments, with a glazing blow of valour.",
            "field": "text",
            "fuzziness": "auto",
        },
        ["doc1", "doc13", "doc14", "doc15", "doc16", "doc17", "doc18",
         "doc2", "doc20", "doc3", "doc4", "doc5", "doc6", "doc7", "doc8",
         "doc9"],
    ),
    (
        {"prefix": "in", "field": "text"},
        ["doc1", "doc11", "doc13", "doc15", "doc16", "doc17", "doc18",
         "doc19", "doc2", "doc20", "doc3", "doc4", "doc7", "doc8"],
    ),
    (
        {"prefix": "vivid", "field": "text"},
        ["doc17", "doc5"],
    ),
    (
        {"match_phrase": "smart academic", "field": "text"},
        ["doc16", "doc18", "doc19"],
    ),
    (
        {"match_phrase": "smrat acedemic", "field": "text",
         "fuzziness": "auto"},
        ["doc16", "doc18", "doc19"],
    ),
    (
        {"wildcard": "br*", "field": "text"},
        ["doc11", "doc14", "doc16", "doc18", "doc19", "doc6", "doc8"],
    ),
]


@pytest.fixture(scope="module")
def syn_index(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("synconf")
    src = str(root / "docs.parquet")
    ids = sorted(DOCUMENTS, key=lambda k: int(k[3:]))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, type=pa.string()),
                "text": pa.array([DOCUMENTS[i] for i in ids]),
            }
        ),
        src,
    )
    d = str(root / "idx")
    build_index(
        [src],
        d,
        IndexOptions(
            fields={"text": FieldConfig(analyzer="en", positions=True)},
            doc_id_fields=["doc_id"],
            num_shards=2,
            bucket_bits=6,
        ),
    )
    add_synonym_documents(
        d, "english", sorted(SYNONYM_DOCUMENTS.items()), "en"
    )
    idx = Index.open(d)
    idx.mapping.synonym_sources["text"] = "english"
    return idx


@pytest.mark.parametrize(
    "query,expect", TEST_QUERIES, ids=[f"q{i}" for i in range(len(TEST_QUERIES))]
)
def test_synonym_search_conformance(syn_index, query, expect):
    res = syn_index.search({"query": query, "size": 30})
    got = sorted(h.id for h in res.hits)
    assert got == sorted(expect), f"{query} -> {got}"


@pytest.fixture(scope="module")
def syn_alias_members(ray_session, tmp_path_factory):
    """The reference's alias variant (search_test.go:4392-4470): docs AND
    synonym docs interleaved into member indexes (batches of 5 over the
    shuffled combined id list), so each member holds a PARTIAL corpus and
    a PARTIAL thesaurus."""
    import random

    root = tmp_path_factory.mktemp("synalias")
    combined = sorted(DOCUMENTS) + sorted(SYNONYM_DOCUMENTS)
    random.Random(42).shuffle(combined)
    batches = [combined[i : i + 5] for i in range(0, len(combined), 5)]
    members = []
    for bi, batch in enumerate(batches):
        doc_ids = [i for i in batch if i in DOCUMENTS]
        syn_ids = [i for i in batch if i in SYNONYM_DOCUMENTS]
        src = str(root / f"docs{bi}.parquet")
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(doc_ids, type=pa.string()),
                    "text": pa.array([DOCUMENTS[i] for i in doc_ids]),
                }
            ),
            src,
        )
        d = str(root / f"idx{bi}")
        build_index(
            [src],
            d,
            IndexOptions(
                fields={"text": FieldConfig(analyzer="en", positions=True)},
                doc_id_fields=["doc_id"],
                num_shards=1,
                bucket_bits=6,
            ),
        )
        if syn_ids:
            add_synonym_documents(
                d,
                "english",
                [(i, SYNONYM_DOCUMENTS[i]) for i in syn_ids],
                "en",
            )
        idx = Index.open(d)
        idx.mapping.synonym_sources["text"] = "english"
        members.append(idx)
    return members


@pytest.mark.parametrize(
    "query,expect", TEST_QUERIES, ids=[f"q{i}" for i in range(len(TEST_QUERIES))]
)
def test_synonym_alias_conformance(syn_alias_members, query, expect):
    """Alias synonym presearch: every member sees the UNION of all
    members' partial thesauri, so alias hits == single-index hits."""
    from bleve_ray.search.distributed import IndexAlias

    alias = IndexAlias(syn_alias_members)
    res = alias.search({"query": query, "size": 30})
    got = sorted(h.id for h in res.hits)
    assert got == sorted(expect), f"{query} -> {got}"


def test_synonym_nested_alias_conformance(syn_alias_members):
    """Two-level alias (alias of aliases) with the extra member attached
    to the last inner alias, per the reference's multi-level variant."""
    from bleve_ray.search.distributed import IndexAlias

    members = syn_alias_members
    inner = [
        IndexAlias(members[i * 2 : i * 2 + 2])
        for i in range(len(members) // 2)
    ]
    if len(members) % 2:
        inner[-1].add(members[-1])
    alias = IndexAlias(inner)
    for query, expect in TEST_QUERIES:
        res = alias.search({"query": query, "size": 30})
        got = sorted(h.id for h in res.hits)
        assert got == sorted(expect), f"{query} -> {got}"
