"""Porter2 (snowball English) stemmer vectors + the en analyzer chain."""

from bleve_ray.analysis import analyzer_named
from bleve_ray.analysis.porter2 import stem

# Known porter2 outputs (snowballstem.org sample vocabulary entries)
VECTORS = {
    "caresses": "caress", "ponies": "poni", "ties": "tie",
    "caress": "caress", "cats": "cat", "feed": "feed", "agreed": "agre",
    "plastered": "plaster", "bled": "bled", "motoring": "motor",
    "sing": "sing", "conflated": "conflat", "troubled": "troubl",
    "sized": "size", "hopping": "hop", "tanned": "tan", "falling": "fall",
    "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
    "filing": "file", "happy": "happi", "sky": "sky",
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
    "conformabli": "conform", "radicalli": "radic",
    "differentli": "differ", "vileli": "vile", "analogousli": "analog",
    "vietnamization": "vietnam", "predication": "predic",
    "operator": "oper", "feudalism": "feudal", "decisiveness": "decis",
    "hopefulness": "hope", "callousness": "callous", "formaliti": "formal",
    "sensitiviti": "sensit", "sensibiliti": "sensibl",
    "triplicate": "triplic", "formalize": "formal",
    "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
    "goodness": "good", "revival": "reviv", "allowance": "allow",
    "inference": "infer", "airliner": "airlin", "gyroscopic": "gyroscop",
    "adjustable": "adjust", "defensible": "defens", "irritant": "irrit",
    "replacement": "replac", "adjustment": "adjust", "dependent": "depend",
    "adoption": "adopt", "activate": "activ", "angulariti": "angular",
    "homologous": "homolog", "effective": "effect",
    "bowdlerize": "bowdler", "probate": "probat", "rate": "rate",
    "cease": "ceas", "roll": "roll", "dying": "die", "lying": "lie",
    "skis": "ski", "running": "run", "generously": "generous",
    "knitting": "knit", "national": "nation",
}


def test_porter2_vectors():
    bad = {w: (stem(w), want) for w, want in VECTORS.items() if stem(w) != want}
    assert not bad, bad


def test_en_analyzer_chain():
    a = analyzer_named("en")
    # possessive strip + lower + stop + stem
    assert a.terms("The dog's bones were running quickly") == [
        "dog",
        "bone",
        "run",
        "quick",
    ]
