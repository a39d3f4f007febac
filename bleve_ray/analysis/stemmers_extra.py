"""Standalone registered stemmer filters beyond the analyzer chains.

The reference registers several stemmers that no built-in analyzer uses
but that users wire into custom analyzers:

- ``stemmer_porter`` -- the classic Porter (V1, 1980) stemmer
  (reference analysis/token/porter/porter.go, backed by the public
  go-porterstemmer port of Martin Porter's original algorithm).
- ``stemmer_snowball`` -- a generic language-dispatching Snowball
  stemmer (reference analysis/token/snowball/snowball.go, backed by
  the public kljensen/snowball fork which supports english, spanish,
  french, hungarian, norwegian, russian and swedish).
- ``stemmer_es_snowball`` -- full Snowball Spanish
  (reference analysis/lang/es/stemmer_es_snowball.go).
- ``stemmer_fr_snowball`` -- full Snowball French
  (reference analysis/lang/fr/stemmer_fr_snowball.go).
- ``stemmer_fr_min`` -- the French minimal stemmer
  (reference analysis/lang/fr/minimal_stemmer_fr.go, a Lucene
  FrenchMinimalStemmer port).

All algorithms here are implemented from the published specifications
(Porter 1980 / snowballstem.org); none of the Go code is translated.
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# Classic Porter (V1) -- M.F. Porter, "An algorithm for suffix stripping",
# Program 14(3) 1980, including the two departures present in the author's
# reference C implementation (step 2: bli->ble, logi->log) which the
# published voc.txt/output.txt pairs -- and hence go-porterstemmer -- follow.
# ---------------------------------------------------------------------------

_P1_VOWELS = "aeiou"


def _p1_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _P1_VOWELS:
        return False
    if c == "y":
        return True if i == 0 else not _p1_cons(w, i - 1)
    return True


def _p1_m(w: str) -> int:
    """Measure: number of VC sequences in w."""
    n = 0
    i = 0
    ln = len(w)
    # skip initial consonants
    while i < ln and _p1_cons(w, i):
        i += 1
    while i < ln:
        # in a vowel run
        while i < ln and not _p1_cons(w, i):
            i += 1
        if i >= ln:
            break
        n += 1
        while i < ln and _p1_cons(w, i):
            i += 1
    return n


def _p1_has_vowel(w: str) -> bool:
    return any(not _p1_cons(w, i) for i in range(len(w)))


def _p1_ends_double_cons(w: str) -> bool:
    return (
        len(w) >= 2
        and w[-1] == w[-2]
        and _p1_cons(w, len(w) - 1)
    )


def _p1_cvc(w: str) -> bool:
    """Ends consonant-vowel-consonant where the final consonant is not
    w, x or y (the *o condition)."""
    if len(w) < 3:
        return False
    i = len(w) - 1
    if not _p1_cons(w, i) or _p1_cons(w, i - 1) or not _p1_cons(w, i - 2):
        return False
    return w[i] not in "wxy"


# step 2/3/4 rule tables: suffix -> replacement (None = delete), applied
# when the measure condition on the remaining stem holds
_P1_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
    ("anci", "ance"), ("izer", "ize"), ("bli", "ble"), ("alli", "al"),
    ("entli", "ent"), ("eli", "e"), ("ousli", "ous"), ("ization", "ize"),
    ("ation", "ate"), ("ator", "ate"), ("alism", "al"),
    ("iveness", "ive"), ("fulness", "ful"), ("ousness", "ous"),
    ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"), ("logi", "log"),
]
_P1_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]
_P1_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


def porter1_stem(word: str) -> str:
    """Classic Porter stemmer over a lowercase word."""
    w = word
    if len(w) <= 2:
        return w

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif not w.endswith("ss") and w.endswith("s"):
        w = w[:-1]

    # step 1b
    if w.endswith("eed"):
        if _p1_m(w[:-3]) > 0:
            w = w[:-1]
    else:
        fired = False
        if w.endswith("ed") and _p1_has_vowel(w[:-2]):
            w = w[:-2]
            fired = True
        elif w.endswith("ing") and _p1_has_vowel(w[:-3]):
            w = w[:-3]
            fired = True
        if fired:
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif _p1_ends_double_cons(w) and w[-1] not in "lsz":
                w = w[:-1]
            elif _p1_m(w) == 1 and _p1_cvc(w):
                w += "e"

    # step 1c: (*v*) y -> i
    if w.endswith("y") and _p1_has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # step 2 (m>0 on the stem)
    for suf, rep in _P1_STEP2:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _p1_m(stem) > 0:
                w = stem + rep
            break

    # step 3 (m>0)
    for suf, rep in _P1_STEP3:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _p1_m(stem) > 0:
                w = stem + rep
            break

    # step 4 (m>1); 'ion' additionally requires stem ending s or t
    for suf in _P1_STEP4:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _p1_m(stem) > 1 and (
                suf != "ion" or (stem and stem[-1] in "st")
            ):
                w = stem
            break

    # step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _p1_m(stem)
        if m > 1 or (m == 1 and not _p1_cvc(stem)):
            w = stem

    # step 5b: (m>1, *d, *L) -> single letter
    if _p1_m(w) > 1 and _p1_ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]

    return w


def make_porter_filter():
    """``stemmer_porter``: classic Porter V1, keyword-marked tokens
    pass through untouched (porter.go:37 ``if !token.KeyWord``)."""

    def porter_filter(tokens):
        for t in tokens:
            if t.type != "KeyWord":
                t.term = porter1_stem(t.term)
        return tokens

    return porter_filter


# ---------------------------------------------------------------------------
# French minimal stemmer (reference minimal_stemmer_fr.go, itself the
# Lucene FrenchMinimalStemFilter): only on words of length >= 6.
# ---------------------------------------------------------------------------


def french_minimal_stem(word: str) -> str:
    w = word
    if len(w) < 6:
        return w
    if w[-1] == "x":
        if w[-3] == "a" and w[-2] == "u":
            return w[:-2] + "l"
        return w[:-1]
    if w[-1] == "s":
        w = w[:-1]
    if w[-1] == "r":
        w = w[:-1]
    if w[-1] == "e":
        w = w[:-1]
    if w[-1] == "é":  # é
        w = w[:-1]
    if len(w) >= 2 and w[-1] == w[-2]:
        w = w[:-1]
    return w


def make_french_minimal_filter():
    def fr_min_filter(tokens):
        for t in tokens:
            t.term = french_minimal_stem(t.term)
        return tokens

    return fr_min_filter


# ---------------------------------------------------------------------------
# Snowball Spanish (snowballstem.org/algorithms/spanish/stemmer.html)
# ---------------------------------------------------------------------------

_ES_VOWELS = "aeiouáéíóúü"  # a e i o u á é í ó ú ü
_ES_UNACCENT = str.maketrans("áéíóú", "aeiou")


def _es_rv(w: str) -> int:
    n = len(w)
    if n < 3:
        return n
    if w[1] not in _ES_VOWELS:
        # second letter consonant: after the next following vowel
        for i in range(2, n):
            if w[i] in _ES_VOWELS:
                return i + 1
        return n
    if w[0] in _ES_VOWELS and w[1] in _ES_VOWELS:
        # first two vowels: after the next following consonant
        for i in range(2, n):
            if w[i] not in _ES_VOWELS:
                return i + 1
        return n
    # consonant-vowel: after the third letter
    return 3


def _std_r1r2(w: str, vowels: str) -> tuple:
    n = len(w)
    r1 = n
    for i in range(n - 1):
        if w[i] in vowels and w[i + 1] not in vowels:
            r1 = i + 2
            break
    r2 = n
    for i in range(r1, n - 1):
        if w[i] in vowels and w[i + 1] not in vowels:
            r2 = i + 2
            break
    return r1, r2


def _ends_in(w: str, suffixes, region_start: int):
    """Longest suffix of w from `suffixes` that starts within
    w[region_start:]; returns the suffix or None."""
    best = None
    for s in suffixes:
        if w.endswith(s) and (best is None or len(s) > len(best)):
            if len(w) - len(s) >= region_start:
                best = s
    return best


def _longest_suffix_any(w: str, suffixes):
    best = None
    for s in suffixes:
        if w.endswith(s) and (best is None or len(s) > len(best)):
            best = s
    return best


_ES_PRON = [
    "me", "se", "sela", "selo", "selas", "selos", "la", "le", "lo",
    "las", "les", "los", "nos",
]
_ES_PRON_A = ["iéndo", "ándo", "ár", "ér", "ír"]
_ES_PRON_B = ["ando", "iendo", "ar", "er", "ir"]
_ES_DEACCENT_PRON = str.maketrans(
    "áéíóú", "aeiou"
)

_ES_S1_DELETE_R2 = [
    "anza", "anzas", "ico", "ica", "icos", "icas", "ismo", "ismos",
    "able", "ables", "ible", "ibles", "ista", "istas", "oso", "osa",
    "osos", "osas", "amiento", "amientos", "imiento", "imientos",
]
_ES_S1_ADOR = [
    "adora", "ador", "ación", "adoras", "adores", "aciones",
    "ante", "antes", "ancia", "ancias",
]
_ES_S2B_GROUP1 = ["en", "es", "éis", "emos"]
_ES_S2B_GROUP2 = [
    "arían", "arías", "arán", "arás", "aríais",
    "aría", "aréis", "aríamos", "aremos", "ará",
    "aré", "erían", "erías", "erán", "erás",
    "eríais", "ería", "eréis", "eríamos", "eremos",
    "erá", "eré", "irían", "irías", "irán",
    "irás", "iríais", "iría", "iréis", "iríamos",
    "iremos", "irá", "iré", "aba", "ada", "ida", "ía",
    "ara", "iera", "ad", "ed", "id", "ase", "iese", "aste", "iste",
    "an", "aban", "ían", "aran", "ieran", "asen", "iesen", "aron",
    "ieron", "ado", "ido", "ando", "iendo", "ió", "ar", "er", "ir",
    "as", "abas", "adas", "idas", "ías", "aras", "ieras", "ases",
    "ieses", "ís", "áis", "abais", "íais", "arais",
    "ierais", "aseis", "ieseis", "asteis", "isteis", "ados", "idos",
    "amos", "ábamos", "íamos", "imos", "áramos",
    "iéramos", "iésemos", "ásemos",
]


def spanish_snowball_stem(word: str) -> str:
    w = word
    if len(w) <= 2:
        return w.translate(_ES_UNACCENT)
    rv = _es_rv(w)
    r1, r2 = _std_r1r2(w, _ES_VOWELS)

    # step 0: attached pronoun
    pron = _ends_in(w, _ES_PRON, rv)
    if pron:
        base = w[: -len(pron)]
        pre_a = _longest_suffix_any(base, _ES_PRON_A)
        pre_b = _longest_suffix_any(base, _ES_PRON_B)
        if pre_a and len(base) - len(pre_a) >= rv:
            w = base.translate(_ES_DEACCENT_PRON)
        elif pre_b and len(base) - len(pre_b) >= rv:
            w = base
        elif (
            base.endswith("yendo")
            and len(base) >= 6
            and base[-6] == "u"
        ):
            # yendo following u: the suffix itself need only be in RV
            # when preceded by u outside
            w = base
        # recompute regions after deletion
        rv = _es_rv(w)
        r1, r2 = _std_r1r2(w, _ES_VOWELS)

    before_s1 = w

    # step 1: standard suffix removal (longest match governs)
    all_s1 = (
        _ES_S1_DELETE_R2
        + _ES_S1_ADOR
        + ["logía", "logías", "ución", "uciones",
           "encia", "encias", "amente", "mente", "idad", "idades",
           "iva", "ivo", "ivas", "ivos"]
    )
    suf = _longest_suffix_any(w, all_s1)
    if suf:
        start = len(w) - len(suf)
        if suf in _ES_S1_DELETE_R2:
            if start >= r2:
                w = w[:start]
        elif suf in _ES_S1_ADOR:
            if start >= r2:
                w = w[:start]
                if w.endswith("ic") and len(w) - 2 >= r2:
                    w = w[:-2]
        elif suf in ("logía", "logías"):
            if start >= r2:
                w = w[:start] + "log"
        elif suf in ("ución", "uciones"):
            if start >= r2:
                w = w[:start] + "u"
        elif suf in ("encia", "encias"):
            if start >= r2:
                w = w[:start] + "ente"
        elif suf == "amente":
            if start >= r1:
                w = w[:start]
                if w.endswith("iv") and len(w) - 2 >= r2:
                    w = w[:-2]
                    if w.endswith("at") and len(w) - 2 >= r2:
                        w = w[:-2]
                elif (
                    w.endswith(("os", "ic", "ad"))
                    and len(w) - 2 >= r2
                ):
                    w = w[:-2]
        elif suf == "mente":
            if start >= r2:
                w = w[:start]
                if (
                    w.endswith(("ante", "able", "ible"))
                    and len(w) - 4 >= r2
                ):
                    w = w[:-4]
        elif suf in ("idad", "idades"):
            if start >= r2:
                w = w[:start]
                if w.endswith("abil") and len(w) - 4 >= r2:
                    w = w[:-4]
                elif w.endswith(("ic", "iv")) and len(w) - 2 >= r2:
                    w = w[:-2]
        elif suf in ("iva", "ivo", "ivas", "ivos"):
            if start >= r2:
                w = w[:start]
                if w.endswith("at") and len(w) - 2 >= r2:
                    w = w[:-2]

    if w == before_s1:
        # step 2a: verb suffixes beginning y (preceded by u)
        s2a = [
            "ya", "ye", "yan", "yen", "yeron", "yendo", "yo",
            "yó", "yas", "yes", "yais", "yamos",
        ]
        suf = _ends_in(w, s2a, rv)
        if suf and len(w) - len(suf) >= 1 and w[-len(suf) - 1] == "u":
            w = w[: -len(suf)]
        else:
            # step 2b: other verb suffixes
            suf = _ends_in(w, _ES_S2B_GROUP1 + _ES_S2B_GROUP2, rv)
            if suf:
                if suf in _ES_S2B_GROUP1 and (
                    suf not in _ES_S2B_GROUP2
                    or len(suf) >= 2
                ):
                    w = w[: -len(suf)]
                    if w.endswith("gu"):
                        w = w[:-1]
                else:
                    w = w[: -len(suf)]

    # step 3: residual suffix
    rv = _es_rv(w)
    suf = _ends_in(
        w, ["os", "a", "o", "á", "í", "ó"], rv
    )
    if suf:
        w = w[: -len(suf)]
    else:
        suf = _ends_in(w, ["e", "é"], rv)
        if suf:
            w = w[:-1]
            if w.endswith("gu") and len(w) - 1 >= rv:
                w = w[:-1]

    return w.translate(_ES_UNACCENT)


# ---------------------------------------------------------------------------
# Snowball French (snowballstem.org/algorithms/french/stemmer.html)
# ---------------------------------------------------------------------------

_FR_VOWELS = (
    "aeiouyâàëéêèïîô"
    "ûù"
)


def _fr_prelude(w: str) -> str:
    """Mark non-vowel u/i/y occurrences by upper-casing them so the
    suffix machinery can treat them as consonants."""
    chars = list(w)
    n = len(chars)

    def is_v(i):
        return 0 <= i < n and chars[i] in _FR_VOWELS

    for i in range(n):
        c = chars[i]
        if c in ("u", "i") and is_v(i - 1) and is_v(i + 1):
            chars[i] = c.upper()
        elif c == "y" and (is_v(i - 1) or is_v(i + 1)):
            chars[i] = "Y"
        elif c == "u" and i > 0 and chars[i - 1] == "q":
            chars[i] = "U"
    return "".join(chars)


def _fr_rv(w: str) -> int:
    n = len(w)
    if n < 3:
        return n
    if w[0] in _FR_VOWELS and w[1] in _FR_VOWELS:
        return 3
    if w[:3] in ("par", "col", "tap"):
        return 3
    # after the first vowel not at the beginning of the word
    for i in range(1, n):
        if w[i] in _FR_VOWELS:
            return i + 1
    return n


_FR_S1_DELETE_R2 = [
    "ance", "iqUe", "isme", "able", "iste", "eux", "ances", "iqUes",
    "ismes", "ables", "istes",
]
_FR_S1_ATEUR = [
    "atrice", "ateur", "ation", "atrices", "ateurs", "ations",
]
_FR_S2A = [
    "îmes", "ît", "îtes", "i", "ie", "ies", "ir", "ira",
    "irai", "iraIent", "irais", "irait", "iras", "irent", "irez",
    "iriez", "irions", "irons", "iront", "is", "issaIent", "issais",
    "issait", "issant", "issante", "issantes", "issants", "isse",
    "issent", "isses", "issez", "issiez", "issions", "issons", "it",
]
_FR_S2B_IONS = ["ions"]
_FR_S2B_E = [
    "é", "ée", "ées", "és", "èrent", "er",
    "era", "erai", "eraIent", "erais", "erait", "eras", "erez",
    "eriez", "erions", "erons", "eront", "ez", "iez",
]
_FR_S2B_A = [
    "ât", "âtes", "a", "ai", "aIent", "ais", "ait", "ant",
    "ante", "antes", "ants", "as", "asse", "assent", "asses",
    "assiez", "assions", "âmes",
]


def french_snowball_stem(word: str) -> str:
    w = _fr_prelude(word)
    rv = _fr_rv(w)
    r1, r2 = _std_r1r2(w, _FR_VOWELS)

    before = w
    did_mandatory = False  # amment/emment/ment/ments found

    # ---- step 1: standard suffix removal (longest match governs)
    all_s1 = (
        _FR_S1_DELETE_R2 + _FR_S1_ATEUR + [
            "logie", "logies", "usion", "ution", "usions", "utions",
            "ence", "ences", "ement", "ements", "ité",
            "ités", "if", "ive", "ifs", "ives", "eaux", "aux",
            "euse", "euses", "issement", "issements", "amment",
            "emment", "ment", "ments",
        ]
    )
    suf = _longest_suffix_any(w, all_s1)
    if suf:
        start = len(w) - len(suf)
        if suf in _FR_S1_DELETE_R2:
            if start >= r2:
                w = w[:start]
        elif suf in _FR_S1_ATEUR:
            if start >= r2:
                w = w[:start]
                if w.endswith("ic"):
                    if len(w) - 2 >= r2:
                        w = w[:-2]
                    else:
                        w = w[:-2] + "iqU"
        elif suf in ("logie", "logies"):
            if start >= r2:
                w = w[:start] + "log"
        elif suf in ("usion", "ution", "usions", "utions"):
            if start >= r2:
                w = w[:start] + "u"
        elif suf in ("ence", "ences"):
            if start >= r2:
                w = w[:start] + "ent"
        elif suf in ("ement", "ements"):
            if start >= rv:
                w = w[:start]
                if w.endswith("iv") and len(w) - 2 >= r2:
                    w = w[:-2]
                    if w.endswith("at") and len(w) - 2 >= r2:
                        w = w[:-2]
                elif w.endswith("eus"):
                    if len(w) - 3 >= r2:
                        w = w[:-3]
                    elif len(w) - 3 >= r1:
                        w = w[:-3] + "eux"
                elif (
                    w.endswith(("abl", "iqU"))
                    and len(w) - 3 >= r2
                ):
                    w = w[:-3]
                elif (
                    w.endswith(("ièr", "Ièr"))
                    and len(w) - 3 >= rv
                ):
                    w = w[:-3] + "i"
        elif suf in ("ité", "ités"):
            if start >= r2:
                w = w[:start]
                if w.endswith("abil"):
                    if len(w) - 4 >= r2:
                        w = w[:-4]
                    else:
                        w = w[:-4] + "abl"
                elif w.endswith("ic"):
                    if len(w) - 2 >= r2:
                        w = w[:-2]
                    else:
                        w = w[:-2] + "iqU"
                elif w.endswith("iv") and len(w) - 2 >= r2:
                    w = w[:-2]
        elif suf in ("if", "ive", "ifs", "ives"):
            if start >= r2:
                w = w[:start]
                if w.endswith("at") and len(w) - 2 >= r2:
                    w = w[:-2]
                    if w.endswith("ic"):
                        if len(w) - 2 >= r2:
                            w = w[:-2]
                        else:
                            w = w[:-2] + "iqU"
        elif suf == "eaux":
            w = w[:start] + "eau"
        elif suf == "aux":
            if start >= r1:
                w = w[:start] + "al"
        elif suf in ("euse", "euses"):
            if start >= r2:
                w = w[:start]
            elif start >= r1:
                w = w[:start] + "eux"
        elif suf in ("issement", "issements"):
            if start >= r1 and start >= 1 and w[start - 1] not in _FR_VOWELS:
                w = w[:start]
        elif suf == "amment":
            if start >= rv:
                w = w[:start] + "ant"
                did_mandatory = True
        elif suf == "emment":
            if start >= rv:
                w = w[:start] + "ent"
                did_mandatory = True
        elif suf in ("ment", "ments"):
            if (
                start >= 1
                and w[start - 1] in _FR_VOWELS
                and start - 1 >= rv
            ):
                w = w[:start]
                did_mandatory = True

    step1_changed = w != before

    # ---- step 2a/2b: verb suffixes, only when step 1 found nothing or
    # only one of amment/emment/ment/ments
    if not step1_changed or did_mandatory:
        base = w
        suf = _ends_in(w, _FR_S2A, rv)
        if (
            suf
            and len(w) - len(suf) - 1 >= rv
            and len(w) - len(suf) >= 1
            and w[len(w) - len(suf) - 1] not in _FR_VOWELS
            and w[len(w) - len(suf) - 1] != "H"
        ):
            w = w[: -len(suf)]
        if w == base:
            # step 2b
            suf = _ends_in(w, _FR_S2B_IONS + _FR_S2B_E + _FR_S2B_A, rv)
            if suf:
                start = len(w) - len(suf)
                if suf == "ions":
                    if start >= r2:
                        w = w[:start]
                elif suf in _FR_S2B_E:
                    w = w[:start]
                else:  # a-group
                    w = w[:start]
                    if w.endswith("e") and len(w) - 1 >= rv:
                        w = w[:-1]
        if w != base:
            step1_changed = True

    if step1_changed:
        # ---- step 3
        if w.endswith("Y"):
            w = w[:-1] + "i"
        elif w.endswith("ç"):
            w = w[:-1] + "c"
    else:
        # ---- step 4 (only when steps 1/2 changed nothing)
        if (
            w.endswith("s")
            and len(w) >= 2
            and w[-2] not in "aiouès"
            and not (len(w) >= 3 and w[-3:-1] == "Hi")
        ):
            w = w[:-1]
        rv = _fr_rv(w)
        _, r2 = _std_r1r2(w, _FR_VOWELS)
        suf = _ends_in(w, ["ion"], rv)
        if (
            suf
            and len(w) - 3 >= r2
            and len(w) >= 4
            and w[-4] in "st"
        ):
            w = w[:-3]
        else:
            suf = _ends_in(
                w, ["ier", "ière", "Ier", "Ière"], rv
            )
            if suf:
                w = w[: -len(suf)] + "i"
            elif w.endswith("e") and len(w) - 1 >= rv:
                w = w[:-1]
            elif (
                w.endswith("ë")
                and len(w) - 1 >= rv
                and w.endswith("guë")
            ):
                w = w[:-1]

    # ---- step 5: undouble
    if w.endswith(("enn", "onn", "ett", "ell", "eill")):
        w = w[:-1]

    # ---- step 6: un-accent
    i = len(w) - 1
    seen_non_vowel = False
    while i >= 0:
        if w[i] in _FR_VOWELS or w[i] in "IUY":
            if seen_non_vowel and w[i] in ("é", "è"):
                w = w[:i] + "e" + w[i + 1:]
            break
        seen_non_vowel = True
        i -= 1

    # postlude
    return (
        w.replace("I", "i").replace("U", "u").replace("Y", "y")
    )


def make_spanish_snowball_filter():
    def es_snowball_filter(tokens):
        for t in tokens:
            if t.type != "KeyWord":
                t.term = spanish_snowball_stem(t.term)
        return tokens

    return es_snowball_filter


def make_french_snowball_filter():
    def fr_snowball_filter(tokens):
        for t in tokens:
            if t.type != "KeyWord":
                t.term = french_snowball_stem(t.term)
        return tokens

    return fr_snowball_filter


# ---------------------------------------------------------------------------
# Snowball Italian (snowballstem.org/algorithms/italian/stemmer.html),
# the reference's standalone ``stemmer_it_snowball``
# (analysis/lang/it/stemmer_it_snowball.go; the it analyzer uses the
# light stemmer).
# ---------------------------------------------------------------------------

_IT_VOWELS = "aeiouàèìòù"
_IT_ACUTE = str.maketrans("áéíóú", "àèìòù")

_IT_PRON = [
    "ci", "gli", "la", "le", "li", "lo", "mi", "ne", "si", "ti", "vi",
    "sene", "gliela", "gliele", "glieli", "glielo", "gliene",
    "mela", "mele", "meli", "melo", "mene",
    "tela", "tele", "teli", "telo", "tene",
    "cela", "cele", "celi", "celo", "cene",
    "vela", "vele", "veli", "velo", "vene",
]
_IT_S1_DELETE_R2 = [
    "anza", "anze", "ico", "ici", "ica", "ice", "iche", "ichi",
    "ismo", "ismi", "abile", "abili", "ibile", "ibili", "ista",
    "iste", "isti", "istà", "istè", "istì", "oso", "osi",
    "osa", "ose", "mente", "atrice", "atrici", "ante", "anti",
]
_IT_S2 = [
    "ammo", "ando", "ano", "are", "arono", "asse", "assero", "assi",
    "assimo", "ata", "ate", "ati", "ato", "ava", "avamo", "avano",
    "avate", "avi", "avo", "emmo", "enda", "ende", "endi", "endo",
    "erà", "erai", "eranno", "ere", "erebbe", "erebbero",
    "erei", "eremmo", "eremo", "ereste", "eresti", "erete",
    "erò", "erono", "essero", "ete", "eva", "evamo", "evano",
    "evate", "evi", "evo", "Yamo", "iamo", "immo", "irà",
    "irai", "iranno", "ire", "irebbe", "irebbero", "irei", "iremmo",
    "iremo", "ireste", "iresti", "irete", "irò", "irono",
    "isca", "iscano", "isce", "isci", "isco", "iscono", "issero",
    "ita", "ite", "iti", "ito", "iva", "ivamo", "ivano", "ivate",
    "ivi", "ivo", "ono", "uta", "ute", "uti", "uto", "ar", "ir",
]


def _it_prelude(w: str) -> str:
    w = w.translate(_IT_ACUTE)
    chars = list(w)
    n = len(chars)

    def is_v(i):
        return 0 <= i < n and chars[i] in _IT_VOWELS

    for i in range(n):
        c = chars[i]
        if c in ("u", "i") and is_v(i - 1) and is_v(i + 1):
            chars[i] = c.upper()
        elif c == "u" and i > 0 and chars[i - 1] == "q":
            chars[i] = "U"
    return "".join(chars)


def _it_rv(w: str) -> int:
    n = len(w)
    if n < 3:
        return n
    low = w.lower()
    if low[0] in _IT_VOWELS and low[1] in _IT_VOWELS:
        return 3
    if low[1] not in _IT_VOWELS:
        for i in range(2, n):
            if low[i] in _IT_VOWELS:
                return i + 1
        return n
    if low[0] not in _IT_VOWELS and low[1] in _IT_VOWELS:
        for i in range(2, n):
            if low[i] not in _IT_VOWELS:
                return i + 1
        return n
    return 3


def italian_snowball_stem(word: str) -> str:
    w = _it_prelude(word)
    rv = _it_rv(w)
    r1, r2 = _std_r1r2(w.lower(), _IT_VOWELS)

    # step 0: attached pronoun, preceded by ando/endo (delete) or
    # ar/er/ir (replace the pronoun by e), the preceding part in RV
    pron = _ends_in(w, _IT_PRON, rv)
    if pron:
        base = w[: -len(pron)]
        pre_a = _longest_suffix_any(base.lower(), ["ando", "endo"])
        pre_b = _longest_suffix_any(base.lower(), ["ar", "er", "ir"])
        if pre_a and len(base) - len(pre_a) >= rv:
            w = base
        elif pre_b and len(base) - len(pre_b) >= rv:
            w = base + "e"
        rv = _it_rv(w)
        r1, r2 = _std_r1r2(w.lower(), _IT_VOWELS)

    before = w
    # step 1: standard suffixes (longest match governs)
    all_s1 = _IT_S1_DELETE_R2 + [
        "azione", "azioni", "atore", "atori", "logia", "logie",
        "uzione", "uzioni", "usione", "usioni", "enza", "enze",
        "amento", "amenti", "imento", "imenti", "amente", "ità",
        "ivo", "ivi", "iva", "ive",
    ]
    suf = _longest_suffix_any(w.lower(), all_s1)
    if suf:
        start = len(w) - len(suf)
        lw = w.lower()
        if suf in _IT_S1_DELETE_R2:
            if start >= r2:
                w = w[:start]
        elif suf in ("azione", "azioni", "atore", "atori"):
            if start >= r2:
                w = w[:start]
                if w.lower().endswith("ic") and len(w) - 2 >= r2:
                    w = w[:-2]
        elif suf in ("logia", "logie"):
            if start >= r2:
                w = w[:start] + "log"
        elif suf in ("uzione", "uzioni", "usione", "usioni"):
            if start >= r2:
                w = w[:start] + "u"
        elif suf in ("enza", "enze"):
            if start >= r2:
                w = w[:start] + "ente"
        elif suf in ("amento", "amenti", "imento", "imenti"):
            if start >= rv:
                w = w[:start]
        elif suf == "amente":
            if start >= r1:
                w = w[:start]
                lw = w.lower()
                if lw.endswith("iv") and len(w) - 2 >= r2:
                    w = w[:-2]
                    if w.lower().endswith("at") and len(w) - 2 >= r2:
                        w = w[:-2]
                elif (
                    lw.endswith(("os", "ic"))
                    or lw.endswith("abil")
                ):
                    cut = 4 if lw.endswith("abil") else 2
                    if len(w) - cut >= r2:
                        w = w[:-cut]
        elif suf == "ità":
            if start >= r2:
                w = w[:start]
                lw = w.lower()
                if lw.endswith("abil") and len(w) - 4 >= r2:
                    w = w[:-4]
                elif lw.endswith(("ic", "iv")) and len(w) - 2 >= r2:
                    w = w[:-2]
        elif suf in ("ivo", "ivi", "iva", "ive"):
            if start >= r2:
                w = w[:start]
                if w.lower().endswith("at") and len(w) - 2 >= r2:
                    w = w[:-2]
                    if w.lower().endswith("ic") and len(w) - 2 >= r2:
                        w = w[:-2]

    # step 2: verb suffixes, only when step 1 removed nothing
    if w == before:
        suf = _ends_in(w, _IT_S2, rv)
        if suf:
            w = w[: -len(suf)]

    # step 3a: final vowel (and a preceding i) in RV
    if w and w[-1].lower() in "aeioàèìò" and len(w) - 1 >= rv:
        w = w[:-1]
        if w and w[-1].lower() == "i" and len(w) - 1 >= rv:
            w = w[:-1]
    # step 3b: ch/gh -> c/g in RV
    lw = w.lower()
    if (lw.endswith("ch") or lw.endswith("gh")) and len(w) - 1 >= rv:
        w = w[:-1]

    return w.replace("I", "i").replace("U", "u")


def make_italian_snowball_filter():
    def it_snowball_filter(tokens):
        for t in tokens:
            if t.type != "KeyWord":
                t.term = italian_snowball_stem(t.term)
        return tokens

    return it_snowball_filter


# ---------------------------------------------------------------------------
# Snowball German (snowballstem.org/algorithms/german/stemmer.html),
# the reference's standalone ``stemmer_de_snowball``
# (analysis/lang/de/stemmer_de_snowball.go; the de analyzer itself uses
# the light stemmer).
# ---------------------------------------------------------------------------

_DE_VOWELS = "aeiouyäöü"
_DE_S_ENDING = set("bdfghklmnrt")
_DE_ST_ENDING = set("bdfghklmnt")


def german_snowball_stem(word: str) -> str:
    w = word.replace("ß", "ss")
    # mark u/y between vowels as consonants
    chars = list(w)
    n = len(chars)
    for i in range(1, n - 1):
        if (
            chars[i] in ("u", "y")
            and chars[i - 1] in _DE_VOWELS
            and chars[i + 1] in _DE_VOWELS
        ):
            chars[i] = chars[i].upper()
    w = "".join(chars)
    r1, r2 = _std_r1r2(w.lower(), _DE_VOWELS)
    r1 = max(r1, 3)  # region before R1 must hold >= 3 letters

    def in_r1(start):
        return start >= r1

    def in_r2(start):
        return start >= r2

    # step 1
    suf = _longest_suffix_any(w, ["em", "ern", "er", "e", "en", "es", "s"])
    if suf:
        start = len(w) - len(suf)
        if suf in ("em", "ern", "er"):
            if in_r1(start):
                w = w[:start]
        elif suf in ("e", "en", "es"):
            if in_r1(start):
                w = w[:start]
                if w.endswith("niss"):
                    w = w[:-1]
        elif suf == "s":
            if (
                in_r1(start)
                and start >= 1
                and w[start - 1] in _DE_S_ENDING
            ):
                w = w[:start]

    # step 2
    suf = _longest_suffix_any(w, ["est", "en", "er", "st"])
    if suf:
        start = len(w) - len(suf)
        if suf in ("en", "er", "est"):
            if in_r1(start):
                w = w[:start]
        elif suf == "st":
            if (
                in_r1(start)
                and start >= 4  # st-ending preceded by >= 3 letters
                and w[start - 1] in _DE_ST_ENDING
            ):
                w = w[:start]

    # step 3 (d-suffixes)
    suf = _longest_suffix_any(
        w, ["end", "ung", "ig", "ik", "isch", "lich", "heit", "keit"]
    )
    if suf:
        start = len(w) - len(suf)
        if suf in ("end", "ung"):
            if in_r2(start):
                w = w[:start]
                if (
                    w.endswith("ig")
                    and len(w) - 2 >= r2
                    and (len(w) < 3 or w[-3] != "e")
                ):
                    w = w[:-2]
        elif suf in ("ig", "ik", "isch"):
            if in_r2(start) and (start < 1 or w[start - 1] != "e"):
                w = w[:start]
        elif suf in ("lich", "heit"):
            if in_r2(start):
                w = w[:start]
                sub = _longest_suffix_any(w, ["er", "en"])
                if sub and len(w) - 2 >= r1:
                    w = w[:-2]
        elif suf == "keit":
            if in_r2(start):
                w = w[:start]
                sub = _longest_suffix_any(w, ["lich", "ig"])
                if sub and len(w) - len(sub) >= r2:
                    w = w[: -len(sub)]

    # postlude: lower the markers, strip umlauts
    return (
        w.replace("U", "u").replace("Y", "y")
        .replace("ä", "a").replace("ö", "o").replace("ü", "u")
    )


def make_german_snowball_filter():
    def de_snowball_filter(tokens):
        for t in tokens:
            if t.type != "KeyWord":
                t.term = german_snowball_stem(t.term)
        return tokens

    return de_snowball_filter


# ---------------------------------------------------------------------------
# Generic language-dispatching Snowball filter (``stemmer_snowball``).
# The reference's backing library supports english, spanish, french,
# hungarian, norwegian, russian and swedish; this engine additionally
# has danish, dutch, finnish, romanian and turkish Snowball
# implementations, so those dispatch too.
# ---------------------------------------------------------------------------


def _snowball_stem_fn(language: str):
    lang = language.lower()
    if lang == "english":
        from .porter2 import stem as porter2_stem

        return porter2_stem
    if lang == "spanish":
        return spanish_snowball_stem
    if lang == "french":
        return french_snowball_stem
    if lang == "german":
        return german_snowball_stem
    if lang == "italian":
        return italian_snowball_stem
    if lang == "russian":
        from .lang_extra import russian_stem

        return russian_stem
    if lang == "swedish":
        from .lang_extra import swedish_stem

        return swedish_stem
    if lang == "norwegian":
        from .lang_extra import norwegian_stem

        return norwegian_stem
    if lang == "danish":
        from .lang_extra import danish_stem

        return danish_stem
    if lang == "dutch":
        from .lang_extra import dutch_stem

        return dutch_stem
    if lang == "finnish":
        from .snowball_more import finnish_stem

        return finnish_stem
    if lang == "hungarian":
        from .snowball_more import hungarian_stem

        return hungarian_stem
    if lang == "romanian":
        from .snowball_more import romanian_stem

        return romanian_stem
    if lang == "turkish":
        from .snowball_more import turkish_stem

        return turkish_stem
    if lang == "porter":
        return porter1_stem
    raise ValueError(f"must specify language: unknown {language!r}")


def make_snowball_filter(language: str):
    """``stemmer_snowball``: config-driven Snowball dispatch
    (snowball.go:49-54 requires ``language``)."""
    stem = _snowball_stem_fn(language)

    def snowball_filter(tokens):
        for t in tokens:
            if t.type != "KeyWord":
                t.term = stem(t.term)
        return tokens

    return snowball_filter
