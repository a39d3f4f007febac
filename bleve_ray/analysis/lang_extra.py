"""Arabic and Russian stemming (reference analysis/lang/{ar,ru}).

- Arabic: Lucene-style light stemmer (prefix + iterated suffix strip) and
  the letter normalizer, reference arabic_normalize.go / stemmer_ar.go
  (independent implementation of the public Lucene ArabicStemmer rules).
- Russian: the public Snowball russian stemmer algorithm
  (snowballstem.org/algorithms/russian/stemmer.html), which the reference
  wraps via blevesearch/snowballstem (stemmer_ru.go).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

# --- Arabic ----------------------------------------------------------------

_AR_ALEF = "ا"
_AR_YEH = "ي"
_AR_HEH = "ه"
# chars folded to bare letters
_AR_FOLD = {
    "آ": _AR_ALEF,  # alef madda
    "أ": _AR_ALEF,  # alef hamza above
    "إ": _AR_ALEF,  # alef hamza below
    "ى": _AR_YEH,  # dotless yeh
    "ة": _AR_HEH,  # teh marbuta
}
# chars deleted outright: tatweel + harakat (diacritics)
_AR_DELETE = set("ـًٌٍَُِّْ")

_AR_PREFIXES = ["ال", "وال", "بال", "كال", "فال", "لل", "و"]
_AR_SUFFIXES = ["ها", "ان", "ات", "ون", "ين", "يه", "ية", "ه", "ة", "ي"]


def arabic_normalize(term: str) -> str:
    """arabic_normalize.go:60-76: fold alef/yeh/teh-marbuta variants, drop
    tatweel and harakat."""
    out = []
    for ch in term:
        if ch in _AR_DELETE:
            continue
        out.append(_AR_FOLD.get(ch, ch))
    return "".join(out)


def arabic_stem(term: str) -> str:
    """stemmer_ar.go:96-110: strip one prefix (wa- needs length>=4, others
    leave >=2 chars), then suffixes in list order, each leaving >=2 chars."""
    runes = term
    for p in _AR_PREFIXES:
        if runes.startswith(p):
            if len(p) == 1 and len(runes) < 4:
                continue
            if len(p) > 1 and len(runes) - len(p) < 2:
                continue
            runes = runes[len(p):]
            break
    for s in _AR_SUFFIXES:
        if runes.endswith(s) and len(runes) - len(s) >= 2:
            runes = runes[: len(runes) - len(s)]
    return runes


# --- Russian (snowball) ----------------------------------------------------

_RU_VOWELS = set("аеиоуыэюя")

# ending classes; (ending, needs_a_ya_before) — snowball "group 1" endings
# require the preceding letter to be а or я (which stays in the stem)
_RU_PERFECTIVE_GERUND: Sequence[Tuple[str, bool]] = [
    ("в", True), ("вши", True), ("вшись", True),
    ("ив", False), ("ивши", False), ("ившись", False),
    ("ыв", False), ("ывши", False), ("ывшись", False),
]
_RU_ADJECTIVE = [
    "ее", "ие", "ые", "ое", "ими", "ыми", "ей", "ий", "ый", "ой", "ем",
    "им", "ым", "ом", "его", "ого", "ему", "ому", "их", "ых", "ую", "юю",
    "ая", "яя", "ою", "ею",
]
_RU_PARTICIPLE: Sequence[Tuple[str, bool]] = [
    ("ем", True), ("нн", True), ("вш", True), ("ющ", True), ("щ", True),
    ("ивш", False), ("ывш", False), ("ующ", False),
]
_RU_VERB: Sequence[Tuple[str, bool]] = [
    ("ла", True), ("на", True), ("ете", True), ("йте", True), ("ли", True),
    ("й", True), ("л", True), ("ем", True), ("н", True), ("ло", True),
    ("но", True), ("ет", True), ("ют", True), ("ны", True), ("ть", True),
    ("ешь", True), ("нно", True),
    ("ила", False), ("ыла", False), ("ена", False), ("ейте", False),
    ("уйте", False), ("ите", False), ("или", False), ("ыли", False),
    ("ей", False), ("уй", False), ("ил", False), ("ыл", False),
    ("им", False), ("ым", False), ("ен", False), ("ило", False),
    ("ыло", False), ("ено", False), ("ят", False), ("ует", False),
    ("уют", False), ("ит", False), ("ыт", False), ("ены", False),
    ("ить", False), ("ыть", False), ("ишь", False), ("ую", False),
    ("ю", False),
]
_RU_NOUN = [
    "а", "ев", "ов", "ие", "ье", "е", "иями", "ями", "ами", "еи", "ии",
    "и", "ией", "ей", "ой", "ий", "й", "иям", "ям", "ием", "ем", "ам",
    "ом", "о", "у", "ах", "иях", "ях", "ы", "ь", "ию", "ью", "ю", "ия",
    "ья", "я",
]


def _ru_regions(word: str) -> Tuple[int, int]:
    """RV = after the first vowel; R2 = after the first non-vowel following
    a vowel inside R1 (R1 computed the same way over the whole word)."""
    n = len(word)
    rv = n
    for i, ch in enumerate(word):
        if ch in _RU_VOWELS:
            rv = i + 1
            break

    def _r(start: int) -> int:
        for i in range(start, n - 1):
            if word[i] in _RU_VOWELS and word[i + 1] not in _RU_VOWELS:
                return i + 2
        return n

    r1 = _r(0)
    r2 = _r(r1)
    return rv, r2


def _among(
    word: str, rv: int, endings: Sequence
) -> Optional[Tuple[str, bool]]:
    """Longest ending (snowball `among`) that lies inside RV; returns
    (ending, constraint_ok).  Like snowball, the longest textual match is
    chosen FIRST and its а/я precondition checked after — no backtracking
    to shorter entries on constraint failure."""
    best = None
    for e in endings:
        end, g1 = e if isinstance(e, tuple) else (e, False)
        if len(word) - len(end) < rv:
            continue
        if not word.endswith(end):
            continue
        if best is None or len(end) > len(best[0]):
            best = (end, g1)
    if best is None:
        return None
    end, g1 = best
    ok = True
    if g1:
        i = len(word) - len(end) - 1
        ok = i >= rv and word[i] in "ая"
    return end, ok


def russian_stem(word: str) -> str:
    """Snowball russian: step1 (gerund | [reflexive] adjectival/verb/noun),
    step2 (и), step3 (derivational, R2), step4 (нн / superlative / ь)."""
    word = word.replace("ё", "е")
    rv, r2 = _ru_regions(word)

    # step 1
    m = _among(word, rv, _RU_PERFECTIVE_GERUND)
    if m is not None and m[1]:
        word = word[: len(word) - len(m[0])]
    else:
        m = _among(word, rv, ["ся", "сь"])
        if m is not None:
            word = word[: len(word) - len(m[0])]
        m = _among(word, rv, _RU_ADJECTIVE)
        if m is not None:
            word = word[: len(word) - len(m[0])]
            m = _among(word, rv, _RU_PARTICIPLE)
            if m is not None and m[1]:
                word = word[: len(word) - len(m[0])]
        else:
            m = _among(word, rv, _RU_VERB)
            if m is not None and m[1]:
                word = word[: len(word) - len(m[0])]
            else:
                m = _among(word, rv, _RU_NOUN)
                if m is not None:
                    word = word[: len(word) - len(m[0])]

    # step 2: final и
    if word.endswith("и") and len(word) - 1 >= rv:
        word = word[:-1]

    # step 3: derivational, must lie in R2
    for end in ("ость", "ост"):
        if word.endswith(end) and len(word) - len(end) >= r2:
            word = word[: len(word) - len(end)]
            break

    # step 4: tidy up
    m = _among(word, rv, ["нн", "ейше", "ейш", "ь"])
    if m is not None:
        end = m[0]
        if end == "нн":
            word = word[:-1]
        elif end in ("ейше", "ейш"):
            word = word[: len(word) - len(end)]
            if word.endswith("нн") and len(word) - 2 >= rv:
                word = word[:-1]
        else:  # ь
            word = word[:-1]
    return word


# --- Persian ---------------------------------------------------------------

_FA_FOLD = {
    "ی": "ي",  # farsi yeh -> yeh
    "ے": "ي",  # yeh barree -> yeh
    "ک": "ك",  # keheh -> kaf
    "ۀ": "ه",  # heh+yeh -> heh
    "ہ": "ه",  # heh goal -> heh
}


def persian_normalize(term: str) -> str:
    """persian_normalize.go:55-71: fold yeh/kaf/heh variants, drop hamza
    above."""
    out = []
    for ch in term:
        if ch == "ٔ":  # hamza above
            continue
        out.append(_FA_FOLD.get(ch, ch))
    return "".join(out)


# --- Scandinavian snowball stemmers ---------------------------------------
# Independent implementations of the public Snowball swedish/norwegian/
# danish algorithms (snowballstem.org); the reference wraps the generated
# Go code via blevesearch/snowballstem (stemmer_{sv,no,da}.go).


def _scand_r1(word: str, vowels: set) -> int:
    """R1 = after the first non-vowel following a vowel, but at least 3
    chars before it (the snowball p1 adjustment shared by sv/no/da)."""
    n = len(word)
    r1 = n
    for i in range(n - 1):
        if word[i] in vowels and word[i + 1] not in vowels:
            r1 = i + 2
            break
    return max(r1, 3) if r1 < n else r1


def _longest_in_r1(word: str, r1: int, endings) -> str:
    best = ""
    for e in endings:
        if len(e) > len(best) and word.endswith(e) and len(word) - len(e) >= r1:
            best = e
    return best


_SV_VOWELS = set("aeiouyäåö")  # a e i o u y ä å ö
_SV_STEP1 = (
    "a arna erna heterna orna ad e ade ande arne are aste en anden aren "
    "heten ern ar er heter or as arnas ernas ornas es ades andes ens arens "
    "hetens erns at andet het ast"
).split()
_SV_S_ENDING = set("bcdfghjklmnoprtvy")
_SV_STEP2 = ["dd", "gd", "nn", "dt", "gt", "kt", "tt"]


def swedish_stem(word: str) -> str:
    r1 = _scand_r1(word, _SV_VOWELS)
    # step 1: longest suffix, or s after a valid s-ending
    e = _longest_in_r1(word, r1, _SV_STEP1)
    s_ok = (
        word.endswith("s")
        and len(word) - 1 >= r1
        and len(word) >= 2
        and word[-2] in _SV_S_ENDING
    )
    if len(e) >= 1:
        word = word[: len(word) - len(e)]
    elif s_ok:
        word = word[:-1]
    # step 2: shorten double-consonant endings
    if _longest_in_r1(word, r1, _SV_STEP2):
        word = word[:-1]
    # step 3
    e = _longest_in_r1(word, r1, ["lig", "ig", "els"])
    if e:
        word = word[: len(word) - len(e)]
    elif word.endswith("löst") and len(word) - 4 >= r1:
        word = word[:-1]  # löst -> lös
    elif word.endswith("fullt") and len(word) - 5 >= r1:
        word = word[:-1]  # fullt -> full
    return word


_NO_VOWELS = set("aeiouyæåø")  # a e i o u y æ å ø
_NO_STEP1 = (
    "a e ede ande ende ane ene hetene en heten ar er heter as es edes "
    "endes enes hetenes ens hetens ers ets et het ast"
).split()
_NO_S_ENDING = set("bcdfghjlmnoprtvyz")
_NO_STEP3 = "leg eleg ig eig lig elig els lov elov slov hetslov".split()


def norwegian_stem(word: str) -> str:
    r1 = _scand_r1(word, _NO_VOWELS)
    # step 1: longest among suffixes | erte/ert -> er | s after s-ending
    cands = []
    e = _longest_in_r1(word, r1, _NO_STEP1)
    if e:
        cands.append((e, "del"))
    e2 = _longest_in_r1(word, r1, ["erte", "ert"])
    if e2:
        cands.append((e2, "er"))
    if (
        word.endswith("s")
        and len(word) - 1 >= r1
        and len(word) >= 2
        and (
            word[-2] in _NO_S_ENDING
            or (word[-2] == "k" and (len(word) < 3 or word[-3] not in _NO_VOWELS))
        )
    ):
        cands.append(("s", "del"))
    if cands:
        e, action = max(cands, key=lambda c: len(c[0]))
        if action == "er":
            word = word[: len(word) - len(e)] + "er"
        else:
            word = word[: len(word) - len(e)]
    # step 2: dt/vt -> delete t
    if _longest_in_r1(word, r1, ["dt", "vt"]):
        word = word[:-1]
    # step 3
    e = _longest_in_r1(word, r1, _NO_STEP3)
    if e:
        word = word[: len(word) - len(e)]
    return word


_DA_VOWELS = set("aeiouyæåø")
_DA_STEP1 = (
    "hed ethed ered e erede ende erende ene erne ere en heden eren er "
    "heder erer heds es endes erendes enes ernes eres ens hedens erens "
    "ers ets erets et eret"
).split()
_DA_S_ENDING = set("abcdfghjklmnoprtvyzå")
_DA_CONSONANTS = set("bcdfghjklmnpqrstvwxz")


def danish_stem(word: str) -> str:
    r1 = _scand_r1(word, _DA_VOWELS)
    # step 1
    e = _longest_in_r1(word, r1, _DA_STEP1)
    if e:
        word = word[: len(word) - len(e)]
    elif (
        word.endswith("s")
        and len(word) - 1 >= r1
        and len(word) >= 2
        and word[-2] in _DA_S_ENDING
    ):
        word = word[:-1]
    # step 2: gd dt gt kt -> delete last letter
    if _longest_in_r1(word, r1, ["gd", "dt", "gt", "kt"]):
        word = word[:-1]
    # step 3
    if word.endswith("igst") and len(word) - 4 >= r1:
        word = word[:-2]
    e = _longest_in_r1(word, r1, ["elig", "lig", "els", "ig"])
    if e:
        word = word[: len(word) - len(e)]
        if _longest_in_r1(word, r1, ["gd", "dt", "gt", "kt"]):
            word = word[:-1]
    elif word.endswith("løst") and len(word) - 4 >= r1:
        word = word[:-1]
    # step 4: undouble final double consonant in R1
    if (
        len(word) >= 2
        and len(word) - 1 >= r1
        and word[-1] == word[-2]
        and word[-1] in _DA_CONSONANTS
    ):
        word = word[:-1]
    return word


# --- Hindi ------------------------------------------------------------------

# hindi_normalize.go:40-130 (Lucene HindiNormalizer rules): nukta forms,
# candrabindu, chandra/short vowels, long->short vowel folds, virama/zw drop.
_HI_MAP = {
    "ँ": "ं",  # candrabindu -> bindu
    "ऩ": "न",
    "ऱ": "र",
    "ऴ": "ळ",
    "क़": "क",
    "ख़": "ख",
    "ग़": "ग",
    "ज़": "ज",
    "ड़": "ड",
    "ढ़": "ढ",
    "फ़": "फ",
    "य़": "य",
    "ॅ": "े",
    "ॆ": "े",
    "ॉ": "ो",
    "ॊ": "ो",
    "ऍ": "ए",
    "ऎ": "ए",
    "ऑ": "ओ",
    "ऒ": "ओ",
    "ॲ": "अ",
    "आ": "अ",
    "ई": "इ",
    "ऊ": "उ",
    "ॠ": "ऋ",
    "ॡ": "ऌ",
    "ऐ": "ए",
    "औ": "ओ",
    "ी": "ि",
    "ू": "ु",
    "ॄ": "ृ",
    "ॣ": "ॢ",
    "ै": "े",
    "ौ": "ो",
}
_HI_DELETE = {"़", "‍", "‌", "्"}


def hindi_normalize(term: str) -> str:
    out = []
    i = 0
    n = len(term)
    while i < n:
        ch = term[i]
        # dead n (न + virama) -> bindu
        if ch == "न" and i + 1 < n and term[i + 1] == "्":
            out.append("ं")
            i += 2
            continue
        if ch in _HI_DELETE:
            i += 1
            continue
        out.append(_HI_MAP.get(ch, ch))
        i += 1
    return "".join(out)


# indic script composition (reference analysis/lang/in/scripts.go table,
# itself from Lucene IndicNormalizer): (ch0, ch1, ch2|-1) -> composed, per
# script block.  -1 = two-char rule; 0xFF = zero-width joiner slot.
_INDIC_SCRIPTS = [  # (block_lo, block_hi, base, flag)
    (0x0900, 0x097F, 0x0900, 1),      # devanagari
    (0x0980, 0x09FF, 0x0980, 2),      # bengali
    (0x0A00, 0x0A7F, 0x0A00, 4),      # gurmukhi
    (0x0A80, 0x0AFF, 0x0A80, 8),      # gujarati
    (0x0B00, 0x0B7F, 0x0B00, 16),     # oriya
    (0x0B80, 0x0BFF, 0x0B80, 32),     # tamil
    (0x0C00, 0x0C7F, 0x0C00, 64),     # telugu
    (0x0C80, 0x0CFF, 0x0C80, 128),    # kannada
    (0x0D00, 0x0D7F, 0x0D00, 256),    # malayalam
]
_DEV, _BEN, _GUR, _GUJ, _ORI, _TAM, _TEL, _KAN, _MAL = (
    1, 2, 4, 8, 16, 32, 64, 128, 256,
)
_INDIC_DECOMP = [
    (0x05, 0x3E, 0x45, 0x11, _DEV | _GUJ),
    (0x05, 0x3E, 0x46, 0x12, _DEV),
    (0x05, 0x3E, 0x47, 0x13, _DEV | _GUJ),
    (0x05, 0x3E, 0x48, 0x14, _DEV | _GUJ),
    (0x05, 0x3E, -1, 0x06, _DEV | _BEN | _GUR | _GUJ | _ORI),
    (0x05, 0x45, -1, 0x72, _DEV),
    (0x05, 0x45, -1, 0x0D, _GUJ),
    (0x05, 0x46, -1, 0x04, _DEV),
    (0x05, 0x47, -1, 0x0F, _GUJ),
    (0x05, 0x48, -1, 0x10, _GUR | _GUJ),
    (0x05, 0x49, -1, 0x11, _DEV | _GUJ),
    (0x05, 0x4A, -1, 0x12, _DEV),
    (0x05, 0x4B, -1, 0x13, _DEV | _GUJ),
    (0x05, 0x4C, -1, 0x14, _DEV | _GUR | _GUJ),
    (0x06, 0x45, -1, 0x11, _DEV | _GUJ),
    (0x06, 0x46, -1, 0x12, _DEV),
    (0x06, 0x47, -1, 0x13, _DEV | _GUJ),
    (0x06, 0x48, -1, 0x14, _DEV | _GUJ),
    (0x07, 0x57, -1, 0x08, _MAL),
    (0x09, 0x41, -1, 0x0A, _DEV),
    (0x09, 0x57, -1, 0x0A, _TAM | _MAL),
    (0x0E, 0x46, -1, 0x10, _MAL),
    (0x0F, 0x45, -1, 0x0D, _DEV),
    (0x0F, 0x46, -1, 0x0E, _DEV),
    (0x0F, 0x47, -1, 0x10, _DEV),
    (0x0F, 0x57, -1, 0x10, _ORI),
    (0x12, 0x3E, -1, 0x13, _MAL),
    (0x12, 0x4C, -1, 0x14, _TEL | _KAN),
    (0x12, 0x55, -1, 0x13, _TEL),
    (0x12, 0x57, -1, 0x14, _TAM | _MAL),
    (0x13, 0x57, -1, 0x14, _ORI),
    (0x15, 0x3C, -1, 0x58, _DEV),
    (0x16, 0x3C, -1, 0x59, _DEV | _GUR),
    (0x17, 0x3C, -1, 0x5A, _DEV | _GUR),
    (0x1C, 0x3C, -1, 0x5B, _DEV | _GUR),
    (0x21, 0x3C, -1, 0x5C, _DEV | _BEN | _ORI),
    (0x22, 0x3C, -1, 0x5D, _DEV | _BEN | _ORI),
    (0x23, 0x4D, 0xFF, 0x7A, _MAL),
    (0x24, 0x4D, 0xFF, 0x4E, _BEN),
    (0x28, 0x3C, -1, 0x29, _DEV),
    (0x28, 0x4D, 0xFF, 0x7B, _MAL),
    (0x2B, 0x3C, -1, 0x5E, _DEV | _GUR),
    (0x2F, 0x3C, -1, 0x5F, _DEV | _BEN),
    (0x2C, 0x41, 0x41, 0x0B, _TEL),
    (0x30, 0x3C, -1, 0x31, _DEV),
    (0x30, 0x4D, 0xFF, 0x7C, _MAL),
    (0x32, 0x4D, 0xFF, 0x7D, _MAL),
    (0x33, 0x3C, -1, 0x34, _DEV),
    (0x33, 0x4D, 0xFF, 0x7E, _MAL),
    (0x35, 0x41, -1, 0x2E, _TEL),
    (0x3E, 0x45, -1, 0x49, _DEV | _GUJ),
    (0x3E, 0x46, -1, 0x4A, _DEV),
    (0x3E, 0x47, -1, 0x4B, _DEV | _GUJ),
    (0x3E, 0x48, -1, 0x4C, _DEV | _GUJ),
    (0x3F, 0x55, -1, 0x40, _KAN),
    (0x41, 0x41, -1, 0x42, _GUR),
    (0x46, 0x3E, -1, 0x4A, _TAM | _MAL),
    (0x46, 0x42, 0x55, 0x4B, _KAN),
    (0x46, 0x42, -1, 0x4A, _KAN),
    (0x46, 0x46, -1, 0x48, _MAL),
    (0x46, 0x55, -1, 0x47, _TEL | _KAN),
    (0x46, 0x56, -1, 0x48, _TEL | _KAN),
    (0x46, 0x57, -1, 0x4C, _TAM | _MAL),
    (0x47, 0x3E, -1, 0x4B, _BEN | _ORI | _TAM | _MAL),
    (0x47, 0x57, -1, 0x4C, _BEN | _ORI),
    (0x4A, 0x55, -1, 0x4B, _KAN),
    (0x72, 0x3F, -1, 0x07, _GUR),
    (0x72, 0x40, -1, 0x08, _GUR),
    (0x72, 0x47, -1, 0x0F, _GUR),
    (0x73, 0x41, -1, 0x09, _GUR),
    (0x73, 0x42, -1, 0x0A, _GUR),
    (0x73, 0x4B, -1, 0x13, _GUR),
]


def _indic_script(cp: int):
    for lo, hi, base, flag in _INDIC_SCRIPTS:
        if lo <= cp <= hi:
            return base, flag
    return None


def indic_normalize(term: str) -> str:
    """scripts.go normalize/compose: recombine split vowel/nukta sequences
    within one Indic script block."""
    runes = list(term)
    i = 0
    while i < len(runes):
        sc = _indic_script(ord(runes[i]))
        if sc is None:
            i += 1
            continue
        base, flag = sc
        ch0 = ord(runes[i]) - base
        if i + 1 >= len(runes):
            break
        sc1 = _indic_script(ord(runes[i + 1]))
        if sc1 is None or sc1[0] != base:
            i += 1
            continue
        ch1 = ord(runes[i + 1]) - base
        ch2 = -1
        if i + 2 < len(runes):
            if runes[i + 2] == "‍":
                ch2 = 0xFF
            else:
                sc2 = _indic_script(ord(runes[i + 2]))
                ch2 = ord(runes[i + 2]) - base if sc2 and sc2[0] == base else -1
        for d0, d1, d2, comp, flags in _INDIC_DECOMP:
            if d0 == ch0 and (flags & flag) and d1 == ch1 and (
                d2 < 0 or d2 == ch2
            ):
                runes[i] = chr(base + comp)
                del runes[i + 1]
                if d2 >= 0:
                    del runes[i + 1]
                break
        i += 1
    return "".join(runes)


# hindi_stemmer_filter.go: strip the longest of the length-5..1 suffix
# classes, each requiring the word to be strictly longer than the suffix+1.
_HI_SUF5 = "ाएंगी ाएंगे ाऊंगी ाऊंगा ाइयाँ ाइयों ाइयां".split()
_HI_SUF4 = (
    "ाएगी ाएगा ाओगी ाओगे एंगी ेंगी एंगे ेंगे ूंगी ूंगा ातीं "
    "नाओं नाएं ताओं ताएं ियाँ ियों ियां"
).split()
_HI_SUF3 = (
    "ाकर ाइए ाईं ाया ेगी ेगा ोगी ोगे ाने ाना ाते ाती ाता "
    "तीं ाओं ाएं ुओं ुएं ुआं"
).split()
_HI_SUF2 = "कर ाओ िए ाई ाए ने नी ना ते ीं ती ता ाँ ां ों ें".split()
_HI_SUF1 = list("ोेूुीिा")


def hindi_stem(word: str) -> str:
    n = len(word)
    for ln, sufs in ((5, _HI_SUF5), (4, _HI_SUF4), (3, _HI_SUF3),
                     (2, _HI_SUF2), (1, _HI_SUF1)):
        if n > ln + 1 and any(word.endswith(s) for s in sufs):
            return word[: n - ln]
    return word


# --- Dutch (snowball) -------------------------------------------------------

_NL_VOWELS = set("aeiouyè")
_NL_ACCENT = str.maketrans("äëïöüáéíóú", "aeiouaeiou")


def _nl_regions(word: str):
    n = len(word)
    r1 = n
    for i in range(n - 1):
        if word[i].lower() in _NL_VOWELS and word[i + 1].lower() not in _NL_VOWELS:
            r1 = i + 2
            break
    r1_adj = max(r1, 3) if r1 < n else r1
    r2 = n
    for i in range(r1, n - 1):
        if word[i].lower() in _NL_VOWELS and word[i + 1].lower() not in _NL_VOWELS:
            r2 = i + 2
            break
    return r1_adj, r2


def _nl_undouble(word: str) -> str:
    if word.endswith(("kk", "dd", "tt")):
        return word[:-1]
    return word


def dutch_stem(word: str) -> str:
    """Public Snowball dutch algorithm (snowballstem.org); the reference
    wraps the generated Go code (analysis/lang/nl/stemmer_nl.go)."""
    word = word.translate(_NL_ACCENT)
    # mark consonantal i/y: initial y, y after vowel, i between vowels
    chars = list(word)
    n = len(chars)
    for i, ch in enumerate(chars):
        if ch == "y" and (i == 0 or chars[i - 1] in _NL_VOWELS):
            chars[i] = "Y"
        elif (
            ch == "i"
            and 0 < i < n - 1
            and chars[i - 1] in _NL_VOWELS
            and chars[i + 1] in _NL_VOWELS
        ):
            chars[i] = "I"
    word = "".join(chars)
    r1, r2 = _nl_regions(word)

    def in_r1(suf):
        return word.endswith(suf) and len(word) - len(suf) >= r1

    # step 1 — snowball among: the longest TEXTUALLY matching suffix is
    # chosen first; if its R1/ending constraint fails, nothing happens
    # (no fallback to a shorter entry)
    for suf in ("heden", "ene", "en", "se", "s"):
        if not word.endswith(suf):
            continue
        if suf == "heden":
            if in_r1(suf):
                word = word[:-5] + "heid"
        elif suf in ("ene", "en"):
            k = len(suf)
            if (
                in_r1(suf)
                and len(word) > k
                and word[-k - 1] not in _NL_VOWELS
                and not word.endswith("gem" + suf)
            ):
                word = _nl_undouble(word[: -k])
        else:  # se / s
            k = len(suf)
            if (
                in_r1(suf)
                and len(word) > k
                and word[-k - 1] not in _NL_VOWELS
                and word[-k - 1] != "j"
            ):
                word = word[: -k]
        break

    # step 2: final e after non-vowel
    e_found = False
    if (
        word.endswith("e")
        and len(word) - 1 >= r1
        and len(word) > 1
        and word[-2] not in _NL_VOWELS
    ):
        e_found = True
        word = _nl_undouble(word[:-1])

    # step 3a: heid
    if (
        word.endswith("heid")
        and len(word) - 4 >= r2
        and (len(word) < 5 or word[-5] != "c")
    ):
        word = word[:-4]
        if (
            word.endswith("en")
            and len(word) - 2 >= _nl_regions(word)[0]
            and len(word) > 2
            and word[-3] not in _NL_VOWELS
            and not word.endswith("gemen")
        ):
            word = _nl_undouble(word[:-2])
    r1, r2 = _nl_regions(word)

    def in_r2(suf):
        return word.endswith(suf) and len(word) - len(suf) >= r2

    # step 3b: derivational suffixes (longest relevant first)
    if in_r2("end") or in_r2("ing"):
        word = word[:-3]
        r1, r2 = _nl_regions(word)
        if in_r2("ig") and (len(word) < 3 or word[-3] != "e"):
            word = word[:-2]
        else:
            word = _nl_undouble(word)
    elif in_r2("ig") and (len(word) < 3 or word[-3] != "e"):
        word = word[:-2]
    elif in_r2("lijk"):
        word = word[:-4]
        # repeat step 2
        r1b, _ = _nl_regions(word)
        if (
            word.endswith("e")
            and len(word) - 1 >= r1b
            and len(word) > 1
            and word[-2] not in _NL_VOWELS
        ):
            word = _nl_undouble(word[:-1])
    elif in_r2("baar"):
        word = word[:-4]
    elif in_r2("bar") and e_found:
        word = word[:-3]

    # step 4: undouble vowel — C + vv + C (v in aeou, last C not I)
    if len(word) >= 4:
        c1, v1, v2, c2 = word[-4], word[-3], word[-2], word[-1]
        if (
            c1 not in _NL_VOWELS
            and v1 == v2
            and v1 in "aeou"
            and c2 not in _NL_VOWELS
            and c2 != "I"
        ):
            word = word[:-2] + word[-1]

    return word.replace("I", "i").replace("Y", "y")


# --- Sorani Kurdish (ckb) ---------------------------------------------------

import unicodedata as _ud

_CKB_HARAKAT = set("ـًٌٍَُِّْ")


def sorani_normalize(term: str) -> str:
    """sorani_normalize.go:70-110: yeh/kaf folds, heh+zwnj -> ae, final
    heh -> ae, teh marbuta -> ae, heh doachashmee -> heh, initial reh ->
    rreh, drop tatweel/harakat/format chars."""
    out: List[str] = []
    n = len(term)
    for i, ch in enumerate(term):
        if ch in ("ي", "ى"):
            out.append("ی")
        elif ch == "ك":
            out.append("ک")
        elif ch == "‌":  # zwnj: heh before it becomes ae
            if out and out[-1] == "ه":
                out[-1] = "ە"
        elif ch == "ه":
            out.append("ە" if i == n - 1 else "ه")
        elif ch == "ة":
            out.append("ە")
        elif ch == "ھ":
            out.append("ه")
        elif ch == "ر":
            out.append("ڕ" if not out else "ر")
        elif ch == "ڒ":
            out.append("ڕ")
        elif ch in _CKB_HARAKAT:
            continue
        elif _ud.category(ch) == "Cf":
            continue
        else:
            out.append(ch)
    return "".join(out)


def sorani_stem(word: str) -> str:
    """sorani_stemmer_filter.go:45-122 (Lucene SoraniStemmer rules):
    postposition, possessive pronoun, then the ezafe/definite/plural
    chain; each guarded by a minimum remaining length."""
    n = len(word)
    # postposition
    if n > 5 and word.endswith("دا"):
        word = word[:-2]
    elif n > 4 and word.endswith("نا"):
        word = word[:-1]
    elif n > 6 and word.endswith("ەوە"):
        word = word[:-3]
    n = len(word)
    # possessive pronoun
    if n > 6 and (
        word.endswith("مان") or word.endswith("یان") or word.endswith("تان")
    ):
        word = word[:-3]
        n = len(word)
    if n > 6 and word.endswith("ێکی"):
        return word[:-3]
    if n > 7 and word.endswith("یەکی"):
        return word[:-4]
    if n > 5 and word.endswith("ێک"):
        return word[:-2]
    if n > 6 and word.endswith("یەک"):
        return word[:-3]
    if n > 6 and word.endswith("ەکە"):
        return word[:-3]
    if n > 5 and word.endswith("کە"):
        return word[:-2]
    if n > 7 and word.endswith("ەکان"):
        return word[:-4]
    if n > 6 and word.endswith("کان"):
        return word[:-3]
    if n > 7 and word.endswith("یانی"):
        return word[:-4]
    if n > 6 and word.endswith("انی"):
        return word[:-3]
    if n > 6 and word.endswith("یان"):
        return word[:-3]
    if n > 5 and word.endswith("ان"):
        return word[:-2]
    if n > 7 and word.endswith("یانە"):
        return word[:-4]
    if n > 6 and word.endswith("انە"):
        return word[:-3]
    if n > 5 and (word.endswith("ایە") or word.endswith("ەیە")):
        return word[:-2]
    if n > 4 and word.endswith("ە"):
        return word[:-1]
    if n > 4 and word.endswith("ی"):
        return word[:-1]
    return word
