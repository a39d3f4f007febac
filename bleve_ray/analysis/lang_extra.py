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
