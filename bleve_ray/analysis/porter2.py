"""Porter2 (Snowball English) stemmer -- public algorithm from
snowballstem.org/algorithms/english/stemmer.html; the same algorithm behind
the reference's analysis/lang/en stemmer filter (snowball english).

Pure-Python, dictionary-free implementation of the published steps
(0, 1a, 1b, 1c, 2, 3, 4, 5) with R1/R2 regions, short-syllable handling
and the published exceptional forms.
"""

from __future__ import annotations

VOWELS = set("aeiouy")
DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
LI_ENDING = set("cdeghkmnrt")

EXCEPTIONS1 = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl", "sky": "sky",
    "news": "news", "howe": "howe", "atlas": "atlas", "cosmos": "cosmos",
    "bias": "bias", "andes": "andes",
}

EXCEPTIONS2 = {
    "inning", "outing", "canning", "herring", "earring", "proceed",
    "exceed", "succeed",
}


def _is_vowel(word: str, i: int) -> bool:
    return word[i] in VOWELS


def _r1_r2(word: str):
    # special prefixes per spec
    for pre in ("gener", "commun", "arsen"):
        if word.startswith(pre):
            r1 = len(pre)
            break
    else:
        r1 = len(word)
        for i in range(1, len(word)):
            if not _is_vowel(word, i) and _is_vowel(word, i - 1):
                r1 = i + 1
                break
    r2 = len(word)
    for i in range(r1 + 1, len(word)):
        if not _is_vowel(word, i) and _is_vowel(word, i - 1):
            r2 = i + 1
            break
    return r1, r2


def _ends_short_syllable(word: str) -> bool:
    # short syllable: vowel-nonvowel at end, preceded by nonvowel (and the
    # following nonvowel is not w, x or Y), or vowel+nonvowel at start
    n = len(word)
    if n == 2:
        return _is_vowel(word, 0) and not _is_vowel(word, 1)
    if n >= 3:
        c2, v, c1 = word[-3], word[-2], word[-1]
        return (
            v in VOWELS
            and c1 not in VOWELS
            and c1 not in "wxY"
            and c2 not in VOWELS
        )
    return False


def _is_short(word: str, r1: int) -> bool:
    return r1 >= len(word) and _ends_short_syllable(word)


def _contains_vowel(s: str) -> bool:
    return any(ch in VOWELS for ch in s)


def stem(word: str) -> str:
    if len(word) <= 2:
        return word
    word = word.lower()
    if word in EXCEPTIONS1:
        return EXCEPTIONS1[word]
    if word.startswith("'"):
        word = word[1:]
    # mark consonant y
    if word.startswith("y"):
        word = "Y" + word[1:]
    chars = list(word)
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in VOWELS:
            chars[i] = "Y"
    word = "".join(chars)

    r1, r2 = _r1_r2(word)

    # step 0: apostrophe suffixes
    for suf in ("'s'", "'s", "'"):
        if word.endswith(suf):
            word = word[: -len(suf)]
            break

    # step 1a
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith(("ied", "ies")):
        word = word[:-2] if len(word) - 3 > 1 else word[:-1]
    elif word.endswith(("us", "ss")):
        pass
    elif word.endswith("s"):
        if _contains_vowel(word[:-2]):
            word = word[:-1]

    if word in EXCEPTIONS2:
        return word.lower().replace("Y", "y")

    # step 1b
    step1b_done = False
    for suf in ("eedly", "eed"):
        if word.endswith(suf):
            if suffix_in_region(word, suf, r1):
                word = word[: -len(suf)] + "ee"
            step1b_done = True
            break
    if not step1b_done:
        for suf in ("ingly", "edly", "ing", "ed"):
            if word.endswith(suf):
                stem_part = word[: -len(suf)]
                if _contains_vowel(stem_part):
                    word = stem_part
                    if word.endswith(("at", "bl", "iz")):
                        word += "e"
                    elif word.endswith(DOUBLES):
                        word = word[:-1]
                    elif _is_short(word, r1):
                        word += "e"
                    r1, r2 = _r1_r2(word)
                break

    # step 1c: y -> i
    if (
        len(word) > 2
        and word[-1] in "yY"
        and word[-2] not in VOWELS
    ):
        word = word[:-1] + "i"

    # step 2 (suffix -> replacement, must be in R1)
    step2 = [
        ("ization", "ize"), ("ational", "ate"), ("fulness", "ful"),
        ("ousness", "ous"), ("iveness", "ive"), ("tional", "tion"),
        ("biliti", "ble"), ("lessli", "less"), ("entli", "ent"),
        ("ation", "ate"), ("alism", "al"), ("aliti", "al"),
        ("ousli", "ous"), ("iviti", "ive"), ("fulli", "ful"),
        ("enci", "ence"), ("anci", "ance"), ("abli", "able"),
        ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
        ("bli", "ble"), ("ogi", "og"), ("li", ""),
    ]
    for suf, rep in step2:
        if word.endswith(suf):
            if suffix_in_region(word, suf, r1):
                if suf == "ogi":
                    if word.endswith("logi"):
                        word = word[:-1]
                elif suf == "li":
                    if len(word) > 2 and word[-3] in LI_ENDING:
                        word = word[:-2]
                else:
                    word = word[: -len(suf)] + rep
                r1, r2 = _r1_r2(word)
            break

    # step 3
    step3 = [
        ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
        ("icate", "ic"), ("iciti", "ic"), ("ative", ""), ("ical", "ic"),
        ("ness", ""), ("ful", ""),
    ]
    for suf, rep in step3:
        if word.endswith(suf):
            if suffix_in_region(word, suf, r1):
                if suf == "ative":
                    if suffix_in_region(word, suf, r2):
                        word = word[: -len(suf)]
                else:
                    word = word[: -len(suf)] + rep
                r1, r2 = _r1_r2(word)
            break

    # step 4 (delete if in R2)
    step4 = (
        "ement", "ance", "ence", "able", "ible", "ment", "ant", "ent",
        "ism", "ate", "iti", "ous", "ive", "ize", "ion", "al", "er", "ic",
    )
    for suf in step4:
        if word.endswith(suf):
            if suffix_in_region(word, suf, r2):
                if suf == "ion":
                    if len(word) > 3 and word[-4] in "st":
                        word = word[:-3]
                else:
                    word = word[: -len(suf)]
                r1, r2 = _r1_r2(word)
            break

    # step 5
    if word.endswith("e"):
        if len(word) - 1 >= r2 or (
            len(word) - 1 >= r1 and not _ends_short_syllable(word[:-1])
        ):
            word = word[:-1]
    elif word.endswith("ll") and len(word) - 1 >= r2:
        word = word[:-1]

    return word.replace("Y", "y")


def suffix_in_region(word: str, suf: str, region_start: int) -> bool:
    return len(word) - len(suf) >= region_start


def make_porter2_filter():
    from .tokenizers import Token

    def porter2_filter(tokens):
        for t in tokens:
            if t.type != "KeyWord":  # keyword-marked tokens skip stemming
                t.term = stem(t.term)
        return tokens

    return porter2_filter
