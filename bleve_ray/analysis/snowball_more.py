"""Snowball stemmers for Finnish, Hungarian, Romanian and Turkish.

Independent Python implementations of the published Snowball algorithms
(snowballstem.org); the reference wires the generated Go equivalents
into its analyzers (analysis/lang/{fi,hu,ro,tr}/stemmer_*.go via
github.com/blevesearch/snowballstem).

Snowball `among` semantics used throughout: pick the LONGEST matching
suffix that lies inside the region, run its condition once, and if the
condition fails do nothing (no backtracking to shorter alternatives).
"""

from __future__ import annotations

from typing import Iterable, Optional, Tuple

# --------------------------------------------------------------------------
# shared region helpers


def _std_r1(word: str, vowels: str) -> int:
    """Standard R1: position after the first non-vowel following a
    vowel (len(word) if none)."""
    for i in range(1, len(word)):
        if word[i] not in vowels and word[i - 1] in vowels:
            return i + 1
    return len(word)


def _std_r2(word: str, r1: int, vowels: str) -> int:
    for i in range(r1 + 1, len(word)):
        if word[i] not in vowels and word[i - 1] in vowels:
            return i + 1
    return len(word)


def _longest_suffix(word: str, region_start: int,
                    suffixes: Iterable[str]) -> Optional[str]:
    """Longest suffix of `word` lying entirely within word[region_start:]."""
    best = None
    for s in suffixes:
        if word.endswith(s) and len(word) - len(s) >= region_start:
            if best is None or len(s) > len(best):
                best = s
    return best


# --------------------------------------------------------------------------
# Finnish (snowballstem.org/algorithms/finnish/stemmer.html)

_FI_V1 = "aeiouyäö"  # a e i o u y ä ö
_FI_V2 = "aeiouäö"  # restricted: no y
_FI_LONG = ("aa", "ee", "ii", "oo", "uu", "ää", "öö")
_FI_STEP1 = ("kaan", "kään", "sti", "kin", "han", "hän",
             "ko", "kö", "pa", "pä")
_FI_STEP2 = ("nsa", "nsä", "mme", "nne", "si", "ni", "an",
             "än", "en")
_FI_STEP3 = ("siin", "tten", "seen", "han", "hen", "hin", "hon",
             "hän", "hön", "hun", "hyn", "den", "tta",
             "ttä", "ssa", "ssä", "sta", "stä", "lla",
             "llä", "lta", "ltä", "lle", "ksi", "ine", "ta",
             "tä", "na", "nä", "a", "ä", "n")
_FI_STEP4 = ("impi", "impa", "impä", "immi", "imma", "immä",
             "mpi", "mpa", "mpä", "mmi", "mma", "mmä",
             "eja", "ejä")
_FI_HXN = {"han": "a", "hen": "e", "hin": "i", "hon": "o", "hun": "u",
           "hyn": "y", "hän": "ä", "hön": "ö"}


def finnish_stem(word: str) -> str:
    r1 = _std_r1(word, _FI_V1)
    r2 = _std_r2(word, r1, _FI_V1)
    ending_removed = False

    # step 1: particles etc.
    s = _longest_suffix(word, r1, _FI_STEP1)
    if s == "sti":
        if len(word) - 3 >= r2:
            word = word[:-3]
    elif s is not None:
        if word[-len(s) - 1 : -len(s)] in "nt" + _FI_V1 and word[: -len(s)]:
            word = word[: -len(s)]

    # step 2: possessives
    s = _longest_suffix(word, r1, _FI_STEP2)
    if s == "si":
        if word[-3:-2] != "k":
            word = word[:-2]
    elif s == "ni":
        word = word[:-2]
        if word.endswith("kse"):
            word = word[:-1] + "i"
    elif s == "an":
        if word[-4:-2] in ("ta", "na") or word[-5:-2] in (
                "ssa", "sta", "lla", "lta"):
            word = word[:-2]
    elif s == "än":
        if word[-4:-2] in ("tä", "nä") or word[-5:-2] in (
                "ssä", "stä", "llä", "ltä"):
            word = word[:-2]
    elif s == "en":
        if word[-5:-2] in ("lle", "ine"):
            word = word[:-2]
    elif s is not None:  # nsa nsä mme nne
        word = word[:-3]

    # step 3: cases
    s = _longest_suffix(word, r1, _FI_STEP3)
    if s in _FI_HXN:
        if word[-4:-3] == _FI_HXN[s]:
            word = word[:-3]
            ending_removed = True
    elif s in ("siin", "den", "tten"):
        n = len(s)
        if word[-n - 1 : -n] == "i" and word[-n - 2 : -n - 1] in _FI_V2:
            word = word[:-n]
            ending_removed = True
    elif s == "seen":
        if word[-6:-4] in _FI_LONG:
            word = word[:-4]
            ending_removed = True
    elif s in ("a", "ä"):
        if (len(word) >= 3 and word[-2] in _FI_V1
                and word[-3] not in _FI_V1):
            word = word[:-1]
            ending_removed = True
    elif s in ("tta", "ttä"):
        if word[-4:-3] == "e":
            word = word[:-3]
            ending_removed = True
    elif s == "n":
        word = word[:-1]
        ending_removed = True
        if word[-2:] in _FI_LONG or word[-2:] == "ie":
            word = word[:-1]
    elif s is not None:
        word = word[: -len(s)]
        ending_removed = True

    # step 4: other endings (R2)
    s = _longest_suffix(word, r2, _FI_STEP4)
    if s in ("mpi", "mpa", "mpä", "mmi", "mma", "mmä"):
        if word[-5:-3] != "po":
            word = word[:-3]
    elif s is not None:
        word = word[: -len(s)]

    # step 5: plurals
    r1 = min(r1, len(word))
    if ending_removed:
        if len(word) > r1 and word[-1:] in "ij" and len(word) - 1 >= r1:
            word = word[:-1]
    else:
        if (word.endswith("t") and len(word) - 1 >= r1
                and word[-2:-1] in _FI_V1):
            word = word[:-1]
            if word[-4:] == "imma" and len(word) - 4 >= r2:
                word = word[:-4]
            elif (word[-3:] == "mma" and len(word) - 3 >= r2
                  and word[-5:-3] != "po"):
                word = word[:-3]

    # step 6: tidying (within R1)
    if len(word) >= r1:
        if len(word) - 2 >= r1 and word[-2:] in _FI_LONG:
            word = word[:-1]
        if (len(word) - 1 >= r1 and len(word) >= 2
                and word[-1] in "aäei" and word[-2] not in _FI_V1):
            word = word[:-1]
        if len(word) - 2 >= r1 and word[-2:] in ("oj", "uj"):
            word = word[:-1]
        if len(word) - 2 >= r1 and word[-2:] == "jo":
            word = word[:-1]
    # final: word ends double consonant + zero or more vowels ->
    # drop one consonant of the pair
    i = len(word) - 1
    while i >= 0 and word[i] in _FI_V1:
        i -= 1
    if (i >= 1 and word[i] not in _FI_V1 and word[i] == word[i - 1]):
        word = word[:i] + word[i + 1 :]
    return word

# --------------------------------------------------------------------------
# Hungarian (snowballstem.org/algorithms/hungarian/stemmer.html)

_HU_V = "aáeéiíoóöőuúüű"
_HU_DIGRAPHS = ("cs", "dz", "dzs", "gy", "ly", "ny", "sz", "ty", "zs")
_HU_DOUBLES = ("bb", "cc", "ccs", "dd", "ff", "gg", "ggy", "jj", "kk",
               "ll", "lly", "mm", "nn", "nny", "pp", "rr", "ss", "ssz",
               "tt", "tty", "vv", "zz", "zzs")
_HU_STEP2 = ("képpen", "onként", "enként", "anként", "képp", "ként",
             "ban", "ben", "nak", "nek", "val", "vel", "tól", "től",
             "ról", "ről", "ból", "ből", "hoz", "hez", "höz", "nál",
             "nél", "ért", "kor", "ba", "be", "ra", "re", "ig", "at",
             "et", "ot", "öt", "ul", "ül", "vá", "vé", "en", "on",
             "an", "ön", "n", "t")
_HU_STEP6 = ("oké", "öké", "aké", "eké", "áké", "áéi", "éké", "ééi",
             "ké", "éi", "éé", "é")
_HU_STEP7 = ("ánk", "ájuk", "ám", "ád", "á", "énk", "éjük", "ém",
             "éd", "é", "ünk", "unk", "juk", "jük", "uk", "ük", "em",
             "om", "am", "od", "ed", "ad", "öd", "d", "ja", "je",
             "a", "e", "o", "m", "nk")
_HU_STEP8 = ("jaitok", "jeitek", "jaink", "jeink", "aitok", "eitek",
             "áitok", "éitek", "jaim", "jeim", "jaid", "jeid", "eim",
             "aim", "aid", "eid", "áim", "áid", "éim", "éid", "aink",
             "eink", "áink", "éink", "jaik", "jeik", "aik", "eik",
             "áik", "éik", "itek", "im", "id", "ai", "ei", "ái",
             "éi", "ink", "ik", "i")
_HU_STEP9 = ("ák", "ék", "ök", "ok", "ek", "ak", "k")


def _hu_r1(word: str) -> int:
    """Hungarian R1 (mark_regions): vowel-initial words mark after the
    first consonant run's digraph (one consonant = one mark, a digraph
    counts as one); consonant-initial words mark after the first vowel."""
    if not word:
        return 0
    if word[0] in _HU_V:
        for i in range(1, len(word)):
            if word[i] not in _HU_V:
                if word[i : i + 3] in _HU_DIGRAPHS:
                    return i + 3
                if word[i : i + 2] in _HU_DIGRAPHS:
                    return i + 2
                return i + 1
        return len(word)
    for i in range(1, len(word)):
        if word[i] in _HU_V:
            return i + 1
    return len(word)


def _hu_undouble(word: str) -> str:
    """Remove one consonant of a final double (incl. ccs/ssz/... style
    doubled digraphs, which reduce to the digraph)."""
    for d in sorted(_HU_DOUBLES, key=len, reverse=True):
        if word.endswith(d):
            if len(d) == 3:  # ccs -> cs etc.
                return word[:-3] + d[1:]
            return word[:-1]
    return word


def hungarian_stem(word: str) -> str:
    r1 = _hu_r1(word)

    # step 1: instrumental case (al/el preceded by double consonant)
    if (word.endswith(("al", "el")) and len(word) - 2 >= r1
            and any(word[: -2].endswith(d) for d in _HU_DOUBLES)):
        word = _hu_undouble(word[:-2])

    # step 2: frequent cases
    s = _longest_suffix(word, r1, _HU_STEP2)
    if s is not None:
        word = word[: -len(s)]
        if word.endswith("á"):
            word = word[:-1] + "a"
        elif word.endswith("é"):
            word = word[:-1] + "e"

    # step 3: special cases
    s = _longest_suffix(word, r1, ("ánként", "án", "én"))
    if s is not None:
        word = word[: -len(s)] + ("e" if s == "én" else "a")

    # step 4: other cases
    s = _longest_suffix(
        word, r1, ("astul", "estül", "ástul", "éstül", "stul", "stül"))
    if s == "ástul":
        word = word[:-5] + "a"
    elif s == "éstül":
        word = word[:-5] + "e"
    elif s is not None:
        word = word[: -len(s)]

    # step 5: factive case (á/é preceded by double consonant)
    if (word.endswith(("á", "é")) and len(word) - 1 >= r1
            and any(word[:-1].endswith(d) for d in _HU_DOUBLES)):
        word = _hu_undouble(word[:-1])

    # step 6: owned
    s = _longest_suffix(word, r1, _HU_STEP6)
    if s in ("áké", "áéi"):
        word = word[: -len(s)] + "a"
    elif s in ("éké", "ééi", "éé"):
        word = word[: -len(s)] + "e"
    elif s is not None:
        word = word[: -len(s)]

    # step 7: singular owner
    s = _longest_suffix(word, r1, _HU_STEP7)
    if s in ("ánk", "ájuk", "ám", "ád", "á"):
        word = word[: -len(s)] + "a"
    elif s in ("énk", "éjük", "ém", "éd", "é"):
        word = word[: -len(s)] + "e"
    elif s is not None:
        word = word[: -len(s)]

    # step 8: plural owner
    s = _longest_suffix(word, r1, _HU_STEP8)
    if s is not None:
        if s.startswith("á"):
            word = word[: -len(s)] + "a"
        elif s.startswith("é"):
            word = word[: -len(s)] + "e"
        else:
            word = word[: -len(s)]

    # step 9: plural
    s = _longest_suffix(word, r1, _HU_STEP9)
    if s == "ák":
        word = word[:-2] + "a"
    elif s == "ék":
        word = word[:-2] + "e"
    elif s is not None:
        word = word[: -len(s)]
    return word

# --------------------------------------------------------------------------
# Romanian (snowballstem.org/algorithms/romanian/stemmer.html); cedilla
# forms (ş U+015F, ţ U+0163) like the reference's snowball vintage

_RO_V = "aăâeiîou"


def _ro_prelude(word: str) -> str:
    """i/u between vowels become I/U (treated as consonants)."""
    s = list(word)
    for i in range(1, len(s) - 1):
        if s[i] in "iu" and s[i - 1] in _RO_V and s[i + 1] in _RO_V:
            s[i] = s[i].upper()
    return "".join(s)


def _ro_rv(word: str) -> int:
    """Romance RV: second letter consonant -> after next vowel; first two
    letters vowels -> after next consonant; else after third letter."""
    n = len(word)
    if n < 3:
        return n
    if word[1] not in _RO_V:
        for i in range(2, n):
            if word[i] in _RO_V:
                return i + 1
        return n
    if word[0] in _RO_V and word[1] in _RO_V:
        for i in range(2, n):
            if word[i] not in _RO_V:
                return i + 1
        return n
    return 3


_RO_STEP0 = {
    "ul": "", "ului": "",
    "aua": "a",
    "ea": "e", "ele": "e", "elor": "e",
    "ii": "i", "iua": "i", "iei": "i", "iile": "i", "iilor": "i",
    "ilor": "i",
    "ile": "i",  # special: not preceded by ab
    "atei": "at",
    "aţie": "aţi", "aţia": "aţi",
}
_RO_STEP1 = {
    "abilitate": "abil", "abilitati": "abil", "abilităi": "abil",
    "abilităţi": "abil",
    "ibilitate": "ibil",
    "ivitate": "iv", "ivitati": "iv", "ivităi": "iv", "ivităţi": "iv",
    "icitate": "ic", "icitati": "ic", "icităi": "ic", "icităţi": "ic",
    "icator": "ic", "icatori": "ic",
    "iciv": "ic", "iciva": "ic", "icive": "ic", "icivi": "ic",
    "icivă": "ic",
    "ical": "ic", "icala": "ic", "icale": "ic", "icali": "ic",
    "icală": "ic",
    "ativ": "at", "ativa": "at", "ative": "at", "ativi": "at",
    "ativă": "at", "aţiune": "at", "atoare": "at", "ator": "at",
    "atori": "at", "ătoare": "at", "ător": "at", "ători": "at",
    "itiv": "it", "itiva": "it", "itive": "it", "itivi": "it",
    "itivă": "it", "iţiune": "it", "itoare": "it", "itor": "it",
    "itori": "it",
}
_RO_STEP2_DELETE = (
    "at", "ata", "ată", "ati", "ate", "ut", "uta", "ută", "uti",
    "ute", "it", "ita", "ită", "iti", "ite", "ic", "ica", "ice",
    "ici", "ică", "abil", "abila", "abile", "abili", "abilă",
    "ibil", "ibila", "ibile", "ibili", "ibilă", "oasa", "oasă",
    "oase", "os", "osi", "oşi", "ant", "anta", "ante", "anti",
    "antă", "ator", "atori", "itate", "itati", "ităi", "ităţi",
    "iv", "iva", "ive", "ivi", "ivă",
)
_RO_STEP2_IST = ("ism", "isme", "ist", "ista", "iste", "isti",
                 "istă", "işti")
_RO_STEP3_COND = (
    "are", "ere", "ire", "âre", "ind", "ând", "indu", "ându", "eze",
    "ească", "ez", "ezi", "ează", "esc", "eşti", "eşte", "ăsc",
    "ăşti", "ăşte", "am", "ai", "au", "eam", "eai", "ea", "eaţi",
    "eau", "iam", "iai", "ia", "iaţi", "iau", "ui", "aşi", "arăm",
    "arăţi", "ară", "uşi", "urăm", "urăţi", "ură", "işi", "irăm",
    "irăţi", "iră", "âi", "âşi", "ârăm", "ârăţi", "âră",
)
_RO_STEP3_UNCOND = (
    "ăm", "aţi", "em", "eţi", "im", "iţi", "âm", "âţi", "seşi",
    "serăm", "serăţi", "seră", "sei", "se", "sesem", "seseşi",
    "sesese", "seserăm", "seserăţi", "seseră", "sese",
)


def romanian_stem(word: str) -> str:
    word = _ro_prelude(word)
    r1 = _std_r1(word, _RO_V)
    r2 = _std_r2(word, r1, _RO_V)
    rv = _ro_rv(word)

    # step 0: plurals etc. (R1)
    s = _longest_suffix(word, r1, _RO_STEP0)
    if s is not None and not (s == "ile" and word[: -3].endswith("ab")):
        word = word[: -len(s)] + _RO_STEP0[s]

    # step 1: combining suffixes (R1), repeated
    removed = False
    while True:
        s = _longest_suffix(word, r1, _RO_STEP1)
        if s is None:
            break
        word = word[: -len(s)] + _RO_STEP1[s]
        removed = True

    # step 2: standard suffixes (R2)
    s = _longest_suffix(
        word, r2,
        _RO_STEP2_DELETE + ("iune", "iuni") + _RO_STEP2_IST)
    if s in ("iune", "iuni"):
        if word[-len(s) - 1 : -len(s)] == "ţ":
            word = word[: -len(s) - 1] + "t"
            removed = True
    elif s in _RO_STEP2_IST:
        word = word[: -len(s)] + "ist"
        removed = True
    elif s is not None:
        word = word[: -len(s)]
        removed = True

    # step 3: verb suffixes (RV), only if steps 1-2 removed nothing
    if not removed:
        s = _longest_suffix(word, rv,
                            _RO_STEP3_COND + _RO_STEP3_UNCOND)
        if s in _RO_STEP3_UNCOND:
            word = word[: -len(s)]
        elif s is not None:
            prev = word[-len(s) - 1 : -len(s)]
            # delete only if preceded by consonant or u (the preceding
            # char must also be inside RV)
            if (len(word) - len(s) - 1 >= rv
                    and (prev == "u" or (prev and prev not in _RO_V))):
                word = word[: -len(s)]

    # step 4: final vowel (RV)
    s = _longest_suffix(word, rv, ("a", "e", "i", "ie", "ă"))
    if s is not None:
        word = word[: -len(s)]

    # postlude
    return word.replace("I", "i").replace("U", "u")

# --------------------------------------------------------------------------
# Turkish (snowballstem.org/algorithms/turkish/stemmer.html, Kapusuz &
# Sever).  Implements the published suffix inventory with the
# vowel-harmony and buffer-consonant (y/n/s after vowel stems) checks and
# the final-consonant devoicing post-process.  The nominal-verb cascade
# is modelled as ordered alternatives (first match wins; stripping lAr
# ends stemming like the original's continue_stemming flag); the rare
# append-vowel-to-vowelless-stem rule is omitted.  Verified against the
# reference vectors (analysis/lang/tr/stemmer_tr_test.go,
# analyzer_tr_test.go).

_TR_V = "aeıioöuü"
# suffix vowel -> allowed last stem vowels (2-form A and 4-form U harmony)
_TR_HARMONY = {"a": "aıou", "e": "eiöü",
               "ı": "aı", "i": "ei", "u": "ou", "ü": "öü"}


def _tr_nvowels(word: str) -> int:
    return sum(c in _TR_V for c in word)


def _tr_harmony_ok(word: str, boundary: int) -> bool:
    """First vowel left of the boundary must license the first vowel
    right of it."""
    stem_v = next((c for c in reversed(word[:boundary]) if c in _TR_V),
                  None)
    suf_v = next((c for c in word[boundary:] if c in _TR_V), None)
    if stem_v is None or suf_v is None:
        return False
    return stem_v in _TR_HARMONY.get(suf_v, "")


def _tr_forms(template: str) -> Tuple[str, ...]:
    """Expand a suffix template: A -> a/e, U -> ı/i/u/ü, D -> d/t,
    parenthesised leading consonant -> with/without."""
    outs = [""]
    i = 0
    optional_head = None
    if template.startswith("("):
        optional_head = template[1]
        template = template[3:]
        i = 0
    while i < len(template):
        ch = template[i]
        if ch == "A":
            outs = [o + v for o in outs for v in "ae"]
        elif ch == "U":
            outs = [o + v for o in outs for v in "ıiuü"]
        elif ch == "D":
            outs = [o + v for o in outs for v in "dt"]
        else:
            outs = [o + ch for o in outs]
        i += 1
    if optional_head is not None:
        outs = outs + [optional_head + o for o in outs]
    return tuple(outs)


def _tr_strip(word: str, template: str, *,
              buffer_needs_vowel: str = "") -> Optional[str]:
    """Strip the longest harmony-valid expansion of `template`; a form
    starting with a char in `buffer_needs_vowel` additionally requires
    the stem to end in a vowel (buffer consonants y/n/s only attach to
    vowel-final stems)."""
    for form in sorted(_tr_forms(template), key=len, reverse=True):
        if not word.endswith(form) or len(form) >= len(word):
            continue
        b = len(word) - len(form)
        if any(c in _TR_V for c in form) and not _tr_harmony_ok(word, b):
            continue
        if (form[0] in buffer_needs_vowel
                and word[b - 1 : b] not in _TR_V):
            continue
        return word[:b]
    return None


def _tr_nominal_verb(word: str) -> Tuple[str, bool]:
    """Strip copular (nominal-verb) suffixes; returns (word,
    continue_with_noun_suffixes)."""
    # -(y)DU / -(y)mUş / -(y)sA with optional person (m/n/k/nUz/lAr)
    for tense in ("DU", "mUş", "sA"):
        for person in ("nUz", "lAr", "k", "m", "n", ""):
            for buf in ("y", ""):
                t = _tr_strip(word, buf + tense + person,
                              buffer_needs_vowel="y")
                if t is not None:
                    return t, True
    t = _tr_strip(word, "(y)ken", buffer_needs_vowel="y")
    if t is not None:
        return t, True
    t = _tr_strip(word, "cAsInA")
    if t is not None:
        return t, True
    # plural copula: ends stemming outright (kimsesizler -> kimsesiz)
    t = _tr_strip(word, "lAr")
    if t is not None:
        t2 = _tr_strip(t, "DUr")
        return (t2 if t2 is not None else t), False
    # person-only copula + optional ymUş / DUr
    for person in ("sUnUz", "(y)Uz", "sUn", "(y)Um"):
        t = _tr_strip(word, person, buffer_needs_vowel="y")
        if t is not None:
            t2 = _tr_strip(t, "(y)mUş", buffer_needs_vowel="y")
            return (t2 if t2 is not None else t), True
    t = _tr_strip(word, "DUr")
    if t is not None:
        return t, True
    return word, True


_TR_NOUN_SUFFIXES = (
    # (template, buffer chars needing a vowel-final stem)
    ("lArI", ""),
    ("ndAn", ""), ("ndA", ""), ("nUn", "n"), ("(y)lA", "y"),
    ("UmUz", ""), ("mUz", "m"), ("UnUz", ""),
    ("DAn", ""), ("DA", ""), ("nA", "n"), ("(y)A", "y"),
    ("nU", "n"), ("(y)U", "y"), ("ncA", "n"), ("ki", ""),
    ("sU", "s"), ("Um", ""), ("Un", ""), ("lAr", ""),
)


def _tr_noun(word: str) -> str:
    """Strip ONE noun suffix (longest valid match across the inventory);
    the original's chain continuations are intentionally not looped, so
    bare dative -A never re-fires on a vowel-final result."""
    best = None
    for template, bufv in _TR_NOUN_SUFFIXES:
        t = _tr_strip(word, template, buffer_needs_vowel=bufv)
        if t is not None and (best is None or len(t) < len(best)):
            best = t
    return best if best is not None else word


_TR_DEVOICE = {"b": "p", "c": "ç", "d": "t", "ğ": "k"}


def turkish_stem(word: str) -> str:
    if _tr_nvowels(word) <= 1:
        return word
    word, cont = _tr_nominal_verb(word)
    if cont:
        word = _tr_noun(word)
    if word and word[-1] in _TR_DEVOICE:
        word = word[:-1] + _TR_DEVOICE[word[-1]]
    return word
