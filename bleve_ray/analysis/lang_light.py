"""Light stemmers + normalizers for de/fr/es/it/pt.

Independent Python implementations of the published Lucene "light"
stemming algorithms (Savoy, "Light Stemming Approaches for the French,
Portuguese, German and Hungarian Languages", SAC 2006) with the exact
semantics the reference wires into its language analyzers:

- German:     analysis/lang/de/german_normalize.go + light_stemmer_de.go
- French:     analysis/lang/fr/light_stemmer_fr.go
- Spanish:    analysis/lang/es/spanish_normalize.go + light_stemmer_es.go
- Italian:    analysis/lang/it/light_stemmer_it.go
- Portuguese: analysis/lang/pt/light_stemmer_pt.go

Each works on a list of characters (rune-level algorithms); the token
filters map them over token streams.
"""

from __future__ import annotations

from typing import List

from .token_filters import Token

# --- German ----------------------------------------------------------------

_DE_ST_ENDING = frozenset("bdfghklmnt")


def german_normalize(term: str) -> str:
    """german_normalize.go: fold umlauts, ß -> ss, and drop 'e' after a
    u/a/o vowel-state (the Lucene GermanNormalizationFilter state
    machine; states N(oun)/U/V)."""
    N, U, V = 0, 1, 2
    state = N
    s = list(term)
    i = 0
    while i < len(s):
        c = s[i]
        if c in "ao":
            state = U
        elif c == "u":
            state = U if state == N else V
        elif c == "e":
            if state == U:
                del s[i]
                i -= 1
            state = V
        elif c in "iqy":
            state = V
        elif c == "ä":
            s[i] = "a"
            state = V
        elif c == "ö":
            s[i] = "o"
            state = V
        elif c == "ü":
            s[i] = "u"
            state = V
        elif c == "ß":
            s[i] = "s"
            i += 1
            s.insert(i, "s")
            state = N
        else:
            state = N
        i += 1
    return "".join(s)


def german_light_stem(term: str) -> str:
    """light_stemmer_de.go: accent fold + two plural/inflection strip
    steps."""
    s = list(term)
    for i, c in enumerate(s):
        if c in "äàáâ":
            s[i] = "a"
        elif c in "öòóô":
            s[i] = "o"
        elif c in "ïìíî":
            s[i] = "i"
        elif c in "üùúû":
            s[i] = "u"
    # step 1
    l = len(s)
    if l > 5 and s[-3] == "e" and s[-2] == "r" and s[-1] == "n":
        del s[-3:]
    elif l > 4 and s[-2] == "e" and s[-1] in "mnrs":
        del s[-2:]
    elif l > 3 and s[-1] == "e":
        del s[-1]
    elif l > 3 and s[-1] == "s" and s[-2] in _DE_ST_ENDING:
        del s[-1]
    # step 2
    l = len(s)
    if l > 5 and s[-3] == "e" and s[-2] == "s" and s[-1] == "t":
        del s[-3:]
    elif l > 4 and s[-2] == "e" and s[-1] in "rn":
        del s[-2:]
    elif l > 4 and s[-2] == "s" and s[-1] == "t" and s[-3] in _DE_ST_ENDING:
        del s[-2:]
    return "".join(s)


# --- French ----------------------------------------------------------------


def _fr_norm(s: List[str]) -> List[str]:
    if len(s) > 4:
        i = 0
        while i < len(s):
            c = s[i]
            if c in "àáâ":
                s[i] = "a"
            elif c == "ô":
                s[i] = "o"
            elif c in "èéê":
                s[i] = "e"
            elif c in "ùû":
                s[i] = "u"
            elif c == "î":
                s[i] = "i"
            elif c == "ç":
                s[i] = "c"
            # the Lucene port runs the full adjacent-duplicate removal
            # pass inside the outer fold loop; behavior preserved
            ch = s[0]
            j = 1
            while j < len(s):
                if s[j] == ch and ch.isalpha():
                    del s[j]
                else:
                    ch = s[j]
                    j += 1
            i += 1
    if len(s) > 4 and s[-2:] == ["i", "e"]:
        del s[-2:]
    if len(s) > 4:
        if s[-1] == "r":
            del s[-1]
        if s[-1] == "e":
            del s[-1]
        if s[-1] == "e":
            del s[-1]
        if s[-1] == s[-2] and s[-1].isalpha():
            del s[-1]
    return s


def _ew(s: List[str], suf: str) -> bool:
    return "".join(s[-len(suf):]) == suf if len(s) >= len(suf) else False


def french_light_stem(term: str) -> str:
    """light_stemmer_fr.go; branch order and in-place rewrites preserved."""
    s = list(term)
    l = len(s)
    if l > 5 and s[-1] == "x":
        if s[-3] == "a" and s[-2] == "u" and s[-4] != "e":
            s[-2] = "l"
        del s[-1]
        l = len(s)
    if l > 3 and s[-1] == "x":
        del s[-1]
        l = len(s)
    if l > 3 and s[-1] == "s":
        del s[-1]
        l = len(s)
    if l > 9 and _ew(s, "issement"):
        del s[-6:]
        s[-1] = "r"
        return "".join(_fr_norm(s))
    if l > 8 and _ew(s, "issant"):
        del s[-4:]
        s[-1] = "r"
        return "".join(_fr_norm(s))
    if l > 6 and _ew(s, "ement"):
        del s[-4:]
        if len(s) > 3 and _ew(s, "ive"):
            del s[-1]
            s[-1] = "f"
        return "".join(_fr_norm(s))
    if l > 11 and _ew(s, "ficatrice"):
        del s[-5:]
        s[-2] = "e"
        s[-1] = "r"
        return "".join(_fr_norm(s))
    if l > 10 and _ew(s, "ficateur"):
        del s[-4:]
        s[-2] = "e"
        s[-1] = "r"
        return "".join(_fr_norm(s))
    if l > 9 and _ew(s, "catrice"):
        del s[-3:]
        s[-4] = "q"
        s[-3] = "u"
        s[-2] = "e"
        return "".join(_fr_norm(s))
    if l > 8 and _ew(s, "cateur"):
        del s[-2:]
        s[-4] = "q"
        s[-3] = "u"
        s[-2] = "e"
        s[-1] = "r"
        return "".join(_fr_norm(s))
    if l > 8 and _ew(s, "atrice"):
        del s[-4:]
        s[-2] = "e"
        s[-1] = "r"
        return "".join(_fr_norm(s))
    if l > 7 and _ew(s, "ateur"):
        del s[-3:]
        s[-2] = "e"
        s[-1] = "r"
        return "".join(_fr_norm(s))
    if l > 6 and _ew(s, "trice"):
        del s[-1]
        s[-3] = "e"
        s[-2] = "u"
        s[-1] = "r"
        l = len(s)
    if l > 5 and _ew(s, "ième"):
        del s[-4:]
        return "".join(_fr_norm(s))
    if l > 7 and _ew(s, "teuse"):
        del s[-2:]
        s[-1] = "r"
        return "".join(_fr_norm(s))
    if l > 6 and _ew(s, "teur"):
        del s[-1]
        s[-1] = "r"
        return "".join(_fr_norm(s))
    if l > 5 and _ew(s, "euse"):
        del s[-2:]
        return "".join(_fr_norm(s))
    if l > 8 and _ew(s, "ère"):
        del s[-1]
        s[-2] = "e"
        return "".join(_fr_norm(s))
    if l > 7 and _ew(s, "ive"):
        del s[-1]
        s[-1] = "f"
        return "".join(_fr_norm(s))
    if l > 4 and (_ew(s, "folle") or _ew(s, "molle")):
        del s[-2:]
        s[-1] = "u"
        return "".join(_fr_norm(s))
    if l > 9 and _ew(s, "nnelle"):
        del s[-5:]
        return "".join(_fr_norm(s))
    if l > 9 and _ew(s, "nnel"):
        del s[-3:]
        return "".join(_fr_norm(s))
    if l > 4 and _ew(s, "ète"):
        del s[-1]
        s[-2] = "e"
        l = len(s)
    if l > 8 and _ew(s, "ique"):
        del s[-4:]
        l = len(s)
    if l > 8 and _ew(s, "esse"):
        del s[-3:]
        return "".join(_fr_norm(s))
    if l > 7 and _ew(s, "inage"):
        del s[-3:]
        return "".join(_fr_norm(s))
    if l > 9 and _ew(s, "isation"):
        del s[-7:]
        if len(s) > 5 and _ew(s, "ual"):
            s[-2] = "e"
        return "".join(_fr_norm(s))
    if l > 9 and _ew(s, "isateur"):
        del s[-7:]
        return "".join(_fr_norm(s))
    if l > 8 and _ew(s, "ation"):
        del s[-5:]
        return "".join(_fr_norm(s))
    if l > 8 and _ew(s, "ition"):
        del s[-5:]
        return "".join(_fr_norm(s))
    return "".join(_fr_norm(s))


# --- Spanish ---------------------------------------------------------------


def spanish_normalize(term: str) -> str:
    """spanish_normalize.go: plain accent fold (keeps ñ)."""
    out = []
    for c in term:
        if c in "àáâä":
            out.append("a")
        elif c in "òóôö":
            out.append("o")
        elif c in "èéêë":
            out.append("e")
        elif c in "ùúûü":
            out.append("u")
        elif c in "ìíîï":
            out.append("i")
        else:
            out.append(c)
    return "".join(out)


def spanish_light_stem(term: str) -> str:
    """light_stemmer_es.go."""
    s = list(term)
    l = len(s)
    if l < 5:
        return term
    last = s[-1]
    if last in "oae":
        return "".join(s[:-1])
    if last == "s":
        if s[-2] == "e" and s[-3] == "s" and s[-4] == "e":
            return "".join(s[:-2])
        if s[-2] == "e" and s[-3] == "c":
            s[-3] = "z"
            return "".join(s[:-2])
        if s[-2] in "oae":
            return "".join(s[:-2])
    return term


# --- Italian ---------------------------------------------------------------


def italian_light_stem(term: str) -> str:
    """light_stemmer_it.go: accent fold + final-vowel strip (tokens
    shorter than 6 pass through untouched, fold included)."""
    s = list(term)
    if len(s) < 6:
        return term
    for i, c in enumerate(s):
        if c in "àáâä":
            s[i] = "a"
        elif c in "òóôö":
            s[i] = "o"
        elif c in "èéêë":
            s[i] = "e"
        elif c in "ùúûü":
            s[i] = "u"
        elif c in "ìíîï":
            s[i] = "i"
    last, prev = s[-1], s[-2]
    if last == "e":
        return "".join(s[:-2] if prev in "ih" else s[:-1])
    if last == "i":
        return "".join(s[:-2] if prev in "hi" else s[:-1])
    if last == "a":
        return "".join(s[:-2] if prev == "i" else s[:-1])
    if last == "o":
        return "".join(s[:-2] if prev == "i" else s[:-1])
    return "".join(s)


# --- Portuguese ------------------------------------------------------------


def _pt_remove_suffix(s: List[str]) -> List[str]:
    l = len(s)
    if l > 4 and _ew(s, "es") and s[-3] in "rslz":
        return s[:-2]
    if l > 3 and _ew(s, "ns"):
        s[-2] = "m"
        return s[:-1]
    if l > 4 and (_ew(s, "eis") or _ew(s, "éis")):
        s[-3] = "e"
        s[-2] = "l"
        return s[:-1]
    if l > 4 and _ew(s, "ais"):
        s[-2] = "l"
        return s[:-1]
    if l > 4 and _ew(s, "óis"):
        s[-3] = "o"
        s[-2] = "l"
        return s[:-1]
    if l > 4 and _ew(s, "is"):
        s[-1] = "l"
        return s
    if l > 3 and (_ew(s, "ões") or _ew(s, "ães")):
        s = s[:-1]
        s[-2] = "ã"
        s[-1] = "o"
        return s
    if l > 6 and _ew(s, "mente"):
        return s[:-5]
    if l > 3 and s[-1] == "s":
        return s[:-1]
    return s


def _pt_norm_feminine(s: List[str]) -> List[str]:
    l = len(s)
    if l > 7 and (_ew(s, "inha") or _ew(s, "iaca") or _ew(s, "eira")):
        s[-1] = "o"
        return s
    if l > 6:
        if (
            _ew(s, "osa") or _ew(s, "ica") or _ew(s, "ida")
            or _ew(s, "ada") or _ew(s, "iva") or _ew(s, "ama")
        ):
            s[-1] = "o"
            return s
        if _ew(s, "ona"):
            s[-3] = "ã"
            s[-2] = "o"
            return s[:-1]
        if _ew(s, "ora"):
            return s[:-1]
        if _ew(s, "esa"):
            s[-3] = "ê"
            return s[:-1]
        if _ew(s, "na"):
            s[-1] = "o"
            return s
    return s


def portuguese_light_stem(term: str) -> str:
    """light_stemmer_pt.go."""
    s = list(term)
    if len(s) < 4:
        return term
    s = _pt_remove_suffix(s)
    if len(s) > 3 and s[-1] == "a":
        s = _pt_norm_feminine(s)
    if len(s) > 4 and s[-1] in "eao":
        del s[-1]
    for i, c in enumerate(s):
        if c in "àáâäã":
            s[i] = "a"
        elif c in "òóôöõ":
            s[i] = "o"
        elif c in "èéêë":
            s[i] = "e"
        elif c in "ùúûü":
            s[i] = "u"
        elif c in "ìíîï":
            s[i] = "i"
        elif c == "ç":
            s[i] = "c"
    return "".join(s)


# --- token-filter wrappers -------------------------------------------------


def make_stem_filter(stem_fn):
    def stem_filter(tokens: List[Token]) -> List[Token]:
        for t in tokens:
            t.term = stem_fn(t.term)
        return tokens

    return stem_filter


# reference analysis/lang/it/articles_it.go (elision set)
ITALIAN_ARTICLES = frozenset(
    "c l all dall dell nell sull coll pell gl agl dagl degl negl sugl "
    "un m t s v d".split()
)
