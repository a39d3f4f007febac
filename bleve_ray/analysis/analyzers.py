"""Analyzer = char filters -> tokenizer -> token filters
(reference analysis/type.go:85-98), plus a plain-dict registry like the
reference's registry/ package.

An Analyzer carries vectorization hints (``lowercase``, ``stop_set``) so the
batch path (freq.analyze_batch) can run the standard chain fully vectorized;
analyzers with other token filters fall back to the exact per-doc chain.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, List, Optional, Sequence

from .stopwords_en import ENGLISH_STOP_WORDS
from .token_filters import lowercase_filter, lower_term, make_stop_filter
from .tokenizers import (
    LetterTokenizer,
    SingleTokenTokenizer,
    Token,
    UnicodeTokenizer,
    WhitespaceTokenizer,
)


@dataclass
class Analyzer:
    name: str
    tokenizer: object
    token_filters: Sequence[Callable[[List[Token]], List[Token]]] = ()
    char_filters: Sequence[Callable[[str], str]] = ()
    # vectorization hints: set iff token_filters == [lowercase?] + [stop?]
    lowercase: bool = False
    stop_set: Optional[frozenset] = None
    fast_path: bool = True

    def apply_char_filters(self, text: str) -> str:
        for cf in self.char_filters:
            text = cf(text)
        return text

    def analyze(self, text: str) -> List[Token]:
        """Exact chain (reference Analyzer.Analyze, analysis/type.go:85-98)."""
        text = self.apply_char_filters(text)
        tokens = self.tokenizer.tokenize(text)
        for tf in self.token_filters:
            tokens = tf(tokens)
        return tokens

    def terms(self, text: str) -> List[str]:
        """Analyzed terms in order (positions implied); used by query-side
        match analysis when offsets are not needed."""
        return [t.term for t in self.analyze(text)]


_REGISTRY = {}


def register_analyzer(analyzer: Analyzer) -> Analyzer:
    _REGISTRY[analyzer.name] = analyzer
    return analyzer


def analyzer_named(name: str) -> Analyzer:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"no analyzer named {name!r} registered; have {sorted(_REGISTRY)}"
        )


def registered_analyzers() -> List[str]:
    return sorted(_REGISTRY)


# --- built-ins -------------------------------------------------------------

# standard: unicode tokenizer + to_lower + english stop words
# (reference analysis/analyzer/standard/standard.go:26-48)
STANDARD = register_analyzer(
    Analyzer(
        name="standard",
        tokenizer=UnicodeTokenizer(),
        token_filters=[lowercase_filter, make_stop_filter(ENGLISH_STOP_WORDS)],
        lowercase=True,
        stop_set=ENGLISH_STOP_WORDS,
    )
)

# simple: letter tokenizer + to_lower (reference analysis/analyzer/simple)
SIMPLE = register_analyzer(
    Analyzer(
        name="simple",
        tokenizer=LetterTokenizer(),
        token_filters=[lowercase_filter],
        lowercase=True,
    )
)

# keyword: whole value = single token (reference analysis/analyzer/keyword)
KEYWORD = register_analyzer(
    Analyzer(name="keyword", tokenizer=SingleTokenTokenizer())
)

# whitespace + lower (not a named reference analyzer, but the whitespace
# tokenizer is reference analysis/tokenizer/whitespace); useful for oracles.
WHITESPACE_LOWER = register_analyzer(
    Analyzer(
        name="whitespace_lower",
        tokenizer=WhitespaceTokenizer(),
        token_filters=[lowercase_filter],
        lowercase=True,
    )
)

# en: unicode + possessive-strip + to_lower + english stop (reference
# analysis/lang/en/analyzer_en.go, minus the snowball stemmer which is
# [later]); registered as "en_nostem" to be explicit about the difference.


def _possessive_filter(tokens: List[Token]) -> List[Token]:
    # reference analysis/lang/en/possessive_filter_en.go: strip trailing 's
    for t in tokens:
        if len(t.term) >= 2 and t.term[-1] in ("s", "S") and t.term[-2] in (
            "'",
            "’",
            "＇",
        ):
            t.term = t.term[:-2]
    return tokens


EN_NOSTEM = register_analyzer(
    Analyzer(
        name="en_nostem",
        tokenizer=UnicodeTokenizer(),
        token_filters=[
            _possessive_filter,
            lowercase_filter,
            make_stop_filter(ENGLISH_STOP_WORDS),
        ],
        fast_path=False,
    )
)

# en: unicode + possessive + to_lower + stop_en + snowball-english stemmer
# (reference analysis/lang/en/analyzer_en.go)


def _make_en():
    from .porter2 import make_porter2_filter

    return register_analyzer(
        Analyzer(
            name="en",
            tokenizer=UnicodeTokenizer(),
            token_filters=[
                _possessive_filter,
                lowercase_filter,
                make_stop_filter(ENGLISH_STOP_WORDS),
                make_porter2_filter(),
            ],
            fast_path=False,
        )
    )


EN = _make_en()


# ascii_alnum_lower: regexp tokenizer [A-Za-z0-9]+ + to_lower.  Used by the
# driver-facing DuckDB-oracle queries because it is exactly expressible as
# regexp_extract_all(lower(text), '[a-z0-9]+') in SQL.
from .tokenizers import RegexpTokenizer  # noqa: E402

ASCII_ALNUM_LOWER = register_analyzer(
    Analyzer(
        name="ascii_alnum_lower",
        tokenizer=RegexpTokenizer("[A-Za-z0-9]+"),
        token_filters=[lowercase_filter],
        lowercase=True,
    )
)


# code: unicode tokenizer + camelCase identifier split + to_lower.
# The camelCase filter is the reference's analysis/token/camelcase
# (SURVEY.md marks it 'highly relevant to code corpora').
from .token_filters import camelcase_filter  # noqa: E402

CODE = register_analyzer(
    Analyzer(
        name="code",
        tokenizer=UnicodeTokenizer(),
        token_filters=[camelcase_filter, lowercase_filter],
        fast_path=False,
    )
)


# web: web tokenizer + to_lower + stop_en (reference analysis/analyzer/web)
from .tokenizers import make_web_tokenizer  # noqa: E402

WEB = register_analyzer(
    Analyzer(
        name="web",
        tokenizer=make_web_tokenizer(),
        token_filters=[lowercase_filter, make_stop_filter(ENGLISH_STOP_WORDS)],
        fast_path=False,
    )
)


def make_custom_analyzer(
    name: str,
    tokenizer,
    token_filters=(),
    char_filters=(),
    register: bool = True,
) -> Analyzer:
    """Custom analyzer by parts (reference analysis/analyzer/custom)."""
    a = Analyzer(
        name=name,
        tokenizer=tokenizer,
        token_filters=list(token_filters),
        char_filters=list(char_filters),
        fast_path=False,
    )
    if register:
        register_analyzer(a)
    return a


# --- language packs (de/fr/es/it/pt) ---------------------------------------
# Chains mirror the reference analyzers exactly
# (analysis/lang/{de,fr,es,it,pt}/analyzer_*.go): unicode tokenizer,
# lowercase, language stop list, then the language's normalize/light-stem
# filters; fr/it insert their elision filter after lowercase.


def _make_lang_packs():
    from .lang_light import (
        ITALIAN_ARTICLES,
        french_light_stem,
        german_light_stem,
        german_normalize,
        italian_light_stem,
        make_stem_filter,
        portuguese_light_stem,
        spanish_light_stem,
        spanish_normalize,
    )
    from .stopwords_langs import (
        DE_STOP_WORDS,
        ES_STOP_WORDS,
        FR_STOP_WORDS,
        IT_STOP_WORDS,
        PT_STOP_WORDS,
    )
    from .token_filters import make_elision_filter

    register_analyzer(
        Analyzer(
            name="de",
            tokenizer=UnicodeTokenizer(),
            token_filters=[
                lowercase_filter,
                make_stop_filter(DE_STOP_WORDS),
                make_stem_filter(german_normalize),
                make_stem_filter(german_light_stem),
            ],
            fast_path=False,
        )
    )
    register_analyzer(
        Analyzer(
            name="fr",
            tokenizer=UnicodeTokenizer(),
            token_filters=[
                lowercase_filter,
                make_elision_filter(),  # default set IS the French articles
                make_stop_filter(FR_STOP_WORDS),
                make_stem_filter(french_light_stem),
            ],
            fast_path=False,
        )
    )
    register_analyzer(
        Analyzer(
            name="es",
            tokenizer=UnicodeTokenizer(),
            token_filters=[
                lowercase_filter,
                make_stop_filter(ES_STOP_WORDS),
                make_stem_filter(spanish_normalize),
                make_stem_filter(spanish_light_stem),
            ],
            fast_path=False,
        )
    )
    register_analyzer(
        Analyzer(
            name="it",
            tokenizer=UnicodeTokenizer(),
            token_filters=[
                lowercase_filter,
                make_elision_filter(ITALIAN_ARTICLES),
                make_stop_filter(IT_STOP_WORDS),
                make_stem_filter(italian_light_stem),
            ],
            fast_path=False,
        )
    )
    register_analyzer(
        Analyzer(
            name="pt",
            tokenizer=UnicodeTokenizer(),
            token_filters=[
                lowercase_filter,
                make_stop_filter(PT_STOP_WORDS),
                make_stem_filter(portuguese_light_stem),
            ],
            fast_path=False,
        )
    )


def _make_ar_ru_packs():
    from .lang_extra import arabic_normalize, arabic_stem, russian_stem
    from .lang_light import make_stem_filter
    from .stopwords_langs import AR_STOP_WORDS, RU_STOP_WORDS
    from .token_filters import make_unicodenorm_filter

    # ar: unicode + lower + NFKC + stop + arabic-normalize + arabic-stem
    # (reference analysis/lang/ar/analyzer_ar.go:30-62 chain order)
    register_analyzer(
        Analyzer(
            name="ar",
            tokenizer=UnicodeTokenizer(),
            token_filters=[
                lowercase_filter,
                make_unicodenorm_filter("NFKC"),
                make_stop_filter(AR_STOP_WORDS),
                make_stem_filter(arabic_normalize),
                make_stem_filter(arabic_stem),
            ],
            fast_path=False,
        )
    )
    # ru: unicode + lower + stop + snowball stemmer (analyzer_ru.go)
    register_analyzer(
        Analyzer(
            name="ru",
            tokenizer=UnicodeTokenizer(),
            token_filters=[
                lowercase_filter,
                make_stop_filter(RU_STOP_WORDS),
                make_stem_filter(russian_stem),
            ],
            fast_path=False,
        )
    )


def _make_more_packs():
    """fa/sv/no/da/hi analyzers (reference analysis/lang/{fa,sv,no,da,hi}
    chain orders)."""
    from .char_filters import zero_width_non_joiner_filter
    from .lang_extra import (
        arabic_normalize,
        danish_stem,
        hindi_normalize,
        hindi_stem,
        indic_normalize,
        norwegian_stem,
        persian_normalize,
        swedish_stem,
    )
    from .lang_light import make_stem_filter
    from .stopwords_langs import (
        DA_STOP_WORDS,
        FA_STOP_WORDS,
        HI_STOP_WORDS,
        NO_STOP_WORDS,
        SV_STOP_WORDS,
    )

    # fa: zwnj char filter + unicode + lower + ar-normalize + fa-normalize
    # + stop (analyzer_fa.go:36-75; no stemmer)
    register_analyzer(
        Analyzer(
            name="fa",
            tokenizer=UnicodeTokenizer(),
            char_filters=[zero_width_non_joiner_filter],
            token_filters=[
                lowercase_filter,
                make_stem_filter(arabic_normalize),
                make_stem_filter(persian_normalize),
                make_stop_filter(FA_STOP_WORDS),
            ],
            fast_path=False,
        )
    )
    from .lang_extra import dutch_stem
    from .stopwords_langs import NL_STOP_WORDS

    for name, stop, stem in (
        ("sv", SV_STOP_WORDS, swedish_stem),
        ("no", NO_STOP_WORDS, norwegian_stem),
        ("da", DA_STOP_WORDS, danish_stem),
        ("nl", NL_STOP_WORDS, dutch_stem),
    ):
        register_analyzer(
            Analyzer(
                name=name,
                tokenizer=UnicodeTokenizer(),
                token_filters=[
                    lowercase_filter,
                    make_stop_filter(stop),
                    make_stem_filter(stem),
                ],
                fast_path=False,
            )
        )
    # hi: unicode + lower + indic-normalize + hindi-normalize + stop + stem
    # (analyzer_hi.go chain)
    register_analyzer(
        Analyzer(
            name="hi",
            tokenizer=UnicodeTokenizer(),
            token_filters=[
                lowercase_filter,
                make_stem_filter(indic_normalize),
                make_stem_filter(hindi_normalize),
                make_stop_filter(HI_STOP_WORDS),
                make_stem_filter(hindi_stem),
            ],
            fast_path=False,
        )
    )


def _make_ckb_pack():
    from .lang_extra import sorani_normalize, sorani_stem
    from .lang_light import make_stem_filter
    from .stopwords_langs import CKB_STOP_WORDS

    # ckb: unicode + sorani-normalize + lower + stop + sorani-stem
    # (reference analysis/lang/ckb/analyzer_ckb.go chain order)
    register_analyzer(
        Analyzer(
            name="ckb",
            tokenizer=UnicodeTokenizer(),
            token_filters=[
                make_stem_filter(sorani_normalize),
                lowercase_filter,
                make_stop_filter(CKB_STOP_WORDS),
                make_stem_filter(sorani_stem),
            ],
            fast_path=False,
        )
    )


def _make_snowball_packs():
    """fi/hu/ro/tr (Snowball), pl (stempel trie), hr (Ljubešić-Pandžić
    rules) full chains (reference analysis/lang/{fi,hu,ro,tr,pl,hr}/
    analyzer_*.go; tr additionally runs the apostrophe filter before
    lowercasing, hr the suffix-transformation before stemming)."""
    from .lang_hr import croatian_stem, croatian_transform
    from .lang_light import make_stem_filter
    from .snowball_more import (
        finnish_stem,
        hungarian_stem,
        romanian_stem,
        turkish_stem,
    )
    from .stempel import polish_stem
    from .stopwords_langs import (
        FI_STOP_WORDS,
        HR_STOP_WORDS,
        HU_STOP_WORDS,
        PL_STOP_WORDS,
        RO_STOP_WORDS,
        TR_STOP_WORDS,
    )
    from .token_filters import apostrophe_filter

    for name, stop, stem in (
        ("fi", FI_STOP_WORDS, finnish_stem),
        ("hu", HU_STOP_WORDS, hungarian_stem),
        ("ro", RO_STOP_WORDS, romanian_stem),
        ("pl", PL_STOP_WORDS, polish_stem),
    ):
        register_analyzer(
            Analyzer(
                name=name,
                tokenizer=UnicodeTokenizer(),
                token_filters=[
                    lowercase_filter,
                    make_stop_filter(stop),
                    make_stem_filter(stem),
                ],
                fast_path=False,
            )
        )
    register_analyzer(
        Analyzer(
            name="tr",
            tokenizer=UnicodeTokenizer(),
            token_filters=[
                apostrophe_filter,
                lowercase_filter,
                make_stop_filter(TR_STOP_WORDS),
                make_stem_filter(turkish_stem),
            ],
            fast_path=False,
        )
    )
    register_analyzer(
        Analyzer(
            name="hr",
            tokenizer=UnicodeTokenizer(),
            token_filters=[
                lowercase_filter,
                make_stop_filter(HR_STOP_WORDS),
                make_stem_filter(croatian_transform),
                make_stem_filter(croatian_stem),
            ],
            fast_path=False,
        )
    )


def _make_cjk_pack():
    from .token_filters import cjk_width_filter, make_cjk_bigram_filter

    # cjk: unicode tokenizer + width fold + to_lower + bigram shingles
    # (reference analysis/lang/cjk/analyzer_cjk.go:27-53)
    register_analyzer(
        Analyzer(
            name="cjk",
            tokenizer=UnicodeTokenizer(),
            token_filters=[
                cjk_width_filter,
                lowercase_filter,
                make_cjk_bigram_filter(),
            ],
            fast_path=False,
        )
    )


_make_lang_packs()
_make_ar_ru_packs()
_make_more_packs()
_make_ckb_pack()
_make_cjk_pack()
_make_snowball_packs()
