"""Char filters: str -> str, applied before tokenization
(reference analysis/char/{html,asciifolding,regexp,zerowidthnonjoiner}).

Reference semantics replace filtered spans with spaces to keep offsets
stable; we do the same.
"""

from __future__ import annotations

import re
import unicodedata

_HTML_RE = re.compile(r"<[^>]*>|&[a-zA-Z]+;|&#[0-9]+;")


def html_char_filter(text: str) -> str:
    """Replace HTML tags/entities with spaces (analysis/char/html)."""
    return _HTML_RE.sub(lambda m: " " * len(m.group(0)), text)


_ZWNJ = "‌"


def zero_width_non_joiner_filter(text: str) -> str:
    return text.replace(_ZWNJ, " ")


# small explicit table for folds NFKD cannot produce (ligatures/slashed;
# asciifolding_test.go AO/AE-smallcap/swung-dash vectors)
_EXTRA_FOLDS = {
    "ß": "ss", "Æ": "AE", "æ": "ae", "Œ": "OE", "œ": "oe",
    "Ø": "O", "ø": "o", "Đ": "D", "đ": "d", "Ł": "L", "ł": "l",
    "Þ": "TH", "þ": "th", "Ð": "D", "ð": "d",
    "Ꜵ": "AO", "ꜵ": "ao", "Ꜷ": "AU", "ꜷ": "au",
    "Ꜹ": "AV", "ꜹ": "av", "Ꜻ": "AV", "ꜻ": "av",
    "Ꜽ": "AY", "ꜽ": "ay", "Ꝏ": "OO", "ꝏ": "oo",
    "ᴁ": "AE", "ᴂ": "ae", "ᴔ": "oe",
    "⁓": "~",  # U+2053 SWUNG DASH (folded like the fullwidth tilde)
    "Ǝ": "E", "ǝ": "e", "Ħ": "H", "ħ": "h",
    "Ŧ": "T", "ŧ": "t", "Ɨ": "I", "ɨ": "i",
}


def ascii_folding_filter(text: str) -> str:
    """Fold accented latin characters to their ASCII base
    (analysis/char/asciifolding semantics via NFKD + combining strip)."""
    if text.isascii():
        return text
    out = []
    for ch in text:
        if ch.isascii():
            out.append(ch)
            continue
        if ch in _EXTRA_FOLDS:
            out.append(_EXTRA_FOLDS[ch])
            continue
        decomp = unicodedata.normalize("NFKD", ch)
        folded = "".join(c for c in decomp if not unicodedata.combining(c))
        out.append(folded if folded.isascii() else ch)
    return "".join(out)


def make_regexp_char_filter(pattern: str, replacement: str = " "):
    """analysis/char/regexp: replace regex matches with replacement."""
    pat = re.compile(pattern)

    def regexp_char_filter(text: str) -> str:
        return pat.sub(replacement, text)

    return regexp_char_filter
