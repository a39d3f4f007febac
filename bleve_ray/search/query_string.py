"""Query-string mini-language -> BooleanQuery.

Implements the practical core of the reference's yacc grammar
(search/query/query_string.y + query_string_lex.go):

  clause  := [+|-] [field ':'] part
  part    := '"' words '"' ['~' slop]      -> MatchPhraseQuery
           | word ['^' boost] ['~' fuzz]   -> MatchQuery (bare words are
                                              analyzed match queries)
           | /regex/                       -> RegexpQuery
           | word with * or ?              -> WildcardQuery
  '+' clause -> must, '-' clause -> must_not, bare -> should

Unsupported pieces of the full grammar (numeric >/< ranges on unindexed
numeric fields) raise ValueError with a clear message.
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

from .query import (
    BooleanQuery,
    ConjunctionQuery,
    DisjunctionQuery,
    FuzzyQuery,
    MatchPhraseQuery,
    MatchQuery,
    Query,
    RegexpQuery,
    WildcardQuery,
)

_TOKEN_RE = re.compile(
    r"""
    (?P<plus>\+) |
    (?P<minus>-(?=\S)) |
    (?P<phrase>"(?:[^"\\]|\\.)*") |
    (?P<regex>/(?:[^/\\]|\\.)*/) |
    (?P<word>[^\s+"/][^\s"]*) |
    (?P<space>\s+)
    """,
    re.VERBOSE,
)

_WORD_MOD_RE = re.compile(
    r"^(?P<body>.*?)(?:\^(?P<boost>\d+(?:\.\d+)?))?(?:~(?P<fuzz>\d+))?$"
)


def parse_query_string(s: str) -> Query:
    must: List[Query] = []
    must_not: List[Query] = []
    should: List[Query] = []

    pos = 0
    mode = 0  # 0 should, 1 must, -1 must_not
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if m is None:
            raise ValueError(f"query string parse error at {pos}: {s[pos:]!r}")
        pos = m.end()
        if m.lastgroup == "space":
            mode = 0
            continue
        if m.lastgroup == "plus":
            mode = 1
            continue
        if m.lastgroup == "minus":
            mode = -1
            continue
        text = m.group(0)
        field = ""
        # field prefix applies to word/phrase/regex tokens: field:rest
        if m.lastgroup == "word" and ":" in text:
            head, _, rest = text.partition(":")
            if head and not head.startswith(("<", ">")):
                field = head
                if rest[:1] in ("-", "+", "~", "^", ":") and not (
                    rest[:1] == "-"
                    and re.fullmatch(r"-\d+(?:\.\d+)?", rest)
                ):
                    # the yacc grammar rejects operators right after the
                    # field separator (query_string_parser_test.go
                    # invalid set: field:-text, field:^text, ...) --
                    # except a negative NUMBER, which is a valid term
                    raise ValueError(
                        f"query string parse error at {pos}: "
                        f"unexpected {rest[0]!r} after field separator"
                    )
                if rest == "" and pos < len(s) and s[pos] == '"':
                    # field:"phrase..." -- the quote starts a new token
                    m2 = _TOKEN_RE.match(s, pos)
                    if m2 and m2.lastgroup == "phrase":
                        pos = m2.end()
                        q, pos = _phrase_with_mods(s, pos, m2.group(0), field)
                        _push(q, mode, must, must_not, should)
                        mode = 0
                        continue
                text = rest
        if m.lastgroup == "phrase":
            q, pos = _phrase_with_mods(s, pos, text, field)
        elif m.lastgroup == "regex":
            q = RegexpQuery(text[1:-1], field=field)
        else:
            if text.startswith(("<", ">")):
                # numeric / date range clause (query_string.y tGREATER /
                # tLESS productions): field:>5, field:>=5.5, field:<"date"
                q, pos = _range_clause(s, pos, text, field)
            elif len(text) > 1 and text.startswith("/") and text.endswith("/"):
                # field:/regex/
                q = RegexpQuery(text[1:-1], field=field)
            else:
                wm = _WORD_MOD_RE.match(text)
                body = wm.group("body")
                boost = float(wm.group("boost")) if wm.group("boost") else 1.0
                fuzz = int(wm.group("fuzz")) if wm.group("fuzz") else 0
                if not body:
                    # bare boost/fuzz markers ("^", "^5", "~2") have no
                    # term to modify
                    raise ValueError(
                        f"query string parse error at {pos}: modifier "
                        f"without a term in {text!r}"
                    )
                if re.search(r"(?<!\\)[\^~]", body):
                    # unescaped modifier chars not in suffix position
                    # (lexer-reserved; the reference rejects cat^3\\: etc)
                    raise ValueError(
                        f"query string parse error at {pos}: unexpected "
                        f"modifier inside {text!r}"
                    )
                if _number_overflows(body):
                    raise ValueError(
                        f"query string parse error at {pos}: numeric "
                        "literal out of range"
                    )
                if "*" in body or "?" in body:
                    q = WildcardQuery(body, field=field, boost=boost)
                elif fuzz:
                    q = FuzzyQuery(
                        body, field=field, fuzziness=fuzz, boost=boost
                    )
                elif re.fullmatch(r"-?\d+(?:\.\d+)?", body):
                    # a numeric term is match OR exact numeric equality
                    # (query_string.y tNUMBER production: disjunction of
                    # MatchQuery and inclusive NumericRangeQuery)
                    from .query import NumericRangeQuery

                    num = float(body)
                    q = DisjunctionQuery(
                        [
                            MatchQuery(body, field=field, boost=boost),
                            NumericRangeQuery(
                                min=num,
                                max=num,
                                field=field,
                                inclusive_min=True,
                                inclusive_max=True,
                                boost=boost,
                            ),
                        ],
                        min=1,
                    )
                else:
                    q = MatchQuery(body, field=field, boost=boost)
        _push(q, mode, must, must_not, should)
        mode = 0

    if not (must or must_not or should):
        from .query import MatchNoneQuery

        return MatchNoneQuery()
    if len(should) and not must and not must_not:
        if len(should) == 1:
            return should[0]
        return DisjunctionQuery(should, min=1)
    return BooleanQuery(
        must=ConjunctionQuery(must) if must else None,
        should=DisjunctionQuery(should, min=0) if should else None,
        must_not=DisjunctionQuery(must_not, min=0) if must_not else None,
    )


def _phrase(token: str, field: str) -> Query:
    body = token[1:-1].replace('\\"', '"')
    return MatchPhraseQuery(body, field=field)


_PHRASE_MOD_RE = re.compile(r"\^(?P<boost>\d+(?:\.\d+)?)")


def _phrase_with_mods(s: str, pos: int, token: str, field: str):
    """Phrase + optional attached boost suffix ('"x y"^2')."""
    q = _phrase(token, field)
    m = _PHRASE_MOD_RE.match(s, pos)
    if m:
        q.boost = float(m.group("boost"))
        pos = m.end()
    return q, pos


def _range_clause(s: str, pos: int, text: str, field: str):
    """field:>OPERAND productions: numeric operand -> NumericRangeQuery,
    quoted operand (next token is a phrase) -> DateRangeQuery; '='
    controls inclusivity (query_string.y tGREATER/tLESS [tEQUAL])."""
    from .query import DateRangeQuery, NumericRangeQuery

    op = text[0]
    inclusive = text[1:2] == "="
    operand = text[2:] if inclusive else text[1:]
    if operand == "" and pos < len(s) and s[pos] == '"':
        m2 = _TOKEN_RE.match(s, pos)
        if m2 and m2.lastgroup == "phrase":
            pos = m2.end()
            date = m2.group(0)[1:-1]
            if op == ">":
                return (
                    DateRangeQuery(
                        start=date, field=field, inclusive_start=inclusive
                    ),
                    pos,
                )
            return (
                DateRangeQuery(
                    end=date, field=field, inclusive_end=inclusive
                ),
                pos,
            )
    try:
        num = float(operand)
    except ValueError:
        raise ValueError(f"invalid range operand: {operand!r}")
    import math as _math

    if _math.isinf(num):
        # strconv.ParseFloat overflow is an error in the reference lexer
        raise ValueError(f"numeric literal out of range: {operand!r}")
    if op == ">":
        return (
            NumericRangeQuery(
                min=num, field=field, inclusive_min=inclusive
            ),
            pos,
        )
    return (
        NumericRangeQuery(max=num, field=field, inclusive_max=inclusive),
        pos,
    )


def _number_overflows(body: str) -> bool:
    """A bare numeric literal too large for float64 is a lexer error in
    the reference (strconv.ParseFloat overflow)."""
    if not re.fullmatch(r"-?\d+(?:\.\d+)?", body):
        return False
    import math as _math

    try:
        return _math.isinf(float(body))
    except ValueError:
        return False


def _push(q, mode, must, must_not, should):
    if mode == 1:
        must.append(q)
    elif mode == -1:
        must_not.append(q)
    else:
        should.append(q)
