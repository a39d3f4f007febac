"""Single-process oracle index: an independent, dict-based implementation of
the exact reference semantics (FIXTURES.md F4: "an in-repo single-process
oracle that implements the exact reference math ... golden-locked").

Deliberately implemented WITHOUT numpy or any code sharing with the engine's
searchers/scorers, so rank/score agreement between the Ray-built index and
this oracle is a genuine cross-check (the same role the reference's
upsidedown-vs-scorch parity test plays, test/versus_score_test.go:46-75).

Scoring math follows SURVEY.md §2.7 (scorer_term.go):
  idf_bm25 = ln(1 + (N - df + 0.5)/(df + 0.5));  tf = sqrt(freq)
  fieldLength = 1/(norm^2), norm = float32(1/sqrt(field_len))
  score = idf * tf*k1 / (tf + k1*(1 - b + b*fieldLength/avgDocLen))
  avgDocLen = ceil(sum_field_len / N)   (search_term.go:113)
  queryNorm = 1/sqrt(sum children (boost*idf)^2), applied iff != 1
  disjunction: score = sum(matched) * countMatch/countTotal
"""

from __future__ import annotations

import math
import struct
from collections import defaultdict
from typing import Dict, List, Optional, Sequence, Tuple

from .analysis.analyzers import analyzer_named

K1 = 1.2
B = 0.75


def _f32(x: float) -> float:
    return struct.unpack("f", struct.pack("f", x))[0]


class OracleIndex:
    def __init__(self, scoring_model: str = "bm25"):
        self.scoring_model = scoring_model
        # field -> term -> doc_id -> (tf, positions tuple)
        self.postings: Dict[str, Dict[str, Dict[str, Tuple[int, tuple]]]] = (
            defaultdict(lambda: defaultdict(dict))
        )
        self.field_len: Dict[str, Dict[str, int]] = defaultdict(dict)
        self.doc_ids: List[str] = []

    def index_doc(self, doc_id: str, fields: Dict[str, str], analyzers: Dict[str, str]):
        self.doc_ids.append(doc_id)
        for fname, text in fields.items():
            analyzer = analyzer_named(analyzers.get(fname, "standard"))
            tokens = analyzer.analyze(text or "")
            self.field_len[fname][doc_id] = len(tokens)
            per_term: Dict[str, List[int]] = defaultdict(list)
            for t in tokens:
                per_term[t.term].append(t.position)
            for term, poss in per_term.items():
                self.postings[fname][term][doc_id] = (len(poss), tuple(poss))

    # --- stats ---
    def doc_count(self) -> int:
        return len(self.doc_ids)

    def avg_doc_length(self, field: str) -> float:
        if self.scoring_model != "bm25":
            return 0.0
        n = self.doc_count()
        if n == 0:
            return 0.0
        card = sum(self.field_len[field].values())
        return math.ceil(card / n)

    def norm(self, field: str, doc_id: str) -> float:
        return _f32(1.0 / math.sqrt(self.field_len[field][doc_id]))

    # --- scoring ---
    def _term_scores(
        self, field: str, term: str, boost: float
    ) -> Tuple[Dict[str, float], float]:
        """-> ({doc_id: raw score}, idf).  Raw = before queryWeight."""
        plist = self.postings[field].get(term, {})
        df = len(plist)
        n = self.doc_count()
        avg = self.avg_doc_length(field)
        if avg > 0:
            idf = math.log(1 + (float(n) - float(df) + 0.5) / (float(df) + 0.5))
        else:
            idf = 1.0 + math.log(float(n) / float(df + 1.0))
        out = {}
        for doc_id, (tf_count, _pos) in plist.items():
            tf = math.sqrt(tf_count)
            nm = self.norm(field, doc_id)
            if avg > 0:
                fl = 1.0 / (nm * nm)
                score = idf * (tf * K1) / (tf + K1 * (1 - B + (B * fl / avg)))
            else:
                score = tf * nm * idf
            out[doc_id] = score
        return out, idf

    # --- query evaluation (returns {doc_id: score}) ---
    def eval_query(self, q: dict) -> Dict[str, float]:
        kind, node = self._build(q)
        return node.evaluate(1.0)

    def search(self, request: dict) -> dict:
        scores = self.eval_query(request["query"])
        size = request.get("size", 10)
        from_ = request.get("from", 0)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        window = ranked[from_ : from_ + size]
        return {
            "total_hits": len(scores),
            "max_score": max(scores.values()) if scores else 0.0,
            "hits": [{"id": d, "score": s} for d, s in window],
        }

    # --- node tree mirroring searcher construction/queryNorm order ---
    def _build(self, q: dict):
        return None, _build_node(self, q)


class _TermNode:
    def __init__(self, oracle: OracleIndex, term: str, field: str, boost: float):
        self.oracle = oracle
        self.term = term
        self.field = field
        self.boost = boost
        self.scores, self.idf = oracle._term_scores(field, term, boost)
        self.query_weight = 1.0

    def weight(self) -> float:
        s = self.boost * self.idf
        return s * s

    def set_query_norm(self, qnorm: float):
        self.query_weight = self.boost * self.idf * qnorm

    def evaluate(self, _):
        if self.query_weight != 1.0:
            return {d: s * self.query_weight for d, s in self.scores.items()}
        return dict(self.scores)

    def positions(self, doc_id: str, term: Optional[str] = None):
        p = self.oracle.postings[self.field].get(self.term, {}).get(doc_id)
        return p[1] if p else ()


class _ConjNode:
    def __init__(self, children):
        self.children = children
        sum_sq = sum(c.weight() for c in children)
        if sum_sq > 0:
            qnorm = 1.0 / math.sqrt(sum_sq)
            for c in children:
                c.set_query_norm(qnorm)

    def weight(self):
        return sum(c.weight() for c in self.children)

    def set_query_norm(self, qnorm):
        for c in self.children:
            c.set_query_norm(qnorm)

    def evaluate(self, _):
        results = [c.evaluate(1.0) for c in self.children]
        if not results:
            return {}
        docs = set(results[0])
        for r in results[1:]:
            docs &= set(r)
        return {d: sum(r[d] for r in results) for d in docs}


class _DisjNode:
    def __init__(self, children, min_match=0):
        self.children = children
        self.min_match = min_match
        sum_sq = sum(c.weight() for c in children)
        if sum_sq > 0:
            qnorm = 1.0 / math.sqrt(sum_sq)
            for c in children:
                c.set_query_norm(qnorm)

    def weight(self):
        return sum(c.weight() for c in self.children)

    def set_query_norm(self, qnorm):
        for c in self.children:
            c.set_query_norm(qnorm)

    def evaluate(self, _):
        results = [c.evaluate(1.0) for c in self.children]
        total = len(self.children)
        agg: Dict[str, Tuple[float, int]] = {}
        for r in results:
            for d, s in r.items():
                prev = agg.get(d, (0.0, 0))
                agg[d] = (prev[0] + s, prev[1] + 1)
        out = {}
        for d, (s, cnt) in agg.items():
            if cnt >= self.min_match:
                out[d] = s * (cnt / total)
        return out


class _BoolNode:
    def __init__(self, must, should, must_not):
        self.must = must
        self.should = should
        self.must_not = must_not
        sum_sq = 0.0
        if must is not None:
            sum_sq += must.weight()
        if should is not None:
            sum_sq += should.weight()
        if sum_sq > 0:
            qnorm = 1.0 / math.sqrt(sum_sq)
            if must is not None:
                must.set_query_norm(qnorm)
            if should is not None:
                should.set_query_norm(qnorm)

    def weight(self):
        w = 0.0
        if self.must is not None:
            w += self.must.weight()
        if self.should is not None:
            w += self.should.weight()
        return w

    def set_query_norm(self, qnorm):
        if self.must is not None:
            self.must.set_query_norm(qnorm)
        if self.should is not None:
            self.should.set_query_norm(qnorm)

    def evaluate(self, _):
        m = self.must.evaluate(1.0) if self.must is not None else None
        s = self.should.evaluate(1.0) if self.should is not None else None
        mn = self.must_not.evaluate(1.0) if self.must_not is not None else {}
        out = {}
        if m is not None:
            min_should = getattr(self.should, "min_match", 0) if s is not None else 0
            for d, sc in m.items():
                if d in mn:
                    continue
                if s is not None and d in s:
                    out[d] = sc + s[d]
                elif min_should == 0:
                    out[d] = sc
        elif s is not None:
            out = {d: sc for d, sc in s.items() if d not in mn}
        return out


class _PhraseNode:
    def __init__(self, oracle: OracleIndex, phrase: List[List[str]], field: str, boost: float):
        self.oracle = oracle
        self.field = field
        self.slots = []
        self.offsets = []
        for i, slot in enumerate(phrase):
            terms = [t for t in slot if t]
            if terms:
                self.slots.append(terms)
                self.offsets.append(i)
        children = []
        for terms in self.slots:
            if len(terms) == 1:
                children.append(_TermNode(oracle, terms[0], field, boost))
            else:
                children.append(
                    _DisjNode(
                        [_TermNode(oracle, t, field, boost) for t in terms],
                        min_match=1,
                    )
                )
        self.must = _ConjNode(children)

    def weight(self):
        return self.must.weight()

    def set_query_norm(self, qnorm):
        self.must.set_query_norm(qnorm)

    def evaluate(self, _):
        cand = self.must.evaluate(1.0)
        out = {}
        base = self.offsets[0] if self.offsets else 0
        for d, sc in cand.items():
            # positions per slot
            ok = None
            for si, terms in enumerate(self.slots):
                poss = set()
                for t in terms:
                    p = self.oracle.postings[self.field].get(t, {}).get(d)
                    if p:
                        poss |= set(p[1])
                delta = self.offsets[si] - base
                cand_pos = {p - delta for p in poss}
                ok = cand_pos if ok is None else (ok & cand_pos)
                if not ok:
                    break
            if ok:
                out[d] = sc
        return out


class _MatchAllNode:
    def __init__(self, oracle, boost):
        self.oracle = oracle
        self.boost = boost
        self.query_weight = 1.0

    def weight(self):
        return self.boost * self.boost

    def set_query_norm(self, qnorm):
        self.query_weight = self.boost * qnorm

    def evaluate(self, _):
        sc = 1.0 * self.query_weight if self.query_weight != 1.0 else 1.0
        return {d: sc for d in self.oracle.doc_ids}


def _build_node(oracle: OracleIndex, q: dict, default_field: str = "content"):
    boost = q.get("boost", 1.0)
    field = q.get("field", default_field)
    if "match" in q:
        analyzer = analyzer_named(q.get("analyzer") or "standard")
        tokens = analyzer.analyze(q["match"])
        terms = [t.term for t in tokens]
        children = [_TermNode(oracle, t, field, boost) for t in terms]
        if not children:
            return _DisjNode([], 0)
        if q.get("operator", "or") == "and":
            return _ConjNode(children)
        return _DisjNode(children, min_match=1)
    if "match_phrase" in q:
        analyzer = analyzer_named(q.get("analyzer") or "standard")
        tokens = analyzer.analyze(q["match_phrase"])
        if not tokens:
            return _DisjNode([], 0)
        first = min(t.position for t in tokens)
        last = max(t.position for t in tokens)
        phrase = [[] for _ in range(last - first + 1)]
        for t in tokens:
            phrase[t.position - first].append(t.term)
        return _PhraseNode(oracle, phrase, field, boost)
    if "term" in q:
        return _TermNode(oracle, q["term"], field, boost)
    if "conjuncts" in q:
        return _ConjNode([_build_node(oracle, c, default_field) for c in q["conjuncts"]])
    if "disjuncts" in q:
        return _DisjNode(
            [_build_node(oracle, c, default_field) for c in q["disjuncts"]],
            min_match=q.get("min", 0),
        )
    if "must" in q or "should" in q or "must_not" in q:
        def sub(key, is_should):
            v = q.get(key)
            if v is None:
                return None
            if isinstance(v, list):
                nodes = [_build_node(oracle, c, default_field) for c in v]
                if key == "must":
                    return _ConjNode(nodes)
                return _DisjNode(nodes, min_match=q.get("min_should", 0) if is_should else 0)
            return _build_node(oracle, v, default_field)

        return _BoolNode(sub("must", False), sub("should", True), sub("must_not", False))
    if "prefix" in q:
        terms = sorted(
            t for t in oracle.postings[field] if t.startswith(q["prefix"])
        )
        if not terms:
            return _DisjNode([], 0)
        return _DisjNode(
            [_TermNode(oracle, t, field, boost) for t in terms], min_match=0
        )
    if "match_all" in q:
        return _MatchAllNode(oracle, boost)
    if "match_none" in q:
        return _DisjNode([], 0)
    raise ValueError(f"oracle cannot build {q!r}")
