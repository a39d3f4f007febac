"""Scorers -- exact ports of the reference scoring math, vectorized.

All formulas follow search/scorer/scorer_term.go (see SURVEY.md §2.7):

- BM25 idf   = ln(1 + (docTotal - docTerm + 0.5)/(docTerm + 0.5))   [:65-77]
- TF-IDF idf = 1 + ln(docTotal/(docTerm + 1))
- tf = sqrt(freq)                                                    [:199-211]
- BM25 score = idf * (tf*k1) / (tf + k1*(1 - b + b*fieldLength/avgDocLength))
  with fieldLength = 1/(norm*norm), norm stored float32              [:142-150]
- TF-IDF score = tf * norm * idf                                     [:153]
- Weight() = (boost*idf)^2; queryWeight = boost*idf*queryNorm        [:112-122]
- score *= queryWeight iff queryWeight != 1 (a single bare term query
  never gets SetQueryNorm -> weight stays 1)                         [:222-235]
- avgDocLength = ceil(fieldCardinality/docCount)
  (search/searcher/search_term.go:113)
- k1 = 1.2, b = 0.75 (search/util.go:275-276)
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np

BM25_K1 = 1.2
BM25_B = 0.75


def compute_idf(avg_doc_length: float, doc_total: int, doc_term: int) -> float:
    if avg_doc_length > 0:
        return math.log(
            1 + (float(doc_total) - float(doc_term) + 0.5) / (float(doc_term) + 0.5)
        )
    return 1.0 + math.log(float(doc_total) / float(doc_term + 1.0))


class TermQueryScorer:
    """Vectorized equivalent of scorer_term.go's TermQueryScorer."""

    def __init__(
        self,
        term: str,
        field: str,
        boost: float,
        doc_total: int,
        doc_term: int,
        avg_doc_length: float,
    ):
        self.term = term
        self.field = field
        self.boost = boost
        self.doc_total = doc_total
        self.doc_term = doc_term
        self.avg_doc_length = avg_doc_length
        self.idf = compute_idf(avg_doc_length, doc_total, doc_term)
        self.query_norm = 0.0
        self.query_weight = 1.0

    def weight(self) -> float:
        s = self.boost * self.idf
        return s * s

    def set_query_norm(self, qnorm: float) -> None:
        self.query_norm = qnorm
        self.query_weight = self.boost * self.idf * qnorm

    def score(self, tfs: np.ndarray, norms: np.ndarray) -> np.ndarray:
        tf = np.sqrt(tfs.astype(np.float64))
        if self.avg_doc_length > 0:
            norm64 = norms.astype(np.float64)
            field_length = 1.0 / (norm64 * norm64)
            score = (
                self.idf
                * (tf * BM25_K1)
                / (
                    tf
                    + BM25_K1
                    * (1 - BM25_B + (BM25_B * field_length / self.avg_doc_length))
                )
            )
        else:
            score = tf * norms.astype(np.float64) * self.idf
        if self.query_weight != 1.0:
            score = score * self.query_weight
        return score


class ConstantScorer:
    """scorer_constant.go: constant score (match_all), boost * queryNorm."""

    def __init__(self, constant: float, boost: float):
        self.constant = constant
        self.boost = boost
        self.query_norm = 0.0
        self.query_weight = 1.0

    def weight(self) -> float:
        s = self.boost
        return s * s

    def set_query_norm(self, qnorm: float) -> None:
        self.query_norm = qnorm
        self.query_weight = self.boost * qnorm

    def score_value(self) -> float:
        score = self.constant
        if self.query_weight != 1.0:
            score = score * self.query_weight
        return score


# --- explanations (scorer_term.go:102-146,159-245; "explain": true) --------


def _f(x: float) -> str:
    """Go %f = fixed six decimals."""
    return f"{float(x):.6f}"


class Explanation(dict):
    """Explanation tree node; plain dict so it JSON-serializes directly
    (reference search.Explanation: value/message/children)."""

    def __init__(self, value, message, children=None):
        super().__init__(value=float(value), message=message)
        if children:
            self["children"] = list(children)


def _idf_explanation(scorer) -> Explanation:
    return Explanation(
        scorer.idf,
        f"idf(docFreq={scorer.doc_term}, maxDocs={scorer.doc_total})",
    )


def _query_weight_explanation(scorer) -> Explanation:
    return Explanation(
        scorer.query_weight,
        f"queryWeight({scorer.field}:{scorer.term}^{_f(scorer.boost)}),"
        " product of:",
        [
            Explanation(scorer.boost, "boost"),
            Explanation(scorer.query_norm, "queryNorm"),
            _idf_explanation(scorer),
        ],
    )


def term_explanation(scorer, freq: int, norm: float, doc_id: str):
    """Per-hit explanation tree for one term scorer, mirroring the
    reference's message formats and nesting."""
    tf = math.sqrt(float(freq))
    if scorer.avg_doc_length > 0:
        norm64 = float(norm)
        field_length = 1.0 / (norm64 * norm64)
        field_norm = 1 - BM25_B + (BM25_B * field_length / scorer.avg_doc_length)
        score = (
            scorer.idf * (tf * BM25_K1) / (tf + BM25_K1 * field_norm)
        )
        children = [
            Explanation(
                tf, f"tf(termFreq({scorer.field}:{scorer.term})={freq}"
            ),
            Explanation(
                BM25_K1 / (tf + BM25_K1 * field_norm),
                f"saturation(term:{scorer.term}), k1={_f(BM25_K1)}/"
                f"(tf={_f(tf)} + k1*fieldNorm={_f(field_norm)}))",
                [
                    Explanation(
                        field_norm,
                        f"fieldNorm(field={scorer.field}), b={_f(BM25_B)},"
                        f" fieldLength={_f(field_length)},"
                        f" avgFieldLength={_f(scorer.avg_doc_length)})",
                    )
                ],
            ),
            _idf_explanation(scorer),
        ]
        model = "bm25"
    else:
        score = tf * float(norm) * scorer.idf
        children = [
            Explanation(
                tf, f"tf(termFreq({scorer.field}:{scorer.term})={freq}"
            ),
            Explanation(
                norm, f"fieldNorm(field={scorer.field}, doc={doc_id})"
            ),
            _idf_explanation(scorer),
        ]
        model = "tfidf"
    expl = Explanation(
        score,
        f"fieldWeight({scorer.field}:{scorer.term} in {doc_id}),"
        f" as per {model} model, product of:",
        children,
    )
    if scorer.query_weight != 1.0:
        expl = Explanation(
            score * scorer.query_weight,
            f"weight({scorer.field}:{scorer.term}^{_f(scorer.boost)}"
            f" in {doc_id}), product of:",
            [_query_weight_explanation(scorer), expl],
        )
    return expl


def constant_explanation(scorer, doc_id: str):
    expl = Explanation(scorer.constant, "ConstantScore()")
    if scorer.query_weight != 1.0:
        expl = Explanation(
            scorer.constant * scorer.query_weight,
            f"weight(^{_f(scorer.boost)}), product of:",
            [
                Explanation(
                    scorer.query_weight,
                    f"ConstantScore()^{_f(scorer.boost)}, product of:",
                    [
                        Explanation(scorer.boost, "boost"),
                        Explanation(scorer.query_norm, "queryNorm"),
                    ],
                ),
                expl,
            ],
        )
    return expl
