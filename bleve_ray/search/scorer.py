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
