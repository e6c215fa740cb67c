"""Exact brute-force BM25 oracle, pure Python/numpy, Spark-free.

Plays the role of the reference's in-test brute-force KNN oracle
(/root/reference/tests/test_utils.hpp:67-105): every engine path (exact
DataFrame scorer, blocked WAND scorer, filtered variants) is
rank-checked against this on fixture corpora. Single-threaded, obvious,
no cleverness — trustworthiness over speed.
"""

from __future__ import annotations

import math
from collections import Counter

from pdx_spark.config import BM25Params
from pdx_spark.functions.tokenize import tokenize_py


class BM25Oracle:
    def __init__(self, docs: dict[int, str], params: BM25Params | None = None):
        """docs: doc_id -> raw text."""
        self.p = params or BM25Params()
        self.tf: dict[int, Counter] = {}
        self.dl: dict[int, int] = {}
        self.df: Counter = Counter()
        for doc_id, text in docs.items():
            toks = tokenize_py(text)
            c = Counter(toks)
            self.tf[doc_id] = c
            self.dl[doc_id] = len(toks)
            for t in c:
                self.df[t] += 1
        self.n_docs = len(docs)
        self.avgdl = (sum(self.dl.values()) / self.n_docs) if self.n_docs else 0.0

    def idf(self, term: str) -> float:
        df = self.df.get(term, 0)
        return math.log((self.n_docs - df + 0.5) / (df + 0.5) + 1.0)

    def score(self, terms: list[str], doc_id: int) -> float:
        p, s = self.p, 0.0
        dl = self.dl[doc_id]
        for t in sorted(set(terms)):  # fixed term order: float determinism
            tf = self.tf[doc_id].get(t, 0)
            if tf == 0:
                continue
            g = tf * (p.k1 + 1.0) / (tf + p.k1 * (1.0 - p.b + p.b * dl / self.avgdl))
            s += self.idf(t) * g
        return s

    def topk(self, query_text: str, k: int,
             allowed: set[int] | None = None,
             require_all_terms: bool = False,
             min_should_match: int = 1) -> list[tuple[int, float]]:
        """[(doc_id, score)] sorted (score desc, doc_id asc); only docs
        with score > 0 (no-match docs never enter a posting scan).
        require_all_terms=True: conjunctive semantics — candidates are
        the docs containing EVERY query term; a corpus-OOV term means
        no doc can match and the result is empty. min_should_match=m:
        candidates contain >= m distinct query terms (OR is m=1, AND
        is m=n)."""
        qterms = sorted(set(tokenize_py(query_text)))
        terms = [t for t in qterms if t in self.df]
        m = max(int(min_should_match), 1)
        if require_all_terms:
            m = len(qterms)
        if not terms or len(terms) < m:
            return []
        counts = Counter()
        for t in terms:
            for d, c in self.tf.items():
                if t in c:
                    counts[d] += 1
        candidates = {d for d, n in counts.items() if n >= m}
        if allowed is not None:
            candidates &= allowed
        scored = [(d, self.score(terms, d)) for d in candidates]
        scored.sort(key=lambda x: (-x[1], x[0]))
        return scored[:k]
