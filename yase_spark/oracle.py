"""Independent naive full-text oracle (SURVEY.md §5.3, M2).

A deliberately simple, Spark-free engine: dict-of-lists inverted index,
full scan BM25, plain sorts. Produces the golden ``query_results``
(rank-identical top-k doc_ids, bitwise-equal float64 scores) that the
Spark engine must reproduce (BASELINE.json:6). Shares ONLY the tokenizer
module with the engine (analyzer parity is part of the spec); scoring and
index structures are written independently of the Spark path.
"""

from __future__ import annotations

import hashlib
import math
from dataclasses import dataclass, field

from .config import B, K1
from .tokenize import analyze_query, tokenize_text


@dataclass
class NaiveIndex:
    k1: float = K1
    b: float = B
    ngrams: bool = True
    postings: dict[str, dict[int, int]] = field(default_factory=dict)  # term -> {doc: tf}
    doc_len: dict[int, int] = field(default_factory=dict)
    n_docs: int = 0
    avgdl: float = 0.0

    def add(self, doc_id: int, text: str) -> None:
        toks = tokenize_text(text, ngrams=self.ngrams)
        self.doc_len[doc_id] = len(toks)
        for t in toks:
            self.postings.setdefault(t, {})
            self.postings[t][doc_id] = self.postings[t].get(doc_id, 0) + 1

    def finalize(self) -> None:
        self.n_docs = len(self.doc_len)
        total = sum(self.doc_len.values())
        self.avgdl = total / self.n_docs if self.n_docs else 0.0

    # ---------------------------------------------------------- queries
    def idf(self, term: str) -> float:
        df = len(self.postings.get(term, {}))
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def topk(self, query: str, k: int = 10) -> list[tuple[int, int, float]]:
        """Full-scan BM25 -> [(rank, doc_id, score)].

        Summation over unique query terms in first-occurrence order —
        the fixed order the engine must match bitwise.
        """
        terms = analyze_query(query)
        scores: dict[int, float] = {}
        # fixed order: iterate terms outer, docs inner; accumulate in
        # term order per doc via repeated dict adds (IEEE order = term order)
        candidates: list[int] = sorted(
            {d for t in terms for d in self.postings.get(t, {})}
        )
        for d in candidates:
            s = 0.0
            dl = self.doc_len[d]
            for t in terms:
                tf = self.postings.get(t, {}).get(d)
                if tf:
                    idf = self.idf(t)
                    s += idf * (tf * (self.k1 + 1.0)) / (
                        tf + self.k1 * (1.0 - self.b + self.b * (dl / self.avgdl))
                    )
            scores[d] = s
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        return [(i + 1, d, s) for i, (d, s) in enumerate(ranked)]

    def bool_and(self, query: str) -> list[int]:
        terms = analyze_query(query)
        if not terms:
            return []
        sets = [set(self.postings.get(t, {})) for t in terms]
        out = set.intersection(*sets) if sets else set()
        return sorted(out)

    def bool_or(self, query: str) -> list[int]:
        terms = analyze_query(query)
        out: set[int] = set()
        for t in terms:
            out |= set(self.postings.get(t, {}))
        return sorted(out)


def build_naive(rows: list[tuple[int, str]], ngrams: bool = True) -> NaiveIndex:
    ix = NaiveIndex(ngrams=ngrams)
    for doc_id, text in rows:
        ix.add(doc_id, text)
    ix.finalize()
    return ix


def sha256_hex(text: str) -> str:
    return hashlib.sha256(text.encode("utf-8")).hexdigest()
