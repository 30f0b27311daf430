"""Declared per-field analysis chains (ES per-field analyzers / Lucene
analysis chains, the configurable half of the mapping surface).

The engine's base analyzer is the pinned code-aware tokenizer
(tokenize.py — one spec, Arrow and JVM impls equality-tested). ES lets
every FIELD declare additional token filters on top of its tokenizer —
stopword removal, stemming — and enforces the same chain on query
terms, or surface forms silently stop matching. This module is that
declaration: an :class:`AnalyzerChain` travels inside ``IndexConfig``
as SEMANTIC fields (``stop_words``, ``stem_tokens``), so the build
persists it in catalog properties, readers adopt it (query-side parity
is enforced by construction, not by caller discipline), and a
mismatched reader config fails loudly like any k1/b mismatch.

Two implementations of ONE spec, mirroring the tokenizer's discipline:

* ``chain_tokens_sql`` — Catalyst column expression over the token
  array (``F.filter`` + ``F.transform`` with the shared S-stemmer SQL
  text), applied at BUILD time inside whole-stage codegen: no Python
  in the hot path, the filter happens before ``doc_len`` is measured
  so BM25 length norms see the indexed stream.
* ``chain_terms`` — the driver-side mirror for QUERY terms (list in,
  list out, no Spark job). Equivalence is property-gated in
  tests/test_analysis.py (random token soup through both paths).

Stopword positions are NOT preserved (tokens renumber densely): phrase
adjacency on a chained index means "adjacent after the filter", the
``enable_position_increments=false`` behavior of Lucene's StopFilter.
That is a per-index contract, persisted with the chain.

At 100 TB a chain is pure win: stopword removal shrinks the heaviest
posting lists (stopwords are the skew kings) before they are ever
shuffled, and stemming folds the long tail of the vocabulary — both
run as JVM expressions inside the one existing tokenize pass, adding
zero jobs and zero shuffles to the build.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import functions as F

from .expand import s_stem


@dataclass(frozen=True)
class AnalyzerChain:
    """Post-tokenizer filters, applied in declaration order:
    stopword removal first, then stemming (ES's conventional filter
    order — stopwords are declared as surface forms)."""

    stop_words: frozenset[str] = frozenset()
    stem: bool = False

    @property
    def is_noop(self) -> bool:
        return not self.stop_words and not self.stem


def chain_from_config(cfg) -> AnalyzerChain:
    """The chain an ``IndexConfig`` declares. ``cfg.stop_words`` is the
    canonical space-separated string form (JSON-safe for catalog
    properties); ``cfg.stem_tokens`` toggles the S-stemmer."""
    return AnalyzerChain(
        stop_words=frozenset(cfg.stop_words.split()),
        stem=bool(cfg.stem_tokens),
    )


def s_stem_col(c):
    """The S-stemmer (expand.s_stem / s_stem_sql — one spec, third
    equality-tested form) as a Column function usable inside
    higher-order-function lambdas, where SQL text can't reference the
    lambda variable by name."""
    minus1 = F.substring(c, F.lit(1), F.length(c) - 1)
    ies_y = F.concat(F.substring(c, F.lit(1), F.length(c) - 3), F.lit("y"))
    return (
        F.when(
            c.endswith("ies"),
            F.when(c.endswith("eies") | c.endswith("aies"), c).otherwise(
                ies_y
            ),
        )
        .when(
            c.endswith("es"),
            F.when(
                c.endswith("aes") | c.endswith("ees") | c.endswith("oes"), c
            ).otherwise(minus1),
        )
        .when(
            c.endswith("s"),
            F.when(c.endswith("us") | c.endswith("ss"), c).otherwise(minus1),
        )
        .otherwise(c)
    )


def chain_tokens_sql(tokens_col, chain: AnalyzerChain):
    """Apply the chain to an ``array<string>`` token column as pure
    Catalyst expressions (whole-stage codegen, zero Python workers)."""
    out = tokens_col
    if chain.stop_words:
        stops = sorted(chain.stop_words)
        out = F.filter(out, lambda t: ~t.isin(*stops))
    if chain.stem:
        out = F.transform(out, s_stem_col)
    return out


def chain_terms(terms: list[str], chain: AnalyzerChain) -> list[str]:
    """Driver-side mirror for query terms: same filter order, same
    stemmer, order-preserving (duplicate handling stays the caller's —
    scoring lanes dedup with dict.fromkeys as before)."""
    out = [t for t in terms if t not in chain.stop_words]
    if chain.stem:
        out = [s_stem(t) for t in out]
    return out
