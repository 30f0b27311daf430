"""Corpus / term statistics (SURVEY.md §2.4 A1–A6).

All exact aggregations — BM25 idf must match the oracle bitwise, so no
``approx_count_distinct`` anywhere. Spark's hash aggregate already does
map-side partial aggregation; the explicit two-phase *salted* variant
(A5) exists for hot-key group-bys whose per-group state is large (and as
the spec-mandated skew strategy, BASELINE.json:6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def term_frequencies(exploded: DataFrame) -> DataFrame:
    """A1: (doc_id, doc_len, term) -> (term, doc_id, tf, dl)."""
    return exploded.groupBy("term", "doc_id").agg(
        F.count("*").alias("tf"), F.first("doc_len").alias("dl")
    )


def doc_frequencies(tf: DataFrame) -> DataFrame:
    """A2: exact df per term (tf rows are already distinct per doc)."""
    return tf.groupBy("term").agg(F.count("*").alias("df"))


def collection_frequencies(tf: DataFrame) -> DataFrame:
    """A3: cf = sum of tf per term."""
    return tf.groupBy("term").agg(F.sum("tf").alias("cf"))


def corpus_stats(docs: DataFrame) -> dict:
    """A4: BM25 globals. avgdl is derived driver-side from exact integer
    sums so every consumer (Spark scorer, WAND kernel, naive oracle)
    divides the same two numbers -> bitwise-identical avgdl."""
    row = docs.agg(
        F.count("*").alias("n_docs"), F.sum("doc_len").alias("total_tokens")
    ).collect()[0]
    n, total = int(row["n_docs"]), int(row["total_tokens"] or 0)
    return {
        "n_docs": n,
        "total_tokens": total,
        "avgdl": (total / n) if n else 0.0,
    }


def salted_two_phase_count(df: DataFrame, key: str, shards: int = 16) -> DataFrame:
    """A5: two-phase aggregation for hot keys: phase 1 groups by
    (key, salt), phase 2 re-aggregates by key. Equality with the plain
    group-by is a test + driver-oracle gate."""
    phase1 = (
        df.withColumn("_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(shards)))
        .groupBy(key, "_salt")
        .agg(F.count("*").alias("_c"))
    )
    return phase1.groupBy(key).agg(F.sum("_c").alias("cnt"))
