"""Mergeable-sketch analytics: HyperLogLog cardinality, Misra-Gries
heavy hitters with an exact verification pass, and KMV bottom-k
sampling/distinct estimation.

These are the aggregations a 100-TB engine CANNOT run exactly at
interactive cost — the entire design burden is that the per-partition
summary must be (a) tiny, (b) mergeable by an associative/commutative
op Catalyst can treat as an ordinary partial aggregate, and (c) here,
additionally DETERMINISTIC, so the DuckDB oracles replay the sketch
bit-for-bit rather than settling for error-band checks:

* ``hll_cardinality`` — HyperLogLog (Flajolet et al. 2007) with 2^p
  registers. The hash is the repo's cross-engine md5-60-bit idiom
  (``curation._h60``), the register index is the top p bits, and the
  leading-zero rank rho comes from an EXACT integer bit-length CASE
  cascade (``_bits_sql``) instead of ``floor(log2(w))`` — a float log
  at a power-of-two boundary may round differently across engines; a
  comparison ladder cannot. The register table (group × 2^p rows) IS
  the shuffle payload; merge = max per register — the classic
  "count distinct across 10^5 partitions with 2 KB per group" shape.
* ``heavy_hitters`` — the Misra-Gries/space-saving guarantee made
  EXACT: per-partition weighted MG over pre-aggregated token counts
  keeps k=ceil(1/phi) counters; any item with global frequency
  > phi·n must exceed phi·n_p in at least one partition (pigeonhole),
  so the union of per-partition candidates is a SUPERSET of the true
  heavy hitters. A second exact pass counts ONLY the candidate set
  (broadcast isin — postings-sized scan, candidate-sized aggregate)
  and filters to > phi·n: the output is exactly "every term with
  frequency > phi·n", SQL-replayable by a plain HAVING — the sketch
  bounds the candidate memory, the second pass restores exactness.
* ``kmv_bottomk`` — the k-minimum-values sketch: the k smallest
  deterministic hashes of a key column. Simultaneously a uniform
  sample (md5 order is corpus-order-independent), a mergeable
  summary (merge = bottom-k of the union), and a distinct-count
  estimator ((k-1)·H / h_(k)). orderBy().limit(k) compiles to
  TakeOrderedAndProject — per-partition heaps, P·k at the driver.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .curation import _h60

# 60-bit hash space: top HLL_P bits index the register, the remaining
# 60-HLL_P bits feed the leading-zero rank
H_BITS = 60
HLL_P = 8  # 256 registers; standard error 1.04/sqrt(256) ~ 6.5%


def _bits_sql(col: str, max_bits: int) -> str:
    """SQL text of EXACT integer bit-length (floor(log2(w))+1, 0 for
    w<=0) as a comparison ladder — no float log anywhere, so every SQL
    engine computes the identical integer. Shared verbatim with the
    DuckDB oracles (the same parity device as the PII patterns)."""
    whens = " ".join(
        f"WHEN {col} >= {1 << (b - 1)} THEN {b}"
        for b in range(max_bits, 0, -1)
    )
    return f"(CASE {whens} ELSE 0 END)"


def h60_duckdb(expr: str) -> str:
    """DuckDB spelling of the SAME 60-bit md5 hash as curation._h60
    (Spark needs conv(hex,16,10); DuckDB casts a 0x literal — the two
    forms are value-identical, the repo-wide cross-engine idiom)."""
    return f"cast(concat('0x', substring(md5({expr}), 1, 15)) as bigint)"


def hll_register_sql(expr: str, dialect: str = "spark") -> tuple[str, str]:
    """(bucket_sql, rho_sql) for the value expression ``expr``:
    bucket = top HLL_P hash bits, rho = 1 + leading zeros of the
    remaining w bits = (60 - HLL_P) - bitlen(w) + 1. Everything except
    the engine-specific md5->bigint spelling is SHARED text, so both
    engines compute identical registers."""
    wbits = H_BITS - HLL_P
    h = _h60(expr) if dialect == "spark" else h60_duckdb(expr)
    # exact top-bits extraction WITHOUT integer-division syntax (Spark
    # `div` vs DuckDB `//` differ): (h - h % 2^w) is a multiple of 2^w
    # bounded by 2^60, so the double division is exact and the cast is
    # rounding-free in both engines
    d = 1 << wbits
    bucket = f"cast((({h}) - (({h}) % {d})) / {d} as bigint)"
    w = f"({h}) % {d}"
    rho = f"({wbits} + 1 - {_bits_sql(f'({w})', wbits)})"
    return bucket, rho


# HLL bias-correction constant for m >= 128 registers
def _alpha(m: int) -> float:
    return 0.7213 / (1.0 + 1.079 / m)


def hll_cardinality(
    df: DataFrame, group_col: str, value_expr: str
) -> DataFrame:
    """Approximate COUNT(DISTINCT value_expr) per ``group_col`` via
    deterministic HyperLogLog. Output (group, nonzero_registers,
    est_r): the estimate applies the standard small-range correction
    (linear counting when raw <= 2.5m and empty registers exist).

    Scale shape: ONE hash aggregate keyed by (group, bucket) — map-side
    combinable max, 2^p rows per group out of the shuffle — then a
    group-keyed reduce of the 2^p registers. Nothing proportional to
    the distinct count ever moves: that is the entire point vs the
    exact ``distinct_counts`` twin (documented swap-out in both
    directions; the exact flavor is the oracle anchor for the REGISTER
    math here, not for the estimate's accuracy, which pytest gates
    against the exact count)."""
    m = 1 << HLL_P
    bucket, rho = hll_register_sql(value_expr)
    regs = (
        df.select(
            F.col(group_col).alias("grp"),
            F.expr(bucket).alias("bucket"),
            F.expr(rho).alias("rho"),
        )
        .groupBy("grp", "bucket")
        .agg(F.max("rho").alias("mr"))
    )
    agg = regs.groupBy("grp").agg(
        F.count("*").alias("present"),
        F.sum(F.expr("pow(cast(2.0 as double), -mr)")).alias("s_present"),
    )
    # absent registers contribute 2^0 = 1 each to the harmonic sum
    est = agg.select(
        F.col("grp"),
        F.col("present").alias("nonzero_registers"),
        F.expr(
            f"cast({_alpha(m)!r} as double) * {m} * {m} "
            f"/ (s_present + ({m} - present))"
        ).alias("raw"),
        (F.lit(m) - F.col("present")).alias("zeros"),
    )
    corrected = est.select(
        F.col("grp").alias(group_col),
        "nonzero_registers",
        F.round(
            F.when(
                (F.col("raw") <= 2.5 * m) & (F.col("zeros") > 0),
                F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("zeros")),
            ).otherwise(F.col("raw")),
            6,
        ).alias("est_r"),
    )
    return corrected.orderBy(group_col)


def _mg_fold(counts: dict, items, ns, k: int) -> None:
    """Weighted Misra-Gries fold of pre-aggregated (item, count) pairs
    into ``counts`` keeping at most k entries: add, then if over k,
    subtract the (k+1)-th largest count from everything and drop the
    non-positive (the standard weighted reduction — each subtraction
    is charged against n/k total mass, preserving the
    count >= true - n/k guarantee)."""
    for it, n in zip(items, ns):
        counts[it] = counts.get(it, 0) + int(n)
    if len(counts) > k:
        kth = sorted(counts.values(), reverse=True)[k]
        for it in list(counts):
            c = counts[it] - kth
            if c > 0:
                counts[it] = c
            else:
                del counts[it]


def heavy_hitters(
    docs: DataFrame, split: str, phi: float = 0.01
) -> DataFrame:
    """EXACT "every term with frequency > phi·n" via the two-pass
    sketch protocol: per-partition weighted Misra-Gries candidates
    (bounded memory: ceil(1/phi) counters per task regardless of
    vocabulary size), then one exact count over the broadcast
    candidate set. Output (term, cnt), cnt descending, term tie-break.

    Why exact: freq(t) > phi·n  ⇒  freq_p(t) > phi·n_p in at least one
    partition p (else summing the per-partition bounds contradicts the
    global one), and MG with k = ceil(1/phi) counters retains every
    item with local frequency > n_p/k ≥ phi·n_p — so the candidate
    union is a superset and the exact pass makes the final set and
    counts literally true. At 10^12 tokens the first pass is the only
    full scan; the second scans again but aggregates only ~1/phi
    candidate terms (broadcast semi-join prunes before the shuffle)."""
    if not (0.0 < phi < 1.0):
        raise ValueError("phi must be in (0, 1)")
    k = math.ceil(1.0 / phi)
    toks = docs.select(
        F.explode(
            F.expr(f"filter(split(lower(text), '{split}'), x -> x <> '')")
        ).alias("term")
    )

    def mg(batches):
        import numpy as np
        import pandas as pd

        counts: dict = {}
        for pdf in batches:
            items, ns = np.unique(pdf["term"].to_numpy(), return_counts=True)
            _mg_fold(counts, items, ns, k)
        if counts:
            yield pd.DataFrame({"term": list(counts)})

    cand = [
        r["term"]
        for r in toks.mapInPandas(mg, schema="term string").distinct().collect()
    ]
    if not cand:
        return toks.sparkSession.createDataFrame(
            [], schema="term string, cnt long"
        )
    n_total = toks.count()
    exact = (
        toks.filter(F.col("term").isin(cand))
        .groupBy("term")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") > float(phi) * n_total)
    )
    return exact.orderBy(F.desc("cnt"), F.asc("term"))


def kmv_bottomk(docs: DataFrame, key_expr: str, k: int = 64) -> DataFrame:
    """K-minimum-values sketch over ``key_expr``: the k smallest
    deterministic 60-bit hashes. Output (rank, key, h) hash-ascending.
    The k-th hash doubles as a distinct estimator ((k-1)·2^60 / h_(k),
    see ``kmv_estimate``); the row set is simultaneously a uniform
    corpus-order-independent sample and a mergeable summary (merge two
    sketches = bottom-k of the union — the property that lets 10^5
    partitions each ship k rows)."""
    from pyspark.sql import Window

    h = _h60(key_expr)
    top = (
        docs.select(F.expr(key_expr).alias("key"), F.expr(h).alias("h"))
        .dropDuplicates(["h"])
        .orderBy(F.asc("h"))
        .limit(k)
    )
    w = Window.orderBy(F.asc("h"))
    return top.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "rank", "key", "h"
    )


def kmv_estimate(sketch_rows: list, k: int) -> float:
    """Distinct-count estimate from a collected bottom-k sketch:
    (k-1) · 2^60 / h_(k) (the classic KMV estimator); if the sketch
    holds fewer than k hashes the count is exact (== len)."""
    if len(sketch_rows) < k:
        return float(len(sketch_rows))
    hk = max(r["h"] for r in sketch_rows)
    return (k - 1) * float(1 << H_BITS) / float(hk)


def sampled_percentiles(
    docs: DataFrame,
    group_col: str,
    value_col: str,
    ps: list[float],
    k: int = 256,
    key_expr: str = "cast(doc_id as string)",
) -> DataFrame:
    """Approximate per-group percentiles from a DETERMINISTIC uniform
    sample: each group keeps the k rows with the smallest md5-60 hash
    of ``key_expr`` (the KMV sample — corpus-order-independent and
    mergeable: bottom-k of unions), then reports the exact
    percentile_disc of each requested p over the sample. Output
    (group, p, value, sample_n), ordered.

    This is the honest scale path next to the exact
    ``aggs.group_percentiles`` window: at 10^12 rows the exact
    per-group sort is the cost ceiling, while the sample bound is
    k·groups rows TOTAL after one shuffle — with the classic
    sample-quantile error ~1/sqrt(k) (pytest gates the band). Unlike
    t-digest/reservoir implementations the sample is a pure function
    of the data, so re-runs, engines, and merge orders all agree —
    which is what makes the driver oracle full-value rather than
    error-band-only."""
    from pyspark.sql import Window

    if not ps or any(not (0.0 < p <= 1.0) for p in ps):
        raise ValueError("ps must be fractions in (0, 1]")
    if k < 1:
        raise ValueError("k must be >= 1")
    h = _h60(key_expr)
    wh = Window.partitionBy(group_col).orderBy(F.col("_h").asc())
    sample = (
        docs.select(group_col, value_col, F.expr(h).alias("_h"))
        .withColumn("_rn", F.row_number().over(wh))
        .filter(F.col("_rn") <= k)
    )
    wv = Window.partitionBy(group_col).orderBy(
        F.col(value_col).asc(), F.col("_h").asc()
    )
    ranked = sample.select(
        group_col,
        F.col(value_col),
        F.col("_h"),
        F.row_number().over(wv).alias("_vr"),
        F.count("*").over(
            Window.partitionBy(group_col)
        ).alias("sample_n"),
    )
    pdf = docs.sparkSession.createDataFrame(
        [(float(p),) for p in ps], "p double"
    )
    picked = ranked.join(F.broadcast(pdf)).filter(
        F.col("_vr")
        == F.greatest(
            F.lit(1), F.ceil(F.col("p") * F.col("sample_n")).cast("int")
        )
    )
    return picked.select(
        group_col, "p", F.col(value_col).alias("value"), "sample_n"
    ).orderBy(group_col, "p")
