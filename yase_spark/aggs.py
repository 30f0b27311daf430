"""Search-engine aggregations over the documents table (ES parity
surface beyond the match-set facets in query.py: ``composite`` paging
and ``cardinality``).

Both are pure relational programs: Catalyst plans the partial (map-side
combine) aggregation, the single shuffle is keyed by the grouping keys,
and output is bucket-sized, never corpus-sized. At 100 TB the composite
pager is the only sane way to enumerate a large bucket space (each page
is an independent bounded query — no server-side cursor state), which is
exactly why ES deprecated deep terms-agg paging in its favor.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def composite_agg(
    docs: DataFrame,
    keys: list[str],
    size: int = 10,
    after: tuple | None = None,
) -> DataFrame:
    """ES ``composite`` aggregation: multi-key terms buckets with
    doc counts, ordered by the key tuple, paginated with an exclusive
    ``after`` cursor (the last key tuple of the previous page — exactly
    ES ``after``). Stateless paging: every page is an independent
    bounded aggregation, so a 10^9-bucket space streams out page by
    page with bounded driver memory and no cross-request state.

    Scale shape: ONE hash aggregate (map-side partial combine) keyed by
    the bucket tuple; the ``after`` predicate prunes BEFORE the shuffle
    (strictly-greater rows only); orderBy().limit(size) compiles to
    TakeOrderedAndProject. NULL keys are excluded (ES composite skips
    missing-by-default)."""
    if not keys:
        raise ValueError("composite_agg needs at least one key")
    d = docs
    for c in keys:
        d = d.filter(F.col(c).isNotNull())
    if after is not None:
        if len(after) != len(keys):
            raise ValueError(f"after cursor must have {len(keys)} values")
        # lexicographic strictly-greater: (k1 > a1) OR (k1 = a1 AND k2 > a2) ...
        cond: Column = F.lit(False)
        for i in range(len(keys)):
            eq = F.lit(True)
            for j in range(i):
                eq = eq & (F.col(keys[j]) == F.lit(after[j]))
            cond = cond | (eq & (F.col(keys[i]) > F.lit(after[i])))
        d = d.filter(cond)
    g = d.groupBy(*keys).agg(F.count("*").alias("doc_count"))
    return g.orderBy(*[F.asc(c) for c in keys]).limit(size)


def group_percentiles(
    docs: DataFrame, group_col: str, value_col: str, ps: list[float]
) -> DataFrame:
    """ES ``percentiles`` aggregation, EXACT discrete flavor: per
    ``group_col`` bucket, the value at ascending rank
    ``max(1, ceil(p·n))`` for each requested quantile p — the
    percentile_disc definition, chosen over interpolation because the
    picked value is an actual data point and is deterministic under
    value ties regardless of tie ordering (any permutation of equal
    values puts the same value at a fixed rank), which makes it exactly
    oracle-replayable. Output (group, p, value), ordered.

    Scale shape: ONE shuffle (the per-group sort window); the tiny p
    list broadcast-cross-joins the ranked rows and only the matching
    ranks survive. At 10^12 rows swap the exact window for
    ``percentile_approx`` (t-digest-style mergeable sketch, same output
    shape) — the exact flavor is the oracle anchor."""
    from pyspark.sql import Window

    if not ps:
        raise ValueError("group_percentiles needs at least one quantile")
    w = Window.partitionBy(group_col).orderBy(F.asc(value_col))
    wn = Window.partitionBy(group_col)
    d = (
        docs.select(group_col, value_col)
        .filter(F.col(value_col).isNotNull())
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count("*").over(wn))
    )
    ps_df = docs.sparkSession.createDataFrame(
        [(float(p),) for p in ps], schema="p double"
    )
    return (
        d.crossJoin(F.broadcast(ps_df))
        .filter(
            F.col("rn")
            == F.greatest(F.lit(1).cast("long"),
                          F.ceil(F.col("p") * F.col("n")).cast("long"))
        )
        .select(group_col, "p", F.col(value_col).alias("value"))
        .orderBy(group_col, "p")
    )


def distinct_counts(docs: DataFrame, group_col: str, split: str) -> DataFrame:
    """ES ``cardinality`` aggregation (exact flavor): the number of
    DISTINCT terms per ``group_col`` bucket over the tokenized text.
    Output (group value, n_terms, n_docs), ordered by group.

    Scale shape: Catalyst plans countDistinct as the two-phase expand
    (partial distinct per partition keyed by (group, term), then the
    merge) — one logical shuffle, no row ever carries more than a term.
    At 10^12 docs where even per-bucket distinct sets are huge, swap the
    exact count for ``approx_count_distinct`` (HLL++, fixed-size
    mergeable sketch, same plan shape) — the exact flavor is the oracle
    anchor."""
    toks = docs.select(
        group_col,
        "doc_id",
        F.explode(F.split(F.lower("text"), split)).alias("term"),
    ).filter(F.col("term") != "")
    return (
        toks.groupBy(group_col)
        .agg(
            F.countDistinct("term").alias("n_terms"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(group_col)
    )
