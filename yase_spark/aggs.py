"""Search-engine aggregations over the documents/events tables (ES
parity surface beyond the match-set facets in query.py: ``composite``
paging, ``cardinality``, ``rare_terms``, and the ``date_histogram`` +
pipeline-aggregation family).

All are pure relational programs: Catalyst plans the partial (map-side
combine) aggregation, the single shuffle is keyed by the grouping keys,
and output is bucket-sized, never corpus-sized. At 100 TB the composite
pager is the only sane way to enumerate a large bucket space (each page
is an independent bounded query — no server-side cursor state), which is
exactly why ES deprecated deep terms-agg paging in its favor. The
pipeline aggregations (derivative / cumulative_sum / moving_fn) run
AFTER the histogram reduction, over bucket-sized data — the window pass
they need never sees a raw event row.
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


def date_histogram_pipeline(
    events: DataFrame, hours: int = 1, window: int = 3
) -> DataFrame:
    """ES ``date_histogram`` (fixed_interval, ``min_doc_count=0``
    gap-fill) per event_type, with the three canonical pipeline
    aggregations computed over the gap-filled bucket sequence:

    - ``derivative``: ``deriv_n = n - lag(n, 1, 0)``. ES omits the
      derivative FIELD on each type's first bucket; a flat relational
      schema cannot omit a field, so the zero left-boundary is the
      NULL-free encoding — chosen over NULL because it makes the
      telescoping identity ``n = Σ deriv_n`` (running sum of the
      derivative recovers the series exactly) hold with no boundary
      case; the first bucket remains identifiable as the one where
      ``cum_n == n``;
    - ``cumulative_sum``: ``cum_n`` (running doc count);
    - ``moving_fn`` (trailing mean): ``mov_avg_n_r`` over the last
      ``window`` buckets including the current one.

    Buckets are epoch-aligned (identical bucketing to DuckDB
    ``time_bucket``); the gap-fill spans each event_type's own
    [min_bucket, max_bucket] range (ES inserts empty buckets inside the
    parent histogram's populated range when ``min_doc_count=0``), so the
    derivative is taken over a DENSE time axis — the whole point of the
    pipeline family: a 3-bucket gap must show as three zero-count
    buckets, not one misleading adjacent delta.

    Output: (event_type, bucket_start, n, sum_value_r, deriv_n, cum_n,
    mov_avg_n_r), ordered.

    Scale shape: ONE hash aggregate (map-side partial combine) reduces
    the raw events to bucket rows; everything after — the per-type
    min/max, the ``sequence()`` gap-fill explode, the three window
    passes — runs over bucket-sized data (time_range/interval ×
    n_types rows), never corpus-sized. The windows partition by
    event_type, whose per-type row count is time-bounded, so no skew
    class exists that grows with corpus size."""
    from pyspark.sql import Window

    if window < 1:
        raise ValueError("moving window must be >= 1 bucket")
    iv = f"{hours} hour"
    hist = events.groupBy(
        F.window("ts", iv).start.alias("bucket_start"),
        "event_type",
    ).agg(
        F.count("*").alias("n"),
        F.sum("value").alias("sum_value"),
    )
    # dense per-type bucket axis: sequence() is evaluated on the
    # bucket-sized aggregate, one row per (type, bucket) after explode
    axis = (
        hist.groupBy("event_type")
        .agg(F.min("bucket_start").alias("lo"), F.max("bucket_start").alias("hi"))
        .select(
            "event_type",
            F.explode(
                F.sequence("lo", "hi", F.expr(f"interval {iv}"))
            ).alias("bucket_start"),
        )
    )
    dense = (
        axis.join(hist, ["event_type", "bucket_start"], "left")
        .withColumn("n", F.coalesce("n", F.lit(0)))
        .withColumn("sum_value", F.coalesce("sum_value", F.lit(0.0)))
    )
    w = Window.partitionBy("event_type").orderBy("bucket_start")
    return (
        dense.withColumn("deriv_n", F.col("n") - F.lag("n", 1, 0).over(w))
        .withColumn("cum_n", F.sum("n").over(w))
        .withColumn(
            "mov_avg_n_r",
            F.round(F.avg("n").over(w.rowsBetween(-(window - 1), 0)), 6),
        )
        .select(
            "event_type",
            "bucket_start",
            "n",
            F.round("sum_value", 6).alias("sum_value_r"),
            "deriv_n",
            "cum_n",
            "mov_avg_n_r",
        )
        .orderBy("event_type", "bucket_start")
    )


def rare_terms(
    docs: DataFrame, split: str, max_doc_count: int = 1, shingles: int = 1
) -> DataFrame:
    """ES ``rare_terms`` aggregation (exact flavor): terms whose
    document frequency is <= ``max_doc_count`` — the long tail the
    ordinary terms agg (ordered by descending count) structurally cannot
    page to. ``shingles=2`` runs it over the adjacent-word 2-shingle
    field (the standard ES setup when the unigram vocabulary is too
    small/common to have a tail at all). Output (term, df), ordered by
    (df, term).

    Scale shape: shingling is a map-only array transform (zip_with over
    two slices, no self-join); per-doc term distinct happens inside the
    partial agg, then ONE shuffle keyed by term for the global df count;
    the <= filter runs post-aggregation on term-sized data. ES itself
    gives up exactness here (CuckooFilter, documented false positives)
    because a coordinator node cannot hold the tail; a shuffle CAN — the
    exact flavor is both the oracle anchor and the thing the distributed
    engine is uniquely positioned to do."""
    if shingles not in (1, 2):
        raise ValueError("shingles must be 1 or 2")
    a = F.filter(F.split(F.lower("text"), split), lambda x: x != "")
    if shingles == 1:
        term = F.explode(a)
    else:
        pairs = F.when(
            F.size(a) >= 2,
            F.zip_with(
                F.slice(a, 1, F.size(a) - 1),
                F.slice(a, 2, F.size(a) - 1),
                lambda x, y: F.concat_ws(" ", x, y),
            ),
        ).otherwise(F.array().cast("array<string>"))
        term = F.explode(pairs)
    df_tbl = (
        docs.select("doc_id", term.alias("term"))
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
    )
    return df_tbl.filter(F.col("df") <= max_doc_count).orderBy("df", "term")
