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


def distinct_tokens(split: str):
    """Column: a doc's DISTINCT non-empty lowercased tokens under the
    ``split`` regex — the ONE map-side tokenizer expression the
    term-set lanes share (terms_sharded, frequent_item_sets,
    sampler_agg, lookup.terms_lookup, cooccur.related_terms). Keeping
    it in one place means a tokenizer change cannot silently diverge
    between operators."""
    return F.array_distinct(
        F.filter(F.split(F.lower("text"), split), lambda x: x != "")
    )


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
    events: DataFrame, hours: int = 1, window: int = 3,
    serial_diff_lag: int | None = None,
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
    out = (
        dense.withColumn("deriv_n", F.col("n") - F.lag("n", 1, 0).over(w))
        .withColumn("cum_n", F.sum("n").over(w))
        .withColumn(
            "mov_avg_n_r",
            F.round(F.avg("n").over(w.rowsBetween(-(window - 1), 0)), 6),
        )
    )
    cols = [
        "event_type",
        "bucket_start",
        "n",
        F.round("sum_value", 6).alias("sum_value_r"),
        "deriv_n",
        "cum_n",
        "mov_avg_n_r",
    ]
    if serial_diff_lag is not None:
        # ES serial_diff: n - n[t - lag], the seasonal differencing
        # pipeline agg (lag=1 degenerates to the derivative). ES omits
        # the first ``lag`` buckets per type; the zero left-boundary is
        # the same NULL-free encoding the derivative uses (those
        # buckets stay identifiable: bucket index < lag <=> the lag
        # window reaches before the type's own axis start).
        if serial_diff_lag < 1:
            raise ValueError("serial_diff lag must be >= 1")
        out = out.withColumn(
            "serial_diff_n",
            F.col("n") - F.lag("n", serial_diff_lag, 0).over(w),
        )
        cols.append("serial_diff_n")
    return out.select(*cols).orderBy("event_type", "bucket_start")


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
    two slices, no self-join); per-doc term distinct happens MAP-SIDE
    (array_distinct before the explode — countDistinct planned an
    extra expand+shuffle), then ONE shuffle keyed by term for the
    global df count; the <= filter runs post-aggregation on term-sized
    data. ES itself
    gives up exactness here (CuckooFilter, documented false positives)
    because a coordinator node cannot hold the tail; a shuffle CAN — the
    exact flavor is both the oracle anchor and the thing the distributed
    engine is uniquely positioned to do."""
    if shingles not in (1, 2):
        raise ValueError("shingles must be 1 or 2")
    a = F.filter(F.split(F.lower("text"), split), lambda x: x != "")
    if shingles == 1:
        term = F.explode(F.array_distinct(a))
    else:
        pairs = F.when(
            F.size(a) >= 2,
            F.zip_with(
                F.slice(a, 1, F.size(a) - 1),
                F.slice(a, 2, F.size(a) - 1),
                lambda x, y: F.concat_ws(" ", x, y),
            ),
        ).otherwise(F.array().cast("array<string>"))
        term = F.explode(F.array_distinct(pairs))
    df_tbl = (
        docs.select(term.alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    return df_tbl.filter(F.col("df") <= max_doc_count).orderBy("df", "term")


def adjacency_matrix(docs: DataFrame, filters: dict[str, str]) -> DataFrame:
    """ES ``adjacency_matrix`` aggregation: named filters (SQL boolean
    expressions over the table's columns) -> one bucket per filter plus
    one per unordered filter PAIR keyed ``"a&b"`` (ES's intersection key
    syntax), with the doc count matching both. Empty buckets are omitted
    (ES contract). Output (key, doc_count), key-ordered.

    Scale shape: ONE corpus scan — every filter evaluates to an int
    indicator column and all m + m(m-1)/2 counts reduce in a SINGLE
    partial-aggregated ``sum()`` row (no shuffle keyed by data at all:
    the aggregate is global, map-side combined to one row per
    partition). The bucket explosion happens on that single row via
    ``stack`` — driver-sized by construction. ES caps m at
    ``index.max_adjacency_matrix_filters`` for the same quadratic
    reason; the cap here is the expression count Catalyst will codegen,
    far above any sane m."""
    names = sorted(filters)
    if len(names) < 2:
        raise ValueError("adjacency_matrix needs at least two filters")
    ind = docs.select(
        *[
            F.when(F.expr(filters[n]), 1).otherwise(0).alias(f"_f_{i}")
            for i, n in enumerate(names)
        ]
    )
    sums, keys = [], []
    for i, a in enumerate(names):
        sums.append(F.sum(F.col(f"_f_{i}")).alias(f"s{len(keys)}"))
        keys.append(a)
        for j in range(i + 1, len(names)):
            sums.append(
                F.sum(F.col(f"_f_{i}") * F.col(f"_f_{j}")).alias(f"s{len(keys)}")
            )
            keys.append(f"{a}&{names[j]}")
    one = ind.agg(*sums)
    stack = ", ".join(f"'{k}', s{i}" for i, k in enumerate(keys))
    return (
        one.select(
            F.expr(f"stack({len(keys)}, {stack}) AS (key, doc_count)")
        )
        .filter(F.col("doc_count") > 0)
        .orderBy("key")
    )


def multi_terms(docs: DataFrame, keys: list[str], size: int = 10) -> DataFrame:
    """ES ``multi_terms`` aggregation: terms buckets over a COMPOSITE
    key tuple, ordered by doc_count DESC (key tuple ASC tie-break —
    deterministic), top ``size``. The composite cousin of the plain
    terms agg; differs from ``composite_agg`` in ORDER (count, not key)
    and purpose (top buckets, not exhaustive paging). NULL keys are
    excluded, as in composite.

    Scale shape: one hash aggregate keyed by the tuple (map-side
    partial combine), then orderBy().limit(size) compiles to
    TakeOrderedAndProject — per-partition heaps, never a global sort.
    At 10^12 docs the count ordering is exact only if every bucket is
    counted globally first, which the single shuffle does; ES documents
    doc_count ERROR BOUNDS here because its per-shard top-N merge
    cannot — the shuffle is what buys exactness."""
    if not keys:
        raise ValueError("multi_terms needs at least one key")
    d = docs
    for c in keys:
        d = d.filter(F.col(c).isNotNull())
    g = d.groupBy(*keys).agg(F.count("*").alias("doc_count"))
    return g.orderBy(
        F.desc("doc_count"), *[F.asc(c) for c in keys]
    ).limit(size)


def bucket_pipeline(
    docs: DataFrame,
    key: str,
    metric_expr: str,
    having: str | None = None,
    order_by: list[tuple[str, bool]] | None = None,
    size: int | None = None,
) -> DataFrame:
    """ES ``bucket_selector`` + ``bucket_sort`` pipeline over a terms
    aggregation: buckets of ``key`` with ``doc_count`` and one metric
    (``metric_expr``, a SQL aggregate expression aliased ``metric``),
    then (1) ``having`` — a SQL predicate over (key, doc_count, metric)
    that DROPS buckets (bucket_selector's script), (2) ``order_by`` —
    [(column, ascending)] bucket re-ordering (bucket_sort's sort, key
    ASC appended as the deterministic tie-break), (3) ``size`` —
    truncation (bucket_sort's size). Output (key, doc_count, metric).

    Scale shape: the selector/sort/truncate all run POST-aggregation on
    bucket-sized data — exactly why ES models them as pipeline aggs:
    the parent reduction is the only corpus-sized pass. With ``size``
    the sort compiles to TakeOrderedAndProject; without it the bucket
    frame is small enough that the order pass is bucket-bounded."""
    g = docs.groupBy(key).agg(
        F.count("*").alias("doc_count"),
        F.expr(metric_expr).alias("metric"),
    )
    if having:
        g = g.filter(F.expr(having))
    cols = [
        (F.asc(c) if asc else F.desc(c))
        for c, asc in (order_by or [(key, True)])
    ] + [F.asc(key)]
    g = g.orderBy(*cols)
    return g.limit(size) if size is not None else g


def percentile_ranks(
    docs: DataFrame, group_col: str, value_col: str, thresholds: list[float]
) -> DataFrame:
    """ES ``percentile_ranks`` aggregation, exact flavor: per
    ``group_col`` bucket and requested threshold t, the percentage of
    values <= t (the inverse of the percentiles agg: value in, rank
    out). Output (group, threshold, pct_r) — pct rounded 6, ordered.

    Scale shape: ONE hash aggregate per group computing len(thresholds)
    indicator sums + the count (map-side combinable — no sort window at
    all, unlike the percentiles agg), then the tiny unpivot runs on
    bucket-sized rows. At 10^12 rows this stays a single shuffle keyed
    by group; ES uses t-digest interpolation here, the exact flavor is
    the oracle anchor with identical output shape."""
    if not thresholds:
        raise ValueError("percentile_ranks needs at least one threshold")
    ts = list(thresholds)
    aggs = [F.count("*").alias("_n")] + [
        F.sum(
            F.when(F.col(value_col) <= F.lit(t), 1).otherwise(0)
        ).alias(f"_le_{i}")
        for i, t in enumerate(ts)
    ]
    g = docs.groupBy(group_col).agg(*aggs)
    stack = ", ".join(
        f"cast({t!r} as double), _le_{i}" for i, t in enumerate(ts)
    )
    return (
        g.select(
            group_col,
            F.col("_n"),
            F.expr(f"stack({len(ts)}, {stack}) AS (threshold, le)"),
        )
        .select(
            group_col,
            "threshold",
            F.round(F.col("le") * 100.0 / F.col("_n"), 6).alias("pct_r"),
        )
        .orderBy(group_col, "threshold")
    )


def weighted_avg(
    docs: DataFrame,
    keys: list[str],
    value_expr: str,
    weight_expr: str,
) -> DataFrame:
    """ES ``weighted_avg`` aggregation: per bucket,
    sum(value*weight) / sum(weight). ``value_expr``/``weight_expr`` are
    SQL expressions over the row (ES's value/weight field pair). The
    sums are computed in the INPUT's type — integer inputs keep exact
    integer sums (one map-side-combinable aggregate) and the single
    division at the end is the only floating-point step, which is what
    makes the result bitwise replayable by any engine. One hash
    aggregate keyed by the bucket tuple; output is bucket-sized.

    NULL semantics match ES: a document missing the VALUE field is
    skipped entirely — its weight must not land in ``w_sum`` (the raw
    ``sum(__w)`` would count it, since only the NULL ``__v * __w``
    product is skipped, deflating the average). A document missing the
    WEIGHT is likewise skipped (ES requires a weight; we take the
    no-``missing``-configured behavior)."""
    if not keys:
        raise ValueError("weighted_avg needs at least one grouping key")
    d = docs.withColumn("__v", F.expr(value_expr)).withColumn(
        "__w", F.expr(weight_expr)
    )
    g = d.groupBy(*keys).agg(
        F.sum(F.expr("__v * __w")).alias("vw_sum"),
        F.sum(
            F.expr("CASE WHEN __v IS NOT NULL THEN __w END")
        ).alias("w_sum"),
    )
    return g.select(
        *keys,
        "vw_sum",
        "w_sum",
        (F.col("vw_sum").cast("double") / F.col("w_sum").cast("double")).alias(
            "wavg"
        ),
    ).orderBy(*keys)


def top_metrics(
    docs: DataFrame,
    keys: list[str],
    sort_col: str,
    metric_cols: list[str],
    size: int = 1,
    ascending: bool = False,
    tiebreak_col: str = "doc_id",
) -> DataFrame:
    """ES ``top_metrics`` aggregation: per bucket, the metric column
    values taken from the row(s) with the largest (or smallest)
    ``sort_col`` — "the value at the latest timestamp per host" shape.
    Deterministic under sort-value ties via ``tiebreak_col`` ASC (ES
    leaves ties unspecified; we don't). One window pass partitioned by
    the bucket keys — k rows of state per bucket, never a global sort;
    the output is bucket-sized (size rows per bucket)."""
    from pyspark.sql import Window

    ordcol = F.col(sort_col).asc() if ascending else F.col(sort_col).desc()
    w = Window.partitionBy(*keys).orderBy(ordcol, F.col(tiebreak_col).asc())
    ranked = docs.withColumn("metric_rank", F.row_number().over(w)).filter(
        F.col("metric_rank") <= size
    )
    return ranked.select(
        *keys, "metric_rank", sort_col, *metric_cols
    ).orderBy(*keys, "metric_rank")


# ES auto_date_histogram's interval ladder (seconds): minute, 5 minutes,
# 30 minutes, hour, 3 hours, 12 hours, day — the subset of ES's ladder
# expressible as fixed-length seconds (calendar months/years are not
# fixed-length and are out of scope for an epoch-arithmetic histogram).
AUTO_INTERVALS_S = (60, 300, 1800, 3600, 10800, 43200, 86400)


def auto_date_histogram(
    events: DataFrame,
    target_buckets: int = 20,
    ts_col: str = "ts",
) -> DataFrame:
    """ES ``auto_date_histogram``: pick the SMALLEST interval from the
    fixed ladder whose bucket count stays <= ``target_buckets`` (the
    largest ladder rung if none fits), then histogram on it. The
    chosen ``interval_s`` is emitted on every row so a consumer (and
    the oracle) can verify the choice.

    Determinism: all bucket arithmetic is exact int64 WALL-CLOCK
    microseconds since the epoch (``timestampdiff`` against an NTZ
    epoch literal — timezone-free, the same integer DuckDB's
    ``epoch_us`` of a naive timestamp yields; ``ep - ep % iv`` flooring
    — no float division anywhere), so the engine and any replaying
    engine agree bitwise. Scale shape: one scalar min/max aggregate
    (the ladder choice is driver arithmetic over two numbers), then ONE
    hash aggregate keyed by the bucket — the same two-job shape at any
    corpus size."""
    epoch0 = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"
    ep_expr = (
        f"timestampdiff(MICROSECOND, {epoch0}, "
        f"cast({ts_col} as timestamp_ntz))"
    )
    ep = events.select(F.expr(ep_expr).alias("ep"))
    row = ep.agg(F.min("ep").alias("mn"), F.max("ep").alias("mx")).collect()[0]
    if row["mn"] is None:
        raise ValueError("auto_date_histogram over an empty frame")
    mn, mx = int(row["mn"]), int(row["mx"])
    iv_s = AUTO_INTERVALS_S[-1]
    for cand in AUTO_INTERVALS_S:
        iv_us = cand * 1_000_000
        n_buckets = (mx - mx % iv_us) // iv_us - (mn - mn % iv_us) // iv_us + 1
        if n_buckets <= target_buckets:
            iv_s = cand
            break
    iv_us = iv_s * 1_000_000
    return (
        events.select(F.expr(ep_expr).alias("ep"))
        .groupBy(
            F.expr(
                f"timestampadd(MICROSECOND, ep - ep % {iv_us}, {epoch0})"
            ).alias("bucket_start")
        )
        .agg(F.count("*").alias("n"))
        .withColumn("interval_s", F.lit(iv_s).cast("long"))
        .orderBy("bucket_start")
    )


def diversified_sampler(
    docs: DataFrame,
    field: str,
    n: int = 100,
    max_per_value: int = 2,
    salt: str = "d0",
    id_col: str = "doc_id",
) -> DataFrame:
    """ES ``diversified_sampler`` aggregation: a fixed-size,
    de-biased sample — at most ``max_per_value`` docs per ``field``
    value (so one dominant host/author/repo cannot own the sample),
    filled in deterministic hash order up to ``n`` rows. Downstream
    sub-aggregations run over the returned frame.

    Determinism: the sample is the ``n`` lowest 60-bit md5 keys of
    (salt, id) — reproducible across runs, engines, and cluster sizes
    (the repo's standard Bernoulli-key device, here in fixed-size
    form). Scale shape: ONE field-partitioned window keeps
    max_per_value rows of state per value, then orderBy(h).limit(n)
    compiles to TakeOrderedAndProject — never a global sort."""
    from pyspark.sql import Window

    from .curation import _h60

    h = F.expr(_h60(f"concat('{salt}', cast({id_col} as string))"))
    w = Window.partitionBy(field).orderBy(F.asc("h"), F.asc(id_col))
    return (
        docs.withColumn("h", h)
        .withColumn("per_value_seq", F.row_number().over(w))
        .filter(F.col("per_value_seq") <= max_per_value)
        .orderBy(F.asc("h"), F.asc(id_col))
        .limit(n)
        .select(id_col, field, "h")
    )


def t_test_expr(
    n_a: str, s_a: str, q_a: str, n_b: str, s_b: str, q_b: str
) -> str:
    """Welch's two-sample t statistic as ONE shared SQL expression over
    exact integer power sums — the facet_stats parity device: both the
    engine and any replaying engine evaluate the IDENTICAL text on the
    IDENTICAL integers, so the double result matches bitwise. Sample
    variance via the explicit two-sum formula (a built-in single-pass
    Welford estimator would not hash-match)."""
    m_a = f"(cast({s_a} as double) / cast({n_a} as double))"
    m_b = f"(cast({s_b} as double) / cast({n_b} as double))"
    v_a = (
        f"((cast({q_a} as double) - cast({s_a} as double) * {m_a})"
        f" / cast({n_a} - 1 as double))"
    )
    v_b = (
        f"((cast({q_b} as double) - cast({s_b} as double) * {m_b})"
        f" / cast({n_b} - 1 as double))"
    )
    return (
        f"({m_a} - {m_b}) / sqrt({v_a} / cast({n_a} as double)"
        f" + {v_b} / cast({n_b} as double))"
    )


def t_test(
    docs: DataFrame,
    predicate_a: str,
    predicate_b: str,
    value_expr: str = "n_chars",
) -> DataFrame:
    """ES ``t_test`` aggregation (heteroscedastic / Welch, the ES
    default): is the metric's mean different between two row slices?
    One conditional aggregation collects exact integer power sums
    (n, sum, sum-of-squares per slice — map-side combinable, one
    corpus pass, no shuffle beyond the single global reduce), then the
    t statistic is one shared-text double expression over those six
    integers (``t_test_expr``). Output one row:
    (n_a, n_b, mean_a_r, mean_b_r, t_r)."""
    d = docs.withColumn("__v", F.expr(value_expr))
    agg = d.agg(
        F.sum(F.expr(f"case when {predicate_a} then 1 else 0 end")).alias("n_a"),
        F.sum(F.expr(f"case when {predicate_a} then __v else 0 end")).alias("s_a"),
        F.sum(
            F.expr(f"case when {predicate_a} then __v * __v else 0 end")
        ).alias("q_a"),
        F.sum(F.expr(f"case when {predicate_b} then 1 else 0 end")).alias("n_b"),
        F.sum(F.expr(f"case when {predicate_b} then __v else 0 end")).alias("s_b"),
        F.sum(
            F.expr(f"case when {predicate_b} then __v * __v else 0 end")
        ).alias("q_b"),
    )
    t = t_test_expr("n_a", "s_a", "q_a", "n_b", "s_b", "q_b")
    return agg.select(
        "n_a",
        "n_b",
        F.round(F.expr("cast(s_a as double) / cast(n_a as double)"), 6).alias(
            "mean_a_r"
        ),
        F.round(F.expr("cast(s_b as double) / cast(n_b as double)"), 6).alias(
            "mean_b_r"
        ),
        F.round(F.expr(t), 6).alias("t_r"),
    )


def matrix_stats_exprs(n: str, pre_a: str, pre_b: str) -> dict[str, str]:
    """ES ``matrix_stats`` arithmetic as SHARED SQL expression text over
    exact power sums (the t_test_expr / facet_stats parity device) —
    ``pre_a``/``pre_b`` prefix the per-field sum columns ``<p>_s1``
    (Σx), ``<p>_s2`` (Σx²), ``<p>_s3`` (Σx³), ``<p>_s4`` (Σx⁴), plus
    the cross sum ``sxy`` (Σ a·b). Definitions match the ES
    RunningStats shapes: covariance/variance UNBIASED (n-1
    denominator), correlation = cov/√(var_a·var_b), skewness =
    √n·M3/M2^1.5 and kurtosis = n·M4/M2² over CENTRAL moment sums
    M_k = Σ(x-μ)^k (non-excess kurtosis — a normal field reads 3)."""
    exprs = {}
    for p in (pre_a, pre_b):
        mu = f"(cast({p}_s1 as double) / cast({n} as double))"
        m2 = f"(cast({p}_s2 as double) - cast({n} as double) * {mu} * {mu})"
        m3 = (
            f"(cast({p}_s3 as double) - 3.0 * {mu} * cast({p}_s2 as double)"
            f" + 2.0 * cast({n} as double) * {mu} * {mu} * {mu})"
        )
        m4 = (
            f"(cast({p}_s4 as double) - 4.0 * {mu} * cast({p}_s3 as double)"
            f" + 6.0 * {mu} * {mu} * cast({p}_s2 as double)"
            f" - 3.0 * cast({n} as double) * {mu} * {mu} * {mu} * {mu})"
        )
        exprs[f"mean_{p}"] = mu
        exprs[f"var_{p}"] = f"({m2} / cast({n} - 1 as double))"
        exprs[f"skew_{p}"] = f"(sqrt(cast({n} as double)) * {m3} / pow({m2}, 1.5))"
        exprs[f"kurt_{p}"] = f"(cast({n} as double) * {m4} / ({m2} * {m2}))"
    exprs["cov"] = (
        f"((cast(sxy as double) - cast({pre_a}_s1 as double)"
        f" * cast({pre_b}_s1 as double) / cast({n} as double))"
        f" / cast({n} - 1 as double))"
    )
    exprs["corr"] = (
        f"({exprs['cov']} / sqrt({exprs[f'var_{pre_a}']}"
        f" * {exprs[f'var_{pre_b}']}))"
    )
    return exprs


def matrix_stats(
    docs: DataFrame, field_a: str, field_b: str,
    expr_a: str | None = None, expr_b: str | None = None,
) -> DataFrame:
    """ES ``matrix_stats`` over two numeric field expressions: per-field
    count/mean/variance/skewness/kurtosis plus the pairwise
    covariance/correlation, all from one global reduce of power sums
    (n, Σx, Σx², Σx³, Σx⁴ per field + Σab — nine numbers, map-side
    combinable, no data-keyed shuffle; the ES version streams the same
    moments per shard and merges). The arithmetic is shared expression
    text (:func:`matrix_stats_exprs`), so any engine replays the
    doubles bitwise from the same sums — and for INTEGER-valued field
    expressions whose power sums stay under 2^53 the double sums are
    themselves exact integers (order-free), making the whole result
    replayable bitwise.

    Output: one row per field — (field, n, mean_r, variance_r, skew_r,
    kurt_r, cov_r, corr_r); cov/corr repeat on both rows, as in the ES
    response where each field carries its covariance/correlation
    against the others."""
    ea, eb = expr_a or field_a, expr_b or field_b
    d = docs.select(
        F.expr(ea).cast("double").alias("__a"),
        F.expr(eb).cast("double").alias("__b"),
    )
    agg = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__a").alias("a_s1"),
        F.sum(F.expr("__a * __a")).alias("a_s2"),
        F.sum(F.expr("__a * __a * __a")).alias("a_s3"),
        F.sum(F.expr("__a * __a * __a * __a")).alias("a_s4"),
        F.sum("__b").alias("b_s1"),
        F.sum(F.expr("__b * __b")).alias("b_s2"),
        F.sum(F.expr("__b * __b * __b")).alias("b_s3"),
        F.sum(F.expr("__b * __b * __b * __b")).alias("b_s4"),
        F.sum(F.expr("__a * __b")).alias("sxy"),
    )
    e = matrix_stats_exprs("n", "a", "b")
    # bucket explosion on the single reduced row (adjacency_matrix
    # device): two field rows via stack, nothing corpus-sized moves
    return agg.select(
        F.expr(
            f"stack(2, "
            f"'{field_a}', {e['mean_a']}, {e['var_a']}, {e['skew_a']}, {e['kurt_a']}, "
            f"'{field_b}', {e['mean_b']}, {e['var_b']}, {e['skew_b']}, {e['kurt_b']}"
            f") as (field, mean, variance, skew, kurt)"
        ),
        F.col("n"),
        F.expr(e["cov"]).alias("cov"),
        F.expr(e["corr"]).alias("corr"),
    ).select(
        "field", "n",
        F.round("mean", 6).alias("mean_r"),
        F.round("variance", 6).alias("variance_r"),
        F.round("skew", 6).alias("skew_r"),
        F.round("kurt", 6).alias("kurt_r"),
        F.round("cov", 6).alias("cov_r"),
        F.round("corr", 6).alias("corr_r"),
    ).orderBy("field")


def string_stats(docs: DataFrame, field: str = "text") -> DataFrame:
    """ES ``string_stats`` (with ``show_distribution``'s underlying
    machinery) over a string field: count, min/max/avg length, and the
    Shannon entropy (log base 2) of the CHARACTER distribution across
    all values — ES computes exactly this from per-character counts.

    Scale shape: lengths are one global reduce of four numbers; the
    character distribution is an explode to one row per character THEN
    an immediate hash agg to alphabet-sized rows (map-side combine does
    the heavy lifting: each partition emits its own char counts, only
    |alphabet| rows shuffle), and the entropy folds over the
    dictionary-sized count table in a deterministic char-sorted order.
    Empty strings contribute length 0 and no characters, like ES."""
    lens = docs.select(F.length(F.col(field)).alias("__l")).agg(
        F.count(F.lit(1)).alias("count"),
        # long, not Spark's int32 length type: replaying engines type
        # min/max over lengths as BIGINT (the dtype-identity gate)
        F.min("__l").cast("long").alias("min_length"),
        F.max("__l").cast("long").alias("max_length"),
        F.sum("__l").alias("total_chars"),
    )
    chars = (
        docs.select(F.explode(F.split(F.col(field), "")).alias("c"))
        .filter(F.length("c") > 0)
        .groupBy("c")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # entropy = -Σ p·log2(p): fold the alphabet-sized count table in
    # char-sorted order (fixed IEEE add order — the analyzer-order
    # summation device) via one sorted-array aggregate
    ent = chars.agg(
        F.sum("cnt").alias("tot"),
        F.expr(
            "array_sort(collect_list(named_struct('c', c, 'cnt', cnt)))"
        ).alias("dist"),
    ).select(
        F.expr(
            "aggregate(dist, cast(0.0 as double), (acc, x) -> acc - "
            "(cast(x.cnt as double) / cast(tot as double)) * "
            "log2(cast(x.cnt as double) / cast(tot as double)))"
        ).alias("entropy")
    )
    return lens.crossJoin(ent).select(
        "count", "min_length", "max_length",
        F.round(
            F.expr("cast(total_chars as double) / cast(count as double)"), 6
        ).alias("avg_length_r"),
        F.round("entropy", 6).alias("entropy_r"),
    )


def dispersion_stats(docs: DataFrame, value_expr: str = "n_chars") -> DataFrame:
    """ES ``boxplot`` + ``median_absolute_deviation`` in one row, EXACT
    where ES ships TDigest approximations: min, q1, median, q3, max
    (linear-interpolation percentiles — the percentile_cont definition
    Spark `percentile` and DuckDB `quantile_cont` share) and
    MAD = median(|x - median|).

    Two corpus passes by necessity (MAD is a median OF residuals
    against the median — not one-pass expressible exactly), each a
    single global percentile reduce; the median scalar moves to pass 2
    via a broadcast crossJoin of the one-row frame, never a collect."""
    v = docs.select(F.expr(value_expr).cast("double").alias("__v"))
    box = v.agg(
        F.min("__v").alias("vmin"),
        F.expr("percentile(__v, 0.25d)").alias("q1"),
        F.expr("percentile(__v, 0.5d)").alias("q2"),
        F.expr("percentile(__v, 0.75d)").alias("q3"),
        F.max("__v").alias("vmax"),
    )
    mad = (
        v.crossJoin(F.broadcast(box.select("q2")))
        .select(F.expr("abs(__v - q2)").alias("__r"))
        .agg(F.expr("percentile(__r, 0.5d)").alias("mad"))
    )
    return box.crossJoin(F.broadcast(mad)).select(
        F.round("vmin", 6).alias("min_r"),
        F.round("q1", 6).alias("q1_r"),
        F.round("q2", 6).alias("median_r"),
        F.round("q3", 6).alias("q3_r"),
        F.round("vmax", 6).alias("max_r"),
        F.round("mad", 6).alias("mad_r"),
    )


def bucket_stats(events: DataFrame, hours: int = 1) -> DataFrame:
    """The ES sibling pipeline aggregations — ``stats_bucket`` /
    ``avg_bucket`` / ``min_bucket`` / ``max_bucket`` / ``sum_bucket`` —
    over each event_type's date_histogram doc counts: one row per type
    with the bucket-count stats. Buckets are the GAP-FILLED dense axis
    (min_doc_count=0, each type's own [min, max] range — the same
    semantics as date_histogram_pipeline: a sibling avg over a gappy
    histogram must see the zero buckets).

    Scale shape: one corpus-reducing hash agg to bucket rows, then the
    dense-axis explode + stats run on bucket-sized data."""
    iv = f"{hours} hour"
    hist = events.groupBy(
        F.window("ts", iv).start.alias("bucket_start"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    axis = (
        hist.groupBy("event_type")
        .agg(F.min("bucket_start").alias("lo"), F.max("bucket_start").alias("hi"))
        .select(
            "event_type",
            F.explode(F.sequence("lo", "hi", F.expr(f"interval {iv}"))).alias(
                "bucket_start"
            ),
        )
    )
    dense = axis.join(hist, ["event_type", "bucket_start"], "left").withColumn(
        "n", F.coalesce("n", F.lit(0))
    )
    return (
        dense.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.min("n").alias("min_n"),
            F.max("n").alias("max_n"),
            F.sum("n").alias("sum_n"),
            F.round(
                F.expr("cast(sum(n) as double) / cast(count(1) as double)"), 6
            ).alias("avg_n_r"),
        )
        .orderBy("event_type")
    )


def rate_agg(
    events: DataFrame, hours: int = 1, unit_minutes: int = 1
) -> DataFrame:
    """ES ``rate`` aggregation inside a date_histogram: per-bucket doc
    count and value sum normalized to a time unit (bucket interval /
    unit — e.g. hourly buckets at unit=minute divide by 60). Buckets
    are the GAP-FILLED dense axis per event_type (a zero bucket has
    rate 0, exactly as ES reports it). One corpus-reducing hash agg;
    the axis explode and the per-unit division run on bucket-sized
    data. The divisions are shared expression text over exact
    integers (count) / the one summed double."""
    iv = f"{hours} hour"
    per = float(hours * 60) / float(unit_minutes)
    hist = events.groupBy(
        F.window("ts", iv).start.alias("bucket_start"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv"))
    axis = (
        hist.groupBy("event_type")
        .agg(F.min("bucket_start").alias("lo"), F.max("bucket_start").alias("hi"))
        .select(
            "event_type",
            F.explode(F.sequence("lo", "hi", F.expr(f"interval {iv}"))).alias(
                "bucket_start"
            ),
        )
    )
    dense = (
        axis.join(hist, ["event_type", "bucket_start"], "left")
        .withColumn("n", F.coalesce("n", F.lit(0)))
        .withColumn("sv", F.coalesce("sv", F.lit(0.0)))
    )
    return dense.select(
        "event_type",
        "bucket_start",
        "n",
        F.round(F.expr(f"cast(n as double) / {per!r}"), 6).alias("rate_r"),
        F.round(F.expr(f"sv / {per!r}"), 6).alias("value_rate_r"),
    ).orderBy("event_type", "bucket_start")


def cumulative_cardinality(
    events: DataFrame, hours: int = 1, key: str = "user_id"
) -> DataFrame:
    """ES ``cumulative_cardinality`` pipeline aggregation, EXACT where
    ES ships HLL sketches: per date_histogram bucket, the number of
    DISTINCT ``key`` values seen in any bucket up to and including it
    (and the bucket's new-value count — the "incremental" read ES
    documents this agg for).

    Scale shape: the corpus shuffles ONCE, keyed by ``key``, to each
    value's FIRST bucket (min — map-side combinable); everything after
    (first-bucket counts, the gap-filled dense axis, the running sum)
    is bucket-sized. Never a (bucket x key) distinct explosion — the
    naive per-bucket countDistinct-over-prefix is quadratic in buckets
    and reshuffles the corpus per bucket."""
    from pyspark.sql import Window

    iv = f"{hours} hour"
    b = events.select(
        F.window("ts", iv).start.alias("bucket_start"), F.col(key).alias("__k")
    )
    first = b.groupBy("__k").agg(F.min("bucket_start").alias("fb"))
    nv = first.groupBy(F.col("fb").alias("bucket_start")).agg(
        F.count(F.lit(1)).alias("new_values")
    )
    axis = b.agg(
        F.min("bucket_start").alias("lo"), F.max("bucket_start").alias("hi")
    ).select(
        F.explode(F.sequence("lo", "hi", F.expr(f"interval {iv}"))).alias(
            "bucket_start"
        )
    )
    dense = axis.join(nv, "bucket_start", "left").withColumn(
        "new_values", F.coalesce("new_values", F.lit(0))
    )
    w = Window.orderBy("bucket_start").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return dense.select(
        "bucket_start",
        "new_values",
        F.sum("new_values").over(w).alias("cum_distinct"),
    ).orderBy("bucket_start")


def terms_sharded(
    docs: DataFrame,
    n_shards: int = 4,
    shard_size: int = 8,
    size: int = 10,
    split: str = "[^a-z0-9]+",
) -> DataFrame:
    """ES ``terms`` aggregation with the DISTRIBUTED error-bound
    semantics (``doc_count_error_upper_bound``): each shard returns its
    top ``shard_size`` terms by document count; the coordinator sums
    the RETURNED counts per term (which may undercount — a shard that
    truncated a term away contributes nothing) and bounds the miss:
    a term's error is the sum, over shards that did NOT return it, of
    that shard's LAST returned count — the largest count the term could
    have had there and still been truncated. A shard with fewer
    distinct terms than ``shard_size`` returned everything: error 0.
    This is the semantics that makes honest distributed top-N possible
    without shipping every shard's full term table — the raison d'être
    of ES's shard_size knob, reproduced exactly.

    Scale shape: one (shard, term, doc) distinct + count agg (the only
    corpus-sized pass); the per-shard truncation is a window
    PARTITIONED BY shard over term-table-sized data; the merge,
    per-shard last-counts, and the total-minus-present error arithmetic
    run over (n_shards x shard_size) rows. Shards here are a
    deterministic hash split of doc_id — on a real deployment the
    partition/segment boundary plays the role.

    Output: (term, doc_count, doc_count_error_upper_bound), merged
    count DESC / term ASC, top ``size``.

    NOTE: construction is EAGER — the shard/term ranking materializes
    (localCheckpoint) when the function is called, because three
    downstream consumers (returned rows, per-shard error bounds, the
    error total) would otherwise each re-run the corpus aggregate.
    Callers composing plans speculatively pay the job up front."""
    from pyspark.sql import Window

    if n_shards < 1 or shard_size < 1 or size < 1:
        raise ValueError("n_shards, shard_size and size must be >= 1")
    # per-doc distinct happens map-side (array_distinct before the
    # explode — no corpus-wide distinct shuffle), and the ranked term
    # table (vocab x shards — bounded) pins once: returned, the error
    # rows AND the total each consume it, and unpinned each re-ran the
    # corpus tokenize+aggregate
    toks = docs.select(
        (F.col("doc_id") % n_shards).alias("shard"),
        F.explode(distinct_tokens(split)).alias("term"),
    )
    counts = toks.groupBy("shard", "term").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("shard").orderBy(F.desc("cnt"), F.asc("term"))
    ranked = counts.withColumn("rn", F.row_number().over(w)).localCheckpoint(
        eager=True
    )
    returned = ranked.filter(F.col("rn") <= shard_size)
    # a shard's error contribution: its shard_size-th count, or 0 when
    # it returned every term it has
    errs = (
        ranked.groupBy("shard")
        .agg(
            F.max("rn").alias("n_terms"),
            F.min(F.when(F.col("rn") == shard_size, F.col("cnt"))).alias(
                "last_cnt"
            ),
        )
        .select(
            "shard",
            F.when(F.col("n_terms") < shard_size, F.lit(0))
            .otherwise(F.col("last_cnt"))
            .cast("long")
            .alias("err"),
        )
    )
    total = errs.agg(F.sum("err").alias("total_err"))
    merged = (
        returned.join(errs, "shard")
        .groupBy("term")
        .agg(
            F.sum("cnt").alias("doc_count"),
            F.sum("err").alias("present_err"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "term",
            "doc_count",
            (F.col("total_err") - F.col("present_err")).alias(
                "doc_count_error_upper_bound"
            ),
        )
    )
    return merged.orderBy(F.desc("doc_count"), F.asc("term")).limit(size)


def normalize_buckets(events: DataFrame, hours: int = 1) -> DataFrame:
    """ES ``normalize`` pipeline aggregation over each event_type's
    gap-filled date_histogram doc counts — the three canonical methods
    in one row: ``rescale_0_1`` ((n-min)/(max-min), 0 when the axis is
    constant), ``percent_of_sum`` (n/Σn), and population ``z-score``
    ((n-μ)/σ). All arithmetic is shared expression text over EXACT
    integer per-type reductions (count, Σn, Σn², min, max — the
    matrix_stats device), so any engine replays the doubles bitwise.

    Scale shape: one corpus-reducing hash agg to bucket rows; the
    dense axis, the per-type five-number reduce, and the normalize
    expressions all run on bucket-sized data."""
    iv = f"{hours} hour"
    hist = events.groupBy(
        F.window("ts", iv).start.alias("bucket_start"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    axis = (
        hist.groupBy("event_type")
        .agg(F.min("bucket_start").alias("lo"), F.max("bucket_start").alias("hi"))
        .select(
            "event_type",
            F.explode(F.sequence("lo", "hi", F.expr(f"interval {iv}"))).alias(
                "bucket_start"
            ),
        )
    )
    dense = axis.join(hist, ["event_type", "bucket_start"], "left").withColumn(
        "n", F.coalesce("n", F.lit(0))
    )
    stats = dense.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("nb"),
        F.sum("n").alias("s1"),
        F.sum(F.expr("n * n")).alias("s2"),
        F.min("n").alias("mn"),
        F.max("n").alias("mx"),
    )
    d = dense.join(stats, "event_type")
    rescale = (
        "CASE WHEN mx = mn THEN 0.0 ELSE "
        "cast(n - mn as double) / cast(mx - mn as double) END"
    )
    pct = "cast(n as double) / cast(s1 as double)"
    mean = "(cast(s1 as double) / cast(nb as double))"
    var = f"(cast(s2 as double) / cast(nb as double) - {mean} * {mean})"
    z = f"CASE WHEN {var} <= 0.0 THEN 0.0 ELSE (cast(n as double) - {mean}) / sqrt({var}) END"
    return d.select(
        "event_type",
        "bucket_start",
        "n",
        F.round(F.expr(rescale), 6).alias("rescale_r"),
        F.round(F.expr(pct), 6).alias("pct_of_sum_r"),
        F.round(F.expr(z), 6).alias("zscore_r"),
    ).orderBy("event_type", "bucket_start")


def filters_agg(
    docs: DataFrame,
    filters: dict[str, str],
    other_bucket: bool = True,
    metric_expr: str = "n_chars",
) -> DataFrame:
    """ES ``filters`` aggregation: one named bucket per predicate plus
    the optional ``_other_`` bucket (documents matching NO named
    filter — ES ``other_bucket_key`` semantics). Buckets may overlap
    (a doc lands in every filter it satisfies), unlike ``terms``; the
    ``_other_`` bucket is disjoint from all of them by construction.
    Each bucket carries its doc count and an avg sub-aggregation over
    ``metric_expr`` (NULL when the bucket is empty, like ES).

    Scale shape: ONE corpus pass — every bucket is a pair of
    conditional aggregates (``sum(case when pred)``) inside a single
    global reduce with full map-side partial combine; no shuffle is
    keyed by anything corpus-sized and no per-bucket scan exists. The
    one-row reduce is then unpivoted to bucket rows with ``stack``
    (bucket-count-sized, driver-free). At 100 TB this is strictly one
    read of the table regardless of how many filters are declared."""
    if not filters or "_other_" in filters:
        raise ValueError("filters_agg needs >=1 named filter; '_other_' is reserved")
    names = list(filters)
    aggs = []
    for i, name in enumerate(names):
        pred = filters[name]
        aggs.append(
            F.sum(F.expr(f"CASE WHEN {pred} THEN 1 ELSE 0 END")).alias(f"__n{i}")
        )
        aggs.append(
            F.sum(
                F.expr(f"CASE WHEN {pred} THEN ({metric_expr}) END")
            ).alias(f"__s{i}")
        )
    if other_bucket:
        none = "NOT (" + " OR ".join(f"({filters[n]})" for n in names) + ")"
        aggs.append(F.sum(F.expr(f"CASE WHEN {none} THEN 1 ELSE 0 END")).alias("__no"))
        aggs.append(
            F.sum(F.expr(f"CASE WHEN {none} THEN ({metric_expr}) END")).alias("__so")
        )
    one = docs.agg(*aggs)
    pairs = ", ".join(
        f"'{n}', __n{i}, __s{i}" for i, n in enumerate(names)
    )
    if other_bucket:
        pairs += ", '_other_', __no, __so"
    k = len(names) + (1 if other_bucket else 0)
    return (
        one.select(
            F.expr(f"stack({k}, {pairs}) AS (bucket, n_docs, __sum)")
        )
        .select(
            "bucket",
            "n_docs",
            F.round(
                F.expr("cast(__sum as double) / nullif(cast(n_docs as double), 0.0)"),
                6,
            ).alias("avg_metric_r"),
        )
        .orderBy("bucket")
    )


def missing_agg(
    docs: DataFrame,
    field_expr: str,
    group_col: str = "lang",
) -> DataFrame:
    """ES ``missing`` + ``value_count`` aggregations over an OPTIONAL
    field, per group: ``n_docs`` (the group's doc count), ``n_values``
    (``value_count`` — docs where the field evaluates non-NULL) and
    ``n_missing`` (``missing`` — docs where it is NULL). The field is
    an expression so schemaless sparse fields work: e.g.
    ``nullif(regexp_extract(text, 'vector[a-z]*', 0), '')`` is a field
    that exists only on documents mentioning ``vector``-tokens, the
    exact sparse-field shape the two ES aggs were built to audit
    (``n_values + n_missing == n_docs`` is a checkable invariant).

    Scale shape: one hash aggregate keyed by the bounded group column;
    the field expression is JVM codegen inside the scan; map-side
    combine reduces each partition to |groups| rows before the only
    shuffle."""
    return (
        docs.withColumn("__f", F.expr(field_expr))
        .groupBy(F.col(group_col).alias("grp"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count("__f").alias("n_values"),
            F.sum(
                F.expr("CASE WHEN __f IS NULL THEN 1 ELSE 0 END")
            ).alias("n_missing"),
        )
        .orderBy("grp")
    )


def categorize_text(
    docs: DataFrame,
    field: str = "text",
    prefix_tokens: int = 3,
    size: int = 10,
) -> DataFrame:
    """ES ``categorize_text`` aggregation, deterministically: group
    semi-structured text by a normalized token-prefix template. ES's
    categorizer tokenizes, WILDCARDS numeric/hex tokens, and clusters
    on the leading token sequence (drain-style log templating); this
    implementation keeps exactly the deterministic core — lowercase
    alphanumeric tokenization, each all-digit or 0x-hex token replaced
    by ``#``, category key = the first ``prefix_tokens`` normalized
    tokens joined by a single space — and drops the adaptive merge
    step (which is run-order-dependent in ES and thus unreproducible
    across engines by design). Output: top-``size`` categories by doc
    count (ties broken by category text), with max_matched doc_id as
    the auditable exemplar.

    Scale shape: the template key is pure JVM string work inside the
    scan (split/transform/slice/concat — no Python), one hash agg with
    map-side combine keyed by the template, then a top-``size``
    TakeOrderedAndProject over category-sized rows."""
    if prefix_tokens < 1:
        raise ValueError("prefix_tokens must be >= 1")
    key = (
        f"concat_ws(' ', slice(transform("
        f"  filter(split(lower({field}), '[^a-z0-9]+'), t -> t <> ''),"
        f"  t -> CASE WHEN t rlike '^[0-9]+$' OR t rlike '^0x[0-9a-f]+$'"
        f"       THEN '#' ELSE t END), 1, {int(prefix_tokens)}))"
    )
    return (
        docs.select(F.expr(key).alias("category"), "doc_id")
        .filter(F.col("category") != "")
        .groupBy("category")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max("doc_id").alias("exemplar_doc_id"),
        )
        .orderBy(F.desc("n_docs"), F.asc("category"))
        .limit(size)
    )


def boxplot_agg(
    docs: DataFrame,
    value_expr: str = "n_chars",
    group_col: str = "source",
) -> DataFrame:
    """ES ``boxplot`` aggregation per group, EXACT where ES ships a
    TDigest approximation: min, q1, median, q3, max (linear-
    interpolation percentiles — the percentile_cont definition Spark
    ``percentile`` and DuckDB ``quantile_cont`` share) plus the two
    WHISKERS with ES's documented semantics — ``lower`` is the
    smallest observed value inside the Tukey fence ``q1 - 1.5*IQR``
    and ``upper`` the largest observed value inside ``q3 + 1.5*IQR``
    (nearest actual data points, NOT the fences themselves).

    Scale shape: two corpus passes by necessity (the whiskers are
    conditional extrema against fences derived from pass-1 quantiles):
    pass 1 is one hash agg keyed by the bounded group column; the
    group-sized fence table broadcasts back for pass 2's conditional
    min/max — no corpus-sized shuffle beyond the two keyed aggs, no
    driver materialization."""
    v = docs.select(
        F.col(group_col).alias("grp"), F.expr(value_expr).cast("double").alias("__v")
    )
    q = v.groupBy("grp").agg(
        F.min("__v").alias("vmin"),
        F.expr("percentile(__v, 0.25d)").alias("q1"),
        F.expr("percentile(__v, 0.5d)").alias("q2"),
        F.expr("percentile(__v, 0.75d)").alias("q3"),
        F.max("__v").alias("vmax"),
    ).withColumn("fence_lo", F.expr("q1 - 1.5d * (q3 - q1)")).withColumn(
        "fence_hi", F.expr("q3 + 1.5d * (q3 - q1)")
    )
    wh = (
        v.join(F.broadcast(q.select("grp", "fence_lo", "fence_hi")), "grp")
        .groupBy("grp")
        .agg(
            F.min(F.expr("CASE WHEN __v >= fence_lo THEN __v END")).alias("lower"),
            F.max(F.expr("CASE WHEN __v <= fence_hi THEN __v END")).alias("upper"),
        )
    )
    return (
        q.join(wh, "grp")
        .select(
            "grp",
            F.round("vmin", 6).alias("min_r"),
            F.round("q1", 6).alias("q1_r"),
            F.round("q2", 6).alias("median_r"),
            F.round("q3", 6).alias("q3_r"),
            F.round("vmax", 6).alias("max_r"),
            F.round("lower", 6).alias("lower_r"),
            F.round("upper", 6).alias("upper_r"),
        )
        .orderBy("grp")
    )


def moving_fn(
    events: DataFrame, hours: int = 1, window: int = 3,
    alpha: float = 0.3, key: str = "event_type",
) -> DataFrame:
    """ES ``moving_fn`` pipeline aggregation with the full
    ``MovingFunctions`` family over a gap-filled ``date_histogram``:
    per key and bucket, the trailing-``window`` (current bucket
    inclusive) ``min`` / ``max`` / ``sum`` / population ``stdDev`` and
    ``ewma(alpha)`` — ES's exponentially weighted moving average,
    which seeds with the window's OLDEST value then folds forward
    ``acc = v·alpha + acc·(1 − alpha)`` (MovingFunctions.ewma).

    The dense per-key bucket axis (``min_doc_count=0`` gap-fill, each
    key's own [min, max] range) is materialized ONCE as a sorted
    struct array per key, then ``posexplode`` + ``slice`` hand every
    bucket its exact trailing window — all five functions are
    ``F.aggregate``/``array_*`` folds over that slice in whole-stage
    codegen, so the fold order (oldest → newest) is explicit and
    engine-replayable rather than an artifact of window-frame
    collection order.

    Scale shape: one hash aggregate reduces raw events to bucket rows;
    the array build, explode, and folds run over bucket-sized data
    (time_range/interval rows per key). Per-key arrays are
    time-bounded, not corpus-bounded — the 100-TB knob is the
    interval, exactly as in date_histogram_pipeline."""
    if window < 1:
        raise ValueError("moving window must be >= 1 bucket")
    if not 0.0 < alpha <= 1.0:
        raise ValueError("alpha must be in (0, 1]")
    iv = f"{hours} hour"
    hist = events.groupBy(
        F.window("ts", iv).start.alias("bucket_start"),
        F.col(key).alias("grp"),
    ).agg(F.count(F.lit(1)).alias("n"))
    axis = (
        hist.groupBy("grp")
        .agg(F.min("bucket_start").alias("lo"), F.max("bucket_start").alias("hi"))
        .select(
            "grp",
            F.explode(F.sequence("lo", "hi", F.expr(f"interval {iv}"))).alias(
                "bucket_start"
            ),
        )
    )
    dense = axis.join(hist, ["grp", "bucket_start"], "left").withColumn(
        "n", F.coalesce("n", F.lit(0))
    )
    series = dense.groupBy("grp").agg(
        F.sort_array(F.collect_list(F.struct("bucket_start", "n"))).alias("sn")
    )
    a = f"cast({float(alpha)} as double)"
    w = int(window)
    # pos is 0-based; slice() is 1-based inclusive: trailing window =
    # elements [max(0, pos-w+1) .. pos]
    vals = (
        f"transform(slice(sn, greatest(1, pos + 2 - {w}), "
        f"pos + 2 - greatest(1, pos + 2 - {w})), x -> cast(x.n as double))"
    )
    return (
        series.select("grp", "sn", F.posexplode("sn").alias("pos", "b"))
        .select(
            "grp",
            F.col("b.bucket_start").alias("bucket_start"),
            F.col("b.n").alias("n"),
            F.expr(vals).alias("__w"),
        )
        .select(
            "grp",
            "bucket_start",
            "n",
            F.expr("cast(array_min(__w) as bigint)").alias("mov_min"),
            F.expr("cast(array_max(__w) as bigint)").alias("mov_max"),
            F.expr(
                "cast(aggregate(__w, cast(0 as double), (s, x) -> s + x) "
                "as bigint)"
            ).alias("mov_sum"),
            F.round(
                F.expr(
                    "sqrt(greatest(cast(0 as double), "
                    "aggregate(__w, cast(0 as double), (s, x) -> s + x * x) "
                    "  / size(__w) "
                    "- pow(aggregate(__w, cast(0 as double), (s, x) -> s + x)"
                    "      / size(__w), cast(2 as double))))"
                ),
                6,
            ).alias("mov_stddev_r"),
            F.round(
                F.expr(
                    f"aggregate(slice(__w, 2, size(__w) - 1), "
                    f"element_at(__w, 1), "
                    f"(acc, v) -> v * {a} + acc * (cast(1 as double) - {a}))"
                ),
                6,
            ).alias("ewma_r"),
        )
        .orderBy("grp", "bucket_start")
    )


def bucket_script(
    events: DataFrame, hours: int = 1, numer_type: str = "error",
) -> DataFrame:
    """ES ``bucket_script`` pipeline aggregation: per date_histogram
    bucket, a script over sibling metrics — the canonical error-rate
    shape ``errors / total`` plus ``value`` intensity
    ``sum(value) / count`` (two scripts over three sibling aggs).
    Companion ``bucket_selector`` semantics ride the same frame: the
    ``selected`` flag marks buckets the ES selector (``rate > 0.2``)
    would keep, WITHOUT dropping rows (the driver hash then pins both
    the script values and the selector verdicts).

    Scale shape: one hash aggregate with conditional sums keyed by the
    time bucket — sibling metrics are CASE expressions inside the same
    reduce, never per-sibling scans; script arithmetic is bucket-sized
    column math."""
    hist = events.groupBy(
        F.window("ts", f"{hours} hour").start.alias("bucket_start")
    ).agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(
            F.expr(f"CASE WHEN event_type = '{numer_type}' THEN 1 ELSE 0 END")
        ).alias("n_numer"),
        F.sum("value").alias("sum_value"),
    )
    rate = "cast(n_numer as double) / cast(n_total as double)"
    return hist.select(
        "bucket_start",
        "n_total",
        "n_numer",
        F.round(F.expr(rate), 6).alias("rate_r"),
        F.round(
            F.expr("sum_value / cast(n_total as double)"), 6
        ).alias("intensity_r"),
        (F.expr(rate) > 0.2).alias("selected"),
    ).orderBy("bucket_start")


def frequent_item_sets(
    docs: DataFrame,
    vocab_size: int = 30,
    min_support: float = 0.02,
    max_size: int = 3,
    min_set_size: int = 1,
    split: str = "[^a-z0-9]+",
) -> DataFrame:
    """ES ``frequent_item_sets`` aggregation (8.x), deterministically:
    CLOSED frequent sets of co-occurring items up to ``max_size`` = 3,
    where items are the corpus's top-``vocab_size`` terms by document
    frequency (ties by term — the bounded item universe ES gets from a
    keyword field's cardinality) and a set's support is the number of
    documents containing ALL its items. ``min_support`` is the ES
    fractional support (threshold = ceil(frac · n_docs)); CLOSED means
    no strict superset has the same support (the ES result contract —
    non-closed sets are redundant: their support equals a reported
    superset's).

    Output (item_set, size, support), item_set the space-joined sorted
    items, ordered (support DESC, item_set ASC).

    Scale shape: the Apriori lattice never materializes — the bounded
    vocabulary broadcasts into the token scan, each doc reduces to its
    sorted distinct item array (one hash agg), and ALL k-set sizes are
    one concatenated ``transform``/``slice`` combination expression
    over those arrays (pure codegen; fan-out bounded by
    C(|vocab ∩ doc|, k)), so support counting is ONE hash agg over
    set-keyed rows — the r5 shape ran a separate explode+aggregate per
    size, re-evaluating the per-doc item reduction three times. The
    support-filtered result (bucket-sized by construction) is pinned
    once (localCheckpoint) and the closedness anti-joins run on its
    per-size slices (broadcast nested loop over bucket-sized data). At
    100 TB the vocabulary bound is the knob — it caps per-doc fan-out
    independent of corpus size. Per-doc distinct happens map-side
    (array_distinct before the explode), never as a corpus-wide
    distinct shuffle."""
    if not 1 <= max_size <= 3:
        raise ValueError("max_size must be in [1, 3]")
    if not 0.0 < min_support <= 1.0:
        raise ValueError("min_support must be a fraction in (0, 1]")
    if not 1 <= min_set_size <= max_size:
        raise ValueError("min_set_size must be in [1, max_size]")
    spark = docs.sparkSession
    n_docs = docs.count()
    thresh = int(-(-min_support * n_docs // 1))  # ceil
    toks = docs.select(
        "doc_id", F.explode(distinct_tokens(split)).alias("term")
    )
    vocab = (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(int(vocab_size))
        .select("term")
    )
    items = (
        toks.join(F.broadcast(vocab), "term")
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_set("term")).alias("it"))
    )
    # sets are ARRAYS end to end (group key, size, containment) — the
    # space-joined string appears only in the OUTPUT column, so a term
    # that itself contains a space (possible under a custom ``split``)
    # can neither be misclassified by size nor have its support merged
    # with a genuine larger set's
    pieces = ["transform(it, x -> array(x))"]
    if max_size >= 2:
        pieces.append(
            "flatten(transform(it, (x, i) -> "
            "transform(slice(it, i + 2, size(it) - i - 1), "
            "y -> array(x, y))))"
        )
    if max_size >= 3:
        pieces.append(
            "flatten(transform(it, (x, i) -> "
            "flatten(transform(slice(it, i + 2, size(it) - i - 1), (y, j) -> "
            "transform(slice(it, i + j + 3, size(it) - i - j - 2), "
            "z -> array(x, y, z))))))"
        )
    all_sets = pieces[0] if len(pieces) == 1 else "concat(" + ", ".join(pieces) + ")"
    freq_all = (
        items.select(F.explode_outer(F.expr(all_sets)).alias("items"))
        .filter(F.col("items").isNotNull())
        .groupBy("items")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= thresh)
        .localCheckpoint(eager=True)
    )
    freq = {}
    for size in range(1, max_size + 1):
        freq[size] = freq_all.filter(
            F.size("items") == size
        ).withColumn("size", F.lit(size))
    # closedness: drop S when a strict superset one larger has EQUAL
    # support (transitive: equal-support chains collapse to the top)
    kept = []
    for size in sorted(freq):
        cur = freq[size]
        if size + 1 in freq:
            sup = freq[size + 1].select(
                F.col("items").alias("__big"),
                F.col("support").alias("__bsup"),
            )
            cond = (
                F.expr("size(array_except(items, __big)) = 0")
                & (F.col("support") == F.col("__bsup"))
            )
            cur = cur.join(F.broadcast(sup), cond, "left_anti")
        kept.append(cur)
    out = kept[0]
    for frame in kept[1:]:
        out = out.unionByName(frame)
    return (
        out.filter(F.col("size") >= min_set_size)
        .select(
            F.array_join("items", " ").alias("item_set"),
            F.col("size").cast("long").alias("size"),
            "support",
        )
        .orderBy(F.desc("support"), F.asc("item_set"))
    )


# deterministic derived IPv4 (the with_geo device, network-shaped): a
# multiply-mod scatter over the full 32-bit space, so range buckets cut
# real boundaries; prime coprime to 2^32 => a bijection of doc_id mod 2^32
_IP_P = 2654435761  # Knuth's multiplicative-hash prime


def with_ip(docs: DataFrame) -> DataFrame:
    """Attach a deterministic ``ip`` (uint32 as BIGINT) and its dotted
    string derived from doc_id — integer ops only, replayable bitwise
    in any engine (the with_geo device for network data)."""
    d = docs.withColumn("ip", (F.col("doc_id") * _IP_P) % F.lit(2**32))
    return d.withColumn(
        "ip_s",
        F.concat_ws(
            ".",
            (F.col("ip") / 16777216).cast("long") % 256,
            (F.col("ip") / 65536).cast("long") % 256,
            (F.col("ip") / 256).cast("long") % 256,
            F.col("ip") % 256,
        ),
    )


def ip_range_agg(
    docs: DataFrame, ranges: list[tuple[str | None, str | None]]
) -> DataFrame:
    """ES ``ip_range`` aggregation: doc counts per half-open IP range
    ``[from, to)`` (ES's contract — ``from`` inclusive, ``to``
    exclusive; ``None`` = unbounded). Ranges are dotted-quad strings;
    empty ranges are reported with zero counts (stable bucket axis).

    Scale shape: dotted quads parse to uint32 ONCE driver-side; each
    range is a pair of integer comparisons in the scan (codegen), the
    bucket CASE feeds one bounded hash aggregate, and the range
    dimension broadcasts back for the gap-fill — the geo_rings shape.
    Overlapping ranges are legal in ES (a doc can land in several), so
    buckets are independent conditional SUMS in one pass, not a
    partition of the data."""
    if not ranges:
        raise ValueError("ip_range_agg needs >= 1 range")

    def val(s):
        if s is None:
            return None
        parts = [int(x) for x in s.split(".")]
        if len(parts) != 4 or any(not 0 <= p <= 255 for p in parts):
            raise ValueError(f"bad IPv4 {s!r}")
        return (parts[0] << 24) | (parts[1] << 16) | (parts[2] << 8) | parts[3]

    d = with_ip(docs)
    aggs = []
    for i, (lo, hi) in enumerate(ranges):
        lo_v, hi_v = val(lo), val(hi)
        conds = []
        if lo_v is not None:
            conds.append(f"ip >= {lo_v}")
        if hi_v is not None:
            conds.append(f"ip < {hi_v}")
        pred = " AND ".join(conds) or "true"
        aggs.append(
            F.sum(F.expr(f"CASE WHEN {pred} THEN 1 ELSE 0 END")).alias(f"__n{i}")
        )
    one = d.agg(*aggs)
    pairs = ", ".join(
        "'{}', __n{}".format(
            f"{lo or '*'}-{hi or '*'}", i
        )
        for i, (lo, hi) in enumerate(ranges)
    )
    return (
        one.select(
            F.expr(f"stack({len(ranges)}, {pairs}) AS (bucket, doc_count)")
        )
        .orderBy("bucket")
    )


def percentiles_bucket(
    events: DataFrame, hours: int = 1,
    percents: tuple[float, ...] = (25.0, 50.0, 75.0),
) -> DataFrame:
    """ES ``percentiles_bucket`` pipeline aggregation: exact
    (linear-interpolation) percentiles OF the gap-filled
    date_histogram's per-bucket doc counts, per event_type — the
    sibling-pipeline "what does a typical hour look like" readout.
    Exact where ES ships the same interpolation over collected bucket
    values (percentiles_bucket is NOT TDigest in ES either — it sees
    every sibling bucket).

    Scale shape: one hash aggregate to bucket rows, the sequence()
    gap-fill, then one percentile reduce per event_type over
    bucket-sized data."""
    iv = f"{hours} hour"
    hist = events.groupBy(
        F.window("ts", iv).start.alias("bucket_start"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    axis = (
        hist.groupBy("event_type")
        .agg(F.min("bucket_start").alias("lo"), F.max("bucket_start").alias("hi"))
        .select(
            "event_type",
            F.explode(F.sequence("lo", "hi", F.expr(f"interval {iv}"))).alias(
                "bucket_start"
            ),
        )
    )
    dense = axis.join(hist, ["event_type", "bucket_start"], "left").withColumn(
        "n", F.coalesce("n", F.lit(0))
    )
    cols = [
        F.round(
            F.expr(f"percentile(cast(n as double), {p / 100.0!r}D)"), 6
        ).alias(f"p{p:g}_r".replace(".", "_"))
        for p in percents
    ]
    return dense.groupBy("event_type").agg(*cols).orderBy("event_type")


def random_sampler_agg(
    docs: DataFrame, probability: float, group_col: str = "lang"
) -> DataFrame:
    """ES ``random_sampler`` aggregation (8.2), deterministically: child
    aggregations run over a probability sample of the documents and
    report counts SCALED by 1/p (the ES contract — the sampler is a
    background-agg accelerator, not a statistics change). Membership is
    a pure hash of doc_id (Knuth multiplicative, the with_ip device):
    ``(doc_id · P) mod 2^32 < p · 2^32`` — deterministic, replayable in
    any engine, and uniform across the id space, which is what ES's
    per-shard random streams give up (theirs is seed-dependent and
    unreproducible across engines by design; the hash IS this engine's
    seed). Output per group: sampled doc count, 1/p-scaled estimate,
    and the group's exact count beside it (the honesty column — at 100
    TB you would NOT compute it; it is here so the driver hash pins the
    estimator against truth).

    Scale shape: the membership predicate is integer codegen in the
    scan (a real deployment pushes it into a partition/bucket filter);
    one hash aggregate with conditional sums — the sample and the exact
    column share a single pass."""
    if not 0.0 < probability <= 1.0:
        raise ValueError("probability must be in (0, 1]")
    thresh = int(probability * 2**32)
    member = f"((doc_id * 2654435761) % 4294967296) < {thresh}"
    inv_p = f"cast('{1.0 / probability!r}' as double)"
    return (
        docs.groupBy(F.col(group_col).alias("grp"))
        .agg(
            F.sum(F.expr(f"CASE WHEN {member} THEN 1 ELSE 0 END")).alias(
                "sampled_docs"
            ),
            F.count(F.lit(1)).alias("exact_docs"),
        )
        .select(
            "grp",
            "sampled_docs",
            F.round(
                F.expr(f"cast(sampled_docs as double) * {inv_p}"), 6
            ).alias("est_docs_r"),
            "exact_docs",
        )
        .orderBy("grp")
    )


def moving_percentiles(
    events: DataFrame, hours: int = 1, window: int = 4,
    percents: tuple[float, ...] = (0.5, 0.9), key: str = "event_type",
) -> DataFrame:
    """ES ``moving_percentiles`` pipeline aggregation, deterministic
    core: per key, the trailing-``window`` percentiles of the gap-
    filled ``date_histogram`` counts. ES slides a merged TDigest along
    the buckets; the engine-checkable core is the EXACT percentile
    over the same trailing window, with the standard linear
    interpolation (C = 1, the ``quantile_cont`` convention): for the
    window's sorted values s[1..m], ``h = p*(m-1)``, result =
    ``s[floor(h)+1] + (h - floor(h)) * (s[floor(h)+2] - s[floor(h)+1])``
    — every term an explicit expression, so any SQL engine replays the
    identical IEEE arithmetic.

    Same lane as ``moving_fn``: one corpus-sized hash aggregate down to
    bucket rows, dense per-key axis as a sorted struct array,
    posexplode + slice hands each bucket its window, the sort and lerp
    run over window-sized arrays in codegen. The 100-TB knob is the
    interval; window and percents are request-sized."""
    if window < 1:
        raise ValueError("moving window must be >= 1 bucket")
    for p in percents:
        if not 0.0 <= p <= 1.0:
            raise ValueError("percents must be in [0, 1]")
    iv = f"{hours} hour"
    hist = events.groupBy(
        F.window("ts", iv).start.alias("bucket_start"),
        F.col(key).alias("grp"),
    ).agg(F.count(F.lit(1)).alias("n"))
    axis = (
        hist.groupBy("grp")
        .agg(F.min("bucket_start").alias("lo"), F.max("bucket_start").alias("hi"))
        .select(
            "grp",
            F.explode(F.sequence("lo", "hi", F.expr(f"interval {iv}"))).alias(
                "bucket_start"
            ),
        )
    )
    dense = axis.join(hist, ["grp", "bucket_start"], "left").withColumn(
        "n", F.coalesce("n", F.lit(0))
    )
    series = dense.groupBy("grp").agg(
        F.sort_array(F.collect_list(F.struct("bucket_start", "n"))).alias("sn")
    )
    w = int(window)
    sl = (
        f"array_sort(transform(slice(sn, greatest(1, pos + 2 - {w}), "
        f"pos + 2 - greatest(1, pos + 2 - {w})), x -> cast(x.n as double)))"
    )
    out = series.select(
        "grp", "sn", F.posexplode("sn").alias("pos", "b")
    ).select(
        "grp",
        F.col("b.bucket_start").alias("bucket_start"),
        F.col("b.n").alias("n"),
        F.expr(sl).alias("__s"),
    )
    for p in percents:
        pc = f"cast({float(p)} as double)"
        h = f"({pc} * cast(size(__s) - 1 as double))"
        lo = f"cast(floor({h}) as int)"
        lerp = (
            f"element_at(__s, {lo} + 1) + ({h} - cast({lo} as double)) * "
            f"(coalesce(element_at(__s, least({lo} + 2, size(__s))), "
            f"element_at(__s, {lo} + 1)) - element_at(__s, {lo} + 1))"
        )
        out = out.withColumn(
            f"p{int(round(p * 100))}_r", F.round(F.expr(lerp), 6)
        )
    return out.drop("__s").orderBy("grp", "bucket_start")


def sampler_agg(
    docs: DataFrame,
    score_terms: list[str],
    n_shards: int = 4,
    shard_size: int = 25,
    split: str = "[^a-z0-9]+",
) -> DataFrame:
    """ES ``sampler`` aggregation: restrict sub-aggregations to the
    TOP-SCORING ``shard_size`` documents PER SHARD (by query ``_score``),
    then aggregate over the sample — the cheap "only look at the best
    matches" device that makes expensive sub-aggs (significant_terms
    et al.) affordable. Distinct from ``diversified_sampler`` (adds a
    de-dup key cap) and ``random_sampler`` (probability sample).

    _score here is the document's matched-term count for
    ``score_terms`` (a constant-score multi-term query — integer, so
    the per-shard truncation is exactly replayable); shards are the
    same deterministic ``doc_id % n_shards`` split the ``terms``
    shard-error agg uses. Per shard keep top ``shard_size`` by
    (_score DESC, doc_id ASC); the sub-agg reports per-lang doc count
    + mean length over the union of kept docs.

    Scale shape: the per-doc score is a MAP-SIDE array_intersect of
    the doc's distinct tokens against the request-sized term list —
    no shuffle at all before the per-shard truncation window (the r5
    shape shuffled the corpus's entire distinct token stream just to
    semi-join a handful of terms out of it); the truncation is a
    window PARTITIONED BY shard over scored-match-sized data; sub-aggs
    run over <= n_shards * shard_size rows. On the real index the
    scored stream comes out of the postings fetch, same topology."""
    from pyspark.sql import Window

    if n_shards < 1 or shard_size < 1:
        raise ValueError("n_shards and shard_size must be >= 1")
    if not score_terms:
        raise ValueError("score_terms must be non-empty")
    # duplicate entries in score_terms are deduplicated (the set-
    # intersection count — the r5 broadcast join double-counted a
    # doc's match once per duplicate row, which was never meaningful
    # request shape)
    tarr = F.array(*[F.lit(t) for t in sorted(set(score_terms))])
    scored = (
        docs.select(
            "doc_id",
            F.size(F.array_intersect(distinct_tokens(split), tarr))
            .cast("long").alias("score"),
        )
        .filter(F.col("score") >= 1)
    )
    win = Window.partitionBy("shard").orderBy(F.desc("score"), F.asc("doc_id"))
    kept = (
        scored.withColumn("shard", F.col("doc_id") % n_shards)
        .withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") <= shard_size)
    )
    return (
        kept.join(docs.select("doc_id", "lang", "n_chars"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(F.avg(F.col("n_chars").cast("double")), 6).alias(
                "avg_chars_r"
            ),
            F.sum("score").cast("long").alias("sum_score"),
        )
        .orderBy("lang")
    )
