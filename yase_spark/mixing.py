"""Training-mixture operators: temperature-based domain weighting,
budgeted mixture sampling, and the deterministic global shuffle a
pretraining export needs.

* ``domain_weights`` — the multilingual/multi-source temperature
  sampling scheme (mBERT/XLM-R/PaLM data mixing): domain i with token
  share p_i samples with weight w_i = p_i^alpha / Σ_j p_j^alpha.
  alpha < 1 up-weights small domains (alpha = 0.5 is sqrt — the usual
  default, and IEEE-exact so Spark and the SQL oracle agree to the
  last ulp before the contract rounding). One corpus scan, then a
  DOMAIN-cardinality aggregate — nothing per-doc survives.
* ``mix_sample`` — materialize a token-budgeted mixture: each domain's
  keep-rate is min(1, budget·w_i / tokens_i) and docs keep/drop by the
  same 60-bit md5 Bernoulli key as ``curation.stratified_sample`` —
  deterministic (re-runs and the oracle pick identical rows), map-only
  after the tiny stats join, zero corpus shuffles.
* ``shuffle_export`` — the global pseudo-random shuffle before
  training: shard = doc hash mod n_shards, position = rank of the hash
  within the shard. Exactly the write pattern a 100 TB export wants —
  the hash IS the partitioner (uniform by construction, no skew), each
  shard sorts locally, nothing global except the hash function.

Determinism: every random choice is the md5-based 60-bit hash shared
verbatim with the DuckDB oracles; weights round at the contract
boundary. Per-doc token counts use the engine's analyzer split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .curation import _h60

SPLIT = "[^a-z0-9_]+"
H60_MAX = float(1 << 60)


def _doc_tokens(docs: DataFrame, group_col: str) -> DataFrame:
    return docs.select(
        "doc_id",
        F.col(group_col).alias("domain"),
        F.expr(
            f"size(filter(split(lower(text), '{SPLIT}'), x -> x <> ''))"
        ).alias("n_tokens"),
    )


def _stats(docs: DataFrame, group_col: str, alpha: float) -> DataFrame:
    """(domain, n_docs, n_tokens, p, w) with w = p^alpha / Σ p^alpha."""
    per = (
        _doc_tokens(docs, group_col)
        .groupBy("domain")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
        )
    )
    tot = per.agg(F.sum("n_tokens").cast("double").alias("tot"))
    shared = per.crossJoin(F.broadcast(tot)).withColumn(
        "pw", F.pow(F.col("n_tokens") / F.col("tot"), F.lit(alpha))
    )
    denom = shared.agg(F.sum("pw").alias("denom"))
    return (
        shared.crossJoin(F.broadcast(denom))
        .select(
            "domain",
            "n_docs",
            "n_tokens",
            (F.col("n_tokens") / F.col("tot")).alias("p"),
            (F.col("pw") / F.col("denom")).alias("w"),
        )
    )


def domain_weights(
    docs: DataFrame, group_col: str = "source", alpha: float = 0.5
) -> DataFrame:
    """Per-domain temperature sampling weights. Output (domain, n_docs,
    n_tokens, share_r, weight_r) ordered by domain."""
    if not 0 < alpha <= 1:
        raise ValueError("alpha must be in (0, 1]")
    return (
        _stats(docs, group_col, alpha)
        .select(
            "domain",
            "n_docs",
            "n_tokens",
            F.round("p", 6).alias("share_r"),
            F.round("w", 6).alias("weight_r"),
        )
        .orderBy("domain")
    )


def mix_sample(
    docs: DataFrame,
    budget_tokens: int,
    group_col: str = "source",
    alpha: float = 0.5,
    salt: str = "mx",
) -> DataFrame:
    """Deterministic token-budgeted mixture sample.

    Domain i keeps docs at rate min(1, budget·w_i / tokens_i) — i.e.
    the realized mixture approaches the temperature weights until a
    domain is exhausted (rate capped at 1; ES/PaLM-style mixing leaves
    oversampling epochs to the training loader). Keep/drop is the
    60-bit md5 of (salt, doc_id): map-only, reproducible, identical in
    the SQL oracle. Output (doc_id, domain, n_tokens) of kept docs.
    """
    if budget_tokens <= 0:
        raise ValueError("budget_tokens must be positive")
    rates = _stats(docs, group_col, alpha).select(
        "domain",
        F.least(
            F.lit(1.0),
            F.lit(float(budget_tokens)) * F.col("w") / F.col("n_tokens"),
        ).alias("rate"),
    )
    key = _h60(f"concat('{salt}', cast(doc_id as string))")
    return (
        _doc_tokens(docs, group_col)
        .join(F.broadcast(rates), "domain")
        .filter(F.expr(key) < F.col("rate") * H60_MAX)
        .select("doc_id", "domain", "n_tokens")
    )


def shuffle_export(
    docs: DataFrame, n_shards: int, salt: str = "sh"
) -> DataFrame:
    """Deterministic global shuffle: (shard, pos, doc_id) with shard =
    h60(salt, doc_id) mod n_shards and pos = 1-based rank of (h60,
    doc_id) within the shard. The hash is the partitioner — shards are
    uniform by construction, each sorts locally (one shuffle total),
    and the layout is byte-reproducible across runs and engines."""
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    key = _h60(f"concat('{salt}', cast(doc_id as string))")
    w = Window.partitionBy("shard").orderBy(F.asc("h"), F.asc("doc_id"))
    return (
        docs.select("doc_id", F.expr(key).alias("h"))
        .withColumn("shard", (F.col("h") % n_shards).cast("int"))
        .withColumn("pos", F.row_number().over(w))
        .select("shard", "pos", "doc_id")
    )


def importance_weights(
    docs: DataFrame,
    target_expr: str,
    alpha: float = 1.0,
) -> DataFrame:
    """DSIR-style data-selection importance weights (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"):
    fit two add-α-smoothed unigram LMs — a TARGET model on the rows
    where ``target_expr`` (SQL boolean over the table's columns) holds
    and a RAW model on the whole corpus — and score every document by
    the log importance ratio of its token stream:

        logw(d) = Σ_{t ∈ d} [ ln p_target(t) − ln p_raw(t) ],
        p(t) = (C(t) + α) / (T + α·V),  V = raw vocabulary size

    (both models smooth over the SAME raw vocabulary, so a token the
    target never saw gets the α floor rather than −inf). Resampling
    the corpus ∝ exp(logw) concentrates it toward the target
    distribution — the standard cheap domain-selection stage before
    pretraining. Output (doc_id, n_tokens, logw_r), logw rounded 5.

    Scale shape: TWO term-keyed hash aggregates bounded by vocabulary
    size (the target counts are a filtered branch of the same token
    scan), four scalars collected from them (bounded by construction),
    then one term-keyed join of the token stream against the
    vocabulary-sized ratio table — broadcast-eligible for real
    vocabularies — and one per-doc aggregation. The paper hashes
    n-grams into 10^4 buckets purely to bound V; exact unigrams make
    the oracle full-value, and swapping the term key for
    ``pmod(hash(term), B)`` is the documented 100-TB variant."""
    if alpha <= 0:
        raise ValueError("alpha must be > 0")
    toks = docs.select(
        "doc_id",
        F.expr(target_expr).alias("_is_target"),
        F.explode(
            F.expr(f"filter(split(lower(text), '{SPLIT}'), x -> x <> '')")
        ).alias("term"),
    )
    # one materialization (vocab-sized, localCheckpoint: blocks are
    # context-cleaned on GC) feeds the scalar collect AND the ratio
    # join — unpinned, the corpus tokenize+aggregate ran twice
    counts = toks.groupBy("term").agg(
        F.count("*").alias("c_raw"),
        F.sum(F.when(F.col("_is_target"), 1).otherwise(0)).alias("c_t"),
    ).localCheckpoint(eager=True)
    tot = counts.agg(
        F.sum("c_raw").alias("t_raw"),
        F.sum("c_t").alias("t_t"),
        F.count("*").alias("v"),
    ).collect()[0]
    t_raw, t_t, v = float(tot["t_raw"]), float(tot["t_t"]), float(tot["v"])
    if t_t == 0.0:
        raise ValueError("target_expr matches no tokens; cannot fit p_target")
    import math

    d_t = math.log(t_t + alpha * v)
    d_raw = math.log(t_raw + alpha * v)
    ratio = counts.select(
        "term",
        (
            (F.log(F.col("c_t") + F.lit(alpha)) - F.lit(d_t))
            - (F.log(F.col("c_raw") + F.lit(alpha)) - F.lit(d_raw))
        ).alias("lr"),
    )
    return (
        toks.select("doc_id", "term")
        .join(ratio, "term")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.sum("lr"), 5).alias("logw_r"),
        )
    )


def sliced_scroll(
    docs: DataFrame,
    slice_id: int,
    max_slices: int,
    salt: str = "slice",
    cols: tuple[str, ...] = ("lang", "source", "n_chars"),
) -> DataFrame:
    """ES SLICED SCROLL — the parallel-export primitive: slice ``i`` of
    ``max`` owns exactly the docs with ``hash(_id) mod max == i``
    (ES's ``slice: {id, max}`` on a scroll/PIT search). N workers each
    request their own slice and the union is the corpus, disjoint by
    construction — no coordination, no cursor contention.

    Here the slice key is the house 60-bit md5 of (salt, doc_id) — the
    same engine-replayable device as ``shuffle_export``, so any SQL
    engine (and any other worker fleet) computes identical membership.
    The slice predicate is map-only and rides WITH the scan: at 100 TB
    each export worker streams its slice straight out of the parquet
    splits it reads, shuffle-free once the presentation-level global
    ``orderBy`` below becomes ``sortWithinPartitions`` (ES likewise
    recommends ``_doc`` order inside a slice — the cheapest stable
    order; the contract comparison is order-insensitive either way)."""
    if max_slices <= 0:
        raise ValueError("max_slices must be positive")
    if not 0 <= slice_id < max_slices:
        raise ValueError("slice_id must be in [0, max_slices)")
    key = _h60(f"concat('{salt}', cast(doc_id as string))")
    return (
        docs.filter(F.expr(key) % max_slices == slice_id)
        .select("doc_id", *cols)
        .orderBy("doc_id")
    )


def split_assign(
    docs: DataFrame,
    fractions: dict[str, float],
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test SPLIT ASSIGNMENT — the first thing
    every training-data pipeline does after curation and the thing that
    must NEVER drift between runs: doc membership is a pure function of
    (salt, doc_id), so adding machines, re-partitioning, or re-running
    months later assigns every doc to the same split (and a changed
    salt re-rolls all of them at once, deliberately).

    ``fractions`` maps split name -> fraction; they must sum to 1.
    Assignment: ``u = h60(salt, doc_id)`` against the cumulative
    integer thresholds ``floor(cum_fraction * 2^60)`` — precomputed
    exact constants, so any SQL engine replays membership bitwise
    (same device as ``mix_sample``). Map-only: the split column is a
    CASE chain in the scan; no shuffle until whatever aggregates the
    caller adds."""
    if not fractions:
        raise ValueError("fractions must be non-empty")
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1 (got {total})")
    if any(f <= 0 for f in fractions.values()):
        raise ValueError("every fraction must be positive")
    key = _h60(f"concat('{salt}', cast(doc_id as string))")
    case = "CASE"
    for name, thr in split_thresholds(fractions):
        case += f" WHEN {key} < {thr} THEN '{name}'"
    case += f" ELSE '{list(fractions)[-1]}' END"
    return docs.withColumn("split", F.expr(case))


def split_thresholds(fractions: dict[str, float]) -> list[tuple[str, int]]:
    """The exact integer h60 thresholds ``split_assign`` compares
    against, exported so SQL oracles build their CASE from the SAME
    accumulated floats (0.9 + 0.05 is 0.9500000000000001 in IEEE —
    recomputing "0.95" independently would drift a boundary doc)."""
    cum, out = 0.0, []
    for name in list(fractions)[:-1]:
        cum += fractions[name]
        out.append((name, int(cum * (1 << 60))))
    return out


def split_counts(docs: DataFrame, fractions: dict[str, float],
                 salt: str = "split") -> DataFrame:
    """Per-split doc and char totals — the audit readout of
    ``split_assign`` (one hash agg on the tiny split key)."""
    return (
        split_assign(docs, fractions, salt)
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("n_chars_sum"),
        )
        .orderBy("split")
    )
