"""Parent/child (nested-document) queries — the Elasticsearch
``has_child`` / ``has_parent`` join surface.

Data model: a PARENT table (documents) and a CHILD table keyed by the
parent id — here the deterministic token-window chunks
``curation.chunk_docs`` emits, the join shape ES implements with
child docs routed to the parent's shard and Lucene implements with
block-joins. Two queries:

* ``has_child_topk`` — rank PARENTS by an aggregate of their matching
  children's relevance (ES ``score_mode``: max/sum/avg/min/none).
  Children are scored with CHILD-LEVEL BM25 statistics (df/avgdl over
  the child corpus — exactly how ES scores the child index), then ONE
  parent-keyed aggregation applies the score mode and the global top-k
  is a TakeOrderedAndProject cap. The scoring is the same relational
  BM25 lane as ``fields.py`` (explode → tf/df/dl aggs → contribution
  join), everything JVM-side; at 100 TB the child tf/df inputs come out
  of a child inverted index instead of a corpus re-scan and feed the
  SAME contribution expression — the aggregation/topology above the
  per-child score is unchanged.
* ``has_parent_children`` — return CHILDREN whose parent matches a
  metadata predicate (ES ``has_parent``): a parent-keyed equi-join
  against the filtered parent dimension; the predicate pushes into the
  parent scan and the small filtered side broadcasts.

Determinism: integer counts everywhere, fixed contribution expression,
(score DESC, parent ASC) and (parent ASC, child ASC) orderings. The
per-child score is carried as an exact BIGINT in 1e-6 units (each
per-term contribution — itself a deterministic scalar expression —
is rounded to 6 dp and lifted to integer micro-units BEFORE any sum),
so the max/sum/min ranking/aggregation keys are integer math:
invariant under partitioning, partial-aggregate merge order, and
engine (the float-sum ulp-straddle class that bit has_child_inner at
sf0.001 in round 5 is closed by construction, same device as
similarity.maxsim_topk). score_mode='avg' is the scoped exception:
Spark's Average over LongType accumulates in a double buffer, so its
exactness holds only while the per-parent micro-unit sum stays below
2^53 (~9e9 in score units per parent — far above any real per-parent
child fan-in, but not a by-construction guarantee like the other
modes). Display scores divide back to doubles only at the contract
boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SPLIT = "[^a-z0-9_]+"
SCORE_MODES = ("max", "sum", "avg", "min", "none")


def _child_scores(
    children: DataFrame, terms: list[str], k1: float, b: float
) -> DataFrame:
    """(doc_id, chunk_id, cscore_u6): BM25 score of every child
    matching >= 1 query term, under child-corpus statistics, in exact
    integer micro-units. One explode pass feeds tf, dl, df, and the two
    scalar totals. Each per-term contribution is a deterministic scalar
    expression over exact integers (tf/df/dl) and the two deterministic
    totals; it is rounded to 6 dp and cast to BIGINT micro-units BEFORE
    the per-child sum, so the sum is integer addition — associative,
    hence invariant under partial-agg merge order and identical in any
    replaying engine."""
    toks = children.select(
        "doc_id", "chunk_id",
        F.explode(F.split(F.lower("chunk_text"), SPLIT)).alias("term"),
    ).filter(F.col("term") != "")
    dl = toks.groupBy("doc_id", "chunk_id").agg(F.count("*").alias("dl"))
    tf = (
        toks.filter(F.col("term").isin(list(terms)))
        .groupBy("doc_id", "chunk_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfs = tf.groupBy("term").agg(F.count("*").alias("df"))
    totals = dl.agg(
        F.count("*").alias("n_children"), F.avg("dl").alias("avgdl")
    )
    idf = F.log(
        1.0 + (F.col("n_children") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    contrib = idf * (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf") + k1 * (1.0 - b + b * (F.col("dl") / F.col("avgdl")))
    )
    return (
        tf.join(F.broadcast(dfs), "term")
        .join(dl, ["doc_id", "chunk_id"])
        .crossJoin(F.broadcast(totals))
        .withColumn("c_u6", F.round(contrib * 1e6, 0).cast("long"))
        .groupBy("doc_id", "chunk_id")
        .agg(F.sum("c_u6").alias("cscore_u6"))
    )


def has_child_topk(
    children: DataFrame,
    terms: list[str],
    k: int = 10,
    score_mode: str = "max",
    min_children: int = 1,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """ES ``has_child``: top-``k`` PARENT ids whose children match the
    query, parent score = ``score_mode`` over matching children's BM25
    scores (``none`` = constant 1.0, ES's unscored filter mode — ties
    then break by parent id, i.e. pure filter semantics).
    ``min_children`` is ES ``min_children``. Output
    (rank, doc_id, n_matched, score_r)."""
    if score_mode not in SCORE_MODES:
        raise ValueError(f"score_mode must be one of {SCORE_MODES}")
    if not terms or k <= 0:
        raise ValueError("has_child_topk needs query terms and k > 0")
    cs = _child_scores(children, terms, k1, b)
    # exact integer keys for max/sum/min; avg divides the exact sum by
    # the exact count once (deterministic); none is ES's unscored 1.0
    agg = {
        "max": F.max("cscore_u6"),
        "sum": F.sum("cscore_u6"),
        "avg": F.avg("cscore_u6"),
        "min": F.min("cscore_u6"),
        "none": F.lit(1_000_000.0),
    }[score_mode]
    parents = (
        cs.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_matched"),
            agg.alias("score_u6"),
        )
        .filter(F.col("n_matched") >= min_children)
    )
    top = parents.orderBy(F.desc("score_u6"), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.desc("score_u6"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank",
        "doc_id",
        "n_matched",
        F.round(F.col("score_u6") / 1e6, 6).alias("score_r"),
    )


def has_child_inner_hits(
    children: DataFrame,
    terms: list[str],
    k: int = 10,
    m: int = 3,
    score_mode: str = "max",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """ES ``inner_hits``: the top-``k`` parents of ``has_child_topk``,
    each flattened to its top-``m`` matching children by child BM25
    score (crank = child rank within the parent, ties by chunk_id).

    One extra broadcast join against the k-row parent set + one
    per-parent window over that parent's matched children — the child
    score frame is computed once and reused for both the parent rollup
    and the inner hits, exactly the single-pass shape ES's block-join
    collector has. Output (rank, doc_id, score_r, crank, chunk_id,
    cscore_r)."""
    if m <= 0:
        raise ValueError("m must be positive")
    cs = _child_scores(children, terms, k1, b).persist()
    agg = {
        "max": F.max("cscore_u6"),
        "sum": F.sum("cscore_u6"),
        "avg": F.avg("cscore_u6"),
        "min": F.min("cscore_u6"),
        "none": F.lit(1_000_000.0),
    }[score_mode]
    parents = (
        cs.groupBy("doc_id")
        .agg(agg.alias("score_u6"))
        .orderBy(F.desc("score_u6"), F.asc("doc_id"))
        .limit(k)
    )
    pw = Window.orderBy(F.desc("score_u6"), F.asc("doc_id"))
    ranked = parents.withColumn("rank", F.row_number().over(pw))
    # children rank on the exact BIGINT micro-unit score (round 5 hit
    # a 6dp display tie whose unrounded float sums straddled at ulp
    # level with opposite sign across engines — with integer keys a
    # tie is a true tie and chunk_id decides, identically everywhere)
    cw = Window.partitionBy("doc_id").orderBy(
        F.desc("cscore_u6"), F.asc("chunk_id")
    )
    return (
        cs.join(F.broadcast(ranked), "doc_id")
        .withColumn("crank", F.row_number().over(cw))
        .filter(F.col("crank") <= m)
        .select(
            "rank",
            "doc_id",
            F.round(F.col("score_u6") / 1e6, 6).alias("score_r"),
            "crank",
            "chunk_id",
            F.round(F.col("cscore_u6") / 1e6, 6).alias("cscore_r"),
        )
    )


def has_parent_children(
    docs: DataFrame, children: DataFrame, predicate: str
) -> DataFrame:
    """ES ``has_parent``: every CHILD whose parent matches the metadata
    predicate, carrying the parent field along. The filtered parent
    dimension broadcasts (a metadata slice is small by definition at
    any scale — and if it is not, Spark's AQE demotes the broadcast);
    the child table is never shuffled. Output
    (doc_id, chunk_id, lang, n_tokens)."""
    parents = docs.filter(F.expr(predicate)).select("doc_id", "lang")
    return (
        children.join(F.broadcast(parents), "doc_id")
        .select("doc_id", "chunk_id", "lang", "n_tokens")
    )


def nested_match(
    docs: DataFrame,
    min_len: int = 6,
    prefix: str = "s",
    k: int = 15,
    split: str = SPLIT,
) -> DataFrame:
    """ES ``nested`` query over array-of-objects fields — the SAME-
    OBJECT conjunction semantics that distinguishes nested mappings
    from flattened ones.

    The fixture derives the nested field from the token stream: each
    token is an object ``{pos, len, tok}``. The query requires a
    SINGLE object with ``len >= min_len AND tok LIKE prefix%`` — under
    a flattened mapping, a doc with one long token and a SEPARATE
    short prefix-matching token false-positives; nested semantics
    reject it. The output exposes both verdicts (``n_hits`` vs
    ``flat_match``) so the divergence is part of the checked contract
    (on the synth corpus the flat query matches nearly every doc, the
    nested one only true same-object hits).

    Scale shape: entirely map-only — ``filter``/``size``/``exists``
    over the in-row array in whole-stage codegen, no explode, no
    shuffle before the final top-k (TakeOrderedAndProject). This is
    the Lucene block-join locality argument done relationally: the
    nested objects live WITH the parent row, so the same-object test
    never leaves the row.

    Output: docs with ``n_hits >= 1`` ranked n_hits DESC / doc_id ASC,
    top ``k``, with the first matching object's position.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if min_len < 1:
        raise ValueError("min_len must be >= 1")
    if not prefix.isalnum():
        raise ValueError("prefix must be alphanumeric")
    toks = (
        f"filter(split(lower(text), '{split}'), t -> t <> '')"
    )
    hit = (
        f"t -> length(t) >= {int(min_len)} "
        f"and startswith(t, '{prefix}')"
    )
    objs = docs.select(
        "doc_id",
        F.expr(f"size(filter({toks}, {hit}))").cast("long").alias("n_hits"),
        F.expr(
            f"array_position(transform({toks}, {hit}), true)"
        ).cast("long").alias("first_pos"),
        F.expr(
            f"exists({toks}, t -> length(t) >= {int(min_len)}) "
            f"and exists({toks}, t -> startswith(t, '{prefix}'))"
        ).alias("flat_match"),
    )
    return (
        objs.filter(F.col("n_hits") >= 1)
        .orderBy(F.desc("n_hits"), F.asc("doc_id"))
        .limit(int(k))
    )
